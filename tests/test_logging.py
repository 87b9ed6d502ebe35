"""Logging smoke tests (§2a #44) — the stdout/stderr band split and
namespacing the reference guarantees (logging.py:26-91)."""

import logging

from langchain_memvid_spark.logging_setup import PACKAGE_LOGGER, get_logger, setup_logging


def test_namespacing_and_idempotent_setup():
    lg = get_logger("core.store")
    assert lg.name == f"{PACKAGE_LOGGER}.core.store"
    root = setup_logging()
    n = len(root.handlers)
    setup_logging()  # second call must not duplicate handlers
    assert len(root.handlers) == n == 2
    assert root.propagate is False


def test_stdout_stderr_band_split(capsys):
    # rebind handlers inside this test so they hold the streams capsys
    # is watching (StreamHandler snapshots sys.stdout at creation)
    root = logging.getLogger(PACKAGE_LOGGER)
    root.handlers.clear()
    setup_logging()
    lg = get_logger("bands")
    lg.info("info-line")
    lg.warning("warn-line")
    lg.error("error-line")
    out, err = capsys.readouterr()
    assert "info-line" in out and "warn-line" in out and "error-line" not in out
    assert "error-line" in err and "info-line" not in err
