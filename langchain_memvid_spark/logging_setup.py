"""Namespaced logging for the package (§2a #44).

Observable behavior mirrors the reference's logging module
(/root/reference/src/langchain_memvid/logging.py:26-91): one package
root logger, module loggers namespaced under it, records up to WARNING
going to stdout and ERROR/CRITICAL to stderr, no propagation to the
root logger, and idempotent handler setup.  Differences by design:
setup is lazy (importing the package emits nothing — important under
spark-submit where stdout may feed a pipe) and the band split is a
single handler-level predicate rather than a Filter subclass.
"""

from __future__ import annotations

import logging
import sys

PACKAGE_LOGGER = "langchain_memvid_spark"

_DEFAULT_FMT = "[%(asctime)s] %(levelname)s [%(name)s.%(funcName)s:%(lineno)d] %(message)s"
_DEFAULT_DATEFMT = "%Y-%m-%d %H:%M:%S"


def _band_handler(stream, lo: int, hi: int, formatter: logging.Formatter) -> logging.Handler:
    h = logging.StreamHandler(stream)
    h.setLevel(lo)
    h.addFilter(lambda record: lo <= record.levelno <= hi)
    h.setFormatter(formatter)
    return h


def setup_logging(
    level: int = logging.INFO,
    fmt: str = _DEFAULT_FMT,
    datefmt: str = _DEFAULT_DATEFMT,
) -> logging.Logger:
    """Configure the package root logger (idempotent): stdout carries
    DEBUG..WARNING, stderr carries ERROR..CRITICAL."""
    root = logging.getLogger(PACKAGE_LOGGER)
    if not root.handlers:
        root.setLevel(level)
        formatter = logging.Formatter(fmt=fmt, datefmt=datefmt)
        root.addHandler(_band_handler(sys.stdout, logging.DEBUG, logging.WARNING, formatter))
        root.addHandler(_band_handler(sys.stderr, logging.ERROR, logging.CRITICAL, formatter))
        root.propagate = False
    return root


def get_logger(name: str | None = None) -> logging.Logger:
    """Module logger namespaced under the package root (configures the
    root on first use). Accepts bare suffixes ("core.store") and
    already-qualified ``__name__`` values without double-prefixing."""
    setup_logging()
    if not name:
        return logging.getLogger(PACKAGE_LOGGER)
    if name == PACKAGE_LOGGER or name.startswith(PACKAGE_LOGGER + "."):
        return logging.getLogger(name)
    return logging.getLogger(f"{PACKAGE_LOGGER}.{name}")
