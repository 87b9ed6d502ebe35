"""Metadata extraction helpers — the reference's
utils/metadata.py get_on_first_match re-expressed twice:

- :func:`get_on_first_match` is the faithful driver-side Python
  helper (exact semantics incl. type-from-default inference —
  /root/reference/src/langchain_memvid/utils/metadata.py:1-17), used
  where the reference uses it: picking a score out of a built
  Document's metadata with fallback keys
  (vectorstore.py:678-684).
- :func:`first_match_col` is the DISTRIBUTED analog: one Catalyst
  expression evaluating the same first-present-non-null-type-matching
  scan over a ``metadata_json`` column, so the semantics also run at
  scan speed over a 100 TB table instead of only on collected rows.
"""

from __future__ import annotations

from typing import Any, Iterable, Type, TypeVar

from pyspark.sql import Column
from pyspark.sql import functions as F

T = TypeVar("T")


def get_on_first_match(
    metadata: dict,
    *keys: Iterable[str],
    default: T = None,
    expected_type: Type[T] = None,
) -> T:
    """First value in ``metadata`` among ``keys`` that is present,
    non-None, and (when a type is given or derivable from a non-None
    ``default``) an instance of the expected type; ``default``
    otherwise. Mirrors the reference exactly, including that bools ARE
    ints to isinstance and that falsy values (0, '', False) are NOT
    skipped — only None is."""
    if expected_type is None and default is not None:
        expected_type = type(default)
    for key in keys:
        if key in metadata and (value := metadata[key]) is not None:
            if expected_type is None or isinstance(value, expected_type):
                return value
    return default


def first_match_col(
    metadata_json: Column,
    keys: list[str],
    dtype: str = "string",
    default: Any | None = None,
) -> Column:
    """Catalyst ``get_on_first_match`` over a JSON metadata column:
    COALESCE of strict per-key typed extractions. ``from_json`` with a
    single-field typed schema returns NULL when the stored value is
    missing, null, or not of the declared type — so the coalesce walk
    IS the reference's skip-None + skip-wrong-type scan, evaluated
    JVM-side per row with no Python. ``dtype`` plays expected_type:
    the 'string' walk masks values that strictly parse as JSON
    numbers or booleans (same strictness as the typed filter dialect,
    minus its non-finite-literal special case — a key storing the
    STRING "NaN" is masked here), so a declared-string walk never
    returns a stored numeric, exactly as ``isinstance(v, str)`` skips
    it driver-side (property-fuzzed against the Python helper). A
    non-None ``default`` terminates the coalesce."""
    cols = []
    for key in keys:
        if dtype == "string":
            raw = F.get_json_object(metadata_json, f"$.{key}")
            num = F.from_json(metadata_json, f"`{key}` double")[key]
            is_bool = F.from_json(metadata_json, f"`{key}` boolean")[key].isNotNull()
            cols.append(F.when(num.isNull() & ~is_bool, raw))
        else:
            cols.append(F.from_json(metadata_json, f"`{key}` {dtype}")[key])
    if default is not None:
        cols.append(F.lit(default).cast(dtype))
    return F.coalesce(*cols)
