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
    COALESCE of strict per-key typed extractions — the SAME
    `_typed_json_col` machinery the store's typed filter dialect uses
    (core/store.py: strict from_json typing, quoted-literal handling
    of "NaN"/"Infinity", regex-escaped raw-text anchor), so the two
    surfaces cannot drift. ``dtype`` plays expected_type over JSON's
    type system: 'string' walks skip numbers, booleans, AND nested
    objects/arrays (a stored string that merely LOOKS like a
    container is kept — the quoted-text anchor distinguishes them);
    'double' walks skip everything that is not a genuine JSON number.
    Property-fuzzed against the Python helper across strings, floats,
    booleans, nested containers, and the special float literals. The
    one inherent divergence: JSON has no int/float split, so a stored
    3 is a number (double walk takes it as 3.0) while the driver-side
    ``isinstance(3, float)`` skips the Python int — documented, not
    hidden. A non-None ``default`` terminates the coalesce; an empty
    key list yields NULL (or the default), like the Python helper
    with no keys."""
    import re as _re

    from langchain_memvid_spark.core.store import _typed_json_col

    for key in keys:
        if not _re.match(r"^[A-Za-z_][A-Za-z0-9_\-]*$", key):
            raise ValueError(
                f"first_match_col key {key!r} is not a plain identifier; "
                "nested/quoted JSON keys are not addressable"
            )
    cols = []
    for key in keys:
        base = _typed_json_col(key, dtype, mj=metadata_json)
        if dtype == "string":
            # additionally skip genuine containers: the raw extraction
            # of an object/array is its JSON text (starts with { or [),
            # but a stored STRING with that shape is quoted in the raw
            # document — keep those, mask the real containers
            raw = F.get_json_object(metadata_json, f"$.{key}")
            quoted = metadata_json.rlike(
                '[{,]\\s*"' + _re.escape(key) + '"\\s*:\\s*"'
            )
            is_container = (
                raw.isNotNull()
                & (raw.startswith("{") | raw.startswith("["))
                & ~quoted
            )
            base = F.when(~is_container, base)
        cols.append(base)
    if default is not None:
        cols.append(F.lit(default).cast(dtype))
    if not cols:
        return F.lit(None).cast(dtype)
    return F.coalesce(*cols)
