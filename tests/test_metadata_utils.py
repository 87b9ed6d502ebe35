"""get_on_first_match parity suite — mirrors the reference's
/root/reference/tests/test_utils_metadata.py case for case (basic,
first-match priority, skip-None, missing keys, defaults, type
checking incl. type-from-default inference, falsy values NOT
skipped), plus the Catalyst first_match_col analog."""

from pyspark.sql import functions as F

from langchain_memvid_spark.functions.metadata import first_match_col, get_on_first_match


def test_basic_and_priority():
    md = {"key1": "value1", "key2": "value2", "key3": "value3"}
    assert get_on_first_match(md, "key1") == "value1"
    assert get_on_first_match(md, "key1", "key2", "key3") == "value1"
    assert get_on_first_match(md, "key3", "key1") == "value3"


def test_skip_none_and_missing():
    md = {"key1": None, "key2": "value2"}
    assert get_on_first_match(md, "key1", "key2") == "value2"
    assert get_on_first_match({"key1": "v"}, "missing", "key1") == "v"
    assert get_on_first_match({"key1": "v"}, "m1", "m2") is None
    assert get_on_first_match({"key1": "v"}, "m1", default="d") == "d"


def test_type_checking():
    md = {"key1": "string_value", "key2": 42, "key3": "another_string"}
    assert get_on_first_match(md, "key1", "key2", expected_type=str) == "string_value"
    assert get_on_first_match(md, "key1", "key2", expected_type=int) == 42
    # wrong-typed values are skipped, not returned
    assert get_on_first_match(md, "key1", "key3", expected_type=int) is None
    # expected_type derives from a non-None default (reference line 9-10)
    assert get_on_first_match(md, "key1", default=0) == 0  # str skipped, int default
    assert get_on_first_match(md, "key2", default=0) == 42


def test_empty_and_none_inputs():
    assert get_on_first_match({}, "k") is None
    assert get_on_first_match({"k": "v"}) is None  # no keys
    assert get_on_first_match({"k": {"nested": 1}}, "k") == {"nested": 1}


def test_falsy_values_not_skipped():
    # the reference's zero/empty-string/False cases: only None skips
    assert get_on_first_match({"k": 0}, "k") == 0
    assert get_on_first_match({"k": ""}, "k") == ""
    assert get_on_first_match({"k": False}, "k") is False
    assert get_on_first_match({"k": False, "j": True}, "k", "j") is False


def test_first_match_col_semantics(spark):
    """The Catalyst analog: first present/non-null/type-matching key
    per row, type-skip via strict typed extraction, default
    terminates."""
    rows = [
        (0, '{"a": "x", "b": "y", "n": 3}'),
        (1, '{"a": null, "b": "y", "n": 3}'),
        (2, '{"b": "only-b", "n": "not-a-number"}'),
        (3, "{}"),
    ]
    df = spark.createDataFrame(rows, "id long, mj string")
    got = {
        r["id"]: (r["s"], r["d"])
        for r in df.select(
            "id",
            first_match_col(F.col("mj"), ["a", "b"]).alias("s"),
            first_match_col(F.col("mj"), ["a", "n"], dtype="double", default=-1.0).alias(
                "d"
            ),
        ).collect()
    }
    assert got[0] == ("x", 3.0)  # 'a' wins the string walk; the double
    # walk type-skips the string 'a' and takes 'n'
    assert got[1] == ("y", 3.0)  # null 'a' skipped both times
    assert got[2] == ("only-b", -1.0)  # 'n' is a string: type-skipped -> default
    assert got[3] == (None, -1.0)  # nothing present; string walk has no default


def test_first_match_col_no_keys_and_bad_key(spark):
    """Zero keys yields NULL (or the default), like the Python helper
    with no keys; non-identifier keys raise loudly."""
    df = spark.createDataFrame([(0, '{"a": 1}')], "id long, mj string")
    row = df.select(
        first_match_col(F.col("mj"), []).alias("s"),
        first_match_col(F.col("mj"), [], dtype="double", default=-1.0).alias("d"),
    ).collect()[0]
    assert row["s"] is None and row["d"] == -1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="identifier"):
        first_match_col(F.col("mj"), ["bad(key)"])
