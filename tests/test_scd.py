"""Semantics of operators/scd.py scd2_from_changelog (oracle parity for the
registered scd2_customer_status query lives in test_oracle_parity.py)."""

import datetime as dt


def _ts(d):
    return dt.datetime(2024, 1, d)


def _build(spark, rows, attrs=("status",)):
    from duckdb_routing_spark.operators.scd import scd2_from_changelog

    df = spark.createDataFrame(rows, "k bigint, ts timestamp, tb bigint, status string")
    out = scd2_from_changelog(df, "k", "ts", list(attrs), tiebreak_col="tb")
    return sorted(out.collect(), key=lambda r: (r["k"], r["version"]))


def test_consecutive_identical_rows_collapse(spark):
    out = _build(
        spark,
        [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "B"), (1, _ts(4), 4, "A")],
    )
    assert [(r["status"], r["version"]) for r in out] == [("A", 1), ("B", 2), ("A", 3)]
    assert out[0]["valid_from"] == _ts(1) and out[0]["valid_to"] == _ts(3)
    assert out[1]["valid_to"] == _ts(4)
    assert out[2]["valid_to"] is None and out[2]["is_current"]
    assert [r["is_current"] for r in out] == [False, False, True]


def test_null_transitions_are_null_safe(spark):
    out = _build(
        spark,
        [(1, _ts(1), 1, None), (1, _ts(2), 2, None), (1, _ts(3), 3, "A"), (1, _ts(4), 4, None)],
    )
    assert [r["status"] for r in out] == [None, "A", None]


def test_equal_timestamps_order_by_tiebreak(spark):
    out = _build(spark, [(1, _ts(1), 2, "B"), (1, _ts(1), 1, "A")])
    assert [(r["status"], r["version"]) for r in out] == [("A", 1), ("B", 2)]


def test_keys_are_independent(spark):
    out = _build(spark, [(1, _ts(1), 1, "A"), (2, _ts(2), 2, "A"), (2, _ts(3), 3, "B")])
    assert [(r["k"], r["version"], r["is_current"]) for r in out] == [
        (1, 1, True),
        (2, 1, False),
        (2, 2, True),
    ]


def test_multi_attribute_change_detection(spark):
    from duckdb_routing_spark.operators.scd import scd2_from_changelog

    df = spark.createDataFrame(
        [(1, _ts(1), 1, "A", "x"), (1, _ts(2), 2, "A", "y"), (1, _ts(3), 3, "A", "y")],
        "k bigint, ts timestamp, tb bigint, a string, b string",
    )
    out = scd2_from_changelog(df, "k", "ts", ["a", "b"], tiebreak_col="tb").collect()
    assert sorted((r["a"], r["b"]) for r in out) == [("A", "x"), ("A", "y")]


def test_apply_delta_equals_full_rebuild(spark):
    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    hist = [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "B"),
            (2, _ts(1), 4, "X"), (3, _ts(2), 5, "Q")]
    late = [(1, _ts(5), 6, "A"), (2, _ts(4), 7, "X"), (2, _ts(6), 8, "Y")]
    full_df = spark.createDataFrame(hist + late, "k bigint, ts timestamp, tb bigint, status string")
    hist_df = spark.createDataFrame(hist, "k bigint, ts timestamp, tb bigint, status string")
    delta_df = spark.createDataFrame(late, "k bigint, ts timestamp, tb bigint, status string")

    dim = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb")
    merged = scd2_apply_delta(dim, delta_df, "k", "ts", ["status"], tiebreak_col="tb")
    want = scd2_from_changelog(full_df, "k", "ts", ["status"], tiebreak_col="tb")
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(merged) == canon(want)
    # key 3 had no delta rows -> passes through untouched
    assert sum(1 for r in merged.collect() if r["k"] == 3) == 1


def test_apply_delta_rejects_out_of_order_keys(spark):
    import pytest as _pytest

    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    hist_df = spark.createDataFrame(
        [(1, _ts(1), 1, "A"), (1, _ts(5), 2, "B")], "k bigint, ts timestamp, tb bigint, status string"
    )
    dim = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb")
    stale = spark.createDataFrame([(1, _ts(3), 9, "C")], "k bigint, ts timestamp, tb bigint, status string")
    with _pytest.raises(ValueError, match="older than"):
        scd2_apply_delta(dim, stale, "k", "ts", ["status"], tiebreak_col="tb")


def test_apply_delta_empty_delta_is_identity(spark):
    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    hist_df = spark.createDataFrame(
        [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "B")], "k bigint, ts timestamp, tb bigint, status string"
    )
    dim = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb")
    empty = spark.createDataFrame([], "k bigint, ts timestamp, tb bigint, status string")
    merged = scd2_apply_delta(dim, empty, "k", "ts", ["status"], tiebreak_col="tb")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, dim.collect()))
