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
