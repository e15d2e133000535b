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


def test_emit_last_seen_values(spark):
    from duckdb_routing_spark.operators.scd import scd2_from_changelog

    df = spark.createDataFrame(
        [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "B")],
        "k bigint, ts timestamp, tb bigint, status string",
    )
    out = sorted(
        scd2_from_changelog(df, "k", "ts", ["status"], tiebreak_col="tb", emit_last_seen=True).collect(),
        key=lambda r: r["version"],
    )
    # run A collapses obs t1,t2 -> last_seen t2; single-obs run B -> t3
    assert [(r["status"], r["valid_from"], r["last_seen"]) for r in out] == [
        ("A", _ts(1), _ts(2)),
        ("B", _ts(3), _ts(3)),
    ]


def test_apply_delta_last_seen_rejects_interleaved_delta(spark):
    """A delta row BETWEEN the last change point and the key's last
    collapsed observation is unresolvable from the dimension alone (the
    later same-attr re-open is invisible). A last_seen dimension rejects
    it loudly; the plain dimension's check cannot see it (documented weak
    precondition) and silently mis-folds -- which is exactly why
    emit_last_seen exists."""
    import pytest as _pytest

    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    sch = "k bigint, ts timestamp, tb bigint, status string"
    hist_df = spark.createDataFrame(
        [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "A")], sch
    )
    delta = spark.createDataFrame([(1, dt.datetime(2024, 1, 2, 12), 9, "B")], sch)
    strict = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb", emit_last_seen=True)
    with _pytest.raises(ValueError, match="last observation"):
        scd2_apply_delta(strict, delta, "k", "ts", ["status"], tiebreak_col="tb")
    # plain dim: the check only sees the last change point (t1) -- passes,
    # and the fold LOSES the t3 re-open a full rebuild would keep
    plain = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb")
    folded = scd2_apply_delta(plain, delta, "k", "ts", ["status"], tiebreak_col="tb")
    full = scd2_from_changelog(
        spark.createDataFrame(
            [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "A"),
             (1, dt.datetime(2024, 1, 2, 12), 9, "B")], sch
        ),
        "k", "ts", ["status"], tiebreak_col="tb",
    )
    assert folded.count() == 2 and full.count() == 3  # the documented gap


def test_apply_delta_with_last_seen_equals_full_rebuild(spark):
    """With emit_last_seen dims the fold provably equals a full rebuild --
    last_seen column included (each run's last observation replays as a
    second same-attr observation)."""
    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    sch = "k bigint, ts timestamp, tb bigint, status string"
    hist = [(1, _ts(1), 1, "A"), (1, _ts(2), 2, "A"), (1, _ts(3), 3, "B"),
            (1, _ts(4), 4, "B"), (2, _ts(1), 5, "X"), (3, _ts(2), 6, "Q")]
    late = [(1, _ts(5), 7, "B"), (1, _ts(6), 8, "A"),
            (2, _ts(4), 9, "X"), (2, _ts(6), 10, "Y")]
    hist_df = spark.createDataFrame(hist, sch)
    delta_df = spark.createDataFrame(late, sch)
    full_df = spark.createDataFrame(hist + late, sch)
    dim = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb", emit_last_seen=True)
    merged = scd2_apply_delta(dim, delta_df, "k", "ts", ["status"], tiebreak_col="tb")
    want = scd2_from_changelog(full_df, "k", "ts", ["status"], tiebreak_col="tb", emit_last_seen=True)
    canon = lambda df: sorted(map(tuple, df.select(*want.columns).collect()))
    assert canon(merged) == canon(want)
    # key 1's run B extended by a same-attr obs: last_seen advanced to t5
    run_b = [r for r in merged.collect() if r["k"] == 1 and r["status"] == "B"]
    assert run_b and max(r["last_seen"] for r in run_b) == _ts(5)


def test_apply_delta_preserves_string_tiebreak(spark):
    """A non-numeric tiebreak keeps its native type through the replay
    union: equal-timestamp delta rows order by the string tiebreak exactly
    as in a full rebuild (the old cast-to-long nulled them out)."""
    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    sch = "k bigint, ts timestamp, tb string, status string"
    hist = [(1, _ts(1), "a", "A")]
    late = [(1, _ts(2), "y", "C"), (1, _ts(2), "x", "B")]
    dim = scd2_from_changelog(spark.createDataFrame(hist, sch), "k", "ts", ["status"], tiebreak_col="tb")
    merged = scd2_apply_delta(
        dim, spark.createDataFrame(late, sch), "k", "ts", ["status"], tiebreak_col="tb"
    )
    want = scd2_from_changelog(
        spark.createDataFrame(hist + late, sch), "k", "ts", ["status"], tiebreak_col="tb"
    )
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(merged) == canon(want)
    got = sorted(merged.collect(), key=lambda r: r["version"])
    assert [r["status"] for r in got] == ["A", "B", "C"]
