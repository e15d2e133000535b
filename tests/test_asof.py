"""As-of join semantics: the documented contract is 'most recent right ROW
wins', including when that row's value column is legitimately NULL."""

from pyspark.sql import functions as F  # noqa: F401

from duckdb_routing_spark.operators.asof import asof_join_backward


def test_asof_null_value_row_still_wins(spark):
    left = spark.createDataFrame(
        [(1, 100, 100, "p1"), (1, 50, 101, "p2"), (2, 10, 102, "p3")],
        "user_id long, ts long, event_id long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 20, 0, 5.0),   # older, non-NULL
            (1, 90, 1, None),  # most recent before ts=100 — value is NULL
            (2, 99, 2, 7.0),   # after left ts=10: not visible
        ],
        "user_id long, ts long, event_id long, value double",
    )
    out = asof_join_backward(left, right, on="ts", by="user_id", value_cols=["value"], seq_col="event_id")
    got = {(r.user_id, r.ts): r.asof_value for r in out.collect()}
    # ts=100 must see the NULL-valued row at ts=90, NOT resurrect 5.0 from ts=20
    assert got[(1, 100)] is None
    assert got[(1, 50)] == 5.0
    assert got[(2, 10)] is None  # no prior right row at all


def test_asof_exact_ts_visible_and_seq_tiebreak(spark):
    left = spark.createDataFrame([(1, 10, 100, "p")], "user_id long, ts long, event_id long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 0, 1.0), (1, 10, 1, 2.0)], "user_id long, ts long, event_id long, value double"
    )
    out = asof_join_backward(left, right, on="ts", by="user_id", value_cols=["value"], seq_col="event_id")
    # exact-timestamp right rows are visible; highest seq wins the tie
    assert out.first().asof_value == 2.0


def test_asof_tolerance_masks_stale_matches(spark):
    from duckdb_routing_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 500.0)], "id long, k string, t double"
    )
    right = spark.createDataFrame(
        [("u", 90.0, 7.0), ("u", 480.0, 9.0)], "k string, t double, v double"
    )
    out = {
        r.id: r.asof_v
        for r in asof_join_backward(
            left, right, on="t", by="k", value_cols=["v"], tolerance_s=15.0
        ).collect()
    }
    # id 1: view at 90 within 15 of 100 -> 7; id 2: latest right at 480 within 15 of 500? 20 > 15 -> NULL
    assert out == {1: 7.0, 2: None}


def test_asof_forward_attaches_next_right_row(spark):
    from duckdb_routing_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 480.0), (3, "u", 900.0)], "id long, k string, t double"
    )
    right = spark.createDataFrame(
        [("u", 110.0, 7.0), ("u", 500.0, 9.0)], "k string, t double, v double"
    )
    out = {
        r.id: r.asof_v
        for r in asof_join_forward(left, right, on="t", by="k", value_cols=["v"]).collect()
    }
    assert out == {1: 7.0, 2: 9.0, 3: None}
    # with tolerance: 500 - 480 = 20 > 15 -> masked
    out_tol = {
        r.id: r.asof_v
        for r in asof_join_forward(
            left, right, on="t", by="k", value_cols=["v"], tolerance_s=15.0
        ).collect()
    }
    assert out_tol == {1: 7.0, 2: None, 3: None}


def test_asof_forward_equal_timestamp_tie_takes_earliest_seq(spark):
    from duckdb_routing_spark.operators.asof import asof_join_forward

    # seq_col must exist on both sides (same contract as backward: the
    # union sorts on it)
    left = spark.createDataFrame([(1, "u", 100.0, 0)], "id long, k string, t double, seq long")
    right = spark.createDataFrame(
        [("u", 200.0, 1, 7.0), ("u", 200.0, 2, 9.0)], "k string, t double, seq long, v double"
    )
    out = asof_join_forward(
        left, right, on="t", by="k", value_cols=["v"], seq_col="seq"
    ).collect()
    assert out[0].asof_v == 7.0  # earliest seq among equal timestamps
