"""Semantics of operators/timeseries.py bucket_gapfill: planted gaps.

(Oracle parity for the registered events_gapfill query lives in
test_oracle_parity.py like every other oracled query.)
"""

import datetime as dt

import pytest


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def filled(spark):
    from duckdb_routing_spark.operators.timeseries import bucket_gapfill

    # key "a": hours 0, 1, 4 observed -> 2,3 are interior gaps
    # key "b": single hour -> no spine beyond itself
    rows = [
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 50), 20.0),
        ("a", _ts(1, 5), 40.0),
        ("a", _ts(4, 59), 100.0),
        ("b", _ts(7, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = bucket_gapfill(df, ts_col="ts", key_col="k", value_col="value")
    return {(r["k"], r["bucket"].hour): r for r in out.collect()}


def test_spine_is_dense_per_key(filled):
    assert {(k, h) for (k, h) in filled} == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 7)}


def test_observed_buckets_pass_through(filled):
    r = filled[("a", 0)]
    assert r["n_events"] == 2 and r["v_sum"] == 30.0 and r["v_locf"] == 30.0 and r["v_interp"] == 30.0
    assert filled[("a", 4)]["v_sum"] == 100.0
    assert filled[("b", 7)]["n_events"] == 1 and filled[("b", 7)]["v_sum"] == 5.0


def test_gap_buckets_locf_and_interpolate(filled):
    g2, g3 = filled[("a", 2)], filled[("a", 3)]
    assert g2["n_events"] == 0 and g2["v_sum"] is None
    assert g2["v_locf"] == 40.0 and g3["v_locf"] == 40.0
    # linear between (h=1, 40.0) and (h=4, 100.0): h=2 -> 60, h=3 -> 80
    assert g2["v_interp"] == pytest.approx(60.0)
    assert g3["v_interp"] == pytest.approx(80.0)


def test_spine_bounded_by_observations(spark):
    from duckdb_routing_spark.operators.timeseries import bucket_gapfill

    # the spine starts/ends at the key's first/last observation, so leading
    # and trailing gap buckets never exist — a single observation yields a
    # single spine row
    df = spark.createDataFrame([("a", _ts(3), 1.0)], "k string, ts timestamp, value double")
    out = bucket_gapfill(df, key_col="k").collect()
    assert len(out) == 1 and out[0]["bucket"].hour == 3


def test_custom_step(spark):
    from duckdb_routing_spark.operators.timeseries import bucket_gapfill

    df = spark.createDataFrame(
        [("a", _ts(0, 0), 2.0), ("a", _ts(0, 45), 4.0)], "k string, ts timestamp, value double"
    )
    out = bucket_gapfill(df, key_col="k", step_seconds=900).orderBy("bucket").collect()
    assert [r["bucket"].minute for r in out] == [0, 15, 30, 45]
    assert [r["n_events"] for r in out] == [1, 0, 0, 1]
    mid = out[1]
    assert mid["v_interp"] == pytest.approx(2.0 + (4.0 - 2.0) * (900.0 / 2700.0))
