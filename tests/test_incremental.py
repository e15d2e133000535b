"""operators/incremental.py: mergeable keyed aggregate state.

The contract under test: merge(state(A), state(B)) == state(A ∪ B)
bit-for-bit, under any batch split — DECIMAL sums make the addition
order-independent. (Oracle parity for orders_incremental_agg lives in
test_oracle_parity.py: the oracle recomputes over the full table, so a
MATCH there proves merge == recompute cross-engine.)
"""

from decimal import Decimal

import pytest


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _canon(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def mods():
    from duckdb_routing_spark.operators import incremental

    return incremental


def test_merge_equals_direct_state(spark, mods):
    a = _rows(spark, [("x", 1.25), ("x", 2.5), ("y", -3.0)])
    b = _rows(spark, [("x", 4.75), ("z", 0.125)])
    merged = mods.merge_agg_states(
        mods.partial_agg_state(a, ["k"], "v"), mods.partial_agg_state(b, ["k"], "v"), ["k"]
    )
    direct = mods.partial_agg_state(a.unionByName(b), ["k"], "v")
    assert _canon(merged) == _canon(direct)


def test_merge_is_associative_across_three_batches(spark, mods):
    batches = [
        _rows(spark, [("x", 1.1), ("y", 2.2)]),
        _rows(spark, [("x", 3.3)]),
        _rows(spark, [("y", -1.1), ("x", 0.004)]),
    ]
    states = [mods.partial_agg_state(b, ["k"], "v") for b in batches]
    left = mods.merge_agg_states(mods.merge_agg_states(states[0], states[1], ["k"]), states[2], ["k"])
    right = mods.merge_agg_states(states[0], mods.merge_agg_states(states[1], states[2], ["k"]), ["k"])
    full = mods.partial_agg_state(batches[0].unionByName(batches[1]).unionByName(batches[2]), ["k"], "v")
    assert _canon(left) == _canon(right) == _canon(full)


def test_empty_delta_is_identity(spark, mods):
    a = _rows(spark, [("x", 1.0), ("y", 2.0)])
    empty = spark.createDataFrame([], "k string, v double")
    state = mods.partial_agg_state(a, ["k"], "v")
    merged = mods.merge_agg_states(state, mods.partial_agg_state(empty, ["k"], "v"), ["k"])
    assert _canon(merged) == _canon(state)


def test_null_measures_counted_out(spark, mods):
    df = spark.createDataFrame([("x", None), ("x", 2.0), ("y", None)], "k string, v double")
    got = {r["k"]: r for r in mods.partial_agg_state(df, ["k"], "v").collect()}
    assert got["x"]["n"] == 1 and got["x"]["v_sum"] == Decimal("2.000000")
    assert got["y"]["n"] == 0 and got["y"]["v_sum"] is None and got["y"]["v_min"] is None


def test_finalize_emits_exact_total_and_mean(spark, mods):
    df = _rows(spark, [("x", 0.1), ("x", 0.2)])
    row = mods.finalize_agg_state(mods.partial_agg_state(df, ["k"], "v"), ["k"]).collect()[0]
    # decimal sum of the parquet-exact doubles, one final division
    assert row["total"] == pytest.approx(0.3)
    assert row["mean"] == row["total"] / 2
    assert row["v_min"] == 0.1 and row["v_max"] == 0.2
