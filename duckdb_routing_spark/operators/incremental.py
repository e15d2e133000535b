"""Incremental aggregate maintenance: mergeable keyed rollup state.

The materialized-view delta pattern a 100 TB pipeline lives on: keep a
keyed state table of ALGEBRAIC aggregates (count / exact decimal sum /
min / max), fold each new batch into it with one keyed merge, and never
re-read history. `merge == recompute` is the contract — the state of
base ∪ delta equals merging the two states, exactly, because every
component is associative-commutative (counts and DECIMAL sums add,
min/max fold) — the same mergeability contract as the sketch family
(operators/sketch.py), here for exact aggregates.

Float discipline: sums fold in DECIMAL(28,6) (exact, order-independent);
`finalize_agg_state` emits doubles only at read time (one cast / one
division for the mean). The state table itself is integer/decimal —
engine-portable and hash-exact.

Scale shape: building a state is one partial-agg shuffle onto the keys;
merging shuffles ONLY the two state tables (bounded by the key
cardinality, not the data), so a daily update costs O(|delta| + |keys|)
regardless of history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg_state(df: DataFrame, keys: list[str], measure: str) -> DataFrame:
    """Keyed mergeable state for one measure: (keys..., n, v_sum DECIMAL,
    v_min, v_max). n counts non-null measures; min/max are null for
    all-null groups (and merge correctly through F.least/greatest-free
    re-aggregation)."""
    return df.groupBy(*keys).agg(
        F.count(measure).cast("long").alias("n"),
        F.sum(F.col(measure).cast("decimal(28,6)")).alias("v_sum"),
        F.min(measure).alias("v_min"),
        F.max(measure).alias("v_max"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Fold two state tables into one: union + keyed re-aggregation
    (counts/sums add, min/max fold). Exact: DECIMAL addition is
    order-independent, so merge(state(A), state(B)) == state(A ∪ B)
    bit-for-bit whatever the batch boundaries were."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("v_sum").cast("decimal(28,6)").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )


def finalize_agg_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time view of a state table: exact sum and mean as one cast /
    one IEEE division per row."""
    return state.select(
        *keys,
        "n",
        F.col("v_sum").cast("double").alias("total"),
        (F.col("v_sum").cast("double") / F.col("n")).alias("mean"),
        "v_min",
        "v_max",
    )
