"""Time-series gap filling: dense per-key time spines with LOCF and linear
interpolation (the TimescaleDB `time_bucket_gapfill` / `locf` /
`interpolate` surface, re-expressed as DataFrame ops).

Reference parity: the reference engine's host SQL answers bucketed
aggregations (test/sql/travel_time.test drives hourly rollups through the
extension); gap filling is the canonical next step of that family for
sensor/telemetry corpora — a missing hour must surface as a row, not
silently vanish from the rollup.

Scale shape:
  - the observed aggregate is one partial-agg shuffle onto (key, bucket) —
    the same keyed-rollup plan as `events_hourly`;
  - the spine is generated per key from that AGGREGATE (min/max bucket per
    key): `sequence()` + `explode` is row-local on the key table, never a
    driver loop, and its row count is bounded by span/step per key;
  - LOCF/interpolation are per-key ordered windows over the DENSE spine —
    partition size is the key's bucket count (span/step), not the event
    count, so a 100 TB event table with bounded per-series spans windows
    over thousands-of-rows partitions. Keys are the parallelism unit: one
    shuffle onto key for the windows, no global sort.

Float discipline (oracle hash-exactness): per-bucket sums fold in
DECIMAL(18,4) exactly (order-independent) and cast to DOUBLE once;
interpolation is a single correctly-rounded IEEE expression
`pv + (nv - pv) * ((t - pt) / (nt - pt))` over exact integer epoch-second
deltas, identical text in the Spark and DuckDB formulations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Dense per-key bucket series with LOCF + linear interpolation.

    Returns one row per (key, bucket) for EVERY step-aligned bucket between
    the key's first and last observation:
      n_events  — observed row count (0 on gap buckets)
      v_sum     — exact decimal-summed value (NULL on gaps)
      v_locf    — last observed v_sum at or before the bucket
      v_interp  — v_sum where observed; linear interpolation between the
                  neighbouring observations for interior gaps; NULL for
                  leading gaps (nothing to carry) — trailing gaps cannot
                  exist because the spine ends at the key's last observation.
    """
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("bigint") * step_seconds
    )
    agg = (
        df.select(
            F.col(key_col).alias("k"),
            bucket.alias("bucket"),
            F.col(value_col).cast("decimal(18,4)").alias("dv"),
        )
        .groupBy("k", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dv").cast("double").alias("v_sum"),
        )
    )
    spine = (
        agg.groupBy("k")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {step_seconds} seconds"))
            ).alias("bucket"),
        )
    )
    j = spine.join(agg, ["k", "bucket"], "left").select(
        "k",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "v_sum",
        F.unix_timestamp("bucket").alias("t"),
        F.when(F.col("v_sum").isNotNull(), F.unix_timestamp("bucket")).alias("obs_t"),
    )
    back = Window.partitionBy("k").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.partitionBy("k").orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    w = j.select(
        "k",
        "bucket",
        "n_events",
        "v_sum",
        "t",
        F.last("v_sum", ignorenulls=True).over(back).alias("pv"),
        F.last("obs_t", ignorenulls=True).over(back).alias("pt"),
        F.first("v_sum", ignorenulls=True).over(fwd).alias("nv"),
        F.first("obs_t", ignorenulls=True).over(fwd).alias("nt"),
    )
    interp: Column = F.when(F.col("v_sum").isNotNull(), F.col("v_sum")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.expr("pv + (nv - pv) * (cast(t - pt as double) / cast(nt - pt as double))"),
    )
    return w.select(
        F.col("k").alias(key_col),
        "bucket",
        "n_events",
        "v_sum",
        F.col("pv").alias("v_locf"),
        interp.alias("v_interp"),
    )
