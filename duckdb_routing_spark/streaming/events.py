"""Streaming event analytics.

Batch/stream parity design: `streaming_hourly_counts` produces the same
rows as the batch `events_hourly` query when the stream is fully drained —
that's the testable contract (file source + memory sink +
processAllAvailable drives a deterministic end-to-end pass locally; on a
cluster the same plan runs against Kafka with real triggers).

Scale posture: watermark bounds state; the windowed aggregation shuffles on
(window, event_type) exactly like the batch groupBy; the stateful
sessionizer keys state by user_id (applyInPandasWithState), which is the
idiomatic Spark replacement for a hand-rolled stateful operator.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (1 file = 1 micro-batch
    locally; swap for Kafka in production). Normalizes event time to a plain
    TIMESTAMP column for watermarking, whatever the file's physical type
    (timestamp[ns] → nanos-as-long → convert; untagged timestamp[us] → read
    as TIMESTAMP directly — see queries.registry.table for the policy)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # probe the batch-read type once so the stream schema matches the file
    probed = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema["ts"].dataType
    ns_long = isinstance(probed, T.LongType)
    # glob the events file specifically: the sf dir holds the OTHER fixture
    # tables too, and a schema-projected read of those yields all-null junk
    # rows (silently swallowed downstream by watermarking — a real trap).
    # The wildcard matters: the file-stream source requires a directory
    # basePath, which a bare file path breaks but a glob preserves.
    raw = (
        spark.readStream.schema(_events_schema(T.LongType() if ns_long else T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(sf_dir, "events*.parquet"))
    )
    if ns_long:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def streaming_hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows with a 2-hour watermark for late data.

    total_value sums in DECIMAL then casts to double — the same float-parity
    policy as the batch queries, so a fully-drained stream hash-matches the
    batch events_hourly aggregation."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n_events", "total_value")
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.IntegerType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.IntegerType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)
SESSION_GAP_US = 30 * 60 * 1_000_000


def _sessionize_fn(key, pdfs, state: GroupState):
    """Custom stateful operator: emit a session row whenever a 30-min gap
    closes one; carry the open session in GroupState."""
    (user_id,) = key
    if state.exists:
        session_no, n_events, start_us, last_us = state.get
    else:
        session_no, n_events, start_us, last_us = 0, 0, None, None
    out = []
    for pdf in pdfs:
        # arrow->pandas can surface absent values as NaN (float64 column)
        for us in pdf["ts_us"].dropna().sort_values():
            us = int(us)
            if start_us is None:
                session_no, n_events, start_us, last_us = 1, 1, us, us
            elif us - last_us > SESSION_GAP_US:
                out.append((user_id, session_no, n_events, start_us, last_us))
                session_no += 1
                n_events, start_us, last_us = 1, us, us
            else:
                n_events += 1
                last_us = us
    state.update((session_no, n_events, start_us, last_us))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "session_no", "n_events", "start_us", "end_us"])


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionizer: closed sessions stream out as
    rows; open sessions live in keyed state."""
    keyed = events.select("user_id", F.unix_micros(F.col("ts")).alias("ts_us")).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion against the memory sink;
    returns the query handle (caller reads spark.table(name))."""
    q = df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    return q


def streaming_session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session aggregation with Spark's built-in session_window
    (the declarative counterpart of the applyInPandasWithState sessionizer):
    one row per (user, session) with event count and bounds. Watermark
    bounds session state; sessions close `gap` after their last event."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("start_us"),
            F.col("n_events"),
        )
    )


def streaming_dedup_exact(events: DataFrame, keys=("user_id", "ts", "event_type")) -> DataFrame:
    """Streaming exact deduplication: watermark-bounded dropDuplicates.

    The 100 TB shape for continuous-ingest dedup (the streaming counterpart
    of dedup.exact_dedup_keep_first): state holds ONE entry per key and the
    watermark bounds how long each entry lives, so state size tracks the
    duplicate-arrival horizon, not the stream's history. First occurrence
    wins and emits immediately (append mode)."""
    return events.withWatermark("ts", "2 hours").dropDuplicates(list(keys))


def run_stream_foreach_batch(df: DataFrame, out_dir: str, output_mode: str = "append"):
    """foreachBatch parquet sink: each micro-batch lands as parquet under
    out_dir/batch=<id> through ordinary batch writers — the idiomatic escape
    hatch for sinks Structured Streaming lacks natively (upserts, JDBC,
    multi-table fan-out). Returns the query handle after draining."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    q = df.writeStream.outputMode(output_mode).foreachBatch(_write).start()
    q.processAllAvailable()
    return q


def streaming_view_purchase_join(views: DataFrame, purchases: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Stream-stream event-time interval join: each purchase matched to every
    view by the same user within `horizon` before it.

    The canonical attribution shape (reference semantics source: the host
    SQL's interval self-join surface, SURVEY §2.4 joins). Both sides carry
    watermarks and the join condition bounds view_ts to a finite window
    around purchase_ts, so Spark derives a state eviction horizon for BOTH
    sides — state size tracks `watermark + horizon` of stream time, not
    stream history; that is what makes the operator run forever at 100 TB
    ingest. Inner join in append mode emits matches as both sides arrive."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "2 hours")
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", "2 hours")
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") > F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
            "inner",
        )
        .select(
            "purchase_id",
            "view_id",
            "user_id",
            (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts"))).alias("lag_us"),
        )
    )


def streaming_hourly_hll(events: DataFrame, key_col: str = "user_id", b: int = 8) -> DataFrame:
    """Windowed HyperLogLog registers: per-hour distinct-`key_col` sketch.

    The canonical streaming use of a mergeable sketch — state per window is
    bounded at 2^b rows regardless of event volume, late events fold in by
    the same MAX algebra the watermark allows, and downstream consumers
    merge hours into days (operators/sketch.hll_merge) without re-reading
    events. Register derivation is shared with the batch operator, so a
    fully-drained stream hash-matches the batch/DuckDB computation."""
    from duckdb_routing_spark.operators.sketch import hll_register_rank

    register, rank = hll_register_rank(key_col, b)
    return (
        events.filter(F.col(key_col).isNotNull())
        .withWatermark("ts", "2 hours")
        .select("ts", register, rank)
        .groupBy(F.window("ts", "1 hour").alias("win"), "register")
        .agg(F.max("rank").alias("max_rank"))
        .select(F.col("win.start").alias("hour"), "register", "max_rank")
    )


def streaming_quantile_sample(
    stream: DataFrame, state_dir: str, value_col: str = "value",
    id_col: str = "event_id", k: int = 1024,
):
    """Continuous quantile sketch: per micro-batch, the batch's OWN
    bottom-k (a pure function of its rows) lands in batch=<id>/ parquet;
    the live sketch is the k-row merge over batch dirs
    (`read_quantile_state`). Because bottom-k is order-independent and
    exactly mergeable, the drained state is BYTE-identical to the batch
    sketch over the whole feed, under any chunking — and per-batch
    overwrite keeps at-least-once replays idempotent, the same contract
    as the docs-side streaming twins."""
    import os as _os

    from duckdb_routing_spark.operators.sketch import quantile_sample

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        quantile_sample(batch_df, value_col, id_col, k).write.mode("overwrite").parquet(
            _os.path.join(state_dir, f"batch={batch_id}")
        )

    return stream.writeStream.outputMode("append").foreachBatch(_step).start()


def read_quantile_state(spark: SparkSession, state_dir: str, k: int = 1024) -> DataFrame:
    """Fold the accumulated per-batch bottom-k tables into the live k-row
    sketch (<= batches*k rows in, k out)."""
    from duckdb_routing_spark.operators.sketch import quantile_sample_merge

    return quantile_sample_merge(
        spark.read.parquet(state_dir).select("hkey", "value"), k=k
    )


def streaming_hourly_cms(
    events: DataFrame, key_col: str = "user_id", depth: int = 4, width: int = 64
) -> DataFrame:
    """Windowed Count-Min cells: per-hour `key_col` frequency sketch.

    Same bounded-state contract as streaming_hourly_hll — state per window
    is <= depth*width counter rows regardless of event volume, counters are
    linear so late events within the watermark fold in by SUM, and
    downstream consumers merge hours into days (operators/sketch.cms_merge)
    without re-reading events. Cell derivation is shared with the batch
    operator, so a fully-drained stream hash-matches batch/DuckDB."""
    from duckdb_routing_spark.operators.sketch import cms_rowcol

    cell = cms_rowcol(key_col, depth, width)
    return (
        events.filter(F.col(key_col).isNotNull())
        .withWatermark("ts", "2 hours")
        .select("ts", cell.alias("row", "col"))
        .groupBy(F.window("ts", "1 hour").alias("win"), "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("hour"), "row", "col", "cnt")
    )
