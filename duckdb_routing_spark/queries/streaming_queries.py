"""Streaming queries in the registry.

stream_hourly has a real DuckDB oracle: a fully-drained file-source stream in
complete output mode must equal the batch aggregation over the same parquet —
that's the batch/stream parity contract. The stateful sessionizer is
genuinely non-SQL-expressible mid-stream (keyed GroupState), so it gets a
rows-only check.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from duckdb_routing_spark.queries.registry import register
from duckdb_routing_spark.streaming import events as ev

STREAM_HOURLY_ORACLE = """
SELECT date_trunc('hour', cast(ts as timestamp)) AS hour, event_type,
       count(*) AS n_events,
       cast(sum(cast(value as decimal(18,6))) as double) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("stream_hourly", oracle=STREAM_HOURLY_ORACLE, doc="Structured Streaming windowed agg == batch result when drained")
def stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    stream = ev.streaming_hourly_counts(ev.read_events_stream(spark, sf_dir))
    q = ev.run_stream_to_memory(stream, name, output_mode="complete")
    try:
        out = spark.table(name).orderBy("hour", "event_type").cache()
        out.count()  # materialize before the stream/view goes away
    finally:
        q.stop()
    return out


# Closed sessions == every island except each user's LAST (still open in
# state when the stream drains). The stateful operator breaks on a gap
# STRICTLY greater than 30 min, so the islands flag uses > (compare the
# session_window oracle, whose end-exclusive semantics use >=).
STREAM_SESSIONIZE_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(cast(ts as timestamp)) AS us FROM events
),
flags AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e
),
sess AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
),
agg AS (
  SELECT user_id, sid, count(*) AS n_events, min(us) AS start_us, max(us) AS end_us
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, cast(sid + 1 AS INT) AS session_no, cast(n_events AS INT) AS n_events,
       start_us, end_us
FROM agg
WHERE sid < (SELECT max(a2.sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
ORDER BY user_id, session_no
"""


@register("stream_sessionize_stateful", oracle=STREAM_SESSIONIZE_ORACLE,
          doc="applyInPandasWithState sessionizer: closed sessions == all-but-last islands")
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    stream = ev.sessionize_stateful(ev.read_events_stream(spark, sf_dir))
    q = ev.run_stream_to_memory(stream, name, output_mode="append")
    try:
        out = spark.table(name).orderBy("user_id", "session_no").cache()
        out.count()
    finally:
        q.stop()
    return out


# islands-technique mirror of session_window semantics: Spark's session is
# [start, last+gap) — end-exclusive — so a gap of EXACTLY 30 min starts a
# new session (>=, not >)
STREAM_SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(cast(ts as timestamp)) AS us FROM events
),
flags AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e
),
sess AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
)
SELECT user_id, min(us) AS start_us, count(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, start_us
"""


@register("stream_session_window", oracle=STREAM_SESSION_WINDOW_ORACLE,
          doc="built-in session_window streaming agg == batch islands when drained")
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_sesswin_{uuid.uuid4().hex[:8]}"
    stream = ev.streaming_session_windows(ev.read_events_stream(spark, sf_dir))
    q = ev.run_stream_to_memory(stream, name, output_mode="complete")
    try:
        out = spark.table(name).orderBy("user_id", "start_us").cache()
        out.count()
    finally:
        q.stop()
    return out


# The stream is deliberately DOUBLED (each event exploded into two copies)
# before the dedup operator, so the parity check proves real dedup work:
# drained output == DISTINCT over the original events, not a no-op pass.
STREAM_DEDUP_ORACLE = """
SELECT event_type, count(*) AS n_events
FROM (SELECT DISTINCT user_id, cast(ts as timestamp) AS tsu, event_type FROM events)
GROUP BY event_type
ORDER BY event_type
"""


@register("stream_dedup_exact", oracle=STREAM_DEDUP_ORACLE,
          doc="watermark-bounded streaming dropDuplicates on a doubled stream == batch DISTINCT")
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    raw = ev.read_events_stream(spark, sf_dir)
    doubled = raw.withColumn("_copy", F.explode(F.array(F.lit(1), F.lit(2)))).drop("_copy")
    stream = ev.streaming_dedup_exact(doubled)
    q = ev.run_stream_to_memory(stream, name, output_mode="append")
    try:
        out = (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"))
            .orderBy("event_type")
            .cache()
        )
        out.count()
    finally:
        q.stop()
    return out


def _minhash_cand_oracle() -> str:
    from duckdb_routing_spark.queries.llm import MINHASH_BANDS_CTE

    return f"WITH {MINHASH_BANDS_CTE} SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b"


@register("stream_dedup_minhash", oracle=_minhash_cand_oracle(),
          doc="incremental MinHash-LSH index over a 4-micro-batch document stream == batch candidate set")
def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup candidates (streaming/docs.py): documents split
    into 4 micro-batches, each batch LSH-joined against the accumulated
    signature index; the drained pair set must equal the batch LSH
    candidate CTE exactly — batch-boundary-independence is the contract."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from duckdb_routing_spark.streaming import docs as sd

    work = tempfile.mkdtemp(prefix="stream_minhash_")
    chunk_dir = sd.write_document_chunks(spark, sf_dir, os.path.join(work, "in"), chunks=4)
    index_dir = os.path.join(work, "index")
    pairs_dir = os.path.join(work, "pairs")
    q = sd.streaming_minhash_candidates(
        sd.read_documents_stream(spark, chunk_dir), index_dir, pairs_dir
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        spark.read.option("recursiveFileLookup", "true").parquet(pairs_dir)
        .distinct().orderBy("doc_a", "doc_b").cache()
    )
    out.count()
    return out


STREAM_INTERVAL_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       epoch_us(cast(p.ts as timestamp)) - epoch_us(cast(v.ts as timestamp)) AS lag_us
FROM events p JOIN events v ON v.user_id = p.user_id
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
  AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
ORDER BY purchase_id, view_id
"""


@register("stream_interval_join", oracle=STREAM_INTERVAL_JOIN_ORACLE,
          doc="stream-stream event-time interval join (purchase<-views within 1h) == batch interval join when drained")
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two watermarked streams over the same file source, inner-joined on
    user with a bounded event-time range — the drained append-mode output
    must equal the batch interval join exactly."""
    from pyspark.sql import functions as F

    name = f"stream_ivj_{uuid.uuid4().hex[:8]}"
    views = ev.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "view")
    purchases = ev.read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    stream = ev.streaming_view_purchase_join(views, purchases)
    q = ev.run_stream_to_memory(stream, name, output_mode="append")
    try:
        out = spark.table(name).orderBy("purchase_id", "view_id").cache()
        out.count()
    finally:
        q.stop()
    return out


def _hll_hourly_oracle(b: int = 8) -> str:
    w = 60 - b
    return f"""
WITH h AS (
  SELECT date_trunc('hour', cast(ts as timestamp)) AS hour,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL
),
rr AS (
  SELECT hour, CAST(hv // {1 << w} AS INTEGER) AS register,
         CAST(CASE WHEN hv % {1 << w} = 0 THEN {w + 1}
              ELSE {w + 1} - length(bin(hv % {1 << w})) END AS INTEGER) AS rank
  FROM h
)
SELECT hour, register, max(rank) AS max_rank
FROM rr GROUP BY hour, register
ORDER BY hour, register
"""


from duckdb_routing_spark.queries.llm import PIPELINE_CURATE_ORACLE  # noqa: E402


@register("stream_curate", oracle=PIPELINE_CURATE_ORACLE,
          doc="incremental curation stream (gate -> index dedup -> split) == batch pipeline_curate when drained")
def stream_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of pipeline_curate: 4 id-ordered micro-batches, each
    quality-gated, deduped against the accumulated fingerprint index, and
    split — the drained per-(split, lang) accounting equals the batch
    flagship exactly (keep-first == keep-lowest-id under the id-ordered
    feed), so it shares pipeline_curate's DuckDB oracle verbatim."""
    import tempfile

    from duckdb_routing_spark.streaming import docs as sd

    work = tempfile.mkdtemp(prefix="stream_curate_")
    chunk_dir = sd.write_document_chunks_ordered(spark, sf_dir, os.path.join(work, "in"), chunks=4)
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*.parquet"))
    )
    q = sd.streaming_curate(stream, os.path.join(work, "index"), os.path.join(work, "curated"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        spark.read.option("recursiveFileLookup", "true").parquet(os.path.join(work, "curated"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("split", "lang")
        .cache()
    )
    out.count()
    return out


def _cms_hourly_oracle(depth: int = 4, width: int = 64) -> str:
    return f"""
WITH h AS (
  SELECT date_trunc('hour', cast(ts as timestamp)) AS hour,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 16, 15))::BIGINT AS h2
  FROM events WHERE user_id IS NOT NULL
),
cells AS (
  SELECT hour, CAST(i AS INTEGER) AS row, CAST((h1 + i * h2) % {width} AS INTEGER) AS col
  FROM h, range({depth}) t(i)
)
SELECT hour, row, col, count(*) AS cnt FROM cells GROUP BY hour, row, col
ORDER BY hour, row, col
"""


@register("stream_cms_hourly", oracle=_cms_hourly_oracle(),
          doc="Structured Streaming per-hour Count-Min frequency sketch == batch cells when drained")
def stream_cms_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming frequencies: <=depth*width counter rows per
    window no matter the event volume; counters are linear, so hours merge
    into days via cms_merge without re-reading events. Fully drained == the
    batch/DuckDB cell table."""
    name = f"stream_cms_{uuid.uuid4().hex[:8]}"
    stream = ev.streaming_hourly_cms(ev.read_events_stream(spark, sf_dir))
    q = ev.run_stream_to_memory(stream, name, output_mode="complete")
    try:
        out = spark.table(name).orderBy("hour", "row", "col").cache()
        out.count()
    finally:
        q.stop()
    return out


@register("stream_hll_hourly", oracle=_hll_hourly_oracle(),
          doc="Structured Streaming per-hour HLL distinct-user sketch == batch registers when drained")
def stream_hll_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming cardinality: 2^b register rows per window no
    matter the event volume; hours merge into days via hll_merge without
    re-reading events. Fully drained == the batch/DuckDB register table."""
    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    stream = ev.streaming_hourly_hll(ev.read_events_stream(spark, sf_dir))
    q = ev.run_stream_to_memory(stream, name, output_mode="complete")
    try:
        out = spark.table(name).orderBy("hour", "register").cache()
        out.count()
    finally:
        q.stop()
    return out


from duckdb_routing_spark.operators.selection import dsir_oracle_sql as _dsir_oracle  # noqa: E402

_LAST_CHUNK_WHERE = (
    "WHERE doc_id IN (SELECT doc_id FROM ("
    "SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn, count(*) OVER () AS n "
    "FROM documents) WHERE rn > 3 * ((n + 3) // 4))"
)


@register("stream_dsir_scores",
          oracle=_dsir_oracle(0, n_features=512, scores_only=True,
                              scores_where=_LAST_CHUNK_WHERE),
          doc="streaming DSIR: per-batch importance scores against the as-of raw "
              "distribution; final batch == batch dsir_scores over the drained corpus")
def stream_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of doc_dsir_scores: 4 id-ordered micro-batches, each
    scored against the rolling raw bucket-count index plus itself. The
    FINAL batch's as-of corpus is the whole feed, so its scores equal the
    batch pipeline's over the full table restricted to its documents —
    which is exactly what the oracle computes (full-corpus DSIR scores
    WHERE doc_id in the last id-range chunk)."""
    import tempfile

    from duckdb_routing_spark.streaming import docs as sd

    work = tempfile.mkdtemp(prefix="stream_dsir_")
    chunk_dir = sd.write_document_chunks_ordered(spark, sf_dir, os.path.join(work, "in"), chunks=4)
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*.parquet"))
    )
    target = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter("lang = 'en'")
    q = sd.streaming_dsir_scores(
        stream, target, os.path.join(work, "index"), os.path.join(work, "scores"), n_features=512
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    scores = spark.read.option("basePath", os.path.join(work, "scores")).parquet(
        os.path.join(work, "scores", "batch=*")
    )
    last = scores.agg(F.max("batch")).collect()[0][0]
    out = scores.filter(F.col("batch") == last).drop("batch").orderBy("doc_id").cache()
    out.count()
    return out
