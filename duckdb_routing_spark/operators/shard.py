"""Training-shard export: deterministic global shuffle into balanced shards.

The last step of every pretraining data pipeline is a GLOBAL shuffle of the
curated corpus into N equal shards whose within-shard order is pseudo-random
but reproducible (so a training run can resume, and two runs over the same
corpus read the same byte stream). Doing this with ORDER BY rand() is wrong
twice at 100 TB: a global sort is an all-to-all over the full corpus, and
rand() is not retry-stable under Spark task re-execution.

This module instead derives a 60-bit uniform key from md5(doc_key || salt)
— the same engine-portable construction as the MinHash/split family — and
assigns shard_id by equal-width ranges over the key space. Because the key
is uniform, equal-width ranges are balanced (no sampling pass needed, unlike
repartitionByRange), and because ranges are ORDERED, the concatenation of
shard 0..N-1 in key order is one deterministic global permutation: a reader
that streams shards in id order replays the exact shuffle.

100 TB shape: shard assignment is a stateless row-local expression; the
write is ONE hash exchange on shard_id plus a per-partition sort — the
minimum physically possible for a sharded sorted export. The manifest is a
tiny N-row aggregate.

Reference parity note: the reference engine ships no export tooling — this
is LLM-pipeline/scale surface on top of SURVEY §2 (like operators/layout.py,
its scan-side sibling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SHARD_SPACE = 1 << 60  # 15 md5 hex chars


def shard_key(key_col: Column, salt: str = "shard") -> Column:
    """60-bit uniform key: ('0x' || substr(md5(key || ':salt'), 1, 15)) in
    DuckDB; non-negative, so integer range math below is exact."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def shard_width(n_shards: int) -> int:
    """Equal-width range size (ceil division keeps max key inside shard
    n_shards-1; all arithmetic stays under 2^63)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return -(-SHARD_SPACE // n_shards)


def assign_shards(
    df: DataFrame, n_shards: int, key_col: str = "doc_id", salt: str = "shard"
) -> DataFrame:
    """Adds `shard_key` (the 60-bit shuffle position) and `shard_id`
    (equal-width range bucket). Row-local, zero shuffle."""
    w = shard_width(n_shards)
    k = shard_key(F.col(key_col), salt)
    return df.withColumn("shard_key", k).withColumn(
        "shard_id", F.expr(f"shard_key div {w}").cast("int")
    )


def shard_manifest(sharded: DataFrame, size_col: str | None = None) -> DataFrame:
    """N-row manifest: per-shard row count, key range (proves the global
    order: max_key of shard i < min_key of shard i+1), and optional payload
    size. The min/max keys double as the resume cursor for a reader."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min("shard_key").alias("min_key"),
        F.max("shard_key").alias("max_key"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("bigint").alias("total_size"))
    return sharded.groupBy("shard_id").agg(*aggs).orderBy("shard_id")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Shard + sort + write: one exchange hash-partitioned on shard_id, a
    within-partition sort on (shard_id, shard_key, key), and a
    partitionBy(shard_id) parquet write, so <path>/shard_id=K/ holds shard K
    in its deterministic read order. Returns the manifest (computed from the
    same sharded plan, before the exchange)."""
    sharded = assign_shards(df, n_shards, key_col, salt)
    (
        sharded.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "shard_key", key_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    return shard_manifest(sharded)


def read_training_shard(spark, path: str, shard_id: int, key_col: str = "doc_id") -> DataFrame:
    """Read ONE shard in its deterministic training order: file-listing
    prunes to shard_id=K/, rows sort by (shard_key, key_col) — the SAME
    tiebreak the writer sorts by, so 60-bit key collisions (expected at
    pretraining scale) replay identically across runs. A distributed
    trainer maps rank -> shard_id and calls this; resuming mid-shard seeks
    by shard_key against the manifest's min/max cursor."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard_id") == shard_id)
        .orderBy("shard_key", key_col)
    )


def shard_manifest_oracle_sql(
    table: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard",
    size_col: str | None = None,
) -> str:
    """The byte-identical manifest in portable DuckDB SQL."""
    w = shard_width(n_shards)
    size_sel = (
        f", cast(sum({size_col}) AS BIGINT) AS total_size" if size_col is not None else ""
    )
    return f"""
SELECT shard_id, count(*) AS n_rows, min(shard_key) AS min_key,
       max(shard_key) AS max_key{size_sel}
FROM (
  SELECT *, shard_key // {w} AS shard_id FROM (
    SELECT *, ('0x' || substr(md5({key_col} || ':{salt}'), 1, 15))::BIGINT AS shard_key
    FROM {table}
  )
)
GROUP BY shard_id ORDER BY shard_id
"""
