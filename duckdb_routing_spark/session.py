"""SparkSession construction tuned for this engine.

Defaults follow the large-cluster posture (AQE on, Arrow on, sane shuffle
partition counts) while remaining correct for local[N] testing. Timezone is
pinned to UTC so timestamp semantics agree with the DuckDB oracle
(DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb_routing_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    On a real cluster ``master``/memory come from spark-submit; everything here
    is cluster-safe (no local-only assumptions beyond the defaults).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores.  On a real cluster this would be set to
        # 2-3x total executor cores (or left to AQE coalescing).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # the events table stores timestamp[ns]; Spark has no nanos timestamp,
        # so read as long and convert explicitly (see queries.registry.table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # untagged parquet timestamp[us] (isAdjustedToUTC=false) would infer
        # as TIMESTAMP_NTZ under Spark 4.x; with session tz pinned UTC the
        # NTZ/LTZ distinction is vacuous, and the DuckDB oracle casts to
        # plain TIMESTAMP — keep both sides on TIMESTAMP
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # STOCK 10 MB broadcast threshold. A 64 MB threshold once won at
        # sf0.1, but after the fact-table-probe join rewrites it loses even
        # there (hash-building a 150k-row orders side costs more than the
        # shuffle it avoids), and the scale study (tools/scale_study.py)
        # measured it INVERTING harder by derived-sf1: broadcasting a
        # 1.5M-row orders table costs ~2x vs letting the join shuffle
        # (q5 4.3 -> 2.2 s). bench.py uses the same stock value.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver-provided parquet tables as temp views.

    Mirrors the oracle harness, which pre-registers the same names in DuckDB.
    """
    from duckdb_routing_spark.queries.registry import table

    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
