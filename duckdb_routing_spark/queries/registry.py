"""Query registry shared by __spark_entry__, tests, and bench.py."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, headline: bool = False, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to plain TIMESTAMP.

    The driver fixture's `events.ts` is untagged parquet timestamp[us]
    (isAdjustedToUTC=false); Spark 4.x infers that as TIMESTAMP_NTZ, which
    most time functions (unix_micros, watermarks over LTZ windows) reject.
    Session tz is pinned UTC (session.py), so the cast is value-identical,
    and the DuckDB oracle side casts to plain TIMESTAMP too."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table; plain parquet scan so Catalyst pushdown
    and pruning apply.

    Timestamp handling (the fixture's `events.ts` has shipped as both
    timestamp[ns] and untagged timestamp[us] across driver environments):
      - timestamp[ns]: read as nano-epoch long
        (spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
        TIMESTAMP — the same truncation DuckDB applies casting TIMESTAMP_NS
        to TIMESTAMP.
      - untagged timestamp[us]: would infer as TIMESTAMP_NTZ; read as plain
        TIMESTAMP (inferTimestampNTZ off + a defensive cast), matching the
        oracle's `cast(ts as timestamp)`."""
    if name == "events":
        # the driver's own session won't have these in its builder; they are
        # dynamic SQLConfs, so set them defensively before touching the file
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_timestamps(df)
