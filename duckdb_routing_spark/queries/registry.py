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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table; plain parquet scan so Catalyst pushdown
    and pruning apply.

    `events.ts` is parquet timestamp[ns]: Spark reads it as nano-epoch long
    (spark.sql.legacy.parquet.nanosAsLong), which we convert to a microsecond
    TIMESTAMP — the same truncation DuckDB applies when casting its
    TIMESTAMP_NS to TIMESTAMP, so both sides agree."""
    if name == "events":
        # the driver's own session won't have this in its builder; it is a
        # dynamic SQLConf, so set it defensively before touching the ns file
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
