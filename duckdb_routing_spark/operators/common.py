"""Shared plan-shaping helpers for the operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_small_scan(df: DataFrame, key: str) -> DataFrame:
    """Repartition a narrow input up to default parallelism before heavy
    row-local work (shingle explode + md5, Arrow-batched vector kernels).

    A small parquet file is often ONE row group -> ONE Spark task, so the
    expensive map would run single-threaded no matter how many cores exist
    (measured: 3.1 s -> 0.5 s for the sf0.1 shingle base on local[32]).
    At cluster scale the scan already has >= parallelism splits and this is
    a structural no-op — the condition below never fires, so the corpus is
    NOT gratuitously reshuffled at 100 TB."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df
