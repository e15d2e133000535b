"""Decompose build_ann_index wall time at sqrt(n) cells (guide §1.4).

Times, with the noop sink and one shared corpus parquet, the build plan's
nested prefixes: (a) corpus scan alone, (b) + norm_col (the _dot_seq
pandas-UDF ArrowEvalPython stage), (c) + fast_assign mapInPandas,
(d) + repartition("cell") exchange, and (e) the real partitioned write.
Interleaved reps so ambient drift hits every variant equally.

Usage: python tools/build_profile.py [--n 1000000] [--reps 3]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from tools.ann_curve import _centers, _vecs_for_ids  # noqa: E402


def main() -> None:
    def arg(flag: str, default):
        return type(default)(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    n = arg("--n", 1_000_000)
    dim = arg("--dim", 64)
    n_cells = arg("--cells", 0)
    if n_cells <= 0:
        n_cells = max(8, int(round(n ** 0.5)))
    reps = arg("--reps", 3)

    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators import clustering
    from duckdb_routing_spark.operators.similarity import (
        _cell_assignments_fast,
        norm_col,
    )
    from duckdb_routing_spark.session import get_spark

    spark = get_spark(app_name="build_profile", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    centers = _centers(dim)

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(_vecs_for_ids(ids, centers, dim))}
            )

    work = tempfile.mkdtemp(prefix="build_profile_")
    try:
        corpus_path = os.path.join(work, "corpus.parquet")
        (
            spark.range(n).repartition(32)
            .mapInPandas(gen, "vec_id long, embedding array<double>")
            .write.parquet(corpus_path)
        )
        corpus = spark.read.parquet(corpus_path)
        sample = corpus.filter("vec_id % 50 = 0")
        cents = clustering.kmeans_centroids_fast(sample, k=n_cells, iterations=3)
        seeds = clustering.centroids_df(spark, cents)

        bare = corpus.select(F.col("vec_id"), F.col("embedding").alias("cvec"))
        normed = corpus.select(
            F.col("vec_id"), F.col("embedding").alias("cvec"),
            norm_col(F.col("embedding")).alias("cnorm"),
        )
        assigned = _cell_assignments_fast(normed, seeds, "cvec")
        shuffled = assigned.withColumn("ingest_batch", F.lit(-1)).repartition("cell")

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        out = os.path.join(work, "cells_out")

        def real_write():
            shuffled.write.option("partitionOverwriteMode", "static").mode(
                "overwrite"
            ).partitionBy("ingest_batch", "cell").parquet(out)

        variants = {
            "a_scan": lambda: noop(bare),
            "b_norm": lambda: noop(normed),
            "c_assign": lambda: noop(assigned),
            "d_shuffle": lambda: noop(shuffled),
            "e_write": real_write,
        }
        times: dict[str, list] = {k: [] for k in variants}
        for k, fn in variants.items():
            sc.setJobDescription(f"warm:{k}")
            fn()
        for _ in range(reps):
            for k, fn in variants.items():
                sc.setJobDescription(f"timed:{k}")
                t0 = time.perf_counter()
                fn()
                times[k].append(round(time.perf_counter() - t0, 3))
        res = {
            "n": n, "n_cells": n_cells,
            "median": {k: statistics.median(v) for k, v in times.items()},
            "all": times,
        }
        print(json.dumps(res))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
