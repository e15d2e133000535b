"""Decompose ann_query_index probe latency at sqrt(n) cells (guide §1.4).

Builds a 1M x 64 IVF store at --cells cells (default sqrt sizing) ONCE,
then times, with the noop sink and labeled jobs, the probe plan's nested
prefixes: (a) pruned cell scan alone, (b) scan + broadcast join + cosine
scoring, (c) + window top-k, (d) the full ann_query_index collect. Each
timing is median of --reps interleaved reps so ambient drift hits every
variant equally. Prints one JSON line.

Usage: python tools/probe_profile.py [--cells 0] [--n 1000000] [--reps 5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
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
    n_queries = arg("--queries", 32)
    n_probe = arg("--probe", 2)
    reps = arg("--reps", 5)

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from duckdb_routing_spark.operators import clustering, similarity
    from duckdb_routing_spark.operators.similarity import _cell_assignments, _dot_seq
    from duckdb_routing_spark.session import get_spark

    spark = get_spark(app_name="probe_profile", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    centers = _centers(dim)

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(_vecs_for_ids(ids, centers, dim))}
            )

    work = tempfile.mkdtemp(prefix="probe_profile_")
    index_dir = os.path.join(work, "ivf")
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
        t0 = time.perf_counter()
        similarity.build_ann_index(corpus, index_dir, n_cells=n_cells, seeds=seeds,
                                   fast_assign=True)
        build_s = time.perf_counter() - t0
        print(f"# build {build_s:.1f}s ({n_cells} cells)", file=sys.stderr)

        q_ids = np.arange(n, n + n_queries)
        Q = _vecs_for_ids(q_ids, centers, dim)
        queries = spark.createDataFrame(
            [(int(q), list(map(float, v))) for q, v in zip(q_ids, Q)],
            "vec_id long, embedding array<double>",
        )

        # the probe plan's pieces, mirroring ann_query_index
        from duckdb_routing_spark.operators.similarity import norm_col

        seeds_df = spark.read.parquet(os.path.join(index_dir, "seeds"))
        q = queries.select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qvec"),
                           norm_col(F.col("embedding")).alias("qnorm"))
        q_cells = _cell_assignments(q, seeds_df, "query_id", "qvec", n_probe).localCheckpoint()
        probe = [r.cell for r in q_cells.select("cell").distinct().collect()]
        cells = spark.read.parquet(os.path.join(index_dir, "cells")).filter(
            F.col("cell").isin(probe)
        )

        # (a) pruned scan, all vector bytes decoded
        scan = cells.select("vec_id", "cvec", "cnorm", "cell")
        # (b) + broadcast join + cosine
        scored = (
            cells.join(F.broadcast(q_cells), "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id", "vec_id",
                (_dot_seq(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
            )
        )
        # (b2) same, but scoring via the pure-JVM HOF dot (bit-identical
        # left-to-right accumulation — cosine_topk_catalyst's form)
        from duckdb_routing_spark.operators.similarity import _dot_hof

        scored_hof = (
            cells.join(F.broadcast(q_cells), "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id", "vec_id",
                (F.expr(_dot_hof("qvec", "cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
            )
        )
        # (c) + window top-k (no final sort)
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
        # (d) full operator output
        full = similarity.ann_query_index(spark, index_dir, queries, k=10, n_probe=n_probe)

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        variants = {
            "a_scan": lambda: noop(scan),
            "b_scored": lambda: noop(scored),
            "b2_scored_hof": lambda: noop(scored_hof),
            "c_topk": lambda: noop(topk),
            "d_full_collect": lambda: full.collect(),
        }
        times: dict[str, list] = {k: [] for k in variants}
        for k, fn in variants.items():  # warm one rep each
            sc.setJobDescription(f"warm:{k}")
            fn()
        for _ in range(reps):
            for k, fn in variants.items():
                sc.setJobDescription(f"timed:{k}")
                t0 = time.perf_counter()
                fn()
                times[k].append(round(time.perf_counter() - t0, 3))
        res = {
            "n": n, "n_cells": n_cells, "n_probe": n_probe,
            "probed_cells": len(probe), "build_sec": round(build_s, 1),
            "median": {k: statistics.median(v) for k, v in times.items()},
            "all": times,
        }
        print(json.dumps(res))
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
