"""Probe scoring shoot-out at sqrt(n) cells (guide §1.4/§2.5/§4).

Builds the 1M x 64 store once (chunked fast assign), prints the cell-size
distribution (kmeans_fast quantizer) and the probe join's pair count, then
interleaves noop-sink reps of the scored join under four scorings:
  hof        — aggregate(zip_with(...)) on float64 twins (shipped)
  unrolled   — the _dot_unrolled codegen chain (known dim)
  udf        — the _dot_seq Arrow pandas UDF (pre-HOF shipped form)
  hof_repart — hof + repartition of the probed slice before scoring
               (breaks the one-task-per-hot-cell straggler)

Usage: python tools/probe_scoring_ab.py [--probe 2] [--reps 4]
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
    reps = arg("--reps", 4)

    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators import clustering, similarity
    from duckdb_routing_spark.operators.similarity import (
        _cell_assignments,
        _dot_hof,
        _dot_seq,
        _dot_unrolled,
        _with_double_vec,
        norm_col,
    )
    from duckdb_routing_spark.session import get_spark

    spark = get_spark(app_name="probe_scoring_ab", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    centers = _centers(dim)

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(_vecs_for_ids(ids, centers, dim))}
            )

    work = tempfile.mkdtemp(prefix="probe_scoring_")
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

        cells_df = spark.read.parquet(os.path.join(index_dir, "cells"))
        sizes = cells_df.groupBy("cell").count().toPandas()["count"].to_numpy()
        dist = {
            "cells_nonempty": int(len(sizes)),
            "p50": int(np.percentile(sizes, 50)),
            "p90": int(np.percentile(sizes, 90)),
            "p99": int(np.percentile(sizes, 99)),
            "max": int(sizes.max()),
            "top5": sorted(map(int, sizes), reverse=True)[:5],
        }
        print(f"# build {build_s:.1f}s; cell sizes {dist}", file=sys.stderr)

        q_ids = np.arange(n, n + n_queries)
        Q = _vecs_for_ids(q_ids, centers, dim)
        queries = spark.createDataFrame(
            [(int(q), list(map(float, v))) for q, v in zip(q_ids, Q)],
            "vec_id long, embedding array<double>",
        )
        seeds_df = spark.read.parquet(os.path.join(index_dir, "seeds"))
        q = queries.select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qvec"),
                           norm_col(F.col("embedding")).alias("qnorm"))
        q_cells = _cell_assignments(q, seeds_df, "query_id", "qvec", n_probe).localCheckpoint()
        probe = [r.cell for r in q_cells.select("cell").distinct().collect()]
        pruned = cells_df.filter(F.col("cell").isin(probe))

        joined = (
            _with_double_vec(pruned, "cvec", "__cd")
            .join(F.broadcast(_with_double_vec(q_cells, "qvec", "__qd")), "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        pairs = joined.count()
        print(f"# probed_cells {len(probe)}; pairs {pairs}", file=sys.stderr)

        hof = joined.select(
            "query_id", "vec_id",
            (F.expr(_dot_hof("__qd", "__cd")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
        unrolled = joined.select(
            "query_id", "vec_id",
            (F.expr(_dot_unrolled("__qd", "__cd", dim)) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
        udf = joined.select(
            "query_id", "vec_id",
            (_dot_seq(F.col("__qd"), F.col("__cd")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
        hof_repart = joined.repartition(32).select(
            "query_id", "vec_id",
            (F.expr(_dot_hof("__qd", "__cd")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        variants = {
            "hof": lambda: noop(hof),
            "unrolled": lambda: noop(unrolled),
            "udf": lambda: noop(udf),
            "hof_repart": lambda: noop(hof_repart),
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
            "n": n, "n_cells": n_cells, "n_probe": n_probe, "pairs": int(pairs),
            "cell_sizes": dist, "build_sec": round(build_s, 1),
            "median": {k: statistics.median(v) for k, v in times.items()},
            "all": times,
        }
        print(json.dumps(res))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
