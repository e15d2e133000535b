"""Interleaved A/B of the fast-assign kernel's memory shape (guide §4/§5).

Variants, each a fresh noop-sink action per rep:
  cur        — _cell_assignments_fast as shipped (one n_batch x n_cells
               score matrix per Arrow batch: 65536 x 1000 x 8B = 524 MB
               transient per worker)
  chunked    — same argmin computed in row chunks (~64 MB transient)
  cur_ex     — shipped kernel + repartition("cell") exchange on top
  hofnorm    — shipped kernel but norm via pure-JVM HOF (no ArrowEvalPython
               stage feeding the mapInPandas)

Usage: python tools/assign_ab.py [--n 1000000] [--reps 4]
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
    reps = arg("--reps", 4)

    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StructField, StructType

    from duckdb_routing_spark.operators import clustering
    from duckdb_routing_spark.operators.similarity import (
        _cell_assignments_fast,
        _dot_hof,
        norm_col,
    )
    from duckdb_routing_spark.session import get_spark

    spark = get_spark(app_name="assign_ab", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=32)
    sc = spark.sparkContext
    centers = _centers(dim)

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(_vecs_for_ids(ids, centers, dim))}
            )

    work = tempfile.mkdtemp(prefix="assign_ab_")
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

        normed = corpus.select(
            F.col("vec_id"), F.col("embedding").alias("cvec"),
            norm_col(F.col("embedding")).alias("cnorm"),
        )
        hof_normed = corpus.select(
            F.col("vec_id"), F.col("embedding").alias("cvec"),
            F.sqrt(F.expr(_dot_hof("embedding", "embedding"))).alias("cnorm"),
        )

        rows = seeds.orderBy("cell").collect()
        cells_arr = np.array([r.cell for r in rows], dtype=np.int64)
        S = np.array([list(r.svec) for r in rows], dtype=np.float64)
        s2 = (S * S).sum(axis=1)

        def chunked_assign_df(vecs):
            out_schema = StructType(list(vecs.schema.fields) + [StructField("cell", IntegerType())])

            def assign(iterator):
                for pdf in iterator:
                    if len(pdf) == 0:
                        continue
                    V = np.vstack(pdf["cvec"].to_numpy()).astype(np.float64, copy=False)
                    out = np.empty(V.shape[0], dtype=np.int64)
                    step = max(1, (1 << 23) // max(1, S.shape[0]))
                    for i in range(0, V.shape[0], step):
                        scores = s2[None, :] - 2.0 * (V[i:i + step] @ S.T)
                        out[i:i + step] = np.argmin(scores, axis=1)
                    pdf = pdf.copy()
                    pdf["cell"] = cells_arr[out].astype("int32")
                    yield pdf

            return vecs.mapInPandas(assign, out_schema)

        cur = _cell_assignments_fast(normed, seeds, "cvec")
        chunked = chunked_assign_df(normed)
        cur_ex = cur.repartition("cell")
        hofnorm = _cell_assignments_fast(hof_normed, seeds, "cvec")

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        variants = {
            "cur": lambda: noop(cur),
            "chunked": lambda: noop(chunked),
            "cur_ex": lambda: noop(cur_ex),
            "hofnorm": lambda: noop(hofnorm),
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
