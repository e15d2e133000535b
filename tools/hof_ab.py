"""Interleaved A/B: pandas-UDF (_dot_seq) vs pure-JVM HOF dot scoring at
each converted call site's own pair volume (VERDICT r10 ask #1).

Sites (one flag each; default runs all):
  near_dups   cosine_near_dup_pairs — LSH-bucket self-join pair scoring
  semantic    semantic_dedup — cell-local pair filter (+ assignment norms)
  ann_lsh     ann_lsh_topk — bucket-probe scoring
  pq          pq_encode — (vector, subspace, code) argmin stream
  kmeans      clustering._assign — one Lloyd assignment pass

Method (the repo's measurement discipline): ONE Spark session, variants
alternate round-robin, per-variant min/median reported; inputs are a
materialized parquet corpus (no regen per action); the timed action is the
noop sink (guide §1.4); before timing, both variants' outputs are asserted
EQUAL via an exact xxhash64 sum over every output column (bit-identity of
the doubles included).

The "old" variants below are verbatim copies of the pre-conversion
formulations (r10 tree) built from the same public operators they used.

Usage:
  python tools/hof_ab.py [--rounds 5] [--sites near_dups,pq,...] [--out FILE]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from duckdb_routing_spark.operators import clustering, similarity  # noqa: E402
from duckdb_routing_spark.operators.similarity import (  # noqa: E402
    _cell_assignments,
    _dot_hof,
    _dot_seq,
    lsh_signature,
    lsh_signature_batch_udf,
    norm_col,
)

N_LATENT = 200


def _centers(dim: int) -> np.ndarray:
    c = np.random.default_rng(7).normal(size=(N_LATENT, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _vecs_for_ids(ids: np.ndarray, centers: np.ndarray, dim: int) -> np.ndarray:
    ids = ids.astype(np.uint64)
    idx = ids[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)[None, :]
    z = idx * np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    noise = z.astype(np.float64) / 2.0**64 * 2.0 - 1.0
    amp = 0.8 / np.sqrt(3.0 * dim)
    return centers[(ids % np.uint64(N_LATENT)).astype(np.int64)] + noise * amp


def make_corpus(spark, path: str, n: int, dim: int) -> DataFrame:
    centers = _centers(dim)

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(
                        _vecs_for_ids(ids, centers, dim).astype(np.float32)
                    ),
                }
            )

    if not os.path.exists(path):
        (
            spark.range(n)
            .repartition(32)
            .mapInPandas(gen, "vec_id long, embedding array<float>")
            .write.parquet(path)
        )
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# old (r10-tree) formulations — verbatim pre-conversion shapes
# ---------------------------------------------------------------------------


def old_near_dup_pairs(corpus, threshold, dim, n_planes):
    sig = corpus.select(
        F.col("vec_id"),
        F.col("embedding").alias("vec"),
        norm_col(F.col("embedding")).alias("nrm"),
        lsh_signature(F.col("embedding"), dim, n_planes).alias("bucket"),
    )
    a = sig.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"),
                   F.col("nrm").alias("na"), "bucket")
    b = sig.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"),
                   F.col("nrm").alias("nb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                (_dot_seq(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def old_semantic_dedup(corpus, threshold, n_cells):
    seeds = (
        corpus.orderBy("vec_id").limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("svec"))
    )
    c = corpus.select(
        F.col("vec_id"),
        F.col("embedding").alias("v"),
        norm_col(F.col("embedding")).alias("nrm"),
    )
    cells = _cell_assignments(c, seeds, "vec_id", "v", 1)
    a = cells.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"), "cell")
    b = cells.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"), "cell")
    pruned = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_dot_seq(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) >= F.lit(threshold))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return cells.join(pruned.withColumn("pruned", F.lit(True)), "vec_id", "left").select(
        "vec_id", "cell", F.coalesce(~F.col("pruned"), F.lit(True)).alias("kept")
    )


def old_ann_lsh_topk(corpus, queries, dim, k, n_planes):
    sig_col = lsh_signature_batch_udf(dim, n_planes)
    sig_corpus = corpus.select(
        F.col("vec_id"),
        F.col("embedding").alias("cvec"),
        norm_col(F.col("embedding")).alias("cnorm"),
        sig_col(F.col("embedding")).alias("bucket"),
    )
    sig_q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        norm_col(F.col("embedding")).alias("qnorm"),
        sig_col(F.col("embedding")).alias("bucket"),
    )
    scored = (
        sig_corpus.join(F.broadcast(sig_q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                (_dot_seq(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def old_pq_encode(corpus, codebook, dim, m):
    subs = F.array(*similarity._subvectors(F.col("embedding"), dim, m))
    exploded = corpus.select(F.col("vec_id"), F.posexplode(subs).alias("s", "sub"))
    scored = exploded.join(F.broadcast(codebook), "s").select(
        "vec_id", "s", "code",
        (_dot_seq(F.col("cvec"), F.col("cvec")) - 2.0 * _dot_seq(F.col("sub"), F.col("cvec"))).alias("score"),
    )
    w = Window.partitionBy("vec_id", "s").orderBy(F.asc("score"), F.asc("code"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "s", "code")
    )


def old_kmeans_assign(emb, centroids):
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids], "cluster_id int, cvec array<double>"
    )
    cdf = cdf.withColumn("cc", _dot_seq(F.col("cvec"), F.col("cvec")))
    scored = (
        emb.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
        .crossJoin(F.broadcast(cdf))
        .select("vec_id", "cluster_id",
                (F.lit(-2.0) * _dot_seq(F.col("v"), F.col("cvec")) + F.col("cc")).alias("score"))
    )
    w = Window.partitionBy("vec_id").orderBy("score", "cluster_id")
    return scored.withColumn("_rk", F.row_number().over(w)).filter("_rk = 1").select(
        "vec_id", "cluster_id"
    )


# ---------------------------------------------------------------------------


def _equal_hash(df: DataFrame) -> tuple[int, int]:
    """(row count, xxhash64-XOR over all columns) — doubles hash on their
    bits, so this pins bit-identity of the values (XOR: order-independent,
    no ANSI overflow)."""
    r = df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("h")
    ).collect()[0]
    return int(r.n), int(r.h or 0)


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run_site(spark, name, variants, rounds) -> dict:
    sc = spark.sparkContext
    # equality gate first (untimed)
    hashes = {}
    for vname, build in variants.items():
        sc.setJobDescription(f"hof_ab:{name}:{vname}:equality")
        hashes[vname] = _equal_hash(build())
    vals = list(hashes.values())
    assert all(v == vals[0] for v in vals), f"{name}: variant outputs differ: {hashes}"
    times: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(rounds):
        for vname, build in variants.items():
            spark.catalog.clearCache()
            sc.setJobDescription(f"hof_ab:{name}:{vname}:round{r}")
            times[vname].append(_noop(build()))
    out = {"rows": vals[0][0]}
    for vname, ts in times.items():
        ts = sorted(ts)
        out[vname] = {"min": round(ts[0], 3), "med": round(ts[len(ts) // 2], 3),
                      "all": [round(t, 3) for t in ts]}
    print(f"# {name}: rows={vals[0][0]} "
          + " ".join(f"{v}={out[v]['min']}/{out[v]['med']}" for v in times),
          file=sys.stderr)
    return out


def main() -> None:
    def arg(flag, default):
        return type(default)(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    rounds = arg("--rounds", 5)
    sites = arg("--sites", "near_dups,semantic,ann_lsh,pq,kmeans").split(",")
    out_file = arg("--out", "")

    from duckdb_routing_spark.session import get_spark

    spark = get_spark(app_name="hof_ab", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="hof_ab_")
    results: dict[str, dict] = {}
    try:
        if {"near_dups", "ann_lsh"} & set(sites):
            # 10k vectors, 4 planes -> 16 buckets -> ~3.1M same-bucket pairs
            c10k = make_corpus(spark, os.path.join(work, "c10k.parquet"), 10_000, 64)
        if "near_dups" in sites:
            results["near_dups"] = run_site(
                spark, "near_dups",
                {
                    "udf": lambda: old_near_dup_pairs(c10k, 0.3, 64, 4),
                    "hof": lambda: similarity.cosine_near_dup_pairs(c10k, 0.3, 64, n_planes=4),
                },
                rounds,
            )
        if "semantic" in sites:
            # 20k vectors, 64 cells -> ~3.1M cell-local pairs
            c20k = make_corpus(spark, os.path.join(work, "c20k.parquet"), 20_000, 64)
            results["semantic"] = run_site(
                spark, "semantic",
                {
                    "udf": lambda: old_semantic_dedup(c20k, 0.25, 64),
                    "hof": lambda: similarity.semantic_dedup(c20k, 0.25, n_cells=64),
                },
                rounds,
            )
        if "ann_lsh" in sites:
            # 64 held-out queries probe a 10k corpus at 4 planes -> ~40k pairs
            # per query wave (the site's own bucket-probe shape)
            qs = c10k.filter("vec_id < 64")
            results["ann_lsh"] = run_site(
                spark, "ann_lsh",
                {
                    "udf": lambda: old_ann_lsh_topk(c10k, qs, 64, 10, 4),
                    "hof": lambda: similarity.ann_lsh_topk(
                        c10k, qs, dim=64, k=10, n_planes=4, catalyst_signature=False),
                },
                rounds,
            )
        if "pq" in sites:
            # 100k vectors x m=8 x k=16 codes -> 12.8M scored dots of dim 8
            c100k = make_corpus(spark, os.path.join(work, "c100k.parquet"), 100_000, 64)
            cb = similarity.pq_codebook(c100k, dim=64, m=8, k=16).localCheckpoint()
            results["pq"] = run_site(
                spark, "pq",
                {
                    "udf": lambda: old_pq_encode(c100k, cb, 64, 8),
                    "hof": lambda: similarity.pq_encode(c100k, cb, dim=64, m=8),
                },
                rounds,
            )
        if "kmeans" in sites:
            # one Lloyd assignment pass: 100k vectors x 16 centroids
            c100k = make_corpus(spark, os.path.join(work, "c100k.parquet"), 100_000, 64)
            cents = [
                (i, [float(x) for x in v])
                for i, v in enumerate(
                    np.vstack(
                        c100k.orderBy("vec_id").limit(16).toPandas()["embedding"].to_numpy()
                    ).astype(np.float64)
                )
            ]
            results["kmeans"] = run_site(
                spark, "kmeans",
                {
                    "udf": lambda: old_kmeans_assign(c100k, cents),
                    "hof": lambda: clustering._assign(c100k, cents, "vec_id", "embedding"),
                },
                rounds,
            )
        line = json.dumps({"rounds": rounds, "sites": results})
        print(line)
        if out_file:
            with open(out_file, "a") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
