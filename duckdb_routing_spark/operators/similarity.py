"""Similarity search over an embedding column (array<float>).

Two tiers, matching how a 100 TB pipeline actually runs ANN:
  - brute-force cosine top-k: the exact baseline. A broadcast of the (small)
    query set against the (huge) corpus — one pass, no shuffle on the corpus
    side except the final per-query top-k.
  - LSH-bucketed ANN: random-hyperplane signatures (deterministically derived
    from md5 so runs are reproducible) bucket the corpus; queries probe only
    their bucket. Trades recall for touching ~1/2^bits of the data.

Cosine math runs in Catalyst higher-order functions (zip_with + aggregate,
element-wise double arithmetic, left-to-right sums — deterministic and
oracle-matchable); no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine, rank).

    queries is broadcast (assumed small); rank ties break by vec_id so the
    result is total-ordered and hash-stable."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("qvec"), F.col("cvec")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes, md5-derived => deterministic)
# ---------------------------------------------------------------------------

def _plane_component(p: int, j: int):
    """Pseudo-random hyperplane component in [-7.5, 7.5]: nibble of a hash,
    centered. Deterministic across engines/runs."""
    nib = F.conv(F.substring(F.md5(F.lit(f"plane:{p}:{j}")), 1, 1), 16, 10).cast("double")
    return nib - 7.5


def lsh_signature(vec_col, dim: int, n_planes: int = 8):
    """Bit signature: bit p = (v . plane_p) > 0."""
    sig = F.lit(0)
    v = vec_col
    for p in range(n_planes):
        dot = F.lit(0.0)
        for j in range(dim):
            dot = dot + F.element_at(v, j + 1).cast("double") * _plane_component(p, j)
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, rank within the
    query's bucket only. At scale the corpus is written bucket-partitioned
    once and probed many times."""
    sig_corpus = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    sig_q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        sig_corpus.join(F.broadcast(sig_q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("qvec"), F.col("cvec")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
