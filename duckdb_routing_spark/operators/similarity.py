"""Similarity search over an embedding column (array<float>).

Two tiers, matching how a 100 TB pipeline actually runs ANN:
  - brute-force cosine top-k: the exact baseline. A broadcast of the (small)
    query set against the (huge) corpus — one pass, no shuffle on the corpus
    side except the final per-query top-k.
  - LSH-bucketed ANN: random-hyperplane signatures (deterministically derived
    from md5 so runs are reproducible) bucket the corpus; queries probe only
    their bucket. Trades recall for touching ~1/2^bits of the data.

Dot products run in an Arrow-batched pandas UDF over numpy. The kernel is
vectorized ACROSS rows but accumulates sequentially ACROSS dimensions
(left-to-right), so every sum is bit-identical to both the previous
zip_with/aggregate formulation and DuckDB's list_dot_product — float32
inputs cast to double make each product exact (24+24 < 53 mantissa bits),
leaving summation order as the only parity risk, which the sequential loop
removes. (The pure-Catalyst higher-order-function version this replaces
evaluated INTERPRETED and was ~100x slower — ARCHITECTURE §3.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType


# DoubleType() instance (not the DDL string "double"): the string form is
# parsed via the active session at import time, and this module must be
# importable before any SparkSession exists.
@pandas_udf(DoubleType())
def _dot_seq(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise dot product with left-to-right accumulation over dims.

    np.dot / BLAS is NOT used on purpose: its pairwise/SIMD partial sums can
    differ from sequential summation in the last ulp, which would break
    hash-parity with the DuckDB oracle."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    va = np.vstack(a.to_numpy()).astype(np.float64, copy=False)
    vb = np.vstack(b.to_numpy()).astype(np.float64, copy=False)
    acc = np.zeros(va.shape[0], dtype=np.float64)
    for j in range(va.shape[1]):
        acc += va[:, j] * vb[:, j]
    return pd.Series(acc)


def norm_col(vec_col) -> F.Column:
    """L2 norm of an array column (sqrt applied JVM-side)."""
    return F.sqrt(_dot_seq(vec_col, vec_col))


def cosine(a, b):
    """Cosine similarity expression (kept for API compatibility; the top-k
    paths precompute per-row norms instead of re-deriving them per pair)."""
    return _dot_seq(a, b) / (norm_col(a) * norm_col(b))


def _dot_unrolled(a: str, b: str, dim: int) -> str:
    """Dot product UNROLLED to a codegen-friendly SQL expression string:
    a[0]*b[0] + a[1]*b[1] + ... — SQL `+` is left-associative, so this
    accumulates left-to-right over dimensions, the identical operation
    order to _dot_seq and DuckDB's list_dot_product; values stay
    hash-exact. Requires a uniform, known dim (ragged arrays would
    silently truncate) — callers probe it from the dataset footer
    driver-side (common.probe_array_dim). Note the analyzer+codegen cost
    of the ~3*dim-term tree is paid PER ACTION (~0.4-0.7 s at dim=64);
    _dot_hof below is the constant-size-tree form that avoids it."""
    return " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))


def _dot_hof(a: str, b: str) -> str:
    """Dot product as higher-order functions — a CONSTANT-size expression
    tree whatever the dim: aggregate folds (0 + p0) + p1 + ... strictly
    left-to-right, so values are bit-identical to _dot_unrolled/_dot_seq
    (pinned by test_cosine_topk_catalyst_matches_kernel). Needs no known
    dim and re-analyzes in milliseconds where the unrolled tree costs
    0.4-0.7 s per action. CAVEAT that sank an earlier HOF attempt: `a`/`b`
    must name REAL columns from a PRIOR projection — referencing a
    same-projection transform() alias makes the analyzer inline that
    transform into every element access, and the resulting tree evaluates
    interpreted (~2 s for 6k pairs x 64 dims). With materialized operand
    columns this form times identically to the unrolled codegen chain at
    bench scale (measured 0.33 s scored-count either way, sf0.1)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0 as double), (acc, x) -> acc + x)"
    )


def _hof_norm(col: str) -> str:
    """L2 norm as the HOF self-dot + sqrt — the pure-JVM twin of norm_col
    (identical value: per-element float64 squares are exact, accumulation
    is left-to-right, sqrt is correctly rounded). `col` must be a float64
    twin materialized in a PRIOR projection (the _dot_hof caveat; use
    _with_double_vec), or products round in the array's element type."""
    return f"sqrt({_dot_hof(col, col)})"


def cosine_topk_catalyst(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_label_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k as ONE pure-JVM action — zero Python stages.

    The bounded-corpus twin of cosine_topk (same columns, same total order,
    hash-identical values): the query side broadcasts into a nested-loop
    join against the corpus scan, dot products run as constant-size
    higher-order-function expressions (_dot_hof — same left-to-right
    accumulation, no per-action re-analysis of an unrolled tree, no known
    dim needed; `dim` is kept for signature compatibility and unused), and
    a single hash exchange on query_id finishes the rank window.
    Collecting the result is one action with no separate query-side
    toPandas job and no Arrow worker startup — the fixed ~0.3-0.5 s the
    mapInPandas form pays at small scale.

    Scale posture: the scored set is |corpus| x |queries| rows through one
    exchange, so this is ONLY for size-dispatched bounded calls; the
    map-side top-k kernel (cosine_topk) is the 100 TB path."""
    del dim  # HOF dots fold any length; ragged inputs zip to the shorter
    dbl = f"transform({vec_col}, x -> cast(x as double))"
    qcols = [f"{id_col} AS query_id", f"{dbl} AS qv"]
    ccols = [f"{id_col} AS vec_id", f"{dbl} AS cv"]
    if exclude_label_col:
        qcols.append(f"{exclude_label_col} AS qlabel")
        ccols.append(f"{exclude_label_col} AS clabel")
    # two-step select: a lateral-alias reference to qv/cv inside the same
    # projection would make the analyzer INLINE the transform() expression
    # into every element access of the dot — with HOF dots that inlining is
    # what made an earlier attempt evaluate interpreted (see _dot_hof)
    q = queries.selectExpr(*qcols).selectExpr(
        "*", f"sqrt({_dot_hof('qv', 'qv')}) AS qnorm"
    )
    c = corpus.selectExpr(*ccols).selectExpr(
        "*", f"sqrt({_dot_hof('cv', 'cv')}) AS cnorm"
    )
    cond = F.expr("vec_id != query_id")
    if exclude_label_col:
        # SQL NULL semantics match the kernel: NULL on either side drops the row
        cond = cond & F.expr("clabel != qlabel")
    scored = c.join(F.broadcast(q), cond).selectExpr(
        "query_id",
        "vec_id",
        f"({_dot_hof('qv', 'cv')}) / (qnorm * cnorm) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    # key-hashed single partition (not coalesce) — satisfies the window's
    # clustering requirement with exactly one exchange, and the upstream
    # scan stays parallel; see the small-nq note in cosine_topk below.
    return (
        scored.repartition(1, F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .sortWithinPartitions("query_id", "rank")
    )


def _score_block(pdf, qarrays, exclude_label_col, k):
    """Score one corpus block against the query arrays and keep the block's
    top-k per query. Operation order is the oracle's: per-dim left-to-right
    float64 accumulation for norms and dots, cosine = dot / (qnorm * cnorm),
    ties by vec_id. Per-pair math is independent of block boundaries, so
    any batch split yields identical values."""
    qids, qmat, qn, qlabels = qarrays
    nq = len(qids)
    ids = pdf["vec_id"].to_numpy()
    clabels = pdf["clabel"].to_numpy() if exclude_label_col else None
    cmat = np.vstack(pdf["cvec"].to_numpy()).astype(np.float64, copy=False)
    cn = np.zeros(len(ids), dtype=np.float64)
    dots = np.zeros((nq, len(ids)), dtype=np.float64)
    for j in range(cmat.shape[1]):
        cj = cmat[:, j]
        cn += cj * cj
        dots += qmat[:, j][:, None] * cj[None, :]
    cos = dots / (qn[:, None] * np.sqrt(cn)[None, :])
    out_q, out_v, out_c = [], [], []
    for qi in range(nq):
        keep = ids != qids[qi]
        if clabels is not None:
            qv = qlabels[qi]
            # SQL NULL semantics: NULL on either side disqualifies.
            # Numeric NULLs surface as NaN through pandas (NaN != NaN),
            # string NULLs as None — treat both as NULL.
            if qv is None or qv != qv:
                keep &= False  # NULL != x is never TRUE
            else:
                keep &= np.array(
                    [c is not None and c == c and c != qv for c in clabels],
                    dtype=bool,
                )
        sel = np.flatnonzero(keep)
        order = np.lexsort((ids[sel], -cos[qi, sel]))[:k]
        pick = sel[order]
        out_q.append(np.full(len(pick), qids[qi]))
        out_v.append(ids[pick])
        out_c.append(cos[qi, pick])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "vec_id": np.concatenate(out_v),
            "cosine": np.concatenate(out_c),
        }
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_label_col: str | None = None,
    small_nq_threshold: int = 64,
    single_task: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine, rank).

    Scale shape: the query matrix (collected driver-side — it is the small
    side by definition) ships inside a mapInPandas closure, and every corpus
    row is read ONCE: each Arrow batch scores nq x batch pairs in numpy and
    emits only its LOCAL top-k per query, so the global re-rank window sees
    ~(n_batches x nq x k) rows instead of the full nq x corpus pair space.
    The previous crossJoin formulation moved every (query, corpus) pair —
    both embedding arrays included — through Arrow three UDF calls deep
    (~150 MB at sf0.1 for 64-dim; measured 0.65 -> 0.25 s).

    Bit-parity with the oracle: products and norms accumulate left-to-right
    over dims in float64 (dim-major loop — identical operation order to
    _dot_seq and DuckDB's list_dot_product), and cosine divides by
    (qnorm * cnorm) in that order. Rank ties break by vec_id, so the result
    is total-ordered and hash-stable; a per-batch top-k by the same order is
    always a superset of the batch's contribution to the global top-k.

    `exclude_label_col`: restrict neighbors to rows whose label DIFFERS
    from the query's — the hard-negative mining shape for contrastive
    training (nearest vectors that are NOT the query's class). NULL
    semantics match the SQL predicate `label != qlabel`: a NULL on either
    side disqualifies the row (a NULL-labeled query gets no negatives),
    so the kernel stays hash-identical to the DuckDB oracle."""
    q_id_t = queries.schema[id_col].dataType.simpleString()
    c_id_t = corpus.schema[id_col].dataType.simpleString()
    ccols = [F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")]
    if exclude_label_col:
        ccols.append(F.col(exclude_label_col).alias("clabel"))
    out_schema = f"query_id {q_id_t}, vec_id {c_id_t}, cosine double, rank int"

    def _build_query_arrays(ids_np, vecs, labels_np):
        """Query matrix + norms with the pinned accumulation order (per-dim
        left-to-right in float64 — the oracle's operation order)."""
        qmat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        qn = np.zeros(len(ids_np), dtype=np.float64)
        for j in range(qmat.shape[1]):
            qn += qmat[:, j] * qmat[:, j]
        return ids_np, qmat, np.sqrt(qn), labels_np

    if single_task and q_id_t == c_id_t and (
        not exclude_label_col
        or queries.schema[exclude_label_col].dataType
        == corpus.schema[exclude_label_col].dataType
    ):
        # bounded-corpus dispatch, fully fused: queries ride the SAME scan
        # as the corpus behind a boolean tag, so the whole query — query
        # load, scoring, final re-rank — is ONE task in ONE job. The
        # two-job form below (driver collect of the query side, then the
        # kernel job) measured ~0.1-0.2 s slower at bench scale purely in
        # job overhead. Values identical: per-pair math is independent of
        # batch boundaries, and the same (query_id, -cosine, vec_id) total
        # order ranks the candidates.
        tagged = corpus.select(*ccols, F.lit(False).alias("is_q")).unionByName(
            queries.select(*ccols, F.lit(True).alias("is_q"))
        )

        def score_and_rank_fused(batches):
            pdfs = [p for p in batches]
            if not pdfs:
                return
            allp = pd.concat(pdfs, ignore_index=True)
            qp = allp[allp["is_q"]]
            cp = allp[~allp["is_q"]]
            if not len(qp) or not len(cp):
                return
            qarrays = _build_query_arrays(
                qp["vec_id"].to_numpy(),
                qp["cvec"],
                qp["clabel"].to_numpy() if exclude_label_col else None,
            )
            out = _score_block(cp, qarrays, exclude_label_col, k)
            allc = out.sort_values(
                ["query_id", "cosine", "vec_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            allc["rank"] = (allc.groupby("query_id").cumcount() + 1).astype("int32")
            yield allc[allc["rank"] <= k].reset_index(drop=True)

        return tagged.coalesce(1).mapInPandas(score_and_rank_fused, out_schema)

    qcols = [F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")]
    if exclude_label_col:
        qcols.append(F.col(exclude_label_col).alias("qlabel"))
    qpdf = queries.select(*qcols).toPandas()
    nq = len(qpdf)
    if nq:
        qarrays = _build_query_arrays(
            qpdf["query_id"].to_numpy(),
            qpdf["qvec"],
            qpdf["qlabel"].to_numpy() if exclude_label_col else None,
        )

    def score_batches(batches):
        for pdf in batches:
            if not nq or not len(pdf):
                continue
            yield _score_block(pdf, qarrays, exclude_label_col, k)

    if single_task:
        # bounded-corpus dispatch without a same-typed query side (or when
        # the fused-union path above can't apply): scan + score + final
        # re-rank still fuse into one task, with the query side collected
        # driver-side first (one extra job).
        def score_and_rank(batches):
            cands = list(score_batches(batches))
            if not cands:
                return
            allp = pd.concat(cands, ignore_index=True).sort_values(
                ["query_id", "cosine", "vec_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            allp["rank"] = (allp.groupby("query_id").cumcount() + 1).astype("int32")
            yield allp[allp["rank"] <= k].reset_index(drop=True)

        return corpus.select(*ccols).coalesce(1).mapInPandas(score_and_rank, out_schema)

    scored = corpus.select(*ccols).mapInPandas(
        score_batches, f"query_id {q_id_t}, vec_id {c_id_t}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    if nq <= small_nq_threshold:
        # small query set: the candidate pool is ≤ n_batches x nq x k rows —
        # shuffle it to ONE partition and finish JVM-side (window + in-
        # partition sort) instead of `orderBy`, whose range exchange runs a
        # SAMPLING job that executes the whole scoring pipeline a second
        # time just to pick output partition bounds. repartition, NOT
        # coalesce: coalesce would collapse the parallel corpus scan
        # upstream. (A pandas re-rank task here measures WORSE — a second
        # Python stage costs more than the JVM window it replaces.)
        return (
            # hash-repartition ON THE WINDOW KEY: hashpartitioning(query_id, 1)
            # satisfies the window's clustering requirement, so exactly one
            # exchange appears in the plan (a bare repartition(1) is round-
            # robin and Spark would add a second, key-hashed exchange)
            scored.repartition(1, F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .sortWithinPartitions("query_id", "rank")
        )

    # many queries: distribute the re-rank per query key
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold), restricted to same-LSH-bucket candidates — the embedding
    analog of MinHash+LSH text dedup. The self-join is bucket-local (an
    equi-join on the hyperplane signature), so the pair space scales with
    bucket occupancy, not n^2; recall follows the hyperplane collision
    bound P(same bucket) = (1 - theta/pi)^n_planes."""
    # scoring via the pure-JVM HOF dot on per-side float64 twins, not the
    # _dot_seq pandas UDF — bit-identical values (exact per-element casts +
    # the same left-to-right accumulation; pinned by
    # test_cosine_topk_catalyst_matches_kernel) with ZERO ArrowEvalPython
    # stages: the UDF form paid SIX (norm per side, both duplicated by
    # filter pushdown, plus the pair dot evaluated under the threshold
    # filter AND again in the projection — the guide §4.4 double-eval).
    # At corpus scale the pair stream no longer crosses the Python boundary
    # at all (tools/hof_ab.py: interleaved A/B at this site's own volume).
    sig = _with_double_vec(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
        ),
        "vec",
        "vd",
    ).selectExpr("vec_id", "bucket", "vd", f"{_hof_norm('vd')} AS nrm")
    a = sig.select(
        F.col("vec_id").alias("id_a"), F.col("vd").alias("va"), F.col("nrm").alias("na"), "bucket"
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"), F.col("vd").alias("vb"), F.col("nrm").alias("nb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.expr(_dot_hof("va", "vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF ANN (seeded coarse quantizer; deterministic, oracle-expressible)
# ---------------------------------------------------------------------------

def _with_double_vec(df: DataFrame, name: str, out: str) -> DataFrame:
    """Project a float64 twin of an array column for HOF dot products.

    zip_with's x*y multiplies in the ARRAY'S element type: on array<float>
    each product rounds to float32 BEFORE the double accumulation, which
    broke oracle hash-parity at ~1e-8 (measured on sim_ann_index_probe).
    Casting per element FIRST makes every product exact (24+24 < 53
    mantissa bits) — the same prior-projection idiom as
    cosine_topk_catalyst, which also keeps the analyzer from inlining the
    transform into the dot (the _dot_hof interpreted-eval caveat). Already-
    double columns alias for free."""
    from pyspark.sql.types import ArrayType

    t = df.schema[name].dataType
    if isinstance(t, ArrayType) and isinstance(t.elementType, DoubleType):
        return df.withColumn(out, F.col(name))
    return df.selectExpr("*", f"transform({name}, x -> cast(x as double)) AS {out}")


def _cell_assignments(
    vecs: DataFrame, seeds: DataFrame, id_alias: str, vec_alias: str, rank_limit: int
) -> DataFrame:
    """Distance-to-seed ranking: score = dot(s,s) - 2*dot(v,s) (== ||v-s||^2
    minus the constant dot(v,v)), ties by seed id. rank_limit=1 assigns a
    vector to its cell; >1 gives a query its probe list. Preserves the
    input columns and adds `cell`."""
    keep = [c for c in vecs.columns]
    # scoring via the pure-JVM HOF dot (_dot_hof), not the _dot_seq pandas
    # UDF: bit-identical left-to-right float64 accumulation (pinned by
    # test_cosine_topk_catalyst_matches_kernel) with no ArrowEvalPython
    # stage — interleaved A/B at 1M vectors x 1000 cells measured the UDF
    # form 4.2x slower on the probe's scored join (tools/probe_profile.py).
    # The float64 twins are projected on each SIDE before the join, so the
    # per-element cast runs once per input row, not once per pair
    scored = (
        _with_double_vec(vecs, vec_alias, "__vd")
        .crossJoin(F.broadcast(_with_double_vec(seeds, "svec", "__sd")))
        .select(
            *keep,
            "cell",
            (
                F.expr(_dot_hof("__sd", "__sd"))
                - F.lit(2.0) * F.expr(_dot_hof("__vd", "__sd"))
            ).alias("score"),
        )
    )
    # NULLS LAST: HOF scoring null-pads dimension-mismatched arrays
    # (zip_with) and propagates null elements, so a malformed vector scores
    # NULL — under the default ASC (nulls first) it would silently win
    # rank 1 where the old _dot_seq UDF raised loudly. Ordering of non-null
    # scores is unchanged, so values/oracle hashes are identical.
    w = Window.partitionBy(id_alias).orderBy(F.asc_nulls_last("score"), F.asc("cell"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rank_limit)
        .drop("score", "crank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: the corpus is partitioned into `n_cells`
    Voronoi cells around seed vectors (deterministically, the first
    n_cells corpus vectors by id — a fixed codebook, the way production IVF
    uses a trained-once quantizer; pass `seeds` (cell, svec) to pin an
    external quantizer, e.g. to compare against a persisted store over a
    filtered corpus slice), and each query probes its `n_probe`
    nearest cells only. At scale the corpus is written cell-partitioned
    once; a probe reads n_probe/n_cells of the data. Complements
    ann_lsh_topk: IVF adapts to the data's density; LSH needs no training."""
    if seeds is None:
        seeds = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("svec"))
        )
    # norms via the HOF self-dot on a float64 twin (bit-identical to
    # norm_col's _dot_seq; see _hof_norm) — no ArrowEvalPython on either
    # scan; the twin is projected away so downstream shapes are unchanged
    c = _with_double_vec(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")),
        "cvec", "__nt",
    ).selectExpr("vec_id", "cvec", f"{_hof_norm('__nt')} AS cnorm")
    q = _with_double_vec(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec", "__nt",
    ).selectExpr("query_id", "qvec", f"{_hof_norm('__nt')} AS qnorm")
    c_cells = _cell_assignments(c, seeds, "vec_id", "cvec", 1)
    q_cells = _cell_assignments(q, seeds, "query_id", "qvec", n_probe)
    # a vector lives in exactly one cell, so a (query, vector) pair meets at
    # most once even with multi-probe — no dedup needed
    scored = (
        _with_double_vec(c_cells, "cvec", "__cd")
        .join(F.broadcast(_with_double_vec(q_cells, "qvec", "__qd")), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            # HOF dot, not the _dot_seq pandas UDF — bit-identical, no
            # Python stage (4.2x on the probe join; tools/probe_profile.py);
            # per-side float64 twins keep products exact on float32 input
            (F.expr(_dot_hof("__qd", "__cd")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _cell_assignments_fast(
    vecs: DataFrame, seeds: DataFrame, vec_alias: str, chunk_rows: int | None = None
) -> DataFrame:
    """Vectorized build-time cell assignment: broadcast the seed MATRIX
    into a mapInPandas batch argmin (one BLAS matmul per Arrow batch), so
    the Arrow traffic is O(n) instead of the exact path's O(n * n_cells)
    crossJoin pairs — the difference between 1 GB and 100+ GB of transfer
    at 1M vectors x 64+ cells (measured by tools/ann_curve.py; at 100 TB
    the crossJoin form is not buildable). Same argument order and
    tie-break (lowest cell id wins: argmin returns the first minimum and
    seeds are scanned in cell order) as `_cell_assignments(rank_limit=1)`;
    BLAS pairwise summation can differ from sequential accumulation in the
    last ulp, so this is OPT-IN for stores whose oracles replay the exact
    sequential math (`build_ann_index(fast_assign=True)`)."""
    rows = seeds.orderBy("cell").collect()
    cells = np.array([r.cell for r in rows], dtype=np.int64)
    S = np.array([list(r.svec) for r in rows], dtype=np.float64)
    s2 = (S * S).sum(axis=1)
    from pyspark.sql.types import StructField, StructType

    # fresh StructType — StructType.add mutates in place, which would also
    # poison the DataFrame's cached schema/columns
    out_schema = StructType(list(vecs.schema.fields) + [StructField("cell", IntegerType())])

    def assign(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_alias].to_numpy()).astype(np.float64, copy=False)
            # argmin in ROW CHUNKS: a whole-batch score matrix is
            # n_batch x n_cells doubles (65536 x 1000 = 524 MB transient
            # PER WORKER at sqrt(n) cells — 32 workers allocate ~16 GB a
            # wave, and the measured build was bimodal 7.6-80 s per action
            # under the resulting allocator/THP thrash). Chunking bounds
            # the transient to ~64 MB; same argmin per row. Interleaved
            # A/B at 1M x 1000 cells: 63.4 s -> 3.4 s median and the
            # variance collapses (tools/assign_ab.py).
            out = np.empty(V.shape[0], dtype=np.int64)
            # ~8M score doubles per chunk; chunk_rows overrides for tests
            # (prod batches never split below n_cells ~8k). Caveat: BLAS
            # may pick different kernels for different chunk SHAPES (e.g. a
            # short trailing chunk hitting GEMV), so chunked scores can
            # differ from whole-batch in the last ulp and flip argmin on
            # near-ties — the same class of sensitivity as the documented
            # BLAS-vs-sequential caveat; this path is opt-in non-oracle.
            step = chunk_rows if chunk_rows is not None else max(1, (1 << 23) // max(1, S.shape[0]))
            if step <= 0:
                raise ValueError(f"chunk_rows must be positive, got {chunk_rows}")
            for i in range(0, V.shape[0], step):
                scores = s2[None, :] - 2.0 * (V[i:i + step] @ S.T)
                out[i:i + step] = np.argmin(scores, axis=1)
            pdf = pdf.copy()
            pdf["cell"] = cells[out].astype("int32")
            yield pdf

    return vecs.mapInPandas(assign, out_schema)


def build_ann_index(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
    index_fs=None,
    meta_cols: list[str] | None = None,
    fast_assign: bool = False,
    max_cells: int = 65536,
) -> None:
    """Persist the IVF index the way a 100 TB vector store actually lays
    out: vectors written CELL-PARTITIONED (<index_dir>/cells/cell=K/) so a
    probe is a partition-PRUNED read of n_probe/n_cells of the data at the
    file-listing level, plus the tiny seed table (<index_dir>/seeds/).
    `seeds` takes a trained quantizer (`clustering.kmeans_centroids` /
    `kmeans_centroids_fast` + `centroids_df`); default is the
    deterministic first-n_cells codebook `ivf_topk` uses.

    n_cells=None (the default) SCALES THE QUANTIZER WITH THE CORPUS:
    max(8, min(max_cells, round(sqrt(n)))) — conventional IVF sizing,
    where a probe of p cells scans ~p*sqrt(n) vectors. A fixed small
    codebook silently degrades at scale (64 cells at 1M vectors put
    recall@10=0.9 at 12.5% of the index scanned — the measured r9 curve);
    sqrt sizing keeps the same recall at a few percent (ANN_CURVE_r10).
    The count() this costs is one pass over the build input — negligible
    against the build's own write."""
    import os as _os

    if seeds is None:
        if n_cells is None:
            n_cells = max(8, min(max_cells, int(round(corpus.count() ** 0.5))))
        seeds = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("svec"))
        )
    from duckdb_routing_spark.operators.fs import live_table_dir

    seeds.write.mode("overwrite").parquet(
        live_table_dir(_os.path.join(index_dir, "seeds"), index_fs)
    )
    # cnorm via the HOF self-dot on a float64 twin — bit-identical to the
    # former norm_col (_hof_norm), and the BUILD no longer pays an
    # ArrowEvalPython pass over the whole corpus just to compute norms
    c = _with_double_vec(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                      *[F.col(m) for m in (meta_cols or [])]),
        "cvec", "__nt",
    ).selectExpr("vec_id", "cvec", f"{_hof_norm('__nt')} AS cnorm",
                 *(meta_cols or []))
    # metadata columns ride INSIDE the cell partitions so a filtered probe
    # (ann_query_index(filter_expr=...)) pushes its predicate into the
    # pruned scan — partition pruning and rowgroup filtering compose
    # two-level layout (ingest_batch, cell): the base build is batch -1 and
    # every extension owns a batch id, so an at-least-once replay of an
    # increment overwrites ITS OWN partitions (dynamic partition overwrite)
    # instead of appending duplicates; probes prune on cell regardless
    # STATIC overwrite on purpose: a (re)build is a from-scratch truncate —
    # dynamic mode would leave earlier increments' ingest_batch=N partitions
    # (and cells the new corpus no longer touches) alive under the new base
    assigned = (
        _cell_assignments_fast(c, seeds, "cvec")
        if fast_assign
        else _cell_assignments(c, seeds, "vec_id", "cvec", 1)
    )
    # colocate each cell in one task before the partitioned write: without
    # this every upstream task opens a writer per cell it sees (tasks x
    # n_cells files — 32k ~31-row files at 1M vectors / sqrt(n) cells,
    # measured 703 s; one shuffle of the vectors brings it to n_cells
    # right-sized files) — shuffle width stays conf-driven (AQE coalesces)
    assigned.withColumn(
        "ingest_batch", F.lit(-1)
    ).repartition("cell").write.option(
        "partitionOverwriteMode", "static"
    ).mode("overwrite").partitionBy(
        "ingest_batch", "cell"
    ).parquet(live_table_dir(_os.path.join(index_dir, "cells"), index_fs))


def extend_ann_index(
    new_vectors: DataFrame,
    index_dir: str,
    increment: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_fs=None,
    meta_cols: list[str] | None = None,
) -> None:
    """Grow a persisted IVF index in place: assign the new vectors against
    the index's OWN seed table (the quantizer is immutable once built —
    re-seeding would orphan every existing cell) and land them under
    (ingest_batch=increment, cell=K) with dynamic partition overwrite, so
    REPLAYING an increment (at-least-once delivery, foreachBatch retries)
    overwrites its own partitions instead of appending duplicates.
    Increment ids and vector ids must be unique across calls. A probe
    after the extension is byte-identical to one over a from-scratch
    rebuild with the same seeds (pytest-pinned); pruning still keys on
    cell."""
    import os as _os

    from duckdb_routing_spark.operators.fs import live_table_dir

    spark = new_vectors.sparkSession
    seeds = spark.read.parquet(live_table_dir(_os.path.join(index_dir, "seeds"), index_fs))
    # same HOF-norm conversion as build_ann_index (bit-identical values)
    c = _with_double_vec(
        new_vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                           *[F.col(m) for m in (meta_cols or [])]),
        "cvec", "__nt",
    ).selectExpr("vec_id", "cvec", f"{_hof_norm('__nt')} AS cnorm",
                 *(meta_cols or []))
    # schema-drift guard: an extension must carry the SAME column set the
    # store already holds — appended files with missing/extra metadata would
    # silently shadow columns at read time (plain parquet picks one footer)
    cells_live = live_table_dir(_os.path.join(index_dir, "cells"), index_fs)
    try:
        existing = set(spark.read.parquet(cells_live).columns) - {"ingest_batch", "cell"}
    except Exception:  # noqa: BLE001 — seed-only bootstrap store: nothing to compare
        existing = None
    if existing is not None and existing != set(c.columns):
        raise ValueError(
            f"extension columns {sorted(c.columns)} do not match the store's "
            f"{sorted(existing)} — pass the same meta_cols as the build"
        )
    _cell_assignments(c, seeds, "vec_id", "cvec", 1).withColumn(
        "ingest_batch", F.lit(increment)
    ).repartition("cell").write.option(
        "partitionOverwriteMode", "dynamic"
    ).mode("overwrite").partitionBy(
        "ingest_batch", "cell"
    ).parquet(live_table_dir(_os.path.join(index_dir, "cells"), index_fs))


def delete_from_ann_index(
    spark,
    index_dir: str,
    ids: DataFrame,
    id_col: str = "vec_id",
    index_fs=None,
) -> int:
    """Remove vectors from a persisted IVF index, copy-on-write.

    Only the (ingest_batch, cell) partitions actually holding the ids are
    rewritten (dynamic partition overwrite); partitions left with zero
    survivors are dropped through the fs shim. Returns the number of
    vectors removed.

    Crash/retry contract: the rewrite is per-partition; a crash mid-way
    leaves some affected partitions rewritten and the rest intact, and
    REPLAYING the same delete is a no-op on the already-rewritten ones —
    the idempotence at-least-once delivery needs. No read-side cost: a
    probe never consults a tombstone table (deletes here are copy-on-write
    like a lakehouse DELETE without deletion vectors; at 100 TB batch your
    deletes so one locating scan amortizes over many ids).

    The locating scan reads only (vec_id, ingest_batch, cell) —
    column-pruned — because a vector's cell cannot be derived from its id
    alone; the rewrite then re-reads just the affected partitions
    (partition-pruned at file listing)."""
    import os as _os

    from duckdb_routing_spark.operators.fs import DEFAULT_FS, live_table_dir

    fs = index_fs or DEFAULT_FS
    live = live_table_dir(_os.path.join(index_dir, "cells"), index_fs)
    try:
        cells = spark.read.parquet(live)
    except Exception as e:  # noqa: BLE001
        # a seed-only bootstrap store has no row files yet — nothing to
        # delete (any other read failure re-raises untouched)
        if "infer schema" in str(e) or "Path does not exist" in str(e):
            return 0
        raise
    idsdf = ids.select(F.col(id_col).alias("vec_id")).distinct()
    affected = [
        (r.ingest_batch, r.cell)
        for r in cells.join(F.broadcast(idsdf), "vec_id")
        .select("ingest_batch", "cell")
        .distinct()
        .collect()
    ]
    if not affected:
        return 0
    if len(affected) <= 64:
        part_pred = None
        for b, c in affected:
            p = (F.col("ingest_batch") == b) & (F.col("cell") == c)
            part_pred = p if part_pred is None else (part_pred | p)
    else:
        # a per-pair OR-chain grows the expression tree with the partition
        # count (a 10k-partition delete would choke the analyzer); the
        # separable isin pair prunes to the CROSS-PRODUCT superset of the
        # affected batches x cells — extra partitions read and rewritten
        # identically (correct, bounded waste), listing-level pruning kept
        part_pred = F.col("ingest_batch").isin([b for b, _ in affected]) & F.col(
            "cell"
        ).isin([c for _, c in affected])
    touched = cells.filter(part_pred)
    n_before = touched.count()
    # localCheckpoint: Spark refuses to overwrite a path that feeds the
    # writing plan — materialize the survivors first (bounded: affected
    # partitions only), same idiom as the dedup-index extension
    survivors = touched.join(F.broadcast(idsdf), "vec_id", "left_anti").localCheckpoint()
    n_after = survivors.count()
    survivors.repartition("ingest_batch", "cell").write.option(
        "partitionOverwriteMode", "dynamic"
    ).mode("overwrite").partitionBy("ingest_batch", "cell").parquet(live)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data: a partition whose every row was deleted produces no output and
    # would keep serving its old files — drop those directories explicitly
    kept = {
        (r.ingest_batch, r.cell)
        for r in survivors.select("ingest_batch", "cell").distinct().collect()
    }
    for b, c in affected:
        if (b, c) not in kept:
            fs.delete(_os.path.join(live, f"ingest_batch={b}", f"cell={c}"))
    return n_before - n_after


def upsert_ann_index(
    new_vectors: DataFrame,
    index_dir: str,
    increment: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_fs=None,
    meta_cols: list[str] | None = None,
) -> None:
    """Replace-or-insert vectors: copy-on-write delete of any existing
    copies of the incoming ids, then a normal extension under
    (ingest_batch=increment). The quantizer is immutable, so a probe after
    an upsert is byte-identical to one over a from-scratch rebuild whose
    corpus carries the updated vectors (pytest-pinned). Single-writer, like
    every other maintenance call on the store. On a store built with
    `meta_cols`, pass the SAME meta_cols here — the extension's
    schema-drift guard rejects a column-set mismatch."""
    spark = new_vectors.sparkSession
    delete_from_ann_index(
        spark, index_dir, new_vectors.select(id_col), id_col=id_col, index_fs=index_fs
    )
    extend_ann_index(
        new_vectors, index_dir, increment, id_col=id_col, vec_col=vec_col,
        index_fs=index_fs, meta_cols=meta_cols,
    )


def compact_ann_index(spark, index_dir: str, index_fs=None) -> None:
    """Fold accumulated increments back into the base: read every
    (ingest_batch, cell) partition, rewrite as batch -1, and swap the
    directory in. Many tiny per-increment files are the classic
    streaming-ingest tax — listing cost and small-file reads grow with
    increment COUNT, not data size — so a periodic compaction restores
    one-file-set-per-cell. Probes are byte-identical before and after
    (pytest-pinned).

    The swap routes through operators.fs.swap_in_compacted: a staged
    double-rename on POSIX/HDFS, a generation-directory + atomic pointer
    PUT on rename-less object stores (pass index_fs=RenamelessFS() or an
    s3fs-backed adapter). A lakehouse table (Delta/Iceberg) would make it
    a metadata-only commit instead."""
    import os as _os

    from duckdb_routing_spark.operators.fs import live_table_dir, swap_in_compacted

    cells_dir = _os.path.join(index_dir, "cells")
    live = live_table_dir(cells_dir, index_fs)

    def _rewrite(staged: str) -> None:
        df = spark.read.parquet(live)
        others = [c for c in df.columns if c not in ("ingest_batch", "cell")]
        (
            df.select(*others, F.lit(-1).alias("ingest_batch"), "cell")
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("ingest_batch", "cell")
            .parquet(staged)
        )

    swap_in_compacted(cells_dir, _rewrite, index_fs)


def ann_query_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_fs=None,
    filter_expr: str | None = None,
) -> DataFrame:
    """Probe a persisted IVF index: assign each query its n_probe nearest
    cells (against the broadcast seed table), then scan ONLY those cell
    partitions — the filter on the partition column prunes at file-listing
    time, so the job reads n_probe/n_cells of the index whatever its size.
    Results are identical to `ivf_topk` over the same seeds (pytest-pinned,
    along with the PartitionFilters plan assertion)."""
    import os as _os

    from duckdb_routing_spark.operators.fs import live_table_dir

    seeds = spark.read.parquet(live_table_dir(_os.path.join(index_dir, "seeds"), index_fs))
    # qnorm via the HOF self-dot on a float64 twin (bit-identical to the
    # former norm_col) — the probe plan has no Python stage left at all
    q = _with_double_vec(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec", "__nt",
    ).selectExpr("query_id", "qvec", f"{_hof_norm('__nt')} AS qnorm")
    # materialize the (tiny) assignment once: the probe list collect and the
    # broadcast join side must see the SAME rows — a lazy plan would
    # evaluate twice, and a nondeterministic `queries` input could then
    # probe cells its re-computed assignments no longer match
    q_cells = _cell_assignments(q, seeds, "query_id", "qvec", n_probe).localCheckpoint()
    probe = [r.cell for r in q_cells.select("cell").distinct().collect()]
    cells = spark.read.parquet(live_table_dir(_os.path.join(index_dir, "cells"), index_fs)).filter(
        F.col("cell").isin(probe)
    )
    if filter_expr:
        # filtered ANN: the metadata predicate evaluates inside the pruned
        # cell scan (parquet row-group stats + codegen filter), BEFORE any
        # join — a probe reads n_probe/n_cells of the index AND only the
        # rows matching the filter; top-k is exact over the filtered slice
        cells = cells.where(F.expr(filter_expr))
    scored = (
        _with_double_vec(cells, "cvec", "__cd")
        .join(F.broadcast(_with_double_vec(q_cells, "qvec", "__qd")), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            # HOF dot, not the _dot_seq pandas UDF — bit-identical, no
            # Python stage (4.2x on the probe join; tools/probe_profile.py);
            # per-side float64 twins keep products exact on float32 input
            (F.expr(_dot_hof("__qd", "__cd")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): partition
    the corpus into `n_cells` Voronoi cells around seed vectors (the same
    deterministic coarse quantizer as `ivf_topk`), then inside each cell
    prune every vector that has a LOWER-id cell-mate with cosine >=
    threshold. Returns one row per input vector: (vec_id, cell, kept).

    Scale posture: the pair space is cell-local (an equi-join on `cell`), so
    it grows with cell occupancy, not n^2 — at 100 TB the quantizer has
    ~sqrt(n) cells and cells stay bounded; cross-cell near-dups are
    sacrificed by design (the SemDeDup trade). The keep rule (min id per
    similar pair survives) is a deterministic greedy canonicalization, so
    the result is reproducible and SQL-expressible for the oracle.

    `seeds` overrides the default first-n_cells quantizer with a TRAINED
    (cell, svec) table — `clustering.kmeans_centroids` + `centroids_df` is
    the in-house path (the SemDeDup paper's actual recipe: kmeans cells,
    then prune)."""
    if seeds is None:
        seeds = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("svec"))
        )
    # HOF dot + norm on a per-side float64 twin (the _with_double_vec
    # idiom), not the _dot_seq pandas UDF: bit-identical values, no
    # ArrowEvalPython stage on the corpus scan or the cell-local pair
    # stream (tools/hof_ab.py A/B at volume). The twin `vd` doubles as the
    # assignment input, so the cast runs once per corpus row.
    c = _with_double_vec(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")), "v", "vd"
    ).selectExpr("vec_id", "vd", f"{_hof_norm('vd')} AS nrm")
    cells = _cell_assignments(c, seeds, "vec_id", "vd", 1)
    a = cells.select(F.col("vec_id").alias("id_a"), F.col("vd").alias("va"), F.col("nrm").alias("na"), "cell")
    b = cells.select(F.col("vec_id").alias("id_b"), F.col("vd").alias("vb"), F.col("nrm").alias("nb"), "cell")
    pruned = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.expr(_dot_hof("va", "vb")) / (F.col("na") * F.col("nb")) >= F.lit(threshold))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return cells.join(pruned.withColumn("pruned", F.lit(True)), "vec_id", "left").select(
        "vec_id", "cell", F.coalesce(~F.col("pruned"), F.lit(True)).alias("kept")
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
    """Bit signature: bit p = (v . plane_p) > 0.

    Pure-Catalyst form: unrolls dim x n_planes expression nodes. Ideal for
    the oracle (DuckDB can evaluate the same SQL) at toy dims, pathological
    past ~32 dims (dim 768 -> ~6k expression nodes in one projection);
    lsh_signature_batch_udf is the scale form with identical output."""
    sig = F.lit(0)
    v = vec_col
    for p in range(n_planes):
        dot = F.lit(0.0)
        for j in range(dim):
            dot = dot + F.element_at(v, j + 1).cast("double") * _plane_component(p, j)
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def plane_matrix(dim: int, n_planes: int = 8) -> np.ndarray:
    """The md5-derived hyperplane matrix (n_planes x dim) as numpy — the
    exact values _plane_component produces in SQL (first md5 hex nibble,
    centered to [-7.5, 7.5])."""
    import hashlib

    return np.array(
        [
            [int(hashlib.md5(f"plane:{p}:{j}".encode()).hexdigest()[0], 16) - 7.5 for j in range(dim)]
            for p in range(n_planes)
        ],
        dtype=np.float64,
    )


def lsh_signature_batch_udf(dim: int, n_planes: int = 8):
    """Arrow-batched signature kernel for real embedding dims: one plan node
    regardless of dim (vs dim x n_planes Catalyst nodes in lsh_signature).

    BIT-IDENTICAL to the Catalyst form: the dot accumulates left-to-right
    over dimensions (acc += v[j] * plane[:, j], vectorized across rows and
    planes but sequential across dims — the same IEEE operation order as the
    unrolled expression), so a near-zero dot can never flip a bucket bit
    between the two forms."""
    planes = plane_matrix(dim, n_planes)  # captured; ships with the closure
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("int")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        # use exactly the first `dim` components, like the Catalyst form
        # (vectors may be wider than the signature dimensionality)
        mat = np.vstack(v.to_numpy()).astype(np.float64, copy=False)[:, : planes.shape[1]]
        acc = np.zeros((mat.shape[0], planes.shape[0]), dtype=np.float64)
        for j in range(planes.shape[1]):
            acc += mat[:, j : j + 1] * planes[:, j]
        return pd.Series(((acc > 0) @ weights).astype(np.int32))

    # asNondeterministic (guide §4.4): the downstream equi-join on the
    # signature pushes isnotnull(bucket) below this projection, and the
    # optimizer then evaluates the UDF TWICE per input row (once under the
    # pushed filter, once in the projection — plan-verified, two
    # ArrowEvalPython nodes per side). The function is in fact
    # deterministic, so values are unchanged; the flag only stops the
    # optimizer duplicating the expensive expression.
    return sig.asNondeterministic()


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    catalyst_signature: bool | None = None,
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, rank within the
    query's bucket only. At scale the corpus is written bucket-partitioned
    once and probed many times.

    Signature form: Catalyst expressions at toy dims (SQL-oracle-able),
    the Arrow-batched kernel past 32 dims (identical output, one plan node);
    catalyst_signature forces a form."""
    use_catalyst = catalyst_signature if catalyst_signature is not None else dim <= 32
    if use_catalyst:
        def sig_col(c):
            return lsh_signature(c, dim, n_planes)
    else:
        sig_col = lsh_signature_batch_udf(dim, n_planes)
    # HOF dot + norm on per-side float64 twins (bit-identical to the
    # _dot_seq pandas UDF; tools/hof_ab.py A/B) — the signature kernel is
    # then the ONLY Python stage left (none at all in the Catalyst-
    # signature dims), and the bucket-local pair stream stays JVM-side.
    sig_corpus = _with_double_vec(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cvec"),
            sig_col(F.col(vec_col)).alias("bucket"),
        ),
        "cvec",
        "cd",
    ).selectExpr("vec_id", "bucket", "cd", f"{_hof_norm('cd')} AS cnorm")
    sig_q = _with_double_vec(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            sig_col(F.col(vec_col)).alias("bucket"),
        ),
        "qvec",
        "qd",
    ).selectExpr("query_id", "bucket", "qd", f"{_hof_norm('qd')} AS qnorm")
    scored = (
        sig_corpus.join(F.broadcast(sig_q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.expr(_dot_hof("qd", "cd")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the ANN compression tier
# ---------------------------------------------------------------------------

def _subvectors(vec_col, dim: int, m: int):
    """Array of m subvector slices of a dim-length vector column."""
    d = dim // m
    return [F.slice(vec_col, s * d + 1, d) for s in range(m)]


def pq_codebook(corpus: DataFrame, dim: int = 64, m: int = 8, k: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic sampled codebook: the subvectors of the first `k`
    corpus vectors by id form the k codes of each of the m subspaces (the
    standard sampled initialization; Lloyd refinement via
    operators.clustering is the opt-in upgrade — code assignment and ADC
    semantics are identical either way). Returns (s, code, cvec) — m*k
    rows, broadcastable anywhere."""
    seeds = corpus.orderBy(id_col).limit(k)
    rows = []
    for s, sub in enumerate(_subvectors(F.col(vec_col), dim, m)):
        rows.append(
            seeds.select(
                F.lit(s).alias("s"),
                F.row_number().over(Window.orderBy(id_col)).cast("int").alias("code"),
                sub.alias("cvec"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def pq_encode(corpus: DataFrame, codebook: DataFrame, dim: int = 64, m: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """PQ codes: per (vector, subspace), the nearest codebook entry by
    squared distance — computed as dot(c,c) - 2*dot(v,c) (the ||v||^2 term
    is constant per argmin), reusing the sequential-sum dot kernel so the
    oracle reproduces every comparison. Ties break to the lowest code.

    Scale shape: the m*k codebook broadcasts; the corpus explodes by m
    (row-local) and the only shuffle is the per-(vector, subspace) argmin
    window — at 100 TB this is the one-off encode pass whose output (m
    uint8s per vector, a 32x compression of dim-64 float32) is what ADC
    search then reads instead of the raw embeddings."""
    subs = F.array(*_subvectors(F.col(vec_col), dim, m))
    exploded = _with_double_vec(
        corpus.select(F.col(id_col).alias("vec_id"), F.posexplode(subs).alias("s", "sub")),
        "sub",
        "subd",
    )
    # HOF dots on float64 twins, not the _dot_seq pandas UDF — bit-identical
    # (tools/hof_ab.py A/B at encode volume); dot(c,c) is constant per
    # codebook entry, so it is computed ONCE per m*k broadcast row instead
    # of per (vector, subspace, code) pair (same value attached by the join)
    cb = _with_double_vec(codebook, "cvec", "cvecd").selectExpr(
        "s", "code", "cvecd", f"{_dot_hof('cvecd', 'cvecd')} AS cc"
    )
    scored = exploded.join(F.broadcast(cb), "s").select(
        "vec_id",
        "s",
        "code",
        (F.col("cc") - 2.0 * F.expr(_dot_hof("subd", "cvecd"))).alias("score"),
    )
    # NULLS LAST for the same malformed-vector reason as _cell_assignments
    w = Window.partitionBy("vec_id", "s").orderBy(F.asc_nulls_last("score"), F.asc("code"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "s", "code")
    )


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, topk: int = 10,
                dim: int = 64, m: int = 8, k: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: each query builds an
    m*k lookup table of partial distances to every codebook entry, and a
    corpus vector's distance estimate is the sum of its m code lookups —
    the query never touches raw corpus embeddings, only the codes.

    The per-query constant ||q_s||^2 is dropped (rank-invariant), so the
    LUT entry is dot(c,c) - 2*dot(q_s,c). Scale shape: codes are the
    compressed corpus (stored once); the LUT (n_queries * m * k rows)
    broadcasts; one groupBy sums the m partials per (query, vector); the
    ADC score itself is excluded from the output because a distributed
    float sum's addend order is not deterministic — ranks are (scores are
    well-separated for continuous data; ties would break by vec_id).

    Returns (query_id, vec_id, rank) — rank 1 = nearest estimate."""
    codebook = pq_codebook(corpus, dim, m, k, id_col, vec_col)
    codes = pq_encode(corpus, codebook, dim, m, id_col, vec_col)
    q = _with_double_vec(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(F.array(*_subvectors(F.col(vec_col), dim, m))).alias("s", "qsub"),
        ),
        "qsub",
        "qsubd",
    )
    # same HOF-on-twins conversion as pq_encode (bit-identical values; the
    # LUT build no longer crosses the Python boundary)
    cbq = _with_double_vec(codebook, "cvec", "cvecd").selectExpr(
        "s", "code", "cvecd", f"{_dot_hof('cvecd', 'cvecd')} AS cc"
    )
    lut = q.join(F.broadcast(cbq), "s").select(
        "query_id",
        "s",
        "code",
        (F.col("cc") - 2.0 * F.expr(_dot_hof("qsubd", "cvecd"))).alias("partial"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("partial").alias("adc"))
    )
    # NULLS LAST for the same malformed-vector reason as _cell_assignments
    w = Window.partitionBy("query_id").orderBy(F.asc_nulls_last("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))
    )


def int8_quantize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 scalar quantization: (vec_id, vmin, vmax, codes)
    with code_j = floor((x_j - vmin) * 255 / (vmax - vmin) + 0.5) — 4x
    storage reduction against float32 with per-vector range adaptation,
    the tier between raw vectors and PQ codes in an ANN serving stack.

    floor(x + 0.5) instead of round(): Spark rounds HALF_UP, DuckDB rounds
    half-to-even — floor keeps the codes byte-identical across engines.
    Degenerate constant vectors (vmax == vmin) encode as all-zero codes.
    Row-local Catalyst expressions; dequantize(j) = vmin + code_j *
    (vmax - vmin) / 255 reconstructs within half a step per component."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vmin, vmax = F.array_min(v), F.array_max(v)
    scale = vmax - vmin
    codes = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.floor((x - vmin) * 255.0 / scale + 0.5)
        ).cast("int"),
    )
    return emb.select(
        F.col(id_col).alias("vec_id"),
        vmin.alias("vmin"),
        vmax.alias("vmax"),
        codes.alias("codes"),
    )


def int8_quantize_oracle_sql(table: str = "embeddings") -> str:
    """The byte-identical quantization in portable DuckDB SQL."""
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ve FROM {table}
),
mm AS (
  SELECT vec_id, ve, list_min(ve) AS vmin, list_max(ve) AS vmax FROM v
)
SELECT vec_id, vmin, vmax,
       list_transform(ve, x -> CAST(CASE WHEN vmax = vmin THEN 0
         ELSE floor((x - vmin) * 255.0 / (vmax - vmin) + 0.5) END AS INTEGER)) AS codes
FROM mm
"""


def dim_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension corpus statistics: (dim, n, sum_x_micro, sum_x2_micro)
    — the normalization pass (mean/std whitening) every embedding pipeline
    runs before indexing or training, in micro-units (1e-6 quantization).

    Exactness contract: x*1e6 is one IEEE double op (identical in both
    engines), floor() truncates identically, and BIGINT sums are exact
    under ANY aggregation order — float sums differ between Spark's
    partial aggregation and DuckDB's sequential fold, and even a
    double->DECIMAL cast ROUNDS differently across engines (measured: 1
    unit in the 12th digit at 32k casts). Consumers derive
    mean ~= sum_x_micro/1e6/n within 1e-6 per element. One posexplode
    (row-local) + one dim-keyed groupBy, map-side combined."""
    x = F.posexplode(F.transform(F.col(vec_col), lambda v: v.cast("double")))
    exploded = emb.select(x.alias("dim", "x"))
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("x") * 1_000_000).cast("long")).alias("sum_x_micro"),
            F.sum(F.floor(F.col("x") * F.col("x") * 1_000_000).cast("long")).alias("sum_x2_micro"),
        )
    )


def dim_stats_oracle_sql(table: str = "embeddings") -> str:
    """The byte-identical per-dimension sums in portable DuckDB SQL.
    (generate_subscripts-free: parallel unnests zip positionally.)"""
    return f"""
WITH e AS (
  SELECT unnest(list_transform(embedding, v -> v::DOUBLE)) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM {table}
)
SELECT dim, count(*) AS n,
       CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS sum_x_micro,
       CAST(sum(CAST(floor(x * x * 1000000) AS BIGINT)) AS BIGINT) AS sum_x2_micro
FROM e GROUP BY dim
"""
