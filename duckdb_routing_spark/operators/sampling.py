"""Deterministic sampling / splitting operators for training-data curation.

Both operators avoid rand(): every decision is a pure function of the row
key and a salt, so (a) re-runs and retries give identical output on a
cluster (Spark tasks can re-execute — nondeterministic sampling silently
duplicates or drops rows under retry), and (b) the DuckDB oracle reproduces
them bit-for-bit with the same md5 arithmetic used by the MinHash pipeline.

100 TB shape: hash_split is a stateless map (no shuffle at all); quota
sample is one window per group key — the shuffle is on the group column,
and per-group state is a counter, not a buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def _hash_bucket(key_col, salt: str):
    """60-bit md5 half of (key || ':' || salt), mod 10k — the same
    engine-portable construction as dedup.MH_PRIME hashing; in DuckDB:
    ('0x' || substr(md5(key || ':salt'), 1, 15))::BIGINT % 10000."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % SPLIT_BUCKETS


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column ('train'/'val'/'test' by default) assigned by
    hash bucket — deterministic, stateless, no shuffle; fractions hold in
    expectation per 10k-bucket granularity."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])).alias("split")
    return df.withColumn("split", expr)


def quota_per_group(
    df: DataFrame,
    group_col: str,
    quota: int,
    key_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Keep at most `quota` rows per group, chosen by hash order (a
    deterministic uniform subsample within each group, not head-of-file
    bias); ties broken by key so the survivor set is total-ordered."""
    w = Window.partitionBy(group_col).orderBy(_hash_bucket(F.col(key_col), salt), F.col(key_col))
    return df.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= quota).drop("_rk")


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.7,
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature/mixture resampling across sources (the pretraining-corpus
    rebalancing where p(source) is flattened to count^alpha, alpha < 1):
    each source keeps rows at rate (n_s / n_min)^(alpha-1), so the SMALLEST
    source keeps everything and larger sources downsample toward balance —
    the downsample-only formulation (no row duplication, retry-safe).

    Per-row keep decisions are the same md5-bucket construction as
    hash_split — deterministic and oracle-reproducible. Scale shape: one
    tiny per-source count aggregate broadcast back; the corpus itself is
    touched by a stateless filter (no shuffle of the data)."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n_src"))
    n_min = counts.agg(F.min("_n_src").alias("_n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        F.pow(F.col("_n_src").cast("double") / F.col("_n_min"), F.lit(alpha - 1.0)).alias("_rate"),
    )
    bucket = _hash_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket.cast("double") < F.col("_rate") * SPLIT_BUCKETS)
        .drop("_rate")
    )


def mix_weights_plan(weights: dict[str, float], default_weight: float = 1.0) -> dict[str, tuple[int, int]]:
    """Resolve epoch weights to exact integer plans: weight w becomes
    (floor(w) whole epochs, round(frac(w) * 10k) hash-bucket threshold for
    the one fractional epoch). Working in integers keeps Spark and the
    DuckDB oracle bit-identical — no float comparisons cross the engine
    boundary."""
    plan = {}
    for s, w in {**weights, None: default_weight}.items():
        if w < 0:
            raise ValueError(f"negative mixture weight for {s!r}: {w}")
        reps = int(w + 1e-9)
        frac = int(round((w - reps) * SPLIT_BUCKETS))
        plan[s] = (reps, frac)
    return plan


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    default_weight: float = 1.0,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Mixture resampling WITH repetition — the pretraining data-mixture
    operator (sample source s for `weights[s]` epochs: 2.5 means every row
    twice plus a deterministic half of rows a third time; 0.3 keeps a 30%
    subset; 0 drops the source). Adds an `epoch` column (1..n_copies) so
    downstream exact-dedup / sharding can tell the copies apart.

    Unlike temperature_sample (downsample-only), this implements the
    up-sampling mixtures real pretraining runs use (rare high-quality
    sources repeated for multiple epochs). Per-row copy counts are a pure
    function of (key, salt, source weight): retry-safe, and reproduced
    bit-for-bit by the DuckDB oracle's generate_series lateral.

    100 TB shape: zero shuffle — a when-chain resolves the per-source plan,
    sequence+explode is row-local, and dropped rows never leave the scan
    (explode of an empty array eliminates them). Row expansion is bounded
    by max(weights), which the caller controls."""
    plan = mix_weights_plan(weights, default_weight)
    d_reps, d_frac = plan.pop(None)
    reps_expr, frac_expr = None, None
    for s, (r, fr) in plan.items():
        cond = F.col(source_col) == s
        reps_expr = (F.when(cond, r) if reps_expr is None else reps_expr.when(cond, r))
        frac_expr = (F.when(cond, fr) if frac_expr is None else frac_expr.when(cond, fr))
    reps = reps_expr.otherwise(d_reps) if reps_expr is not None else F.lit(d_reps)
    frac = frac_expr.otherwise(d_frac) if frac_expr is not None else F.lit(d_frac)
    bucket = _hash_bucket(F.col(key_col), salt)
    n_copies = (reps + F.when(bucket < frac, 1).otherwise(0)).cast("int")
    # sequence(1, 0) in Spark DESCENDS to [1, 0] — guard with an explicit
    # empty array so zero-copy rows vanish under the (inner) explode.
    epochs = F.when(n_copies >= 1, F.sequence(F.lit(1), n_copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(epochs))


def mix_sources_oracle_case(weights: dict[str, float], default_weight: float = 1.0,
                            source_col: str = "source", key_col: str = "doc_id",
                            salt: str = "mix") -> str:
    """DuckDB expression computing the identical per-row copy count."""
    plan = mix_weights_plan(weights, default_weight)
    d_reps, d_frac = plan.pop(None)
    if plan:
        whens_r = " ".join(f"WHEN '{s}' THEN {r}" for s, (r, _) in plan.items())
        whens_f = " ".join(f"WHEN '{s}' THEN {fr}" for s, (_, fr) in plan.items())
        reps = f"CASE {source_col} {whens_r} ELSE {d_reps} END"
        frac = f"CASE {source_col} {whens_f} ELSE {d_frac} END"
    else:
        reps, frac = str(d_reps), str(d_frac)
    bucket = f"(('0x' || substr(md5({key_col} || ':{salt}'), 1, 15))::BIGINT % {SPLIT_BUCKETS})"
    return f"({reps} + CASE WHEN {bucket} < {frac} THEN 1 ELSE 0 END)"
