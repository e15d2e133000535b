"""As-of join — the time-series operator Spark lacks natively.

Implementation is the union + last-ignore-nulls window technique: tag both
sides, sort (by, on, tag) inside each `by` partition, carry the right side's
values forward with last(ignorenulls), keep left rows. One shuffle on `by`,
no Python, no range explosion — at 100 TB this is strictly better than the
applyInPandas/merge_asof fallback because state never leaves the JVM and
skewed keys ride AQE.

Tie semantics: direction='backward' with exact matches allowed — a right row
at exactly left.on is visible (right tag sorts first at equal timestamps);
among equal-timestamp right rows the one latest in `seq_col` wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    seq_col: str | None = None,
    prefix: str = "asof_",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on within the same `by` group.

    value_cols: right-side columns to carry. seq_col: deterministic
    tie-breaker among right rows with equal `on` (required for
    oracle-reproducible output). tolerance_s: pandas-merge_asof-style
    bound — a right row older than `tolerance_s` seconds (for timestamp
    `on`; same-unit for numeric) yields NULLs instead of a stale carry.
    The carried struct keeps the right row's own `on`, so the bound is a
    row-local mask after the same single window pass — no extra shuffle."""
    order_cols = [F.col(on), F.col("_asof_tag")] + ([F.col(seq_col)] if seq_col else [])
    lhs = left.withColumn("_asof_tag", F.lit(1))
    for c in value_cols:
        lhs = lhs.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    rhs = (
        right
        # a NULL-on right row sorts nulls-first and would be carried into
        # every left row as a phantom match (merge_asof drops NULL keys)
        .filter(F.col(on).isNotNull())
        .select(
            by,
            on,
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
            *([F.col(seq_col)] if seq_col and seq_col not in (by, on) else []),
        )
        .withColumn("_asof_tag", F.lit(0))
    )
    # align schemas
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)

    w = Window.partitionBy(by).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    out = lhs.unionByName(rhs)
    # carry the whole right ROW as one struct: a right row whose value
    # columns are all NULL still produces a NON-null struct, so
    # last(ignorenulls) picks the most recent right ROW — per-column
    # last(_r_c) would skip legitimately-NULL values and resurrect an older
    # non-NULL one, diverging from 'most recent right row' semantics.
    row_struct = F.when(
        F.col("_asof_tag") == 0,
        F.struct(F.col(on).alias("_on"), *[F.col(f"_r_{c}").alias(c) for c in value_cols]),
    )
    out = out.withColumn("_asof_row", F.last(row_struct, ignorenulls=True).over(w))
    fresh = (
        F.lit(True)
        if tolerance_s is None
        else (F.col(on).cast("double") - F.col("_asof_row._on").cast("double"))
        <= F.lit(float(tolerance_s))
    )
    for c in value_cols:
        out = out.withColumn(f"{prefix}{c}", F.when(fresh, F.col(f"_asof_row.{c}")))
    return out.filter(F.col("_asof_tag") == 1).drop(
        "_asof_tag", "_asof_row", *[f"_r_{c}" for c in value_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    seq_col: str | None = None,
    prefix: str = "asof_",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    right.on >= left.on in the same `by` group (merge_asof
    direction='forward'). Implemented by reflecting BOTH ordering columns
    (`on` and `seq_col`) through negated double columns and reusing the
    backward kernel — same single shuffle, with tie and tolerance
    semantics properly mirrored: among equal-timestamp right rows the one
    EARLIEST in `seq_col` wins (the mirror of backward's latest-wins).
    `seq_col`, when given, must be numeric. Integral `on`/`seq_col`
    columns negate as exact longs; other types go through double (exact to
    2^53 — microsecond timestamps through year 2255)."""

    def _neg(df: DataFrame, col: str):
        dt = dict(df.dtypes)[col]
        return -F.col(col) if dt in ("bigint", "int", "smallint", "tinyint") else -F.col(col).cast("double")

    neg, neg_seq = "_asof_neg_on", "_asof_neg_seq"
    lhs = left.withColumn(neg, _neg(left, on))
    rhs = right.withColumn(neg, _neg(right, on))
    if seq_col:
        lhs = lhs.withColumn(neg_seq, _neg(lhs, seq_col))
        rhs = rhs.withColumn(neg_seq, _neg(rhs, seq_col))
    out = asof_join_backward(
        lhs, rhs, on=neg, by=by, value_cols=value_cols,
        seq_col=neg_seq if seq_col else None, prefix=prefix, tolerance_s=tolerance_s,
    )
    return out.drop(neg, *( [neg_seq] if seq_col else [] ))
