"""Slowly-changing-dimension type 2 (SCD2) builds from a changelog.

The warehouse primitive downstream of CDC: given an event/changelog table
(key, ts, attributes...), emit one row per ATTRIBUTE RUN with
[valid_from, valid_to) validity, a per-key version number, and an
is_current flag. Consecutive rows whose tracked attributes are unchanged
collapse into the run that opened them — the classic "only persist the
change points" contract, so the dimension's size is the number of changes,
not the number of observations.

Companion to `operators/snapshot.py` (snapshot diffing): the diff feeds an
incremental pipeline, SCD2 is the queryable history it maintains.

Scale shape: two per-key ordered windows (change detection, then
valid_to/version over the CHANGE POINTS only) — every shuffle keys on the
dimension key, partition size is one key's history, never the table. No
driver state, no global sort; the final orderBy belongs to the report, not
the operator.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a changelog into SCD2 validity intervals.

    Returns `key, <attrs...>, valid_from, valid_to, version, is_current`:
    one row per maximal run of identical `attr_cols` values per key,
    `valid_to` = the next run's `valid_from` (NULL on the open run),
    `version` = 1-based run index per key. Rows with equal timestamps order
    by `tiebreak_col` (pass a unique column for deterministic results).
    Attribute comparison is null-safe: NULL -> 'X' and 'X' -> NULL both
    open new runs, NULL -> NULL does not.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = reduce(
        lambda a, b: a | b,
        [~F.lag(c).over(w).eqNullSafe(F.col(c)) for c in attr_cols],
    )
    points = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_chg", changed)
        .where((F.col("_rn") == 1) | F.col("_chg"))
    )
    order2 = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w2 = Window.partitionBy(key_col).orderBy(*order2)
    return points.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_apply_delta(
    dim: DataFrame,
    delta: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Incrementally maintain an SCD2 dimension: fold a new changelog batch
    in without recomputing untouched keys.

    Only the keys present in `delta` rebuild — their existing change points
    (which by construction include every run-start) replay through
    `scd2_from_changelog` together with the new observations; everyone else
    passes through untouched. Cost is O(|delta keys' history| + |delta|),
    the materialized-view delta shape (operators/incremental.py) for
    dimensions.

    PRECONDITION (validate=True checks it with one small aggregate): the
    delta is append-only per key — every new observation's timestamp is >=
    the key's current last valid_from. Out-of-order arrivals BETWEEN
    historical change points would need the collapsed-away duplicate
    observations to resolve (a run that re-opens after an interleaved
    change is invisible once its duplicates are gone), so those keys must
    rebuild from the full changelog instead; the check raises rather than
    silently mis-folding."""
    affected = delta.select(key_col).distinct()
    if validate:
        last = (
            dim.join(affected, key_col, "leftsemi")
            .groupBy(key_col)
            .agg(F.max("valid_from").alias("_last"))
        )
        first_new = delta.groupBy(key_col).agg(F.min(ts_col).alias("_first"))
        n_bad = last.join(first_new, key_col).where(F.col("_first") < F.col("_last")).count()
        if n_bad:
            raise ValueError(
                f"{n_bad} key(s) have delta rows older than their current "
                "last change point; rebuild those keys from the full changelog"
            )
    replay = (
        dim.join(affected, key_col, "leftsemi")
        .select(key_col, *attr_cols, F.col("valid_from").alias(ts_col))
        .withColumn("_tb", F.lit(None).cast("long"))
    )
    order_tb = F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(None).cast("long")
    new_obs = delta.select(key_col, *attr_cols, ts_col, order_tb.alias("_tb"))
    # NULL tiebreaks sort FIRST under Spark's asc default, so existing
    # points stay ahead of same-timestamp new observations deterministically
    rebuilt = scd2_from_changelog(
        replay.unionByName(new_obs),
        key_col,
        ts_col,
        attr_cols,
        tiebreak_col="_tb",
    )
    untouched = dim.join(affected, key_col, "left_anti")
    return untouched.unionByName(rebuilt.select(*untouched.columns))
