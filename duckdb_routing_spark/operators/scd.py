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
from pyspark.sql.types import LongType


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
    emit_last_seen: bool = False,
) -> DataFrame:
    """Collapse a changelog into SCD2 validity intervals.

    Returns `key, <attrs...>, valid_from, valid_to, version, is_current`:
    one row per maximal run of identical `attr_cols` values per key,
    `valid_to` = the next run's `valid_from` (NULL on the open run),
    `version` = 1-based run index per key. Rows with equal timestamps order
    by `tiebreak_col` (pass a unique column for deterministic results).
    Attribute comparison is null-safe: NULL -> 'X' and 'X' -> NULL both
    open new runs, NULL -> NULL does not.

    `emit_last_seen=True` appends a `last_seen` column — the timestamp of
    the LAST observation collapsed into the run (== valid_from for a
    single-observation run). A dimension that carries last_seen lets
    `scd2_apply_delta` fully validate its append-only precondition: without
    it, observations collapsed away after the final change point are
    unrecoverable and the check can only see the last change point. Costs
    one extra (key, run)-keyed window; off by default so the plain
    dimension shape (and its oracle) is unchanged.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = reduce(
        lambda a, b: a | b,
        [~F.lag(c).over(w).eqNullSafe(F.col(c)) for c in attr_cols],
    )
    if emit_last_seen:
        # run id = running count of run-starts; last_seen = max ts within
        # the (key, run) group. Same key-sized partitions as the base path.
        base = (
            df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_start", (F.col("_rn") == 1) | changed)
            .withColumn(
                "_run",
                F.sum(F.col("_start").cast("int")).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
        )
        points = base.withColumn(
            "_last_seen", F.max(ts_col).over(Window.partitionBy(key_col, "_run"))
        ).where(F.col("_start"))
    else:
        points = (
            df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_chg", changed)
            .where((F.col("_rn") == 1) | F.col("_chg"))
        )
    order2 = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w2 = Window.partitionBy(key_col).orderBy(*order2)
    out_cols = [
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    ]
    if emit_last_seen:
        out_cols.append(F.col("_last_seen").alias("last_seen"))
    return points.select(*out_cols)


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

    PRECONDITION: the delta is append-only per key — every new
    observation's timestamp is >= the key's LAST OBSERVATION (not just its
    last change point). Observations collapsed into a run are gone; a delta
    row interleaved among them would need them back to resolve (a run that
    re-opens after an interleaved change is invisible once its duplicates
    are collapsed), so violating keys must rebuild from the full changelog.

    How much of that precondition `validate=True` can enforce depends on
    the dimension's shape:

    * dim built with `emit_last_seen=True` (has a `last_seen` column): the
      check compares against the key's last OBSERVATION — the precondition
      is fully enforced, and the fold provably equals a full rebuild
      (pytest-pinned), last_seen included.
    * plain dim (no `last_seen`): the check can only compare against the
      last CHANGE POINT (max valid_from) — a delta row between the last
      change point and the key's last collapsed observation passes the
      check yet folds differently from a full rebuild (a later same-attr
      re-open is lost). If deltas can interleave there, build the dimension
      with emit_last_seen=True.

    Ties at the boundary (delta ts == the stored timestamp) replay the
    existing point FIRST (NULL tiebreak sorts ahead) — the original
    observation's tiebreak value is not stored, so exact-equal boundary
    timestamps resolve old-before-new deterministically.

    The tiebreak column keeps its native type (string ids stay strings);
    the replay side uses a typed NULL of the same type."""
    affected = delta.select(key_col).distinct()
    has_last_seen = "last_seen" in dim.columns
    if validate:
        bound = "last_seen" if has_last_seen else "valid_from"
        last = (
            dim.join(affected, key_col, "leftsemi")
            .groupBy(key_col)
            .agg(F.max(bound).alias("_last"))
        )
        first_new = delta.groupBy(key_col).agg(F.min(ts_col).alias("_first"))
        n_bad = last.join(first_new, key_col).where(F.col("_first") < F.col("_last")).count()
        if n_bad:
            what = "last observation" if has_last_seen else "current last change point"
            raise ValueError(
                f"{n_bad} key(s) have delta rows older than their {what}; "
                "rebuild those keys from the full changelog"
            )
    tb_type = delta.schema[tiebreak_col].dataType if tiebreak_col else LongType()
    null_tb = F.lit(None).cast(tb_type)
    # replay tiebreak = struct(native_tb, ord): the original tiebreak
    # VALUES of collapsed observations are not stored, so replay rows carry
    # (NULL, version) — a NULL first field sorts before any delta tiebreak
    # (old-before-new at equal timestamps), and the version second field
    # keeps same-timestamp change points in their ORIGINAL order (two runs
    # opening on the same timestamp would otherwise tie nondeterministically).
    # Delta rows carry (tb, MAX) so replay duplicates of the same run stay
    # adjacent ahead of them; two deltas at equal ts order by their tb.
    _MAX_ORD = F.lit((1 << 62)).cast("long")

    def _rtb(ver):
        return F.struct(null_tb.alias("t"), ver.cast("long").alias("o"))

    replay_base = dim.join(affected, key_col, "leftsemi")
    replay = replay_base.select(
        key_col, *attr_cols, F.col("valid_from").alias(ts_col),
        _rtb(F.col("version")).alias("_tb"),
    )
    if has_last_seen:
        # re-emit each run's LAST observation too: same attrs so it
        # collapses back into its run, but it carries the run's true
        # last_seen through the rebuild (and anchors the open run's end)
        replay = replay.unionByName(
            replay_base.select(
                key_col, *attr_cols, F.col("last_seen").alias(ts_col),
                _rtb(F.col("version")).alias("_tb"),
            )
        )
    order_tb = F.col(tiebreak_col) if tiebreak_col else null_tb
    new_obs = delta.select(
        key_col, *attr_cols, ts_col,
        F.struct(order_tb.alias("t"), _MAX_ORD.alias("o")).alias("_tb"),
    )
    rebuilt = scd2_from_changelog(
        replay.unionByName(new_obs),
        key_col,
        ts_col,
        attr_cols,
        tiebreak_col="_tb",
        emit_last_seen=has_last_seen,
    )
    untouched = dim.join(affected, key_col, "left_anti")
    return untouched.unionByName(rebuilt.select(*untouched.columns))
