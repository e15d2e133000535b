"""Snapshot diff: the incremental-processing primitive (CDC shape).

100 TB posture: a pipeline that reprocesses the whole corpus every run
wastes its budget on the ~99% that did not change; the diff against the
previous snapshot — added / removed / changed keys — is what bounds each
run to new work. One fingerprint per side (row-local md5) and one keyed
full-outer join; downstream stages (dedup index updates, embedding
refresh, sketch merges) consume the diff instead of the corpus. The same
algebra drives the streaming family's incremental indexes
(streaming/docs.py); this is the batch form.

Reference parity note: the reference engine ships no incremental
processing — this is LLM-pipeline/scale surface on top of SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level diff of two snapshots: (id, change) with change in
    'added' (key only in new), 'removed' (key only in old), 'changed'
    (key in both, content fingerprint differs). Unchanged keys are NOT
    emitted — the output is the work list, sized by the delta.

    `content_cols` (default: every non-id column common to both sides)
    feed a row-local md5 over a null-safe concat; the join is the only
    shuffle, keyed on the id. Assumes the id is unique within each
    snapshot (the usual primary-key contract); duplicate ids would
    fan out through the full-outer join."""
    if content_cols is None:
        content_cols = sorted(
            (set(old.columns) & set(new.columns)) - {id_col}
        )
    if not content_cols:
        raise ValueError("no content columns to fingerprint")

    def fp(df: DataFrame) -> Column:
        # unit separator between fields so ("ab","c") != ("a","bc");
        # NULL encodes distinctly from the empty string
        parts = [
            F.coalesce(F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("null"))
            for c in content_cols
        ]
        return F.md5(F.concat_ws("\x1f", *parts))

    o = old.select(F.col(id_col).alias("_oid"), fp(old).alias("_ofp"))
    n = new.select(F.col(id_col).alias("_nid"), fp(new).alias("_nfp"))
    joined = o.join(n, o["_oid"] == n["_nid"], "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("_nid"), F.col("_oid")).alias(id_col),
            F.when(F.col("_oid").isNull(), F.lit("added"))
            .when(F.col("_nid").isNull(), F.lit("removed"))
            .when(F.col("_ofp") != F.col("_nfp"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change"),
        )
        .filter(F.col("change") != "unchanged")
    )


def snapshot_diff_oracle_sql(
    old_sql: str, new_sql: str, id_col: str, content_cols: list[str]
) -> str:
    """The identical diff in portable DuckDB SQL over two snapshot
    subqueries."""
    def fp(alias: str) -> str:
        parts = ", ".join(
            f"coalesce('v' || CAST({alias}.{c} AS VARCHAR), 'null')" for c in content_cols
        )
        return f"md5(concat_ws(chr(31), {parts}))"

    return f"""
WITH o AS (SELECT {id_col} AS _oid, {fp('t')} AS _ofp FROM ({old_sql}) t),
n AS (SELECT {id_col} AS _nid, {fp('t')} AS _nfp FROM ({new_sql}) t),
j AS (SELECT * FROM o FULL OUTER JOIN n ON o._oid = n._nid)
SELECT coalesce(_nid, _oid) AS {id_col},
       CASE WHEN _oid IS NULL THEN 'added'
            WHEN _nid IS NULL THEN 'removed'
            WHEN _ofp != _nfp THEN 'changed'
            ELSE 'unchanged' END AS change
FROM j
WHERE (CASE WHEN _oid IS NULL THEN 'added'
            WHEN _nid IS NULL THEN 'removed'
            WHEN _ofp != _nfp THEN 'changed'
            ELSE 'unchanged' END) != 'unchanged'
"""
