"""Table profiling + data-quality constraint auditing.

The ANALYZE-side of an analytics engine: before a 100 TB corpus is joined,
deduped, or split, a pipeline wants (a) a per-column statistical profile
(the input to partition sizing, skew planning, and schema drift detection)
and (b) a declarative constraint audit (the dbt-test / Deequ shape: assert
keys unique, references resolve, values in range — get back violation
counts, not a crash).

Scale design:
  - `profile_table` is ONE aggregation pass over the table — every
    column's stats fold in the same partial aggregate (map-side combine,
    one shuffle of a single row). Exact distinct counts expand the
    aggregate (Spark plans one Expand per distinct column); at cluster
    scale flip `exact_distinct=False` to use approx_count_distinct (HLL,
    one pass, no expand) — same report schema.
  - `run_checks` unions one tiny aggregate per constraint; each branch is
    the minimal plan for its kind (uniqueness: one groupBy on the key;
    reference: broadcast-able left-anti join; row predicates: a filter
    count with the predicate pushed to the scan). One action runs all
    branches; the result is a <n_checks>-row report.

Float parity (see queries/relational.py policy): numeric min/max are
emitted as DOUBLE columns (never stringified — engines format doubles
differently), string min/max as STRING columns, timestamps as epoch
microseconds; avg_len is an exact integer sum over an exact count, one
IEEE division.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def profile_table(df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True) -> DataFrame:
    """One row per column: (column_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str, avg_len).

    min_num/max_num cover numeric and timestamp columns (timestamps as
    epoch microseconds, exact); min_str/max_str cover strings
    (lexicographic); avg_len is the mean string length. The whole profile
    is ONE aggregation (single shuffle of one row) followed by a row-local
    unpivot of the per-column structs."""
    cols = columns or [f.name for f in df.schema.fields]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        dt = dtypes[c]
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nulls_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        if _is_numeric(dt):
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            aggs.append(F.unix_micros(F.min(col).cast("timestamp")).cast("double").alias(f"__min_{c}"))
            aggs.append(F.unix_micros(F.max(col).cast("timestamp")).cast("double").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
        if isinstance(dt, T.StringType):
            aggs.append(F.min(col).alias(f"__mins_{c}"))
            aggs.append(F.max(col).alias(f"__maxs_{c}"))
            aggs.append(
                (F.sum(F.length(col)).cast("double") / F.count(col)).alias(f"__avglen_{c}")
            )
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__mins_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__maxs_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__avglen_{c}"))
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_num"),
            F.col(f"__max_{c}").alias("max_num"),
            F.col(f"__mins_{c}").alias("min_str"),
            F.col(f"__maxs_{c}").alias("max_str"),
            F.col(f"__avglen_{c}").alias("avg_len"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# Declarative data-quality checks
# ---------------------------------------------------------------------------


@dataclass
class Check:
    """One declarative constraint. kind:
    'unique'    — key_cols has no duplicate combinations
    'not_null'  — expr column has no NULLs
    'predicate' — every row satisfies the SQL boolean expr
    'reference' — every non-null value of expr appears in ref[ref_col]
    """

    name: str
    kind: str
    expr: str = ""
    key_cols: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_col: str = ""


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check against df; returns (check_name, kind, n_violations,
    passed) — one row per check, violations counted, never raising.

    Each kind compiles to its minimal distributed plan:
      unique    -> groupBy(key) HAVING count>1, count the duplicate groups'
                   EXCESS rows (sum(cnt-1): rows that would have to leave)
      not_null  -> count(IS NULL) — folds map-side, predicate at the scan
      predicate -> count(NOT expr) — pushed to the scan where possible
      reference -> left-anti join on the ref keys (broadcast when small),
                   counting non-null orphans
    The report unions one single-row aggregate per check; one action runs
    all branches."""
    rows: list[DataFrame] = []
    for ck in checks:
        if ck.kind == "unique":
            viol = (
                df.groupBy(*[F.col(c) for c in ck.key_cols])
                .agg(F.count(F.lit(1)).alias("cnt"))
                .filter(F.col("cnt") > 1)
                .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_violations"))
            )
        elif ck.kind == "not_null":
            viol = df.agg(F.count(F.when(F.expr(ck.expr).isNull(), 1)).alias("n_violations"))
        elif ck.kind == "predicate":
            viol = df.agg(
                F.count(F.when(~F.coalesce(F.expr(ck.expr), F.lit(False)), 1)).alias("n_violations")
            )
        elif ck.kind == "reference":
            if ck.ref is None:
                raise ValueError(f"check {ck.name}: kind='reference' needs ref/ref_col")
            keys = ck.ref.select(F.col(ck.ref_col).alias("__ref_key")).distinct()
            viol = (
                df.select(F.expr(ck.expr).alias("__fk"))
                .filter(F.col("__fk").isNotNull())
                .join(keys, F.col("__fk") == F.col("__ref_key"), "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
            )
        else:
            raise ValueError(f"check {ck.name}: unknown kind {ck.kind!r}")
        rows.append(
            viol.select(
                F.lit(ck.name).alias("check_name"),
                F.lit(ck.kind).alias("kind"),
                F.col("n_violations").cast("long").alias("n_violations"),
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int, id_col: str | None = None
) -> DataFrame:
    """Privacy audit for a data release: k-anonymity over quasi-identifiers.

    A row is k-anonymous when at least k rows share its full quasi-identifier
    combination (Sweeney 2002); combinations below k re-identify. Returns one
    row per VIOLATING combination: (quasi_cols..., group_size, sample_id) —
    sample_id (min of id_col) points an auditor at a concrete affected row.
    An empty result certifies the release at the chosen k.

    Scale shape: one partial-agg shuffle onto the quasi-identifier key —
    the same keyed-count plan as the skew report; the violating slice is
    small by definition (each group < k rows). All integer columns.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("group_size")]
    if id_col:
        aggs.append(F.min(id_col).alias("sample_id"))
    return df.groupBy(*quasi_cols).agg(*aggs).where(F.col("group_size") < k)
