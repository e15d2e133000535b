"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins;
these helpers cover the two cases it doesn't: broadcast-ineligible dimension
joins with a hot key, and groupBy aggregations where one key dominates.

Salting is deterministic here (salt derives from a hash of designated
columns, not rand()) so results stay reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(salt_from: list[str], n_salts: int):
    return F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(n_salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `large.key` is skewed: the large side gets a
    deterministic salt in [0, n_salts), the small side is replicated
    n_salts times, and the join key becomes (key, salt) — the hot key's
    rows spread over n_salts tasks instead of one straggler."""
    salted_large = large.withColumn("_salt", _salt_col(salt_from, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    salt_from: list[str],
    n_salts: int = 16,
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Skew-resistant groupBy: partial aggregate on (key, salt), then merge
    partials per key. Exposes count + sums (algebraic aggregates compose;
    non-algebraic ones need sketches instead)."""
    sum_cols = sum_cols or {}
    partial = (
        df.withColumn("_salt", _salt_col(salt_from, n_salts))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_pc"),
            *[F.sum(src).alias(f"_ps_{alias}") for alias, src in sum_cols.items()],
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_pc").alias(count_col),
        *[F.sum(f"_ps_{alias}").alias(alias) for alias in sum_cols],
    )


def key_skew_report(df: DataFrame, key_col: str, topk: int = 10) -> DataFrame:
    """Diagnostic before choosing a join strategy: the top-k hottest keys
    with exact counts and integer parts-per-million share — the number that
    decides between a plain shuffle join, AQE skew splitting, and
    salted_join above. (share_ppm is integer-exact: cnt * 1_000_000 / total
    in bigint arithmetic, so the report is value-hash oracle-able.)

    One keyed groupBy + a tiny global top-k — the report itself never
    becomes the skew problem it measures."""
    counts = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col(key_col).alias("key"),
            "cnt",
            # integer floor division on both engines (double-divide + cast
            # would round in DuckDB but truncate in Spark)
            F.expr("(cnt * 1000000L) div total").alias("share_ppm"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(topk)
    )
