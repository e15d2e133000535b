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
