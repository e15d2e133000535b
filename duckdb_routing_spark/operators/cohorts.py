"""Cohort retention over an event stream.

Users are grouped into acquisition cohorts by the period (week by default)
of their FIRST event; retention at offset k is the fraction of a cohort
active in any way k periods later. The other half of the product-analytics
pair with operators/funnel.py.

Scale shape: one user-keyed min aggregation (cohort assignment), one join
back to the events keyed on the same user column, then a distinct +
count over (cohort, offset, user) — the distinct is the only shuffle that
grows with activity volume, and it is keyed on the small (cohort, offset)
space times users. No per-user history is ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    events: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort DATE, period_offset INT, n_active BIGINT, n_cohort BIGINT,
    retention DOUBLE), ordered by (cohort, period_offset).

    cohort = the period-start date of the user's first event;
    period_offset = whole periods between the cohort start and the activity
    (floor of day difference / period length, so offset 0 is the
    acquisition period itself and retention[0] == 1.0 by construction).
    Retention divides exact int counts — hash-stable vs a SQL oracle."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[period]
    base = events.select(F.col(user_col).alias("user"), F.col(ts_col).cast("date").alias("d"))
    first = base.groupBy("user").agg(F.min("d").alias("first_d"))
    cohort_start = (
        F.date_sub(F.col("first_d"), F.dayofweek(F.col("first_d")) - 1) if period == "week" else F.col("first_d")
    )
    firsts = first.select("user", cohort_start.alias("cohort"))
    active = (
        base.join(firsts, "user")
        .select(
            "cohort",
            F.floor(F.datediff(F.col("d"), F.col("cohort")) / days).cast("int").alias("period_offset"),
            "user",
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("n_cohort"))
    return (
        active.groupBy("cohort", "period_offset")
        .agg(F.count("*").alias("n_active"))
        .join(sizes, "cohort")
        .select(
            "cohort",
            "period_offset",
            "n_active",
            "n_cohort",
            (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias("retention"),
        )
        .orderBy("cohort", "period_offset")
    )
