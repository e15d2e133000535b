"""Ordered-funnel conversion over an event stream.

The classic product-analytics operator a large-scale events pipeline needs:
for a step sequence [s0, s1, ..., sk], a user completes step i when an
event of type s_i exists STRICTLY AFTER their first completion of step
i-1 (first-touch semantics; ties on the raw timestamp are broken by
nothing — strictly-greater comparison on event-time microseconds, the
same rule the SQL oracle expresses).

Scale shape: step i is one `event_type = s_i` filter (pushed to the scan)
plus a groupBy(user) min — every shuffle in the chain keys on the user
column, the chain length is the (small, fixed) number of steps, and no
per-user event history is ever collected anywhere. This is the
composition a 100 TB events table wants, vs. the collect_list-per-user
formulation whose state is unbounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """Per-user first-completion time (event-time microseconds) of each
    funnel prefix: DataFrame(user, t0, t1, ..., t_{k-1}), NULL where the
    user never reaches the step. ``within_s`` bounds the whole funnel to a
    horizon after the first step (t_i <= t0 + within_s)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    us = F.unix_micros(F.col(ts_col))
    base = events.select(F.col(user_col).alias("user"), F.col(type_col).alias("et"), us.alias("us"))
    cur = base.filter(F.col("et") == steps[0]).groupBy("user").agg(F.min("us").alias("t0"))
    for i, step in enumerate(steps[1:], start=1):
        nxt = base.filter(F.col("et") == step)
        cond = F.col("us") > F.col(f"t{i - 1}")
        if within_s is not None:
            cond = cond & (F.col("us") <= F.col("t0") + int(within_s * 1_000_000))
        ti = (
            nxt.join(cur, "user")
            .filter(cond)
            .groupBy("user")
            .agg(F.min("us").alias(f"t{i}"))
        )
        cur = cur.join(ti, "user", "left")
    return cur


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """One row per funnel step: (step, step_index, n_users, pct_of_first,
    pct_of_prev). Percentages are exact int/int double divisions (hash-
    stable against the SQL oracle); step 0's pct columns are 1.0."""
    per_user = funnel_user_steps(events, steps, user_col, ts_col, type_col, within_s)
    counts = per_user.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(len(steps))]
    )
    rows = [
        F.struct(
            F.lit(step).alias("step"),
            F.lit(i).alias("step_index"),
            F.col(f"n{i}").alias("n_users"),
            (
                F.lit(1.0)
                if i == 0
                else F.col(f"n{i}").cast("double") / F.col("n0").cast("double")
            ).alias("pct_of_first"),
            (
                F.lit(1.0)
                if i == 0
                else F.col(f"n{i}").cast("double") / F.col(f"n{i - 1}").cast("double")
            ).alias("pct_of_prev"),
        )
        for i, step in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
