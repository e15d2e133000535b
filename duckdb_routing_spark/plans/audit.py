"""Helpers to read `df.explain("formatted")` output programmatically —
the feedback loop for the scale rules: filters must reach the parquet scan
(PushedFilters), projections must prune (ReadSchema), dimension joins must
broadcast, and Python should only appear in ArrowEvalPython stages we chose.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (empty strings for scans with
    nothing pushed)."""
    plan = formatted_plan(df)
    return [m.group(1).strip() for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan)]


def scan_read_schema(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [m.group(1).strip() for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def python_eval_stages(df: DataFrame) -> int:
    """Number of Python evaluation NODES in the plan. explain("formatted")
    prints every node twice (once in the tree, once as a detail-section
    header "(n) NodeName"), so count only the numbered headers."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan))
