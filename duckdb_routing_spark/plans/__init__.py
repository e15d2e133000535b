"""Plan inspection: assert the physical plans we designed for actually
materialize (pushdown reached the scan, small sides broadcast, codegen
spans cover the hot expressions)."""

from duckdb_routing_spark.plans.audit import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)
