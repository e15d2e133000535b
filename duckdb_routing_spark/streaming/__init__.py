"""Structured Streaming surface over the events table.

The reference implements no streaming (SURVEY §2.4); this layer is the
north-star addition: the same event analytics as the batch queries, expressed
as proper streaming plans (watermarks + windowed state), plus a custom
stateful sessionizer via applyInPandasWithState.
"""

from duckdb_routing_spark.streaming.events import (  # noqa: F401
    run_stream_to_memory,
    sessionize_stateful,
    streaming_hourly_counts,
)
