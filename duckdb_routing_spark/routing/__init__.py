"""The routing operator family, rebuilt Spark-first.

Semantics source of truth is the reference's self-contained native engine
(`/root/reference/rust/src/lib.rs`): per-(highway, mode) speed table, directed
weighted graph in travel-time milliseconds, nearest-main-road-node snapping,
Dijkstra shortest paths / isochrones, haversine path distances.

The Spark realization: the road graph is small relative to the query tables
(Italy = 9.7M nodes / 24.6M edges, i.e. a few hundred MB as numpy arrays), so
it is broadcast to executors once and every routing operator becomes a
vectorized Arrow-batched kernel over ordinary DataFrames — the reference's
per-row global mutex (src/travel_time_extension.cpp:650) is replaced by
lock-free read-only shared state per executor.
"""

from duckdb_routing_spark.routing.engine import RoutingEngine  # noqa: F401
from duckdb_routing_spark.routing.graph import RoutingGraph  # noqa: F401
