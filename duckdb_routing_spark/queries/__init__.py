"""The relational query library + oracle registry.

Every operator the engine claims is registered here as a QuerySpec:
a Spark implementation (spark, sf_dir) -> DataFrame and, when the semantics
are SQL-expressible, the equivalent DuckDB oracle SQL. The driver's
correctness gate runs both sides at sf0.01 and hash-compares
(row-count + schema + order-insensitive value hash), so:

  - every computed column is aliased identically on both sides;
  - NEVER round() an aggregate (Spark's HALF_UP-on-shortest-string and
    DuckDB's value rounding diverge on .5 boundaries). Instead: cast each
    per-row expression to DECIMAL(18,s), sum exactly, cast the final result
    to double ONCE; averages = exact decimal sum / count; window totals are
    summed in decimal too. Full rationale: ARCHITECTURE.md §4.
  - LIMIT/top-k queries carry a total deterministic ORDER BY (ties broken
    by a key column).
"""

from duckdb_routing_spark.queries.registry import REGISTRY, QuerySpec, register  # noqa: F401

# importing the modules populates the registry
from duckdb_routing_spark.queries import llm, relational, routing_queries, streaming_queries  # noqa: F401,E402
