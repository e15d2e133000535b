"""The relational query library + oracle registry.

Every operator the engine claims is registered here as a QuerySpec:
a Spark implementation (spark, sf_dir) -> DataFrame and, when the semantics
are SQL-expressible, the equivalent DuckDB oracle SQL. The driver's
correctness gate runs both sides at sf0.01 and hash-compares
(row-count + schema + order-insensitive value hash), so:

  - every computed column is aliased identically on both sides;
  - money aggregates round to 2 decimals, ratios/averages to 4-6, so
    partition-order float non-associativity cannot flip the hash;
  - LIMIT/top-k queries carry a total deterministic ORDER BY (ties broken
    by a key column).
"""

from duckdb_routing_spark.queries.registry import REGISTRY, QuerySpec, register  # noqa: F401

# importing the modules populates the registry
from duckdb_routing_spark.queries import llm, relational, routing_queries, streaming_queries  # noqa: F401,E402
