"""PySpark-native analytics engine with the capabilities of the reference
`duckdb-routing` DuckDB extension (road routing / travel-time operator family
on top of a full SQL engine), rebuilt Spark-first.

Layout:
    session.py    -- SparkSession builder tuned for local[N] and oracle parity
    routing/      -- the routing operator family (graph, kernels, engine)
    functions/    -- scalar function kits (geo, text)
    operators/    -- dedup / similarity / multimodal / text-analysis operators
    queries/      -- the relational query library (TPC-H-ish + events)
    sources/      -- readers (parquet tables, OSM ways, binary/multimodal)
    streaming/    -- Structured Streaming surface over the events table
    plans/        -- plan-inspection helpers (explain auditing)
    testing.py    -- deterministic synthetic road-grid fixtures
"""

__version__ = "0.1.0"

from duckdb_routing_spark.session import get_spark  # noqa: F401
