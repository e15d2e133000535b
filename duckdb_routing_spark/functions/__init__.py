"""Scalar function kits for the SQL surface.

- geo: the spatial ST_* surface the reference workload uses (SURVEY §2.4),
  expressed over WKT strings / WKB bytes without a geometry type system.
- text: the text-analysis kit as SQL-defined functions (pure-Catalyst).
- vector: embedding math (dot/cosine/l2/norm) as SQL-defined functions.
"""

from duckdb_routing_spark.functions.geo import register_geo_functions  # noqa: F401
from duckdb_routing_spark.functions.text import register_text_functions  # noqa: F401
from duckdb_routing_spark.functions.vector import register_vector_functions  # noqa: F401
