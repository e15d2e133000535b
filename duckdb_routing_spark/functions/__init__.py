"""Scalar function kits: the spatial ST_* surface the reference workload
uses (SURVEY §2.4), expressed over WKT strings / WKB bytes without a
geometry type system."""

from duckdb_routing_spark.functions.geo import register_geo_functions  # noqa: F401
