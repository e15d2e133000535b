"""Source connectors: the driver parquet tables, OSM way tables, binary
media files, and HTTP fetch for remote PBFs (the reference reads remote
blobs through httpfs — examples/monaco_end_to_end.sql)."""

from duckdb_routing_spark.sources.readers import (  # noqa: F401
    fetch_to_local,
    read_binary_media,
    read_osm_ways_table,
    read_table,
)
