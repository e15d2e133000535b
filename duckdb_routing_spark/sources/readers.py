"""Readers. Parquet is the default path (columnar, pushdown); everything
else wraps a Spark source format or a driver-side fetch.
"""

from __future__ import annotations

import os
import shutil
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from duckdb_routing_spark.queries.registry import table as read_table  # noqa: F401

WAYS_SCHEMA = "way_id long, nodes array<long>, highway string, oneway string"
OSM_NODES_SCHEMA = "node_id long, lon double, lat double"


def read_osm_ways_table(spark: SparkSession, path: str) -> DataFrame:
    """Way table exported from OSM (parquet or json lines) with the columns
    the graph builder needs: way_id, nodes array<long>, highway, oneway.
    (Direct .osm.pbf decoding is gated on osmium — routing/osm_build.py.)"""
    if path.endswith(".json") or path.endswith(".jsonl"):
        return spark.read.schema(WAYS_SCHEMA).json(path)
    return spark.read.parquet(path)


def read_binary_media(spark: SparkSession, path_glob: str) -> DataFrame:
    """Opaque media files as binary rows: (path, modificationTime, length,
    content) via Spark's binaryFile source — the scan side of the multimodal
    operators."""
    return spark.read.format("binaryFile").load(path_glob)


def fetch_to_local(url_or_path: str, cache_dir: str = "/tmp/routing_fetch_cache") -> str:
    """Driver-side fetch with a content cache, mirroring the reference's
    remote-tiles download + $TMPDIR cache (valhalla_build_tiles_simple.cpp:
    180-197, examples/remote_tiles_example.sql). Local paths pass through."""
    if not url_or_path.startswith(("http://", "https://")):
        return url_or_path
    os.makedirs(cache_dir, exist_ok=True)
    # key by (url-hash, basename): two hosts serving the same filename (or
    # one URL whose content changed under a NEW name) must not collide.
    # Same-URL refreshes still hit the cache — the reference's $TMPDIR
    # download cache has the same staleness semantics; delete the cache
    # dir to force a refetch.
    import hashlib

    tag = hashlib.md5(url_or_path.encode()).hexdigest()[:12]
    dest = os.path.join(cache_dir, f"{tag}-{os.path.basename(url_or_path)}")
    if not os.path.exists(dest):
        tmp = dest + ".part"
        with urllib.request.urlopen(url_or_path) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, dest)
    return dest
