"""Spark 4 Python DataSource packaging of the pure-Python PBF decoder:

    spark.dataSource.register(OsmPbfDataSource)
    ways  = spark.read.format("osmpbf").option("kind", "ways").load(path)
    nodes = spark.read.format("osmpbf").option("kind", "nodes").load(path)

This is the idiomatic Spark-4 form of sources/osm_pbf.read_osm_pbf (which
predates the API and uses mapPartitions over an RDD of blob ranges): the
driver scans the file's blob directory once (offsets only — no payload
bytes), each InputPartition carries a slice of (offset, size) ranges, and
executors seek + decode their own byte ranges through the SAME kernels
(`decode_ranges`, `scan_blobs`). Reference behavior covered:
`valhalla_build_tiles` ingestion (valhalla-wrapper/src/wrapper.cpp tile
build) without osmium — see sources/osm_pbf.py for the decoder parity
notes.

Scale posture: partition count follows the blob count (capped by the
`partitions` option), so a planet file fans out to thousands of
independent seek+decode tasks with zero driver-side payload movement.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from duckdb_routing_spark.sources import osm_pbf


class _RangesPartition(InputPartition):
    def __init__(self, path: str, ranges: list[tuple[int, int]]):
        self.path = path
        self.ranges = ranges


class _OsmPbfReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmpbf: .load(path) is required")
        self.kind = options.get("kind", "ways")
        if self.kind not in ("ways", "nodes"):
            raise ValueError(f"osmpbf: kind must be 'ways' or 'nodes', got {self.kind!r}")
        self.max_parts = int(options.get("partitions", "64"))
        if self.max_parts < 1:
            raise ValueError(f"osmpbf: partitions must be >= 1, got {self.max_parts}")

    def partitions(self):
        blobs = [
            (off, size) for btype, off, size in osm_pbf.scan_blobs(self.path) if btype == "OSMData"
        ]
        if not blobs:
            raise ValueError(f"osmpbf: no OSMData blobs in {self.path}")
        n = min(len(blobs), self.max_parts)
        buckets: list[list[tuple[int, int]]] = [[] for _ in range(n)]
        for i, b in enumerate(blobs):
            buckets[i % n].append(b)
        return [_RangesPartition(self.path, b) for b in buckets if b]

    def read(self, partition: _RangesPartition):
        nodes, ways = osm_pbf.decode_ranges(partition.path, partition.ranges)
        if self.kind == "nodes":
            yield from nodes
        else:
            yield from ways


class OsmPbfDataSource(DataSource):
    """`spark.read.format("osmpbf")` — options: kind=ways|nodes (default
    ways), partitions=N (default 64)."""

    @classmethod
    def name(cls) -> str:
        return "osmpbf"

    def schema(self) -> str:
        kind = self.options.get("kind", "ways")
        return osm_pbf.NODES_SCHEMA if kind == "nodes" else osm_pbf.WAYS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _OsmPbfReader(self.options)
