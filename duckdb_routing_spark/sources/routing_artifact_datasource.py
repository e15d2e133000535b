"""Spark 4 Python DataSource over the reference engine's cached graph
artifacts (`<pbf>.<mode>.routing` bincode — rust/src/lib.rs RoutingData):

    spark.dataSource.register(RoutingArtifactDataSource)
    nodes = spark.read.format("routingartifact").option("kind", "nodes").load(path)
    edges = spark.read.format("routingartifact").load(path)     # default: edges

Interop surface: a reference user can inspect/join/aggregate their
existing artifacts with plain SQL (degree distributions, weight
histograms, bbox filters) without converting anything — the same binary
the reference loads for routing, parsed by routing/ref_artifact.py's
cursor (the byte-layout parity is pinned by test_monaco_artifact).

Execution shape: bincode is a single sequential stream, so ONE partition
parses it (driver ships only the path); the emitted rows then
repartition like any DataFrame. Artifacts are graph-sized (MBs — Italy
~hundreds of MB), not corpus-sized, so single-task parse is the honest
cost; at cluster scale the parse output is written once to parquet and
the artifact retired.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EDGES_SCHEMA = "src long, dst long, weight_ms long, length_m double"
NODES_SCHEMA = "node_id long, lon double, lat double, is_main boolean"


class _ArtifactPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ArtifactReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("routingartifact: .load(path) is required")
        self.kind = options.get("kind", "edges")
        if self.kind not in ("edges", "nodes"):
            raise ValueError(f"routingartifact: kind must be 'edges' or 'nodes', got {self.kind!r}")

    def partitions(self):
        return [_ArtifactPartition(self.path)]

    def read(self, partition: _ArtifactPartition):
        from duckdb_routing_spark.routing.ref_artifact import read_reference_artifact

        import numpy as np

        g = read_reference_artifact(partition.path)
        if self.kind == "nodes":
            main = np.zeros(g.num_nodes, dtype=bool)
            main[g.main_nodes] = True
            for i in range(g.num_nodes):
                yield (i, float(g.node_lon[i]), float(g.node_lat[i]), bool(main[i]))
        else:
            # expand the CSR adjacency back to (src, dst, w, len) rows
            degrees = np.diff(g.indptr)
            src = np.repeat(np.arange(g.num_nodes, dtype=np.int64), degrees)
            for s, d, w, lm in zip(src, g.indices, g.weights_ms, g.lengths_m):
                yield (int(s), int(d), int(w), float(lm))


class RoutingArtifactDataSource(DataSource):
    """`spark.read.format("routingartifact")` — options: kind=edges|nodes."""

    @classmethod
    def name(cls) -> str:
        return "routingartifact"

    def schema(self) -> str:
        return NODES_SCHEMA if self.options.get("kind", "edges") == "nodes" else EDGES_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _ArtifactReader(self.options)
