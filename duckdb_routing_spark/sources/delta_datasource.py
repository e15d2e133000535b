"""Spark 4 Python DataSource over the from-scratch Delta log: batch
snapshots AND an incremental Structured Streaming SOURCE.

    spark.dataSource.register(DeltaLogDataSource)
    snap   = spark.read.format("deltalog").load(table)             # batch
    stream = spark.readStream.format("deltalog").load(table)       # incremental

Semantics (public Delta protocol, mirroring the real delta source):
  - batch: replay the log (checkpoint-accelerated via deltalog._replay),
    read exactly the LIVE files; hive partition columns are reconstructed
    from each add action's partitionValues — the protocol's source of
    truth — not from directory-name inference, so numeric-looking values
    keep their declared types.
  - streaming: offsets are LOG VERSIONS. Each micro-batch reads the `add`
    actions of versions (start, end] whose dataChange=true — so an
    OPTIMIZE commit (dataChange=false compaction, deltalog.optimize_delta)
    is correctly INVISIBLE to a streaming consumer: no re-emission of
    rewritten rows. `remove` actions are ignored (append-only streaming;
    a table mutated by overwrite mid-stream raises unless
    ignoreDeletes=true, the real source's guard). startingVersion=N
    begins at version N (default -1 = deliver the table from genesis).

Executors read their own parquet file via pyarrow (one InputPartition per
data file — a planet-sized table fans out to one task per file with zero
driver payload movement); only the tiny JSON/checkpoint replay happens
driver-side, exactly the split the real connector has.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from duckdb_routing_spark.sources import deltalog as dl


class _FilePartition(InputPartition):
    def __init__(self, table: str, rel_path: str, partition_values: dict):
        self.table = table
        self.rel_path = rel_path
        self.partition_values = partition_values


def _schema_struct(table: str):
    from pyspark.sql.types import StructType

    meta, _, _ = dl._replay(table)
    return StructType.fromJson(json.loads(meta["schemaString"]))


def _read_file(table: str, rel_path: str, partition_values: dict, schema):
    """Yield schema-ordered tuples from one data file, filling partition
    columns from the add action's partitionValues (cast to the declared
    type — the protocol stores strings)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(table, rel_path))
    cols = {}
    n = tbl.num_rows
    casts = {
        "byte": int, "short": int, "integer": int, "long": int,
        "float": float, "double": float, "boolean": lambda s: s == "true",
        "string": str,
    }
    for f in schema.fields:
        if f.name in tbl.column_names:
            cols[f.name] = tbl.column(f.name).to_pylist()
        elif f.name in partition_values:
            raw = partition_values[f.name]
            val = None if raw is None else casts.get(
                f.dataType.simpleString(), str
            )(raw)
            cols[f.name] = [val] * n
        else:
            cols[f.name] = [None] * n
    names = [f.name for f in schema.fields]
    for row in zip(*(cols[c] for c in names)):
        yield row


class _DeltaBatchReader(DataSourceReader):
    def __init__(self, table: str, schema):
        self.table = table
        self._schema = schema

    def partitions(self):
        _, live, _ = dl._replay(self.table)
        return [
            _FilePartition(self.table, p, a.get("partitionValues") or {})
            for p, a in sorted(live.items())
        ]

    def read(self, partition: _FilePartition):
        yield from _read_file(
            partition.table, partition.rel_path, partition.partition_values,
            self._schema,
        )


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, schema, options):
        self.table = table
        self._schema = schema
        self.starting_version = int(options.get("startingversion", "-1"))
        self.ignore_deletes = options.get("ignoredeletes", "false").lower() == "true"

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        return {"version": dl._latest_version(self.table)}

    def partitions(self, start: dict, end: dict):
        parts = []
        for v in range(start["version"] + 1, end["version"] + 1):
            for action in dl._read_actions(self.table, v):
                if "remove" in action and action["remove"].get("dataChange", True):
                    if not self.ignore_deletes:
                        raise RuntimeError(
                            f"deltalog stream: version {v} removes data "
                            "(overwrite/delete); streaming is append-only — "
                            "set ignoreDeletes=true to skip removed files"
                        )
                if "add" not in action:
                    continue
                add = action["add"]
                # dataChange=false adds are compaction rewrites (OPTIMIZE):
                # the rows were already emitted from the original files
                if not add.get("dataChange", True):
                    continue
                parts.append(
                    _FilePartition(self.table, add["path"],
                                   add.get("partitionValues") or {})
                )
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_file(
            partition.table, partition.rel_path, partition.partition_values,
            self._schema,
        )

    def commit(self, end: dict) -> None:
        pass  # the log is the source of truth; nothing to acknowledge


class DeltaLogDataSource(DataSource):
    """`format("deltalog")` — batch snapshot reads and an incremental
    streaming source over sources/deltalog.py tables. Streaming options:
    startingVersion=N (default -1), ignoreDeletes=true|false."""

    @classmethod
    def name(cls) -> str:
        return "deltalog"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltalog: .load(table_path) is required")
        return path

    def schema(self):
        return _schema_struct(self._table())

    def reader(self, schema) -> DataSourceReader:
        return _DeltaBatchReader(self._table(), schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _DeltaStreamReader(self._table(), schema, self.options)
