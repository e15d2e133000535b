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
    begins at version N INCLUSIVE — matching the real Delta source's
    option semantics (default -1 = deliver the table from genesis).
    maxVersionsPerTrigger=K caps each micro-batch at K log versions,
    so a consumer starting against a 10^4-commit table drains it in
    bounded batches instead of one giant first batch (the real
    source's maxFilesPerTrigger analog in the unit our offsets use).

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


def _cast_partition_value(raw: str, simple_type: str, col: str):
    """The protocol stores partitionValues as strings; cast to the
    DECLARED type (the serialization formats are the protocol's
    "Partition Value Serialization" table). Unsupported partition types
    raise a clear error naming the column instead of leaking a Python
    str that fails at Arrow conversion on the executor."""
    import datetime
    import decimal

    if simple_type in ("byte", "short", "integer", "long"):
        return int(raw)
    if simple_type in ("float", "double"):
        return float(raw)
    if simple_type == "boolean":
        return raw == "true"
    if simple_type == "string":
        return raw
    if simple_type == "date":
        return datetime.date.fromisoformat(raw)
    if simple_type.startswith("timestamp"):
        # protocol format: {year}-{month}-{day} {hour}:{minute}:{second}[.micros]
        return datetime.datetime.fromisoformat(raw)
    if simple_type.startswith("decimal"):
        return decimal.Decimal(raw)
    raise ValueError(
        f"deltalog: unsupported partition column type {simple_type!r} "
        f"for column {col!r} (supported: integral/floating/boolean/"
        "string/date/timestamp/decimal)"
    )


def _read_file(table: str, rel_path: str, partition_values: dict, schema):
    """Yield schema-ordered tuples from one data file, filling partition
    columns from the add action's partitionValues (cast to the declared
    type — the protocol stores strings)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(table, rel_path))
    cols = {}
    n = tbl.num_rows
    for f in schema.fields:
        if f.name in tbl.column_names:
            cols[f.name] = tbl.column(f.name).to_pylist()
        elif f.name in partition_values:
            raw = partition_values[f.name]
            val = None if raw is None else _cast_partition_value(
                raw, f.dataType.simpleString(), f.name
            )
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
        mvpt = options.get("maxversionspertrigger")
        self.max_versions = int(mvpt) if mvpt is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("deltalog: maxVersionsPerTrigger must be >= 1")
        # highest offset this reader has planned so far — the base the
        # rate limiter advances from (see latestOffset)
        self._planned: int | None = None

    def initialOffset(self) -> dict:
        # offsets are EXCLUSIVE starts (partitions reads (start, end]), so
        # "begin at version N inclusive" is offset N-1; the -1 default
        # (full table) maps to -2... except nothing lives below 0, so -1
        # already includes genesis. Clamp at -1.
        return {"version": max(-1, self.starting_version - 1)}

    def latestOffset(self) -> dict:
        head = dl._latest_version(self.table)
        if self.max_versions is None:
            return {"version": head}
        # Rate limit: advance at most max_versions past the furthest offset
        # this worker has planned. The engine calls latestOffset BEFORE
        # initialOffset on a fresh stream (measured), so the unseeded base
        # is the starting version. On restart recovery with committed
        # offsets ahead of that base the first capped value can transiently
        # sit BELOW the checkpointed start — partitions() is duplicate-proof
        # against that (emits only versions past every offset it has seen)
        # and re-seeds the base, so the stream self-heals within one batch.
        base = self._planned
        if base is None:
            base = max(-1, self.starting_version - 1)
        return {"version": min(head, base + self.max_versions)}

    def partitions(self, start: dict, end: dict):
        # `lo` guards against replanning/regressed offsets: never re-emit a
        # version at or below one already planned by this worker
        lo = start["version"]
        if self._planned is not None:
            lo = max(lo, self._planned)
        self._planned = max(lo, end["version"])
        parts = []
        for v in range(lo + 1, end["version"] + 1):
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
    startingVersion=N (default -1 = genesis; N is INCLUSIVE),
    ignoreDeletes=true|false, maxVersionsPerTrigger=K (cap log versions
    per micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return "deltalog"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltalog: .load(table_path) is required")
        return path

    def schema(self):
        table = self._table()
        meta, _, _ = dl._replay(table)
        schema = _schema_struct(table)
        # fail fast driver-side on partition types the reconstruction
        # cannot cast, instead of a late executor failure
        by_name = {f.name: f for f in schema.fields}
        for col in meta.get("partitionColumns") or []:
            if col in by_name:
                t = by_name[col].dataType.simpleString()
                if not (
                    t in ("byte", "short", "integer", "long", "float",
                          "double", "boolean", "string", "date")
                    or t.startswith("timestamp") or t.startswith("decimal")
                ):
                    raise ValueError(
                        f"deltalog: unsupported partition column type {t!r} "
                        f"for column {col!r}"
                    )
        return schema

    def reader(self, schema) -> DataSourceReader:
        return _DeltaBatchReader(self._table(), schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _DeltaStreamReader(self._table(), schema, self.options)
