"""Minimal Delta Lake transaction log: a from-scratch implementation of the
PUBLIC Delta protocol (delta-io PROTOCOL.md), enough to make the lakehouse
sink a TESTED real branch in a JAR-free image.

`sinks.write_table_format` remains the production path (the real Delta/
Iceberg runtime on the classpath); this module is its dependency-free
counterpart, the way operators/imagecodec.py backs the multimodal decode
gate. What it implements, by protocol section:

  - the _delta_log layout: one JSON commit per version, file named
    `%020d.json`, newline-delimited single-action objects;
  - actions: `protocol` (minReaderVersion 1 / minWriterVersion 2),
    `metaData` (table id, format parquet, schemaString = Spark StructType
    JSON — the exact string Delta stores, `df.schema.json()` —
    partitionColumns, configuration), `add` (path, partitionValues, size,
    modificationTime, dataChange), `remove` (path, deletionTimestamp,
    dataChange), `txn` (appId/version — exactly-once streaming
    bookkeeping), `commitInfo` (informational);
  - optimistic concurrency: a commit is a PUT-IF-ABSENT of version N
    (`open(..., 'x')` on POSIX — the protocol's atomic rename/put
    requirement). An append that loses the race re-reads the log and
    retries at N+1 (blind appends never conflict); an overwrite that loses
    raises rather than clobbering a state it did not read;
  - snapshot reads + TIME TRAVEL: replay add/remove up to a version, read
    the live files (`basePath` recovers hive-partition columns);
  - appends must match the table schema exactly (no evolution here).

OPTIMIZE is implemented (`optimize_delta`): per-partition bin-packing
compaction of small live files — the maintenance a 1-minute-batch
exactly-once stream needs — committed as add/remove actions with
dataChange=false so readers and streaming consumers see no new data.

Checkpoints ARE implemented (protocol "Checkpoints" section): every
`checkpoint_interval` commits the writer reconciles the log into
`%020d.checkpoint.parquet` (one action per row: protocol / metaData /
add / txn columns — remove tombstones are reconciled away because this
module's vacuum walks the filesystem instead of consuming tombstones)
and points `_last_checkpoint` at it, so a snapshot read replays at most
`checkpoint_interval` JSON commits no matter how long an exactly-once
stream has been appending. Time travel to a pre-checkpoint version
replays from the newest on-disk checkpoint at or below the target (full
JSON replay when none exists). The log itself is bounded by
`cleanup_delta_log` (the protocol's metadata-cleanup analog): it
materializes a base checkpoint at the retention cutoff, deletes older
JSON commits + checkpoints, and records the horizon so time travel past
it raises DeltaTimeTravelError naming the cleanup — the same
attributable-failure contract vacuum_delta records for data files.

NOT implemented (documented scope, raises where relevant): deletion
vectors, column mapping, generated columns, CDC files, multi-part
checkpoints, and non-POSIX stores (an object-store deployment swaps the
put-if-absent primitive, e.g. S3 conditional puts — same shape as
operators/fs.py's pointer commits).

Data files are written by Spark itself (df.write.parquet to a staging dir,
then hard-moved under the table root keeping Spark's unique part names),
so executors do all data IO; only the tiny JSON commit is driver-side —
the same split the real Delta writer has.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_delta_log"
_LAST_CHECKPOINT = "_last_checkpoint"
DEFAULT_CHECKPOINT_INTERVAL = 10

# Diagnostic: JSON commit files parsed since import (tests pin that a
# checkpointed snapshot read replays a bounded number of them).
_JSON_COMMITS_READ = 0


class DeltaConcurrentWriteError(RuntimeError):
    """An overwrite lost the optimistic-concurrency race: another commit
    landed after the snapshot this overwrite was based on."""


class DeltaTimeTravelError(RuntimeError):
    """Time travel requested a version whose data files were vacuumed or
    whose log commits were cleaned up — the error names the maintenance
    operation so the failure is attributable, not a mystery FileNotFound."""


_HORIZON = "_horizon.json"


def _read_horizon(table: str) -> dict:
    """{'data_min_version': int|None, 'log_min_version': int|None} — the
    oldest version whose data files (vacuum) / log commits (cleanup) are
    still guaranteed present. Absent file = full history available."""
    p = os.path.join(table, _LOG_DIR, _HORIZON)
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _advance_horizon(table: str, key: str, version: int) -> None:
    """Monotonically raise `key` in the horizon sidecar (crash-safe
    write-temp + rename; a lost race leaves a LOWER horizon, which is
    conservative — never claims availability that was destroyed)."""
    h = _read_horizon(table)
    if (h.get(key) or -1) >= version:
        return
    h[key] = version
    h[key.replace("_min_version", "_at_ms")] = int(time.time() * 1000)
    p = os.path.join(table, _LOG_DIR, _HORIZON)
    tmp = p + f".tmp{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(h, f)
    os.replace(tmp, p)


def _check_travelable(table: str, version: int) -> None:
    h = _read_horizon(table)
    log_min = h.get("log_min_version")
    if log_min is not None and version < log_min:
        raise DeltaTimeTravelError(
            f"version {version} is below the log-retention horizon "
            f"{log_min}: its JSON commits were deleted by "
            "cleanup_delta_log(); earliest time-travelable version is "
            f"{log_min}"
        )
    data_min = h.get("data_min_version")
    if data_min is not None and version < data_min:
        raise DeltaTimeTravelError(
            f"version {version} is below the vacuum horizon {data_min}: "
            "its unreferenced data files were deleted by vacuum_delta(); "
            f"earliest fully-readable version is {data_min}"
        )


def _log_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.json")


def _latest_version(table: str) -> int:
    """Highest committed version, or -1 for a nonexistent/empty log."""
    log = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log):
        return -1
    versions = [
        int(f[:-5]) for f in os.listdir(log) if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(versions, default=-1)


def _read_actions(table: str, version: int) -> list[dict]:
    global _JSON_COMMITS_READ
    _JSON_COMMITS_READ += 1
    with open(_log_path(table, version)) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _checkpoint_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG_DIR, f"{version:020d}.checkpoint.parquet")


def _checkpoint_versions(table: str) -> list[int]:
    """All checkpoint-parquet versions present on disk, sorted ascending."""
    log = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit():
            out.append(int(f[:20]))
    return sorted(out)


def _last_checkpoint_version(table: str) -> int | None:
    """Version `_last_checkpoint` points at, or None (absent/unreadable —
    the protocol says readers fall back to listing + JSON replay)."""
    p = os.path.join(table, _LOG_DIR, _LAST_CHECKPOINT)
    try:
        with open(p) as f:
            v = json.load(f)["version"]
        return v if os.path.exists(_checkpoint_path(table, v)) else None
    except (OSError, ValueError, KeyError):
        return None


def _read_checkpoint(table: str, version: int) -> tuple[dict | None, dict, dict]:
    """Load reconciled (metaData, live adds, txns) from a checkpoint
    parquet. Maps come back from Arrow as (key, value) pair lists."""
    import pyarrow.parquet as pq

    meta = None
    live: dict[str, dict] = {}
    txns: dict[str, int] = {}
    for row in pq.read_table(_checkpoint_path(table, version)).to_pylist():
        if row.get("metaData"):
            m = dict(row["metaData"])
            m["format"] = {"provider": m["format"]["provider"], "options": {}}
            m["configuration"] = {}
            m["partitionColumns"] = list(m.get("partitionColumns") or [])
            meta = m
        elif row.get("add"):
            a = dict(row["add"])
            a["partitionValues"] = dict(a.get("partitionValues") or [])
            live[a["path"]] = a
        elif row.get("txn"):
            t = row["txn"]
            txns[t["appId"]] = max(txns.get(t["appId"], -1), t["version"])
    return meta, live, txns


def _replay(
    table: str, version: int | None = None
) -> tuple[dict | None, dict, dict]:
    """Replay the log up to `version` (inclusive; None = latest), starting
    from the newest checkpoint at or below it when one exists (bounded JSON
    reads for long-running streams). Returns (metaData, {path: add_action}
    for live files, {appId: latest txn version} — the exactly-once
    streaming bookkeeping)."""
    latest = _latest_version(table)
    if latest < 0:
        raise FileNotFoundError(f"not a delta table (no {_LOG_DIR}): {table}")
    upto = latest if version is None else version
    if upto > latest or upto < 0:
        raise ValueError(f"version {version} out of range [0, {latest}]")
    if version is not None:
        _check_travelable(table, version)
    meta = None
    live: dict[str, dict] = {}
    txns: dict[str, int] = {}
    start = 0
    cp = _last_checkpoint_version(table)
    if cp is not None and cp > upto:
        # time travel BELOW the last checkpoint: fall back to the newest
        # on-disk checkpoint at or below the target (after log cleanup the
        # pre-cutoff JSON commits are gone, so replay-from-0 is not an
        # option; within the retention window a base checkpoint exists)
        cp = max((c for c in _checkpoint_versions(table) if c <= upto), default=None)
    if cp is not None and cp <= upto:
        meta, live, txns = _read_checkpoint(table, cp)
        start = cp + 1
    for v in range(start, upto + 1):
        for action in _read_actions(table, v):
            if "metaData" in action:
                meta = action["metaData"]
            elif "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
            elif "txn" in action:
                t = action["txn"]
                txns[t["appId"]] = max(txns.get(t["appId"], -1), t["version"])
    return meta, live, txns


def write_checkpoint(table: str, version: int | None = None) -> str:
    """Reconcile the log at `version` (default latest) into the protocol's
    checkpoint parquet (`%020d.checkpoint.parquet`, one action per row in
    protocol / metaData / add / txn struct columns) and atomically point
    `_delta_log/_last_checkpoint` at it. Remove tombstones are reconciled
    away: this module's vacuum walks the filesystem, it does not consume
    tombstones. Crash-safe — both files land via write-temp + rename.
    `_last_checkpoint` advancement is check-then-rename, so two writers
    checkpointing different versions can interleave such that the pointer
    momentarily lands on the OLDER one; the post-rename re-read below
    self-heals that (rewrites the pointer to the newest checkpoint file on
    disk). A pointer behind the newest checkpoint is never incorrect —
    only extra JSON replay — and readers fall back to listing when the
    pointer is unreadable, per the protocol."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    v = _latest_version(table) if version is None else version
    meta, live, txns = _replay(table, v)
    schema = pa.schema(
        [
            ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                    ("minWriterVersion", pa.int32())])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([("provider", pa.string())])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("createdTime", pa.int64()),
            ])),
            ("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
            ])),
            ("txn", pa.struct([("appId", pa.string()), ("version", pa.int64())])),
        ]
    )
    rows: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    ]
    if meta is not None:
        rows.append(
            {"metaData": {
                "id": meta["id"],
                "format": {"provider": meta["format"]["provider"]},
                "schemaString": meta["schemaString"],
                "partitionColumns": meta.get("partitionColumns", []),
                "createdTime": meta.get("createdTime"),
            }}
        )
    for path in sorted(live):
        a = live[path]
        rows.append(
            {"add": {
                "path": a["path"],
                "partitionValues": list((a.get("partitionValues") or {}).items()),
                "size": a["size"],
                "modificationTime": a["modificationTime"],
                "dataChange": a.get("dataChange", True),
            }}
        )
    for app_id in sorted(txns):
        rows.append({"txn": {"appId": app_id, "version": txns[app_id]}})
    cp_path = _checkpoint_path(table, v)
    tmp = cp_path + f".tmp{uuid.uuid4().hex}"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.replace(tmp, cp_path)

    def _point_at(version: int) -> None:
        lc = os.path.join(table, _LOG_DIR, _LAST_CHECKPOINT)
        t = lc + f".tmp{uuid.uuid4().hex}"
        with open(t, "w") as f:
            json.dump({"version": version, "size": len(rows)}, f)
        os.replace(t, lc)

    prev = _last_checkpoint_version(table)
    if prev is None or v > prev:
        _point_at(v)
        # self-heal the check-then-rename window: if a concurrent writer
        # published a NEWER checkpoint while we were advancing the pointer,
        # our rename may have regressed it — re-read and repair
        newest = max(_checkpoint_versions(table), default=v)
        cur = _last_checkpoint_version(table)
        if cur is None or cur < newest:
            _point_at(newest)
    return cp_path


def _stage_data_files(
    df: DataFrame, table: str, partition_by: list[str] | None
) -> list[dict]:
    """Write df as parquet via Spark into a staging dir, move the part
    files under the table root (keeping Spark's unique part names and any
    hive partition dirs), and return their `add` actions."""
    staging = os.path.join(table, f"_staged_{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    adds = []
    for root, _dirs, files in os.walk(staging):
        rel_dir = os.path.relpath(root, staging)
        for fname in files:
            if not fname.endswith(".parquet"):
                continue  # _SUCCESS, .crc markers
            rel = fname if rel_dir == "." else os.path.join(rel_dir, fname)
            dst = os.path.join(table, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(root, fname), dst)
            part_values = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, val = seg.partition("=")
                    # Spark percent-encodes special chars in hive dir names;
                    # the protocol stores the DECODED value in partitionValues
                    part_values[urllib.parse.unquote(k)] = (
                        None if val == "__HIVE_DEFAULT_PARTITION__"
                        else urllib.parse.unquote(val)
                    )
            st = os.stat(dst)
            adds.append(
                {
                    "add": {
                        # the protocol stores /-separated paths relative to
                        # the table root, percent-encoding left out (our
                        # partition values are plain scalars)
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": part_values,
                        "size": st.st_size,
                        "modificationTime": int(st.st_mtime * 1000),
                        "dataChange": True,
                    }
                }
            )
    shutil.rmtree(staging, ignore_errors=True)
    return adds


def _try_commit(table: str, version: int, actions: list[dict]) -> bool:
    """PUT-IF-ABSENT of version N: True on success, False if N exists."""
    os.makedirs(os.path.join(table, _LOG_DIR), exist_ok=True)
    try:
        with open(_log_path(table, version), "x") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")
        return True
    except FileExistsError:
        return False


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    checkpoint_interval: int | None = DEFAULT_CHECKPOINT_INTERVAL,
) -> int:
    """Commit `df` to the Delta table at `table`; returns the version the
    data lives at.

    mode='append' adds files (schema must equal the table's; blind appends
    retry through concurrency races). mode='overwrite' removes every live
    file and adds the new ones atomically in one commit (raises
    DeltaConcurrentWriteError if another commit lands first).

    `txn=(appId, version)` records the protocol's streaming transaction
    action and makes the commit EXACTLY-ONCE per (appId, version): if the
    table has already seen this appId at >= version, the call is a no-op
    returning the current table version — the at-least-once foreachBatch
    replay contract (the check re-runs after losing a commit race, so two
    replayers cannot both land).

    Every `checkpoint_interval` commits the writer also reconciles the log
    into a protocol checkpoint parquet (see write_checkpoint), keeping
    snapshot reads O(interval) JSON files for long-running streams. Pass
    None to disable (maintenance then calls write_checkpoint directly)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    latest = _latest_version(table)
    first = latest < 0
    if not first:
        meta, live, txns = _replay(table)
        if txn is not None and txns.get(txn[0], -1) >= txn[1]:
            return latest  # replayed micro-batch: exact no-op
        if meta["schemaString"] != df.schema.json():
            raise ValueError(
                "schema mismatch with the table (this minimal writer does "
                f"not evolve schemas): table={meta['schemaString']} "
                f"df={df.schema.json()}"
            )
        if sorted(meta.get("partitionColumns", [])) != sorted(partition_by or []):
            raise ValueError("partition_by must match the table's partitionColumns")
    adds = _stage_data_files(df, table, partition_by)
    now = int(time.time() * 1000)
    base: list[dict] = [
        {"commitInfo": {"timestamp": now, "operation": mode.upper(),
                        "engineInfo": "duckdb_routing_spark minimal delta writer"}}
    ]
    if first:
        base.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        base.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": partition_by or [],
                    "configuration": {},
                    "createdTime": now,
                }
            }
        )
    if txn is not None:
        base.append({"txn": {"appId": txn[0], "version": txn[1]}})
    version = latest + 1
    while True:
        actions = list(base)
        if mode == "overwrite" and not first:
            _, live, _ = _replay(table)
            actions += [
                {"remove": {"path": p, "deletionTimestamp": now, "dataChange": True}}
                for p in sorted(live)
            ]
        actions += adds
        if _try_commit(table, version, actions):
            if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
                write_checkpoint(table, version)
            return version
        if mode == "overwrite":
            raise DeltaConcurrentWriteError(
                f"version {version} was committed concurrently; overwrite "
                "must re-read the table before retrying"
            )
        # blind append: retry after the winner — but if the winner WAS this
        # txn (a replayed twin racing us), the no-op contract still holds
        if txn is not None:
            _, _, txns = _replay(table)
            if txns.get(txn[0], -1) >= txn[1]:
                return _latest_version(table)
        version = _latest_version(table) + 1


def read_delta(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Snapshot read (optionally time-traveled to `version`): replay the
    log, read exactly the LIVE files, then apply the STORED schemaString —
    Spark's hive partition inference would otherwise retype numeric-looking
    partition values (lang='1' coming back int), drifting from the
    metaData the writer enforces on append. basePath recovers the
    hive-partition columns; an empty snapshot returns an empty frame with
    the table schema."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    meta, live, _ = _replay(table, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if not live:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, p) for p in sorted(live)]
    raw = spark.read.option("basePath", table).parquet(*paths)
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def delta_history(table: str) -> list[dict]:
    """commitInfo per version, oldest first — the DESCRIBE HISTORY shape.
    After cleanup_delta_log, history starts at the log horizon (the
    pre-cutoff commits no longer exist)."""
    start = _read_horizon(table).get("log_min_version") or 0
    out = []
    for v in range(start, _latest_version(table) + 1):
        info = next(
            (a["commitInfo"] for a in _read_actions(table, v) if "commitInfo" in a), {}
        )
        out.append({"version": v, **info})
    return out


def optimize_delta(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Bin-packing compaction (Delta's OPTIMIZE): rewrite each hive
    partition's small live files into ~target_file_bytes files and commit
    the swap as ONE version whose add/remove actions carry
    dataChange=false — per the protocol, readers see the same rows before
    and after, and a streaming consumer of the table must NOT re-emit the
    rewritten data. This is the maintenance half of the exactly-once
    streaming sink story: a 1-minute-batch stream lands ~1.4k tiny files a
    day; compaction folds each partition back to a handful, and the
    checkpointed log keeps the read path O(interval) regardless.

    Partitions whose live-file count is below `min_files` are left alone
    (nothing to gain; rewriting them would only churn the log). Returns
    the number of files removed by compaction (0 = no commit was made).
    Like overwrite, OPTIMIZE is read-modify-write: if another commit lands
    between the snapshot read and the commit, DeltaConcurrentWriteError is
    raised and the caller retries on the fresh state (data files written
    for the lost attempt are unreferenced and left to vacuum)."""
    snapshot_version = _latest_version(table)
    meta, live, _ = _replay(table)
    # group live files by their hive partition (the dir part of the path)
    by_part: dict[str, list[str]] = {}
    for p in live:
        by_part.setdefault(os.path.dirname(p), []).append(p)
    removes: list[str] = []
    adds: list[dict] = []
    now = int(time.time() * 1000)
    for part_dir, files in sorted(by_part.items()):
        if len(files) < min_files:
            continue
        total = sum(live[p]["size"] for p in files)
        n_out = max(1, int(total / target_file_bytes) + (1 if total % target_file_bytes else 0))
        if n_out >= len(files):
            continue  # already at or below the target layout
        src = [os.path.join(table, p) for p in sorted(files)]
        staging = os.path.join(table, f"_staged_{uuid.uuid4().hex}")
        spark.read.parquet(*src).coalesce(n_out).write.parquet(staging)
        for fname in os.listdir(staging):
            if not fname.endswith(".parquet"):
                continue
            rel = os.path.join(part_dir, fname) if part_dir else fname
            dst = os.path.join(table, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(staging, fname), dst)
            st = os.stat(dst)
            part_values = dict(live[files[0]].get("partitionValues") or {})
            adds.append(
                {"add": {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": part_values,
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": False,
                }}
            )
        shutil.rmtree(staging, ignore_errors=True)
        removes.extend(files)
    if not removes:
        return 0
    actions: list[dict] = [
        {"commitInfo": {"timestamp": now, "operation": "OPTIMIZE",
                        "engineInfo": "duckdb_routing_spark minimal delta writer"}}
    ]
    actions += [
        {"remove": {"path": p, "deletionTimestamp": now, "dataChange": False}}
        for p in sorted(removes)
    ]
    actions += adds
    # commit strictly at snapshot+1: if ANY commit landed after the replay
    # (even one we could now see via _latest_version), our remove/add sets
    # are stale — an interleaved overwrite could have dropped our source
    # files, and committing compacted copies would resurrect deleted data
    version = snapshot_version + 1
    if not _try_commit(table, version, actions):
        raise DeltaConcurrentWriteError(
            f"version {version} was committed concurrently; OPTIMIZE must "
            "re-read the table before retrying"
        )
    return len(removes)


def vacuum_delta(
    table: str, retain_last: int = 1, grace_seconds: float = 600.0
) -> int:
    """Garbage-collect data files unreferenced by the last `retain_last`
    snapshots (default: only the current one). Returns the number of files
    deleted. The log itself stays intact (bounded separately by
    cleanup_delta_log), but TIME TRAVEL below the retained window no
    longer finds its data files — the protocol's standard retention trade,
    made explicit by the argument instead of a retention clock (a
    deployment maps retain_last to its retention window). When files are
    actually deleted the horizon sidecar records it, so a later time
    travel below the window raises DeltaTimeTravelError naming this
    vacuum instead of a bare FileNotFoundError mid-scan. Crash-safe:
    deletion happens strictly after the retained-set computation, and a
    re-run is a no-op.

    Concurrent-append safety (real Delta VACUUM's modification-time
    retention window, scaled down): an in-flight append stages parquet
    under `_staged_*` and hard-moves files under the table root BEFORE its
    commit lands, so a vacuum racing it would otherwise see those files as
    unreferenced. The walk therefore never descends into `_staged_*` dirs,
    and any file younger than `grace_seconds` (default 10 min — far longer
    than a stage-to-commit window) is left alone. Pass grace_seconds=0
    only when no writer can be running (exclusive maintenance)."""
    latest = _latest_version(table)
    if latest < 0:
        raise FileNotFoundError(f"not a delta table (no {_LOG_DIR}): {table}")
    # clamp to the log horizon: versions below it have no JSON commits to
    # replay (cleanup_delta_log ran), so they cannot be in the retained set
    oldest_retained = max(
        0, latest - retain_last + 1,
        _read_horizon(table).get("log_min_version") or 0,
    )
    retained: set[str] = set()
    for v in range(oldest_retained, latest + 1):
        _, live, _ = _replay(table, v)
        retained |= set(live)
    deleted = 0
    now = time.time()
    for root, dirs, files in os.walk(table):
        dirs[:] = [d for d in dirs if d != _LOG_DIR and not d.startswith("_staged_")]
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, table).replace(os.sep, "/")
            if rel in retained:
                continue
            if grace_seconds and now - os.stat(full).st_mtime < grace_seconds:
                continue
            os.remove(full)
            deleted += 1
    if deleted:
        # record that versions below the retained window may now be missing
        # data files, so time travel there raises DeltaTimeTravelError
        # naming this vacuum instead of a bare FileNotFoundError mid-scan
        _advance_horizon(table, "data_min_version", oldest_retained)
    return deleted


def cleanup_delta_log(
    table: str, retain_versions: int = 100
) -> dict:
    """Bound the `_delta_log` itself — the protocol's metadata-cleanup
    analog (real Delta's delta.logRetentionDuration, expressed in versions
    like vacuum's retain_last). Without this, an exactly-once stream
    appending every minute accumulates JSON commits and checkpoint
    parquets FOREVER even though checkpointed reads never touch the old
    ones.

    Keeps time travel for the newest `retain_versions` versions and
    deletes everything older: let `cutoff = latest - retain_versions + 1`
    (clamped to the last checkpoint — commits at/after the newest
    checkpoint are always kept so the tail replay stays intact). A BASE
    checkpoint is materialized at the cutoff version first (replayed from
    the still-present log), so every retained version remains readable via
    checkpoint + JSON tail; then JSON commits and checkpoint parquets
    strictly below the cutoff are deleted and the log horizon is recorded
    — time travel below it raises DeltaTimeTravelError naming this
    cleanup. Idempotent; returns counts
    {'json_deleted', 'checkpoints_deleted', 'log_min_version'}."""
    latest = _latest_version(table)
    if latest < 0:
        raise FileNotFoundError(f"not a delta table (no {_LOG_DIR}): {table}")
    if retain_versions < 1:
        raise ValueError("retain_versions must be >= 1")
    cutoff = latest - retain_versions + 1
    cp = _last_checkpoint_version(table)
    if cp is not None:
        cutoff = min(cutoff, cp)
    existing_min = _read_horizon(table).get("log_min_version") or 0
    if cutoff <= existing_min or cutoff <= 0:
        return {"json_deleted": 0, "checkpoints_deleted": 0,
                "log_min_version": max(existing_min, 0)}
    # base checkpoint at the cutoff so versions [cutoff, latest] stay
    # readable after the pre-cutoff JSON commits disappear
    if cutoff not in _checkpoint_versions(table):
        write_checkpoint(table, cutoff)
    # horizon FIRST (crash between horizon and deletion leaves a
    # conservative state: reads of old versions error informatively even
    # though their files still exist; the reverse order would leave bare
    # FileNotFoundErrors)
    _advance_horizon(table, "log_min_version", cutoff)
    json_deleted = cp_deleted = 0
    log = os.path.join(table, _LOG_DIR)
    for fname in os.listdir(log):
        if fname.endswith(".json") and fname[:-5].isdigit():
            if int(fname[:-5]) < cutoff:
                os.remove(os.path.join(log, fname))
                json_deleted += 1
        elif fname.endswith(".checkpoint.parquet") and fname[:20].isdigit():
            if int(fname[:20]) < cutoff:
                os.remove(os.path.join(log, fname))
                cp_deleted += 1
    return {"json_deleted": json_deleted, "checkpoints_deleted": cp_deleted,
            "log_min_version": cutoff}
