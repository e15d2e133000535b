"""Minimal Delta-protocol writer/reader (sources/deltalog.py): append /
overwrite / time-travel / partition semantics, the put-if-absent commit
race, and the log's structural conformance to the public protocol — the
dependency-free branch behind the JAR-gated lakehouse sink."""

import json
import os

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.sources import deltalog as dl


def _orders(spark, lo, hi):
    return (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(f"o_orderkey >= {lo} AND o_orderkey < {hi}")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def _canon(df):
    return sorted(map(tuple, df.collect()))


def test_append_roundtrip_and_history(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b = _orders(spark, 0, 300), _orders(spark, 300, 700)
    assert dl.write_delta(a, t) == 0
    assert dl.write_delta(b, t) == 1
    got = dl.read_delta(spark, t)
    assert _canon(got) == _canon(a.unionByName(b))
    assert got.schema == a.schema
    hist = dl.delta_history(t)
    assert [h["version"] for h in hist] == [0, 1]
    assert [h["operation"] for h in hist] == ["APPEND", "APPEND"]


def test_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b = _orders(spark, 0, 300), _orders(spark, 300, 700)
    dl.write_delta(a, t)
    dl.write_delta(b, t, mode="overwrite")
    # live snapshot = overwrite only, even though v0's files are on disk
    assert _canon(dl.read_delta(spark, t)) == _canon(b)
    # time travel back to v0
    assert _canon(dl.read_delta(spark, t, version=0)) == _canon(a)
    with pytest.raises(ValueError, match="out of range"):
        dl.read_delta(spark, t, version=5)


def test_partitioned_writes_recover_partition_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _orders(spark, 0, 500)
    dl.write_delta(df, t, partition_by=["o_orderstatus"])
    dl.write_delta(_orders(spark, 500, 900), t, partition_by=["o_orderstatus"])
    got = dl.read_delta(spark, t)
    want = df.unionByName(_orders(spark, 500, 900))
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got.select(*want.columns)) == _canon(want)
    # add actions carry hive partitionValues per the protocol
    acts = [json.loads(ln) for ln in open(os.path.join(t, "_delta_log", f"{0:020d}.json"))]
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(set(a["partitionValues"]) == {"o_orderstatus"} for a in adds)
    statuses = {a["partitionValues"]["o_orderstatus"] for a in adds}
    assert statuses == {r.o_orderstatus for r in df.select("o_orderstatus").distinct().collect()}


def test_log_structure_matches_protocol(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.write_delta(_orders(spark, 0, 100), t)
    log = os.path.join(t, "_delta_log")
    files = sorted(os.listdir(log))
    assert files == ["0" * 20 + ".json"]  # %020d naming
    acts = [json.loads(ln) for ln in open(os.path.join(log, files[0]))]
    kinds = [next(iter(a)) for a in acts]
    assert kinds[0] == "commitInfo" and "protocol" in kinds and "metaData" in kinds
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    # schemaString is the exact Spark StructType JSON the real writer stores
    from pyspark.sql.types import StructType

    assert StructType.fromJson(json.loads(meta["schemaString"])) == _orders(spark, 0, 100).schema
    adds = [a["add"] for a in acts if "add" in a]
    assert adds
    for a in adds:
        assert a["dataChange"] is True and a["size"] > 0
        assert os.path.exists(os.path.join(t, a["path"]))


def test_append_race_retries_overwrite_race_raises(spark, tmp_path, monkeypatch):
    """Inject a competing commit BETWEEN the snapshot read and the
    put-if-absent (the real race window): the blind append retries at the
    next version; the overwrite refuses to clobber a state it did not
    read."""
    t = str(tmp_path / "t")
    dl.write_delta(_orders(spark, 0, 200), t)

    real_try = dl._try_commit

    def racing_try(table, version, actions, _fired=[]):
        if not _fired:
            _fired.append(True)
            with open(os.path.join(table, "_delta_log", f"{version:020d}.json"), "w") as f:
                f.write(json.dumps({"commitInfo": {"timestamp": 0, "operation": "APPEND"}}) + "\n")
        return real_try(table, version, actions)

    monkeypatch.setattr(dl, "_try_commit", racing_try)
    # blind append loses version 1 to the injected winner, retries, lands at 2
    assert dl.write_delta(_orders(spark, 200, 400), t) == 2

    # fresh race (new _fired cell) for the overwrite
    def racing_try2(table, version, actions, _fired=[]):
        if not _fired:
            _fired.append(True)
            with open(os.path.join(table, "_delta_log", f"{version:020d}.json"), "w") as f:
                f.write(json.dumps({"commitInfo": {"timestamp": 0, "operation": "APPEND"}}) + "\n")
        return real_try(table, version, actions)

    monkeypatch.setattr(dl, "_try_commit", racing_try2)
    with pytest.raises(dl.DeltaConcurrentWriteError):
        dl.write_delta(_orders(spark, 0, 100), t, mode="overwrite")
    # the append's data survived both races intact
    monkeypatch.setattr(dl, "_try_commit", real_try)
    assert dl.read_delta(spark, t).count() == _orders(spark, 0, 400).count()


def test_schema_and_partition_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.write_delta(_orders(spark, 0, 200), t)
    drifted = _orders(spark, 200, 300).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="schema mismatch"):
        dl.write_delta(drifted, t)
    with pytest.raises(ValueError, match="partitionColumns"):
        dl.write_delta(_orders(spark, 200, 300), t, partition_by=["o_orderstatus"])


def test_empty_snapshot_after_overwrite_with_empty_frame(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _orders(spark, 0, 200)
    dl.write_delta(df, t)
    dl.write_delta(df.filter("o_orderkey < 0"), t, mode="overwrite")
    got = dl.read_delta(spark, t)
    assert got.count() == 0 and got.schema == df.schema


def test_streaming_delta_sink_exactly_once(spark, tmp_path):
    """Drained streaming Delta ingestion == the batch table, and a full
    no-checkpoint replay is an exact no-op — the protocol's txn action
    (appId, batch version) makes at-least-once foreachBatch exactly-once."""
    from duckdb_routing_spark.streaming import docs as sd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    in_dir = tmp_path / "din"
    in_dir.mkdir()
    for b in range(3):
        docs.filter(f"doc_id % 3 = {b}").coalesce(1).write.parquet(
            str(in_dir / f"chunk_{b}.parquet")
        )
    t = str(tmp_path / "dtable")

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "chunk_*.parquet"))
        )
        q = sd.streaming_delta_sink(stream, t, app_id="docs-ingest", partition_by=["lang"])
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()
    got = dl.read_delta(spark, t)
    assert _canon(got.select("doc_id", "text", "lang")) == _canon(docs)
    v_before = dl.delta_history(t)[-1]["version"]
    # no-checkpoint restart: every micro-batch replays; txn makes each a no-op
    run_stream()
    assert dl.delta_history(t)[-1]["version"] == v_before
    assert _canon(dl.read_delta(spark, t).select("doc_id", "text", "lang")) == _canon(docs)


def test_vacuum_deletes_only_unreferenced_files(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b = _orders(spark, 0, 300), _orders(spark, 300, 700)
    dl.write_delta(a, t)
    dl.write_delta(b, t, mode="overwrite")
    # grace_seconds=0: exclusive-maintenance mode (files were written
    # milliseconds ago; the default 10-min window would protect them all)
    _, live0, _ = dl._replay(t, 0)  # v0's live set, pre-vacuum
    n = dl.vacuum_delta(t, retain_last=1, grace_seconds=0)
    assert n > 0
    # current snapshot intact; vacuum re-run is a no-op
    assert _canon(dl.read_delta(spark, t)) == _canon(b)
    assert dl.vacuum_delta(t, retain_last=1, grace_seconds=0) == 0
    # v0's files are gone from disk (log/history remain), and time travel
    # there now raises the attributable horizon error
    assert live0 and all(not os.path.exists(os.path.join(t, p)) for p in live0)
    with pytest.raises(dl.DeltaTimeTravelError, match="vacuum_delta"):
        dl._replay(t, 0)
    assert [h["version"] for h in dl.delta_history(t)] == [0, 1]
    # retain_last=2 would have kept both snapshots: rebuild and check
    t2 = str(tmp_path / "t2")
    dl.write_delta(a, t2)
    dl.write_delta(b, t2, mode="overwrite")
    assert dl.vacuum_delta(t2, retain_last=2, grace_seconds=0) == 0
    assert _canon(dl.read_delta(spark, t2, version=0)) == _canon(a)


def test_vacuum_never_races_an_inflight_append(spark, tmp_path):
    """An append stages parquet and hard-moves files under the table root
    BEFORE its commit lands. A concurrent vacuum must not delete them:
    _staged_* dirs are skipped outright, and just-moved (not yet committed)
    files are protected by the modification-time grace window."""
    t = str(tmp_path / "t")
    dl.write_delta(_orders(spark, 0, 300), t)
    dl.write_delta(_orders(spark, 300, 700), t, mode="overwrite")
    # simulate the in-flight append's two windows:
    staged_dir = os.path.join(t, "_staged_deadbeef")
    os.makedirs(staged_dir)
    staged = os.path.join(staged_dir, "part-00000-inflight.parquet")
    moved = os.path.join(t, "part-00000-moved-not-committed.parquet")
    for p in (staged, moved):
        with open(p, "wb") as f:
            f.write(b"PAR1fake")
    # default grace window: both survive; only v0's OLD files would be
    # eligible (and they're also young here, so nothing is deleted at all)
    assert dl.vacuum_delta(t, retain_last=1) == 0
    assert os.path.exists(staged) and os.path.exists(moved)
    # even with grace disabled, the _staged_* dir is never entered
    deleted = dl.vacuum_delta(t, retain_last=1, grace_seconds=0)
    assert deleted > 0  # v0's files + the moved-but-uncommitted orphan
    assert os.path.exists(staged)
    assert _canon(dl.read_delta(spark, t)) == _canon(_orders(spark, 300, 700))


def test_checkpoint_bounds_snapshot_reads(spark, tmp_path):
    """25 commits at checkpoint_interval=10 → checkpoints at v10 and v20;
    a snapshot read replays the v20 checkpoint + at most 5 JSON commits,
    not all 25. Time travel to a pre-checkpoint version still works (full
    JSON replay), and txn exactly-once state survives checkpointing."""
    t = str(tmp_path / "t")
    df = _orders(spark, 0, 100)
    for v in range(25):
        got_v = dl.write_delta(
            df, t, txn=("ckpt-app", v), checkpoint_interval=10
        )
        assert got_v == v
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{10:020d}.checkpoint.parquet"))
    assert os.path.exists(os.path.join(log, f"{20:020d}.checkpoint.parquet"))
    assert json.load(open(os.path.join(log, "_last_checkpoint")))["version"] == 20
    dl._JSON_COMMITS_READ = 0
    got = dl.read_delta(spark, t)
    assert dl._JSON_COMMITS_READ <= 5  # v21..v24 only
    assert got.count() == df.count() * 25
    # txn bookkeeping carried through the checkpoint: replaying an old
    # micro-batch is still an exact no-op
    assert dl.write_delta(df, t, txn=("ckpt-app", 3)) == 24
    assert dl.delta_history(t)[-1]["version"] == 24
    # time travel below the checkpoint falls back to full JSON replay
    assert dl.read_delta(spark, t, version=2).count() == df.count() * 3
    # schema still enforced post-checkpoint
    with pytest.raises(ValueError, match="schema mismatch"):
        dl.write_delta(df.withColumn("x", F.lit(1)), t)


def test_checkpoint_makes_thousand_commit_log_readable(spark, tmp_path):
    """A week-long exactly-once stream is ~1e4 commits; the read path must
    not replay them all. Synthesize 1,000 commits (each adds+removes a
    phantom path — no live change), checkpoint, and pin that the snapshot
    read parses ZERO JSON commit files."""
    t = str(tmp_path / "t")
    df = _orders(spark, 0, 100)
    dl.write_delta(df, t, checkpoint_interval=None)
    for v in range(1, 1000):
        phantom = f"phantom-{v}.parquet"
        ok = dl._try_commit(
            t,
            v,
            [
                {"commitInfo": {"timestamp": 0, "operation": "APPEND"}},
                {"add": {"path": phantom, "partitionValues": {}, "size": 1,
                         "modificationTime": 0, "dataChange": True}},
                {"remove": {"path": phantom, "deletionTimestamp": 0,
                            "dataChange": True}},
            ],
        )
        assert ok
    dl.write_checkpoint(t)
    dl._JSON_COMMITS_READ = 0
    got = dl.read_delta(spark, t)
    assert dl._JSON_COMMITS_READ == 0
    assert _canon(got) == _canon(df)


def test_optimize_compacts_small_files_without_changing_data(spark, tmp_path):
    """OPTIMIZE folds each partition's small per-commit files into
    ~target-size files in ONE dataChange=false commit: rows identical
    before/after, live-file count drops, time travel to the pre-OPTIMIZE
    version still works (until vacuum), vacuum then reclaims exactly the
    compacted-away files, and a re-run is a no-op."""
    t = str(tmp_path / "t")
    for i in range(4):  # 4 appends -> >=4 small files per partition
        dl.write_delta(_orders(spark, i * 100, (i + 1) * 100), t,
                       partition_by=["o_orderstatus"])
    canon_before = _canon(dl.read_delta(spark, t))
    _, live_before, _ = dl._replay(t)
    v_before = dl._latest_version(t)
    n_removed = dl.optimize_delta(spark, t, target_file_bytes=1 << 30)
    assert n_removed > 0
    _, live_after, _ = dl._replay(t)
    assert len(live_after) < len(live_before)
    assert _canon(dl.read_delta(spark, t)) == canon_before
    # one OPTIMIZE commit, every add/remove marked dataChange=false
    hist = dl.delta_history(t)
    assert hist[-1]["operation"] == "OPTIMIZE"
    acts = dl._read_actions(t, dl._latest_version(t))
    touched = [a for a in acts if "add" in a or "remove" in a]
    assert touched and all(
        (a.get("add") or a.get("remove"))["dataChange"] is False for a in touched
    )
    # time travel to the pre-OPTIMIZE snapshot still reads the old files
    assert _canon(dl.read_delta(spark, t, version=v_before)) == canon_before
    # re-run: nothing left to compact
    assert dl.optimize_delta(spark, t, target_file_bytes=1 << 30) == 0
    # vacuum reclaims exactly the compacted-away files
    assert dl.vacuum_delta(t, retain_last=1, grace_seconds=0) == n_removed
    assert _canon(dl.read_delta(spark, t)) == canon_before


def test_partition_values_are_percent_decoded_and_schema_applied(spark, tmp_path):
    """Spark percent-encodes special chars in hive dir names and infers
    partition types on read; the protocol stores DECODED values and the
    table's declared schema wins (lang='1' must come back string)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a b/c"), (2, "1"), (3, "plain")], "id int, lang string"
    )
    dl.write_delta(df, t, partition_by=["lang"])
    acts = [json.loads(ln) for ln in open(os.path.join(t, "_delta_log", f"{0:020d}.json"))]
    vals = {a["add"]["partitionValues"]["lang"] for a in acts if "add" in a}
    assert vals == {"a b/c", "1", "plain"}
    got = dl.read_delta(spark, t)
    assert got.schema == df.schema  # no int inference for lang='1'
    assert _canon(got.select("id", "lang")) == _canon(df)


def _contend_commits(args):
    """Worker for the multiprocess put-if-absent test: land `n` blind
    append-style commits, each retrying at the next version on loss."""
    table, worker, n = args
    from duckdb_routing_spark.sources import deltalog as dlw

    landed = []
    for i in range(n):
        marker = f"w{worker}-c{i}"
        while True:
            v = dlw._latest_version(table) + 1
            ok = dlw._try_commit(
                table, v,
                [{"commitInfo": {"timestamp": 0, "operation": "APPEND", "marker": marker}},
                 {"add": {"path": f"{marker}.parquet", "partitionValues": {},
                          "size": 1, "modificationTime": 0, "dataChange": True}}],
            )
            if ok:
                landed.append(v)
                break
    return landed


def test_put_if_absent_commit_under_real_process_contention(tmp_path):
    """Four PROCESSES hammer the same log with blind appends (no
    monkeypatched race — real open(..., 'x') contention on one directory):
    every commit must land at a unique version, the version sequence must
    be gapless, and every worker's markers must appear exactly once."""
    import multiprocessing as mp

    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, dl._LOG_DIR))
    workers, per = 4, 25
    with mp.get_context("spawn").Pool(workers) as pool:
        out = pool.map(_contend_commits, [(t, w, per) for w in range(workers)])
    all_versions = sorted(v for lst in out for v in lst)
    assert all_versions == list(range(workers * per))  # gapless, no double-land
    markers = []
    for v in range(workers * per):
        acts = dl._read_actions(t, v)
        markers += [a["commitInfo"]["marker"] for a in acts if "commitInfo" in a]
    assert sorted(markers) == sorted(
        f"w{w}-c{i}" for w in range(workers) for i in range(per)
    )


def test_deltalog_datasource_batch_matches_read_delta(spark, tmp_path):
    """format('deltalog') batch read == read_delta: same schema (declared
    types win, partition values from the protocol's partitionValues) and
    same rows, through executor-side pyarrow file reads."""
    from duckdb_routing_spark.sources.delta_datasource import DeltaLogDataSource

    spark.dataSource.register(DeltaLogDataSource)
    t = str(tmp_path / "t")
    dl.write_delta(_orders(spark, 0, 300), t, partition_by=["o_orderstatus"])
    dl.write_delta(_orders(spark, 300, 700), t, partition_by=["o_orderstatus"])
    got = spark.read.format("deltalog").load(t)
    want = dl.read_delta(spark, t)
    assert got.schema == want.schema
    assert _canon(got.select(*want.columns)) == _canon(want)


def test_deltalog_streaming_source_incremental_and_optimize_invisible(spark, tmp_path):
    """The streaming source delivers each commit's dataChange=true adds
    exactly once: batch 1 = the existing table, batch 2 = only the new
    append, and an OPTIMIZE commit between triggers emits NOTHING (its
    adds carry dataChange=false — rewritten rows must not re-stream)."""
    from duckdb_routing_spark.sources.delta_datasource import DeltaLogDataSource

    spark.dataSource.register(DeltaLogDataSource)
    t = str(tmp_path / "t")
    a, b = _orders(spark, 0, 300), _orders(spark, 300, 700)
    dl.write_delta(a, t, partition_by=["o_orderstatus"])

    q = (
        spark.readStream.format("deltalog").load(t)
        .writeStream.format("memory").queryName("delta_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = _canon(spark.sql("SELECT * FROM delta_stream_t").select(*a.columns))
        assert got1 == _canon(a)
        # incremental append -> only the delta arrives
        dl.write_delta(b, t, partition_by=["o_orderstatus"])
        q.processAllAvailable()
        got2 = _canon(spark.sql("SELECT * FROM delta_stream_t").select(*a.columns))
        assert got2 == _canon(a.unionByName(b))
        # OPTIMIZE rewrites files with dataChange=false: stream sees nothing
        removed = dl.optimize_delta(spark, t, target_file_bytes=1 << 30)
        assert removed > 0
        q.processAllAvailable()
        got3 = _canon(spark.sql("SELECT * FROM delta_stream_t").select(*a.columns))
        assert got3 == got2
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# round 10: startingVersion inclusivity, rate limiting, typed partitions,
# checkpoint-pointer self-heal, log retention + horizon errors
# ---------------------------------------------------------------------------


def test_streaming_starting_version_is_inclusive(spark, tmp_path):
    """startingVersion=N delivers version N's adds (inclusive, like the
    real Delta source) — N=0 returns the genesis commit's data, N=1 skips
    exactly version 0."""
    from duckdb_routing_spark.sources.delta_datasource import DeltaLogDataSource

    spark.dataSource.register(DeltaLogDataSource)
    t = str(tmp_path / "t")
    a, b = _orders(spark, 0, 300), _orders(spark, 300, 700)
    dl.write_delta(a, t)       # version 0
    dl.write_delta(b, t)       # version 1

    for sv, want in ((0, a.unionByName(b)), (1, b)):
        name = f"delta_sv_{sv}"
        q = (
            spark.readStream.format("deltalog")
            .option("startingVersion", str(sv)).load(t)
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt{sv}"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = _canon(spark.sql(f"SELECT * FROM {name}").select(*a.columns))
            assert got == _canon(want), f"startingVersion={sv}"
        finally:
            q.stop()


def test_streaming_max_versions_per_trigger_batches(spark, tmp_path):
    """maxVersionsPerTrigger=K advances the offset at most K log versions
    per latestOffset call (driver-side reader contract), and an end-to-end
    stream still drains the whole table across several micro-batches."""
    from duckdb_routing_spark.sources.delta_datasource import (
        DeltaLogDataSource,
        _DeltaStreamReader,
    )

    spark.dataSource.register(DeltaLogDataSource)
    t = str(tmp_path / "t")
    chunks = [_orders(spark, i * 100, (i + 1) * 100) for i in range(5)]
    for c in chunks:
        dl.write_delta(c, t)  # versions 0..4

    # reader-level offset pinning: batch ends advance 2 versions at a time
    r = _DeltaStreamReader(t, None, {"maxversionspertrigger": "2"})
    assert r.initialOffset() == {"version": -1}
    ends = []
    for _ in range(4):
        end = r.latestOffset()
        ends.append(end["version"])
        list(r.partitions({"version": ends[-2] if len(ends) > 1 else -1}, end))
    assert ends == [1, 3, 4, 4]

    # end-to-end: all rows arrive despite the cap
    q = (
        spark.readStream.format("deltalog")
        .option("maxVersionsPerTrigger", "2").load(t)
        .writeStream.format("memory").queryName("delta_mvpt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        want = chunks[0]
        for c in chunks[1:]:
            want = want.unionByName(c)
        got = _canon(spark.sql("SELECT * FROM delta_mvpt").select(*want.columns))
        assert got == _canon(want)
        assert len(q.recentProgress) >= 3  # drained in capped batches
    finally:
        q.stop()


def test_datasource_partition_casts_date_and_decimal(spark, tmp_path):
    """date / decimal partition columns are reconstructed with their
    DECLARED types from the protocol's partitionValues strings (not leaked
    as Python str, which would fail Arrow conversion executor-side)."""
    import datetime
    from decimal import Decimal

    from duckdb_routing_spark.sources.delta_datasource import DeltaLogDataSource

    spark.dataSource.register(DeltaLogDataSource)
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 2), Decimal("12.34")),
         (2, datetime.date(2024, 1, 3), Decimal("56.78"))],
        "id int, d date, amt decimal(10,2)",
    )
    dl.write_delta(df, t, partition_by=["d", "amt"])
    got = spark.read.format("deltalog").load(t)
    assert got.schema == dl.read_delta(spark, t).schema
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["d"] == datetime.date(2024, 1, 2)
    assert rows[1]["amt"] == Decimal("12.34")
    assert rows[2]["d"] == datetime.date(2024, 1, 3)
    assert rows[2]["amt"] == Decimal("56.78")


def test_checkpoint_pointer_self_heals_to_newest(spark, tmp_path):
    """Writing an OLDER checkpoint while a newer checkpoint parquet exists
    but the pointer is missing/behind ends with the pointer at the NEWEST
    checkpoint on disk (the check-then-rename interleave repair)."""
    t = str(tmp_path / "t")
    for i in range(6):
        dl.write_delta(_orders(spark, i * 50, (i + 1) * 50), t,
                       checkpoint_interval=None)
    dl.write_checkpoint(t, 5)
    os.remove(os.path.join(t, dl._LOG_DIR, dl._LAST_CHECKPOINT))
    # pointer gone; a (stale) writer checkpoints version 2
    dl.write_checkpoint(t, 2)
    assert dl._last_checkpoint_version(t) == 5
    # and both checkpoints remain readable bases for time travel
    assert len(dl.read_delta(spark, t, version=2).collect()) == 150


def _tiny_commit_table(t: str, n_commits: int, checkpoint_interval: int = 25):
    """A delta table with `n_commits` single-file commits written WITHOUT
    Spark (pyarrow data files + direct log commits) so log-scale tests run
    in milliseconds. Schema: (id long, v long); commit i adds one file
    holding row (i, i*10)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StructField, StructType

    schema_json = StructType(
        [StructField("id", LongType()), StructField("v", LongType())]
    ).json()
    os.makedirs(t, exist_ok=True)
    now = 1700000000000
    for i in range(n_commits):
        fname = f"part-{i:05d}.parquet"
        pq.write_table(
            pa.table({"id": [i], "v": [i * 10]}),
            os.path.join(t, fname),
        )
        actions = [
            {"commitInfo": {"timestamp": now + i, "operation": "APPEND"}}
        ]
        if i == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {"metaData": {
                    "id": "tiny-commit-table",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now,
                }}
            )
        actions.append(
            {"add": {
                "path": fname,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(t, fname)),
                "modificationTime": now + i,
                "dataChange": True,
            }}
        )
        assert dl._try_commit(t, i, actions)
        if checkpoint_interval and i > 0 and i % checkpoint_interval == 0:
            dl.write_checkpoint(t, i)


def test_cleanup_delta_log_bounds_log_and_time_travel_errors(spark, tmp_path):
    """After cleanup_delta_log on a long-history table: the _delta_log file
    count is bounded by the retention window, the current snapshot and every
    retained version stay readable (base checkpoint at the cutoff), and time
    travel below the horizon raises DeltaTimeTravelError naming the cleanup."""
    t = str(tmp_path / "t")
    n = 200
    _tiny_commit_table(t, n, checkpoint_interval=25)

    res = dl.cleanup_delta_log(t, retain_versions=20)
    # cutoff = min(latest - retain + 1, last checkpoint) = min(180, 175)
    assert res["log_min_version"] == 175
    assert res["json_deleted"] > 0
    log_files = os.listdir(os.path.join(t, dl._LOG_DIR))
    # bounded: retained JSON tail + >=1 checkpoint + pointer + horizon
    assert len([f for f in log_files if f.endswith(".json")]) <= 26
    assert len(log_files) < 35

    # current snapshot: all n rows
    assert dl.read_delta(spark, t).count() == n
    # retained old version reads green via the base checkpoint
    lm = res["log_min_version"]
    assert dl.read_delta(spark, t, version=lm).count() == lm + 1
    assert dl.read_delta(spark, t, version=n - 3).count() == n - 2
    # below the horizon: informative error, not FileNotFoundError
    with pytest.raises(dl.DeltaTimeTravelError, match="cleanup_delta_log"):
        dl.read_delta(spark, t, version=lm - 1)
    # idempotent
    res2 = dl.cleanup_delta_log(t, retain_versions=20)
    assert res2["json_deleted"] == 0
    # history starts at the horizon
    hist = dl.delta_history(t)
    assert hist[0]["version"] == lm and hist[-1]["version"] == n - 1


def test_vacuum_records_horizon_and_time_travel_errors(spark, tmp_path):
    """After a vacuum that actually deletes files, time travel below the
    retained window raises DeltaTimeTravelError naming vacuum_delta."""
    t = str(tmp_path / "t")
    dl.write_delta(_orders(spark, 0, 300), t)                  # v0
    dl.write_delta(_orders(spark, 300, 700), t, mode="overwrite")  # v1
    assert dl.vacuum_delta(t, retain_last=1, grace_seconds=0) > 0
    with pytest.raises(dl.DeltaTimeTravelError, match="vacuum_delta"):
        dl.read_delta(spark, t, version=0)
    # current snapshot unaffected
    assert dl.read_delta(spark, t).count() == len(_orders(spark, 300, 700).collect())
