"""Per-batch latency vs batch size for the stateful streaming events
family (VERDICT r10 ask #7): the standing scale claim is that the fixed
per-micro-batch cost (state store commit + sink write + planning) is a
CONSTANT that amortizes as batches carry more rows. This measures it:
the sf events table is split into K chunk files (1 file = 1 micro-batch),
the applyInPandasWithState sessionizer + the windowed hourly aggregate are
driven to completion, and per-batch wall/rows come from the query progress
feed. One JSON line; --out appends.

Usage:
  python tools/stream_floor.py [--sf-dir /root/testdata/sf0.1]
                               [--chunks 16,8,4,2,1] [--out FILE]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    def arg(flag: str, default):
        return type(default)(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    sf_dir = arg("--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    chunk_list = [int(c) for c in arg("--chunks", "16,8,4,2,1").split(",")]
    out_file = arg("--out", "")

    from duckdb_routing_spark.session import get_spark
    from duckdb_routing_spark.streaming import events as sev

    spark = get_spark(app_name="stream_floor", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=4)
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_rows = src.count()
    work = tempfile.mkdtemp(prefix="stream_floor_")
    results = []
    try:
        for chunks in chunk_list:
            cdir = os.path.join(work, f"events_{chunks}")
            os.makedirs(cdir)
            # deterministic contiguous split by event_id so every layout
            # carries the same rows; each chunk is ONE file -> one batch
            ids = src.select("event_id").orderBy("event_id").collect()
            lo, hi = ids[0].event_id, ids[-1].event_id
            step = (hi - lo + 1 + chunks - 1) // chunks
            for i in range(chunks):
                (
                    src.filter(
                        (F.col("event_id") >= lo + i * step)
                        & (F.col("event_id") < lo + (i + 1) * step)
                    )
                    .coalesce(1)
                    .write.mode("overwrite")
                    # chunk 0 is named exactly events.parquet: the stream
                    # reader probes that path for the ts physical type and
                    # globs events*.parquet for the batches
                    .parquet(os.path.join(
                        cdir, "events.parquet" if i == 0 else f"events_{i}.parquet"))
                )
            for name, build in (
                ("sessionize_stateful", lambda s: sev.sessionize_stateful(s)),
                ("hourly_counts", lambda s: sev.streaming_hourly_counts(s)),
            ):
                stream = sev.read_events_stream(spark, cdir)
                spark.sparkContext.setJobDescription(
                    f"stream_floor:{name}:chunks={chunks}"
                )
                q = (
                    build(stream)
                    .writeStream.outputMode(
                        "append" if name == "sessionize_stateful" else "update"
                    )
                    .format("memory")
                    .queryName(f"sf_{name}_{chunks}")
                    .start()
                )
                q.processAllAvailable()
                prog = [
                    json.loads(p if isinstance(p, str) else p.json)
                    for p in q.recentProgress
                ]
                q.stop()
                batches = [
                    {
                        "rows": p["numInputRows"],
                        "sec": round(p["durationMs"]["triggerExecution"] / 1000.0, 3),
                    }
                    for p in prog
                    if p["numInputRows"] > 0
                ]
                steady = batches[1:] or batches  # batch 0 pays stream/JVM warmup
                med = sorted(b["sec"] for b in steady)[len(steady) // 2]
                rows_med = sorted(b["rows"] for b in steady)[len(steady) // 2]
                results.append(
                    {
                        "op": name,
                        "chunks": chunks,
                        "rows_per_batch": rows_med,
                        "sec_per_batch_med": med,
                        "us_per_row": round(med / max(rows_med, 1) * 1e6, 1),
                        "batches": batches,
                    }
                )
                print(
                    f"# {name} chunks={chunks}: ~{rows_med} rows/batch, "
                    f"{med:.2f}s/batch steady ({med / max(rows_med, 1) * 1e6:.0f} us/row)",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    line = json.dumps({"n_rows": n_rows, "points": results})
    print(line)
    if out_file:
        with open(out_file, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
