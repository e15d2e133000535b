"""Measured DuckDB baseline for the headline bench set.

Runs the SAME oracle SQL that the driver's correctness harness executes
(`__spark_entry__.oracle_sql()`) through stock DuckDB against the SAME
parquet tables bench.py reads, and prints ONE JSON line mirroring
bench.py's shape — so the Spark-vs-DuckDB ratio is measured, not
estimated.  Queries without an oracle (rows-only probes, e.g.
route_batch_throughput) are skipped and listed under "skipped".

Usage:  python baseline_duckdb.py            # sf0.1, best-of-4
        SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_RUNS=... python baseline_duckdb.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_routing_spark.queries import REGISTRY  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))

    con = duckdb.connect()
    # match the driver harness: each table pre-registered as a view over parquet
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    headline = {n: s for n, s in sorted(REGISTRY.items()) if s.headline}
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for r in range(runs):
        for name, spec in headline.items():
            if not spec.oracle:
                if r == 0:
                    skipped.append(name)
                continue
            t0 = time.perf_counter()
            n = len(con.execute(spec.oracle).fetchall())
            dt = time.perf_counter() - t0
            if dt < timings.get(name, float("inf")):
                timings[name] = dt
            if r == runs - 1:
                print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    timings = {k: round(v, 4) for k, v in timings.items()}

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "duckdb_baseline_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "skipped": skipped,
        "sf": float(sf) if sf else sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
