"""Measured Spark-vs-DuckDB ratio on the headline set, noise-resistant.

Runs bench-identical Spark rounds and baseline-identical DuckDB rounds
INTERLEAVED (S,D,S,D,...) so an outside-VM noise burst poisons one round of
both engines rather than all runs of one engine, takes per-query best-of-N
for each side, and prints ONE JSON line:

  {"spark_total": s, "duckdb_total": s, "ratio": r,
   "queries": {name: {"spark": s, "duckdb": s, "ratio": r}},
   "skipped": [names without an oracle], "sf": 0.1}

The ratio excludes oracle-less queries (rows-only probes) from BOTH totals.
Usage: python tools/ratio.py   # env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
                               #      SPARK_GRAFT_BENCH_RUNS (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_routing_spark.queries import REGISTRY  # noqa: E402
from duckdb_routing_spark.session import (  # noqa: E402
    bench_session_conf,
    get_spark,
    warm_bench_session,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    # Spark side: the exact bench.py session config + warmup, imported from
    # the single source of truth (session.bench_session_conf) so the two
    # harnesses cannot drift
    spark = get_spark(
        app_name="ratio",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf=bench_session_conf(shuffle),
    )
    warm_bench_session(spark, sf_dir, cpus)

    # DuckDB side: the exact baseline_duckdb.py setup
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    headline = {n: s for n, s in sorted(REGISTRY.items()) if s.headline}
    skipped = [n for n, s in headline.items() if not s.oracle]
    # bench.py methodology: build each plan ONCE (py4j plan-construction
    # chatter is per-program, not per-run), clear caches before every timed
    # run so the full data path re-executes inside the timing
    plans = {name: spec.fn(spark, sf_dir) for name, spec in headline.items()}

    # per-query session-conf overrides (QuerySpec.session_conf) — the same
    # resolution + apply/restore bench.py does, so the two harnesses measure
    # the same physical plans
    from contextlib import contextmanager

    overrides: dict[str, dict] = {}
    for name, spec in headline.items():
        if spec.session_conf:
            ov = (spec.session_conf(spark, sf_dir) if callable(spec.session_conf)
                  else dict(spec.session_conf))
            if ov:
                overrides[name] = ov

    @contextmanager
    def query_conf(name):
        ov = overrides.get(name)
        if not ov:
            yield
            return
        saved = {k: spark.conf.get(k) for k in ov}
        for k, v in ov.items():
            spark.conf.set(k, v)
        try:
            yield
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    sp: dict[str, float] = {}
    dd: dict[str, float] = {}
    # bench.py's untimed warm round: both engines execute everything once
    # before measurement so cold IO / codegen / first-touch costs never
    # land in a timed best-of
    for name, spec in headline.items():
        spark.catalog.clearCache()
        with query_conf(name):
            plans[name].count()
        if spec.oracle:
            con.execute(spec.oracle).fetchall()
    for r in range(runs):
        for name in headline:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            with query_conf(name):
                plans[name].count()
            dt = time.perf_counter() - t0
            sp[name] = min(sp.get(name, float("inf")), dt)
        for name, spec in headline.items():
            if not spec.oracle:
                continue
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            dd[name] = min(dd.get(name, float("inf")), time.perf_counter() - t0)

    # paired settling round, BOTH engines (bench.py rationale: the heavy
    # driver-side builders leave the next single-task Arrow query 2-3x
    # slower for exactly one execution; the first back-to-back run absorbs
    # the interference, the second samples steady state — symmetric
    # treatment keeps the comparison fair)
    for name in headline:
        with query_conf(name):
            spark.catalog.clearCache()
            plans[name].count()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            plans[name].count()
            sp[name] = min(sp.get(name, float("inf")), time.perf_counter() - t0)
    for name, spec in headline.items():
        if not spec.oracle:
            continue
        con.execute(spec.oracle).fetchall()
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        dd[name] = min(dd.get(name, float("inf")), time.perf_counter() - t0)

    per = {
        n: {
            "spark": round(sp[n], 4),
            "duckdb": round(dd[n], 4),
            "ratio": round(sp[n] / dd[n], 2) if dd[n] > 0 else None,
        }
        for n in sorted(dd)
    }
    s_tot = sum(sp[n] for n in dd)
    d_tot = sum(dd.values())
    print(
        json.dumps(
            {
                "spark_total": round(s_tot, 4),
                "duckdb_total": round(d_tot, 4),
                "ratio": round(s_tot / d_tot, 3),
                "queries": per,
                "skipped": skipped,
                "sf": sf_dir,
                # effective session knobs: bench_session_conf honors
                # SPARK_GRAFT_AQE, so published ratios must carry what the
                # session actually ran with (ADVICE r8)
                "conf": {
                    "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
                    "shuffle_partitions": shuffle,
                    "cpus": cpus,
                    "runs": runs,
                    **({"query_overrides": overrides} if overrides else {}),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
