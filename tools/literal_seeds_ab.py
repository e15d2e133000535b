"""A/B: createDataFrame vs single-expr-string literal plan for the two
remaining pandas-sourced artifact tables (VERDICT r10 ask #6) —
clustering.centroids_df (cell, svec: k x dim doubles) and bpe.merges_df
(rank, left, right strings).

The r10 literal_df rejection was based on the per-element F.lit build
cost; the open question was whether a SINGLE F.expr string parse (the
trick that made the 256-term weight array cheap) changes the verdict.
Measured here per variant: DataFrame BUILD time (py4j + parse + analysis)
and per-ACTION time (the pickled ExistingRDD scan re-serializes rows per
action; a literal plan does not). Values asserted equal first.

Usage: python tools/literal_seeds_ab.py [--rounds 5] [--k 1000] [--dim 64]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    def arg(flag, default):
        return type(default)(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    rounds = arg("--rounds", 5)
    k = arg("--k", 1000)
    dim = arg("--dim", 64)

    from duckdb_routing_spark.session import get_spark

    spark = get_spark(app_name="literal_seeds_ab", master=f"local[{os.cpu_count() or 4}]",
                      shuffle_partitions=4)
    rng = np.random.default_rng(7)
    cents = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(k)]
    merges = [(f"tok{i}", f"en{i}") for i in range(200)]

    def cdf_pandas():
        return spark.createDataFrame(
            [(c, list(map(float, v))) for c, v in cents], "cell INT, svec ARRAY<DOUBLE>"
        )

    def cdf_literal():
        rows = ",".join(
            "struct(%d, array(%s))" % (c, ",".join(repr(x) for x in v)) for c, v in cents
        )
        return spark.range(1).selectExpr(f"inline(array({rows}))").toDF("cell", "svec")

    def mdf_pandas():
        return spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(merges)], "rank INT, l STRING, r STRING"
        )

    def mdf_literal():
        rows = ",".join(
            "struct(%d, %s, %s)" % (i, repr(a), repr(b)) for i, (a, b) in enumerate(merges)
        )
        return spark.range(1).selectExpr(f"inline(array({rows}))").toDF("rank", "l", "r")

    out = {}
    for name, variants in (
        ("centroids", {"pandas": cdf_pandas, "literal": cdf_literal}),
        ("merges", {"pandas": mdf_pandas, "literal": mdf_literal}),
    ):
        vals = {v: sorted(map(tuple, fn().collect())) for v, fn in variants.items()}
        assert vals["pandas"] == vals["literal"], f"{name}: values differ"
        res = {}
        for v, fn in variants.items():
            builds, actions = [], []
            for r in range(rounds):
                spark.sparkContext.setJobDescription(f"lit_ab:{name}:{v}:r{r}")
                t0 = time.perf_counter()
                df = fn()
                builds.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                actions.append(time.perf_counter() - t0)
            res[v] = {
                "build_min": round(min(builds), 3),
                "action_min": round(min(actions), 3),
                "total_min": round(min(b + a for b, a in zip(builds, actions)), 3),
            }
            print(f"# {name}/{v}: build {min(builds):.3f} action {min(actions):.3f}",
                  file=sys.stderr)
        out[name] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
