"""Emulate the driver's correctness gate end to end, standalone.

Loads `__spark_entry__.py` under a DEFAULT-config SparkSession (no UTC
pinning, no nanosAsLong — the entry module must self-provision, exactly
like the driver), runs every `queries()` entry at the given sf, and
hash-compares each against its `oracle_sql()` through stock DuckDB the way
the driver does: sort columns by name, sort rows, csv with
float_format='%.17g', md5. Runs the whole set in SHUFFLED order (flag
cross-query state leaks: temp views, persisted frames, engine broadcasts).

Usage:
    python tools/driver_emulation.py [sf_dir] [--seed N]
Exit code 0 iff every oracled query matches.
"""

from __future__ import annotations

import hashlib
import os
import random
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False, float_format="%.17g").encode()).hexdigest()


def dtype_kinds(pdf) -> dict[str, str]:
    """Per-column pandas dtype *kind* (i/u/f/b/O/M/...), unsigned folded
    into signed.  The r6 driver red row (doc_quality_classifier) was an
    oracle whose DuckDB HUGEINT sum came back as float64 while Spark emitted
    int64 — values equal, CSV text different ('-123.0' vs '-123') under the
    driver's hasher but identical under ours because float_format='%.17g'
    renders -123.0 as -123.  Comparing kinds catches that class locally."""
    return {c: ("i" if pdf[c].dtype.kind == "u" else pdf[c].dtype.kind) for c in pdf.columns}


def canon_compare(spdf, opdf) -> tuple[bool, str]:
    """Strict driver-style compare: value hash AND per-column dtype kind.

    Returns (ok, reason).  A kind mismatch between an integer column on one
    side and a float column on the other is a failure even when the %.17g
    value hashes agree — the driver's hasher is not guaranteed to
    canonicalize trailing '.0', so typing drift must fail locally too."""
    if canon_hash(spdf) != canon_hash(opdf):
        return False, "value-hash"
    sk, ok_ = dtype_kinds(spdf), dtype_kinds(opdf)
    drift = {
        c
        for c in set(sk) & set(ok_)
        if sk[c] != ok_[c] and {sk[c], ok_[c]} <= {"i", "f"}
    }
    if drift:
        return False, f"dtype-kind drift (int vs float): {sorted(drift)}"
    return True, ""


def main() -> int:
    argv = sys.argv[1:]
    seed = 4
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i : i + 2]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = SparkSession.builder.master(f"local[{os.cpu_count() or 8}]").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = entry.queries(), entry.oracle_sql()
    names = sorted(qs)
    random.Random(seed).shuffle(names)
    if only is not None:
        names = [n for n in names if n in only]
    failures: list[str] = []
    for name in names:
        try:
            spdf = qs[name](spark, sf).toPandas()
            if name not in osql:
                print(f"{name}: rows-only ({len(spdf)} rows)")
                continue
            opdf = con.execute(osql[name]).fetchdf()
            ok, why = canon_compare(spdf, opdf)
            tag = "MATCH" if ok else f"MISMATCH [{why}]"
            print(f"{name}: {tag} ({len(spdf)}/{len(opdf)} rows)")
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue like the driver
            failures.append(name)
            print(f"{name}: ERROR {str(e)[:160]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} ok; failures: {failures or 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
