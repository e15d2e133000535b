"""Self-check of the driver's correctness gate: run every registered query's
Spark implementation AND its DuckDB oracle on the same parquet tables,
canonicalize (sort columns by name, sort rows), and require EXACT value
equality — stricter than any reasonable hash the driver applies."""

import os

import duckdb
import pandas as pd
import pytest
from pandas.testing import assert_frame_equal

from duckdb_routing_spark.queries import REGISTRY
from duckdb_routing_spark.session import TESTDATA_TABLES

from tests.conftest import SF_SMOKE

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", SF_SMOKE)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("bool")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
    if len(pdf.columns):
        pdf = pdf.sort_values(list(pdf.columns), kind="stable")
    return pdf.reset_index(drop=True)


ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    got = canon(spec.fn(spark, SF).toPandas())
    want = canon(duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), f"column names differ: {got.columns} vs {want.columns}"
    assert len(got) == len(want), f"row counts differ: {len(got)} vs {len(want)}"
    assert len(got) > 0 or name in (), f"{name}: empty result — weak test, tune predicates"
    # int-vs-float kind drift is a driver hash failure even when values are
    # equal (r6: DuckDB HUGEINT sum -> pandas float64 vs Spark int64 hashed
    # '-123.0' vs '-123').  canon() preserves kind, so compare it strictly.
    drift = [
        c
        for c in got.columns
        if {got[c].dtype.kind, want[c].dtype.kind} == {"i", "f"}
    ]
    assert not drift, f"int-vs-float dtype drift (driver would hash-fail): {drift}"
    assert_frame_equal(got, want, check_exact=True, check_dtype=False)


def test_no_oracle_returns_hugeint(duck):
    """DuckDB sum(BIGINT) widens to HUGEINT, which fetchdf() renders as
    float64 — the exact typing that made the r6 driver hash-fail a correct
    query.  Every oracle's projected schema must be HUGEINT-free."""
    offenders = {}
    for name in ORACLED:
        desc = duck.execute(f"DESCRIBE {REGISTRY[name].oracle}").fetchall()
        huge = [c for c, typ, *_ in desc if "HUGEINT" in typ.upper()]
        if huge:
            offenders[name] = huge
    assert not offenders, f"uncast HUGEINT oracle columns: {offenders}"


def test_emulator_catches_dtype_drift():
    """tools/driver_emulation.canon_compare must fail the exact r6 frame
    shape — identical values, int64 on the Spark side, float64 on the
    oracle side — that the old float_format-only hash passed."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.driver_emulation import canon_compare

    spark_side = pd.DataFrame({"doc_id": [1, 2], "raw_score": pd.array([-123, 45], dtype="int64")})
    oracle_side = pd.DataFrame({"doc_id": [1, 2], "raw_score": pd.array([-123.0, 45.0], dtype="float64")})
    ok, why = canon_compare(spark_side, oracle_side)
    assert not ok and "dtype-kind" in why
    ok, _ = canon_compare(spark_side, spark_side.copy())
    assert ok


def test_registry_nonempty():
    assert len(REGISTRY) >= 10


def test_driver_exposed_set_fits_the_cap():
    """The driver checks only the first DRIVER_QUERY_CAP sorted names from
    __spark_entry__.queries(); every exposed query must fall inside the cap,
    every hidden name must exist in the registry (no typo'd tombstones), and
    the north-star families must all be exposed."""
    import importlib.util

    from duckdb_routing_spark.queries.registry import DRIVER_HIDDEN, DRIVER_QUERY_CAP

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    exposed = sorted(mod.queries())
    assert len(exposed) <= DRIVER_QUERY_CAP, f"{len(exposed)} exposed > cap {DRIVER_QUERY_CAP}"
    assert DRIVER_HIDDEN <= set(REGISTRY), DRIVER_HIDDEN - set(REGISTRY)
    for family in ("sim_", "stream_", "window_", "route_travel_time", "route_tile_build"):
        assert any(n.startswith(family) for n in exposed), f"{family} family not driver-exposed"
    # every hidden query still has a local oracle (pytest parity coverage).
    # The named exceptions carry non-SQL oracles instead: the throughput
    # probe is rows-only by design; the BPE pair is value-oracled against
    # the independent pure-Python reference in test_bpe.py.
    NON_SQL_ORACLED = {
        "route_batch_throughput",
        "doc_bpe_tokens",
        "doc_training_sequences",
        "doc_wordpiece_tokens",
        "doc_unigram_tokens",
    }
    for n in DRIVER_HIDDEN:
        assert REGISTRY[n].oracle is not None or n in NON_SQL_ORACLED
