"""Plan audits (pushdown / broadcast / codegen posture) + the ST_* kit."""

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.functions import register_geo_functions
from duckdb_routing_spark.plans import audit
from duckdb_routing_spark.queries import REGISTRY
from duckdb_routing_spark.routing.geometry import build_wkb_linestring
from tests.conftest import SF_ORACLE


def test_q6_filters_reach_the_scan(spark):
    df = REGISTRY["q6_revenue_forecast"].fn(spark, SF_ORACLE)
    pushed = [p for p in audit.pushed_filters(df) if p]
    assert pushed, "q6 predicates did not push down to the parquet scan"
    joined = " ".join(pushed)
    assert "l_shipdate" in joined and "l_discount" in joined


def test_q6_column_pruning(spark):
    df = REGISTRY["q6_revenue_forecast"].fn(spark, SF_ORACLE)
    schemas = audit.scan_read_schema(df)
    assert schemas
    # the scan must NOT read all 11 lineitem columns for a 4-column query
    assert all(s.count(":") <= 5 for s in schemas), f"scan reads too many columns: {schemas}"


def test_q3_broadcasts_dimension(spark):
    df = REGISTRY["q3_shipping_priority"].fn(spark, SF_ORACLE)
    assert audit.has_broadcast_join(df), "customer dimension should broadcast, not shuffle"


def test_relational_queries_stay_jvm_side(spark):
    for name in ("q1_pricing_summary", "q5_local_supplier", "events_sessionize", "dedup_minhash_lsh"):
        df = REGISTRY[name].fn(spark, SF_ORACLE)
        assert audit.python_eval_stages(df) == 0, f"{name} fell off the JVM fast path"


def test_geo_function_kit(spark):
    register_geo_functions(spark)
    ls = build_wkb_linestring([13.0, 13.001, 13.002], [52.0, 52.0, 52.001])
    df = spark.createDataFrame([(ls,)], "g binary")
    row = df.selectExpr(
        "st_astext(g) AS wkt",
        "st_npoints(g) AS n",
        "st_geomtype(g) AS t",
        "st_astext(st_startpoint(g)) AS sp",
        "st_astext(st_endpoint(g)) AS ep",
        "st_asgeojson(g) AS gj",
        "st_astext(st_point(7.42, 43.73)) AS pt",
    ).first()
    assert row.wkt.startswith("LINESTRING(13.0 52.0")
    assert row.n == 3
    assert row.t == "LINESTRING"
    assert row.sp == "POINT(13.0 52.0)"
    assert row.ep == "POINT(13.002 52.001)"
    assert '"LineString"' in row.gj
    assert row.pt == "POINT(7.42 43.73)"


def test_geo_functions_null_handling(spark):
    register_geo_functions(spark)
    row = spark.sql(
        "SELECT st_astext(NULL) AS a, st_npoints(NULL) AS b, st_centroid(NULL) AS c"
    ).first()
    assert row.a is None and row.b is None and row.c is None
