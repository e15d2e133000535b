"""Bucketing: co-located joins without a shuffle — the 100 TB join strategy
for repeated large-large joins (SURVEY 'Partitioning & shuffle'). Writes two
tables bucketed by the join key and asserts the join plan contains NO
exchange on either side."""

import pytest

from duckdb_routing_spark.plans import audit


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # the session's warehouse dir is fixed at startup; use a unique db
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_test")
    spark.sql("USE bucketing_test")
    yield spark
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    spark.sql("USE default")
    spark.sql("DROP DATABASE IF EXISTS bucketing_test")


def test_bucketed_join_has_no_shuffle(warehouse, spark):
    from pyspark.sql import functions as F

    fact = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("v")
    )
    dim = spark.range(500).select(F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    fact.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("fact_b")
    dim.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("dim_b")

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
        plan = audit.formatted_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_bench_bucketed_override_value_parity(warehouse, spark):
    """bench.py's SPARK_GRAFT_BUCKETED mode: overriding lineitem/orders with
    bucketed catalog tables through the registry hook must not change query
    VALUES (layout is a physical property), and the lineitem-orders join
    must carry no fact-side exchange."""
    import os

    from bench import _register_bucketed_facts
    from duckdb_routing_spark.queries import REGISTRY
    from duckdb_routing_spark.queries.registry import _TABLE_CACHE

    sf_dir = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
    spec = REGISTRY["q3_shipping_priority"]
    plain = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]

    _register_bucketed_facts(spark, sf_dir)
    try:
        bucketed_df = spec.fn(spark, sf_dir)
        bucketed = [tuple(r) for r in bucketed_df.collect()]
        assert bucketed == plain
        plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
        # fact tables are bucket-scanned: no Exchange directly above either
        # FileScan of the bucketed tables (the final sort/agg may still
        # exchange its tiny input)
        assert "Bucketed: true" in plan
    finally:
        # drop the overrides so later tests see plain parquet again
        _TABLE_CACHE.get(spark, {}).pop((sf_dir, "lineitem"), None)
        _TABLE_CACHE.get(spark, {}).pop((sf_dir, "orders"), None)
        spark.sql("DROP TABLE IF EXISTS lineitem_bench_b")
        spark.sql("DROP TABLE IF EXISTS orders_bench_b")


def test_bucketed_tpch_join_family_zero_fact_shuffles(warehouse, spark):
    """The documented join posture for the TPC-H family at scale: with
    lineitem+orders bucketed by orderkey, q3/q5/q10 plan ZERO fact-side
    shuffle exchanges -- no `Exchange hashpartitioning` keyed on
    l_orderkey/o_orderkey anywhere in the executed plan (the remaining
    exchanges are tiny post-aggregation group/sort moves and broadcasts).
    Values stay identical to the plain-parquet layout (layout is physical).
    tools/scale_study.py --bucketed measures the same plans at derived sf1."""
    import os
    import re

    from bench import _register_bucketed_facts
    from duckdb_routing_spark.queries import REGISTRY
    from duckdb_routing_spark.queries.registry import _TABLE_CACHE

    sf_dir = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
    names = ["q3_shipping_priority", "q5_local_supplier", "q10_returned_items"]
    plain = {n: [tuple(r) for r in REGISTRY[n].fn(spark, sf_dir).collect()] for n in names}

    _register_bucketed_facts(spark, sf_dir)
    try:
        for n in names:
            df = REGISTRY[n].fn(spark, sf_dir)
            assert [tuple(r) for r in df.collect()] == plain[n]
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            for ln in plan.splitlines():
                if "Exchange hashpartitioning" in ln:
                    assert not re.search(r"\b[lo]_orderkey\b", ln), (
                        f"{n}: fact-side shuffle survived bucketing:\n{ln.strip()}"
                    )
    finally:
        _TABLE_CACHE.get(spark, {}).pop((sf_dir, "lineitem"), None)
        _TABLE_CACHE.get(spark, {}).pop((sf_dir, "orders"), None)
        spark.sql("DROP TABLE IF EXISTS lineitem_bench_b")
        spark.sql("DROP TABLE IF EXISTS orders_bench_b")
