"""Bloom-filter join pruning: no false negatives, result-identical joins,
fp rate near theory, mergeable bitmaps, and the JVM/numpy hash parity that
makes build and probe agree."""

import math

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def sides(spark):
    large = spark.range(30_000).select(
        F.pmod(F.col("id") * 48271, 10_000).alias("k"), F.col("id").alias("payload")
    ).cache()
    small = spark.range(700).select((F.col("id") * 13 % 10_000).alias("k")).distinct().cache()
    return large, small


def test_no_false_negatives(spark, sides):
    large, small = sides
    probed = bloom_might_contain(large, "k", bloom_build(small, "k"), out_col="ok")
    truly = large.join(small, "k", "left_semi")
    missed = truly.join(probed.filter(~F.col("ok")).select("k", "payload"), ["k", "payload"], "left_semi")
    assert missed.count() == 0


def test_semi_join_identical_to_plain(spark, sides):
    large, small = sides
    plain = {(r.k, r.payload) for r in large.join(small, "k", "left_semi").collect()}
    bloomed = {(r.k, r.payload) for r in bloom_semi_join(large, small, "k").collect()}
    assert plain == bloomed


def test_fp_rate_near_theory(spark):
    # disjoint probe keys: every positive is a false positive
    n, n_bits, k = 5_000, 1 << 16, 5
    build = spark.range(n).select((F.col("id") + 1_000_000).alias("k"))
    probe = spark.range(20_000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", n_bits=n_bits, k=k)
    fp = bloom_might_contain(probe, "k", bloom, n_bits=n_bits, k=k, out_col="ok").filter("ok").count()
    expected = (1 - math.exp(-k * n / n_bits)) ** k  # ~0.0101
    rate = fp / 20_000
    assert rate < 4 * expected + 0.002, (rate, expected)


def test_bitmaps_merge_like_union(spark, sides):
    large, small = sides
    lo = bloom_build(small.filter(F.col("k") < 5_000), "k")
    hi = bloom_build(small.filter(F.col("k") >= 5_000), "k")
    merged = lo.unionByName(hi).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    whole = bloom_build(small, "k")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_null_probe_keys_filtered(spark, sides):
    _, small = sides
    df = spark.range(10).select(F.when(F.col("id") < 5, F.col("id")).alias("k"))
    out = bloom_might_contain(df, "k", bloom_build(small, "k"), out_col="ok")
    assert out.filter(F.col("k").isNull() & F.col("ok")).count() == 0


def test_probe_filter_runs_before_join_shuffle(spark, sides):
    """The whole point: the bloom filter must sit BELOW the join in the plan
    so the exchange/join sees the reduced probe side."""
    large, small = sides
    plan = bloom_semi_join(large, small, "k", how="left_semi")._jdf.queryExecution().executedPlan().toString()
    # the pythonUDF filter must appear on the probe (streamed) side of the join
    assert plan.index("pythonUDF") > plan.index("Join") or "FilterExec" not in plan
    join_pos = plan.index("Join")
    udf_pos = plan.index("ArrowEvalPython") if "ArrowEvalPython" in plan else plan.index("pythonUDF")
    assert udf_pos > join_pos, "bloom probe should be inside the join's subtree"
