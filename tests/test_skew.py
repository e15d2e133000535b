"""Salted join / two-phase agg must be result-identical to the plain
formulations on a deliberately skewed dataset (one key holds 90% of rows)."""

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 gets ~90k rows; keys 1..99 get ~1k each
    df = spark.range(100_000).select(
        F.when(F.col("id") < 90_000, F.lit(0)).otherwise(F.pmod(F.col("id"), 99) + 1).alias("k"),
        F.col("id").alias("payload"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return df.cache()


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name"))
    plain = skewed.join(dim, "k").groupBy("k_name").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = salted_join(skewed, dim, "k", salt_from=["payload"], n_salts=8).groupBy("k_name").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    a = {r.k_name: (r.n, r.s) for r in plain.collect()}
    b = {r.k_name: (r.n, r.s) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    plain_n = skewed.join(dim, "k", "left").filter(F.col("tag").isNull()).count()
    salted_n = salted_join(skewed, dim, "k", salt_from=["payload"], n_salts=4, how="left").filter(
        F.col("tag").isNull()
    ).count()
    assert plain_n == salted_n > 0


def test_two_phase_agg_equals_direct(spark, skewed):
    direct = skewed.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("total_v"))
    salted = two_phase_agg(skewed, "k", salt_from=["payload"], n_salts=8, sum_cols={"total_v": "v"})
    a = {r.k: (r.n, r.total_v) for r in direct.collect()}
    b = {r.k: (r.n, r.total_v) for r in salted.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert a[k][1] == pytest.approx(b[k][1])  # double sums: order differs by design
