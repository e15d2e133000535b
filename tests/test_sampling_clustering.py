"""Curation operators: deterministic split/quota invariants, Lloyd basics.
(Value-level parity vs DuckDB is covered by test_oracle_parity for
doc_hash_split / doc_quota_sample / emb_kmeans.)"""

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators import clustering, sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_split_deterministic_and_partitioning(spark, docs):
    a = sampling.hash_split(docs).select("doc_id", "split")
    b = sampling.hash_split(docs).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0  # pure function of (key, salt)
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # total partition, no drops/dups
    assert counts["train"] > counts.get("val", 0) >= 0
    # a different salt gives a different (but still complete) assignment
    c = sampling.hash_split(docs, salt="other").select("doc_id", F.col("split").alias("split2"))
    assert c.count() == n
    assert a.join(c, "doc_id").filter(F.col("split") != F.col("split2")).count() > 0


def test_quota_per_group_bounds(spark, docs):
    out = sampling.quota_per_group(docs.select("doc_id", "source"), "source", 7)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert per and all(r.n <= 7 for r in per)
    # groups smaller than the quota keep everything
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {r.source: r.n for r in per}
    for s, n in sizes.items():
        assert kept[s] == min(n, 7)


def test_kmeans_assigns_every_vector(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = clustering.kmeans_lloyd(emb, k=3, iterations=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r.cluster_id for r in rows} <= {0, 1, 2}
    # deterministic: second run identical
    again = clustering.kmeans_lloyd(emb, k=3, iterations=2).collect()
    assert [(r.vec_id, r.cluster_id) for r in rows] == [(r.vec_id, r.cluster_id) for r in again]


def test_pretraining_pipeline_end_to_end(spark, tmp_path):
    """The composed pipeline: quality+lang filter -> exact dedup -> near-dup
    cluster dedup -> split -> partitioned write. Checks: output is smaller
    than input, contains no exact-dup pair, no near-dup pair survives with
    both members, the write is split-partitioned, and the whole flow is
    deterministic (second run byte-identical counts)."""
    from duckdb_routing_spark.operators import dedup
    from duckdb_routing_spark.pipelines import build_pretraining_dataset
    from duckdb_routing_spark.queries.registry import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    out_dir = str(tmp_path / "corpus")
    out = build_pretraining_dataset(docs, out_dir)
    got = out.cache()
    n_in, n_out = docs.count(), got.count()
    assert 0 < n_out < n_in

    # no exact dups survive
    assert got.groupBy(F.md5(F.lower("text"))).count().filter("count > 1").count() == 0
    # no near-dup pair survives intact: re-run the pair finder on survivors
    assert dedup.near_dup_pairs(got, threshold=0.8).count() == 0
    # split-partitioned layout + all three splits materialized at this SF
    import os
    parts = sorted(p for p in os.listdir(out_dir) if p.startswith("split="))
    assert parts == ["split=test", "split=train", "split=val"]
    back = spark.read.parquet(out_dir)
    assert back.count() == n_out
    # train fraction lands near 0.8 (hash bucketing holds in expectation)
    frac = back.filter("split = 'train'").count() / n_out
    assert 0.6 < frac < 0.95
    # determinism
    again = build_pretraining_dataset(docs)
    assert again.count() == n_out
    assert again.select("doc_id").subtract(got.select("doc_id")).count() == 0
    got.unpersist()
