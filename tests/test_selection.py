"""DSIR data selection: exact parity vs a pure-Python reference, Gumbel
resampling behavior, and the scale-shape plan assertions."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators import selection
from duckdb_routing_spark.plans.audit import formatted_plan, has_broadcast_join
from tests.conftest import SF_ORACLE

N_FEATURES = 512


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet").cache()


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_FEATURES


def _grams(text: str) -> list[str]:
    ws = [w for w in text.lower().split(" ") if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _reference_scores(rows, target_pred):
    """Independent DSIR: Counter distributions, math.log micro-units."""
    raw, tgt = Counter(), Counter()
    per_doc: dict[int, Counter] = {}
    for doc_id, text, is_target in rows:
        c = Counter(_bucket(g) for g in _grams(text))
        per_doc[doc_id] = c
        raw.update(c)
        if is_target:
            tgt.update(c)
    nr = sum(raw.values()) + N_FEATURES
    nt = sum(tgt.values()) + N_FEATURES
    lam = {
        b: math.floor(1_000_000 * math.log(((tgt[b] + 1) * nr) / ((raw[b] + 1) * nt)))
        for b in range(N_FEATURES)
    }
    return {
        d: (sum(c.values()), sum(cnt * lam[b] for b, cnt in c.items()))
        for d, c in per_doc.items()
    }


def test_dsir_scores_match_pure_python_reference(spark, docs):
    """Micro-unit importance log-weights are exact: the Spark pipeline and
    a Counter+math.log reference agree on every document (integer algebra
    leaves no room for aggregation-order drift)."""
    rows = [
        (r.doc_id, r.text, r.lang == "en")
        for r in docs.select("doc_id", "text", "lang").collect()
    ]
    expect = _reference_scores(rows, None)
    got = {
        r.doc_id: (r.n_grams, r.score_mu)
        for r in selection.dsir_scores(
            docs, docs.filter("lang = 'en'"), n_features=N_FEATURES
        ).collect()
    }
    assert got == expect


def test_dsir_scores_separate_target_language(spark, docs):
    """The selection signal is real: with target = English documents, the
    mean per-gram log-weight of English docs is positive and beats every
    other language's mean (the distribution-shift detection DSIR exists
    for)."""
    s = selection.dsir_scores(docs, docs.filter("lang = 'en'"), n_features=N_FEATURES)
    means = {
        r.lang: r.m
        for r in s.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg(F.col("score_mu") / F.col("n_grams")).alias("m"))
        .collect()
    }
    assert means["en"] > 0
    assert all(means["en"] > v for k, v in means.items() if k != "en")


def test_dsir_select_gumbel_vs_greedy(spark, docs):
    """Gumbel-top-k is a weighted sample: it must (a) return exactly k
    docs, (b) be replayable (hash-u noise), (c) differ from the greedy
    top-k while still being dominated by high-scoring docs."""
    tgt = docs.filter("lang = 'en'")
    k = 100
    greedy = {r.doc_id for r in selection.dsir_select(docs, tgt, k, N_FEATURES, gumbel=False).collect()}
    g1 = {r.doc_id for r in selection.dsir_select(docs, tgt, k, N_FEATURES).collect()}
    g2 = {r.doc_id for r in selection.dsir_select(docs, tgt, k, N_FEATURES).collect()}
    assert len(greedy) == len(g1) == k
    assert g1 == g2  # deterministic replay
    assert g1 != greedy  # noise actually perturbs the draw
    assert len(g1 & greedy) > k // 2  # but weight still dominates
    # a different salt is a fresh draw
    g3 = {r.doc_id for r in selection.dsir_select(docs, tgt, k, N_FEATURES, salt="other").collect()}
    assert g3 != g1


def test_dsir_empty_target_degrades_to_uniform(spark, docs):
    """Add-one smoothing makes an empty target corpus the UNIFORM target
    (never NULL scores): every bucket ratio becomes (1 * Nr) / ((cr+1) * F),
    which penalizes frequent buckets — scores stay defined and finite."""
    s = selection.dsir_scores(docs, docs.filter("doc_id < 0"), n_features=N_FEATURES)
    rows = s.collect()
    assert len(rows) == docs.count()
    assert all(r.score_mu is not None for r in rows)


def test_streaming_dsir_as_of_contract(spark, docs, tmp_path):
    """The streaming twin scores each micro-batch against the corpus as of
    its arrival: batch 0 equals batch DSIR over chunk 0 alone, and the
    final batch equals batch DSIR over the FULL feed restricted to its
    docs (the oracle's contract)."""
    import os

    from duckdb_routing_spark.streaming import docs as sd

    pdf = docs.select("doc_id", "text", "lang").orderBy("doc_id").toPandas()
    chunk_dir = str(tmp_path / "in")
    os.makedirs(chunk_dir)
    per = (len(pdf) + 2) // 3
    chunks = [pdf.iloc[i * per:(i + 1) * per] for i in range(3)]
    for b, part in enumerate(chunks):
        part.to_parquet(os.path.join(chunk_dir, f"chunk_{b}.parquet"), index=False)
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*.parquet"))
    )
    tgt = docs.filter("lang = 'en'")
    q = sd.streaming_dsir_scores(
        stream, tgt, str(tmp_path / "idx"), str(tmp_path / "scores"), n_features=N_FEATURES
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.option("basePath", str(tmp_path / "scores")).parquet(
        str(tmp_path / "scores") + "/batch=*"
    )

    def as_rows(df):
        return sorted((r.doc_id, r.n_grams, r.score_mu) for r in df.collect())

    chunk0 = spark.createDataFrame(chunks[0])
    assert as_rows(got.filter("batch = 0").drop("batch")) == as_rows(
        selection.dsir_scores(chunk0, tgt, n_features=N_FEATURES)
    )
    last_ids = set(chunks[2].doc_id)
    full = selection.dsir_scores(docs, tgt, n_features=N_FEATURES).filter(
        F.col("doc_id").isin(last_ids)
    )
    assert as_rows(got.filter("batch = 2").drop("batch")) == as_rows(full)
    # every doc scored exactly once across the drained feed
    assert got.count() == len(pdf) == got.select("doc_id").distinct().count()


def test_dsir_plan_shape(spark, docs):
    """100 TB posture, mechanically: the log-ratio table joins broadcast,
    and selection ends in TakeOrderedAndProject (global top-k without a
    global sort)."""
    sel = selection.dsir_select(docs, docs.filter("lang = 'en'"), 10, N_FEATURES)
    plan = formatted_plan(sel)
    assert has_broadcast_join(sel)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
