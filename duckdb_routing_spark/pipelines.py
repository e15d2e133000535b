"""Composed end-to-end pipelines over the operator library.

`build_pretraining_dataset` is the canonical 100 TB training-data flow —
quality filter -> language filter -> exact dedup -> near-dup cluster
dedup -> deterministic split -> partitioned parquet — each stage the
already-oracled operator, chained the way a production run would chain
them. Every stage is shuffle-bounded the same way its standalone operator
is (documented per stage below); nothing in the pipeline collects data
driver-side.

Run it standalone:
    python -m duckdb_routing_spark.pipelines <sf_dir> <out_dir>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_routing_spark.operators import dedup, text
from duckdb_routing_spark.operators.sampling import hash_split


def build_pretraining_dataset(
    docs: DataFrame,
    out_dir: str | None = None,
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.8,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """documents(doc_id, text, ...) -> cleaned, deduped, split corpus.

    Stages (shuffle budget per stage in parens):
      1. feature block: tokens/quality/lang — pure projection (0 shuffles)
      2. keep quality >= quality_min and identified language (0)
      3. exact dedup, first doc_id per md5(text) wins (1: groupBy fp)
      4. near-dup removal: LSH candidates -> exact Jaccard >= threshold ->
         connected components -> keep each cluster's minimum doc_id
         (bounded: banded self-join + O(diameter) label-propagation rounds)
      5. deterministic hash split train/val/test (0 — stateless bucketing)
      6. optional write, partitioned by split (files land split=train/...)

    Returns the final DataFrame (doc_id, text, lang_pred, quality, split).
    """
    # 1-2: features + filters stay one narrow projection over the scan
    feats = text.with_text_features(docs).filter(
        (F.col("quality") >= quality_min) & (F.col("lang_pred") != "und")
    )

    # 3: exact dedup — keep the minimum doc_id per fingerprint. Reuses the
    # fp column the feature block already computed (dedup.exact_dedup_
    # keep_first would recompute it from text).
    w_min = F.min("doc_id").over(Window.partitionBy("fp"))
    exact = feats.withColumn("_keep", F.col("doc_id") == w_min).filter("_keep").drop("_keep")

    # 4: near-dup clusters over the exact-deduped survivors; drop every
    # cluster member except its canonical minimum. Docs in no pair keep
    # themselves (left anti join against the non-survivor set).
    pairs = dedup.near_dup_pairs(exact, threshold=jaccard_threshold)
    clusters = dedup.dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept = exact.join(losers, "doc_id", "left_anti")

    # 5: deterministic split
    out = hash_split(kept, fractions=fractions).select(
        "doc_id", "text", "lang_pred", "quality", "split"
    )

    # 6: partitioned write — split is the partition column so downstream
    # training jobs prune to their split at the file-listing level
    if out_dir is not None:
        out.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    return out


def export_pretraining_shards(
    docs: DataFrame,
    out_dir: str,
    mix_weights: dict[str, float] | None = None,
    n_shards: int = 64,
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """The full last mile: curate -> (optional) mixture with repetition ->
    deterministic sharded shuffle of the TRAIN split, written as
    <out_dir>/shard_id=K/ parquet. Returns the shard manifest.

    Composition of already-tested stages: build_pretraining_dataset (same
    shuffle budget), sampling.mix_sources (0 shuffles; requires the input's
    `source` column, so it runs on the curated-join-source frame), and
    shard.write_training_shards (1 exchange + per-partition sort). The
    shard key includes the mixture epoch — each copy of a document gets its
    own independent position in the global shuffle order (epoch copies
    spread across the read order instead of sitting adjacent).
    """
    from duckdb_routing_spark.operators import shard as _shard
    from duckdb_routing_spark.operators.sampling import mix_sources

    curated = build_pretraining_dataset(
        docs, quality_min=quality_min, jaccard_threshold=jaccard_threshold
    ).filter(F.col("split") == "train")

    if mix_weights is not None:
        # re-attach the source column (build_pretraining_dataset projects it
        # away); broadcast-sized at test SFs, keyed join at scale
        mixed = mix_sources(
            curated.join(docs.select("doc_id", "source"), "doc_id"), mix_weights
        )
        keyed = mixed.withColumn(
            "_shard_doc_key", F.concat_ws("#", F.col("doc_id").cast("string"), F.col("epoch"))
        )
    else:
        keyed = curated.withColumn("_shard_doc_key", F.col("doc_id").cast("string"))

    return _shard.write_training_shards(keyed, out_dir, n_shards, key_col="_shard_doc_key")


def export_tokenized_shards(
    docs: DataFrame,
    out_dir: str,
    merges: list[tuple[str, str]] | None = None,
    seq_len: int = 128,
    n_shards: int = 64,
    train_sample: int = 1000,
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.8,
    tokenizer: str = "bpe",
) -> DataFrame:
    """The tokenized last mile: curate -> tokenize -> fixed-length
    input_ids windows -> deterministic sharded shuffle, written as
    <out_dir>/shard_id=K/ parquet rows (doc_id, seq_id, input_ids).
    Returns the shard manifest.

    `tokenizer` picks the family — "bpe" (default), "wordpiece", or
    "unigram" — all three share the corpus-collapse training shape and the
    sequences_from_ids windowing mile, so the pipeline downstream of the
    encoder is byte-identical. Pass a trained `merges` table (BPE only) to
    reuse a tokenizer across runs (the production path — the tokenizer is
    a versioned artifact); otherwise one is trained on the curated
    corpus's lowest-id `train_sample` docs. The shard key is
    (doc_id, seq_id), so a document's windows spread across the global
    read order instead of sitting adjacent — the same dispersal contract
    as the mixture-epoch key in export_pretraining_shards."""
    from duckdb_routing_spark.operators import bpe
    from duckdb_routing_spark.operators import shard as _shard

    if tokenizer not in ("bpe", "wordpiece", "unigram"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    if merges is not None and tokenizer != "bpe":
        raise ValueError("a merges table is a BPE artifact; train in-pipeline "
                         "for wordpiece/unigram")

    # curated fans out to three actions (merge training, vocab chars, the
    # shard write) — persist it or each one re-executes the whole curation
    # DAG (the ~6x re-execution near_dup_pairs' docstring measured)
    curated = build_pretraining_dataset(
        docs, quality_min=quality_min, jaccard_threshold=jaccard_threshold
    ).filter(F.col("split") == "train").persist()
    try:
        sample = curated.orderBy("doc_id").limit(train_sample)
        if tokenizer == "wordpiece":
            from duckdb_routing_spark.operators import wordpiece as _wp

            wp_vocab = _wp.wordpiece_vocab(curated, _wp.wordpiece_train(sample, n_merges=30))
            seqs = _wp.training_sequences(curated, wp_vocab, seq_len=seq_len)
        elif tokenizer == "unigram":
            from duckdb_routing_spark.operators import unigram as _ug

            ug_vocab = _ug.unigram_train(sample, vocab_size=120)
            seqs = _ug.training_sequences(curated, ug_vocab, seq_len=seq_len)
        else:
            if merges is None:
                merges = bpe.bpe_train(sample, n_merges=30)
            vocab = bpe.bpe_vocab(curated, merges)
            seqs = bpe.training_sequences(curated, merges, vocab, seq_len=seq_len)
        keyed = seqs.withColumn(
            "_shard_doc_key",
            F.concat_ws("#", F.col("doc_id").cast("string"), F.col("seq_id").cast("string")),
        )
        manifest = _shard.write_training_shards(keyed, out_dir, n_shards, key_col="_shard_doc_key")
        # the write ran; pin the (n_shards-row) manifest before releasing
        # the cache its plan hangs off
        return manifest.localCheckpoint()
    finally:
        curated.unpersist()


def curate_hygiene(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    weights: DataFrame | None = None,
    n_features: int = 256,
    jaccard_threshold: float = 0.8,
    semantic_threshold: float = 0.995,
) -> DataFrame:
    """The round-6 hygiene stack as ONE flow — every stage an
    already-oracled operator, composed corpus-in / kept-corpus-out:

      1. model quality gate (`text.quality_classifier`; keep raw_score>0)
      2. fuzzy dedup, canonical survivor per cluster (`dedup.fuzzy_dedup_keep`)
      3. benchmark decontamination, containment mode (`dedup.decontaminate`)
         — skipped when eval_docs is None
      4. semantic dedup over model-free hashed embeddings
         (`text.hashed_doc_embeddings` -> `similarity.semantic_dedup`)

    Returns the surviving docs (all input columns). The composition is
    pinned equal to applying the four stages one at a time
    (tests/test_sampling_clustering.py), so each stage's own oracle
    transfers to the whole.

    gated/kept each feed multiple downstream consumers, so both persist
    (the near_dup_pairs lazy-API convention: materialization pays off on
    the caller's first action; at cluster scale these are staging
    tables)."""
    from duckdb_routing_spark.operators import similarity as _sim

    if weights is None:
        weights = text.classifier_weights(docs.sparkSession, n_features=n_features)
    gate = text.quality_classifier(docs, weights, n_features=n_features).filter("keep")
    gated = docs.join(gate.select("doc_id"), "doc_id", "left_semi").persist()
    fz = dedup.fuzzy_dedup_keep(gated, threshold=jaccard_threshold)
    kept = gated.join(
        fz.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )
    if eval_docs is not None:
        kept = dedup.decontaminate(kept, eval_docs, metric="containment")
    kept = kept.persist()
    emb = text.hashed_doc_embeddings(kept, n_features=n_features)
    sem = _sim.semantic_dedup(emb, threshold=semantic_threshold, id_col="doc_id",
                              vec_col="embedding")
    return kept.join(
        sem.filter("kept").select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )


def main() -> None:
    import sys

    from duckdb_routing_spark.queries.registry import table
    from duckdb_routing_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pretraining_dataset"
    spark = get_spark(app_name="pretraining_pipeline")
    result = build_pretraining_dataset(table(spark, sf_dir, "documents"), out_dir)
    result.groupBy("split").count().orderBy("split").show()


if __name__ == "__main__":
    main()
