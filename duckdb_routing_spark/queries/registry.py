"""Query registry shared by __spark_entry__, tests, and bench.py."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""
    # Optional per-query session-conf override for the measurement
    # harnesses (bench.py / tools/ratio.py apply it around this query's
    # executions only, restoring the pinned bench session after). Either a
    # static dict or a callable (spark, sf_dir) -> dict so the override can
    # scale with the data (e.g. shuffle width from input bytes). Purely a
    # physical-planning knob — correctness gates (driver, oracle parity)
    # run every query under ONE session config and must stay value-equal.
    session_conf: Callable[[SparkSession, str], dict] | dict | None = None


REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness harness checks only the FIRST 50 registry names in
# sorted order; anything past the cap gets no driver row at all. The registry
# intentionally holds more than 50 queries (they all stay oracle-checked in
# tests/test_oracle_parity.py and available to bench.py), so __spark_entry__
# exposes exactly the 50 most-informative ones. Each hidden name is a strict
# variant of an exposed sibling:
#   dedup_cluster_assign     downstream stage of dedup_near_dups
#                            (pytest-oracled vs recursive-CTE components)
#   dedup_simhash            ⊂ dedup_simhash_pairs (same signature pipeline)
#   dedup_simhash64_pairs    widened twin of dedup_simhash_pairs (same
#                            banding proof at 64 bits; pytest-oracled)
#   doc_contamination        word-n-gram overlap vs an eval slice; text family
#                            exposed via doc_text_features/doc_chunks
#   doc_temperature_sample   count^alpha mixture resampling; sampling family
#                            exposed via doc_hash_split/doc_quota_sample
#   doc_repetition           Gopher repetition signals; text family
#   doc_stats                ⊂ doc_text_features / doc_token_stats
#   q4_order_priority        EXISTS semi-join; anti/semi shapes also in
#                            q22_dormant_rich (anti_join_quiet_customers was
#                            itself hidden late round 6, same rationale)
#   q7_nation_volume         multi-join volume shape ⊂ q5/q3/q10 join family;
#                            hidden to give doc_chunks a driver row
#   route_snap               snap kernel already driver-exercised through
#                            route_travel_time/route_wkb_duration endpoint
#                            snapping (+ test_locate_and_snap); hidden to give
#                            doc_pii_scrub a driver row
#   window_running_total     window-frame family covered by window_topk_orders
#                            + doc_pack_bins (prefix-sum window); hidden to
#                            give doc_pack_bins a driver row
#   q8/q9/q14/q18/q19        multi-join / subquery shapes covered by
#                            q1,q3,q5,q6,q7,q10,q22
#   q11/q13/q16/q17/q21      late-added decision-support shapes (scalar-
#                            subquery HAVING, outer-join histogram, NOT IN +
#                            count-distinct, correlated AVG, EXISTS+NOT
#                            EXISTS); operator families already represented
#                            among the exposed 50 (q22 anti/semi, q5 joins)
#   rollup_revenue           ⊂ grouping_sets_revenue (ROLLUP is sugar)
#   route_batch_throughput   rows-only throughput probe; bench.py measures it
#                            (durations value-oracled by its hidden twin
#                            route_batch_durations on the oracle grid)
#   route_isochrone          ⊂ route_isochrones_batch (same kernel)
#   route_node_count         trivial; cardinalities oracled in
#                            route_monaco_real_osm + route_tile_build
#   sim_pq_codes             PQ encode; similarity family exposed via
#                            sim_topk_cosine/sim_ann_lsh/sim_ivf_topk
#   sim_pq_topk              PQ ADC search; same family
#   stream_dedup_minhash     incremental-LSH twin of dedup_minhash_lsh +
#                            stream_dedup_exact (pytest-oracled)
#   stream_interval_join     stream-stream interval join; join family exposed
#                            via asof + q3/q5, stream family via 3 stream_* rows
#   stream_session_window    declarative twin of stream_sessionize_stateful
#   union_buckets            plain UNION ALL set op
DRIVER_HIDDEN: frozenset[str] = frozenset(
    {
        # tolerance variant of the exposed asof_purchase_last_view;
        # pytest-oracled
        "asof_view_within_hour",
        "dedup_cluster_assign",
        # same assignment as dedup_cluster_assign through star contraction
        # (Kiveris et al.) — both SQL-oracled by the transitive-closure CTE
        "dedup_cluster_star",
        "dedup_simhash",
        "dedup_simhash64_pairs",
        "doc_contamination",
        # exact heavy-hitters (TakeOrderedAndProject top-k over a count
        # agg); frequency family driver-exercised via doc_token_stats +
        # dedup_exact_stats; the Misra-Gries sketch twin is pytest-oracled
        # against it (test_sketch.py)
        "doc_topk_tokens",
        # WordPiece twin of the hidden doc_bpe_tokens (tokenizer family
        # driver-exercised via doc_token_stats + the BPE shard pipeline);
        # pytest-value-oracled vs an independent reference
        "doc_wordpiece_tokens",
        # unigram-LM third tokenizer family, same rationale;
        # pytest-value-oracled vs an independent log-space reference
        "doc_unigram_tokens",
        "doc_temperature_sample",
        # DSIR importance log-weight components: strict subset of the
        # exposed doc_dsir_select (same score pipeline, no Gumbel/top-k);
        # SQL-oracled with exact micro-unit integer log-weights
        "doc_dsir_scores",
        # per-label mean vector: a plain groupBy average, strictly less
        # informative than the exposed emb_kmeans (full Lloyd-iteration
        # parity); hidden to hand its driver row to doc_dsir_select, the
        # data-selection flagship (round-7 swap, verified MATCH under the
        # driver-emulation gate before exposure)
        "emb_label_centroids",
        # streaming DSIR twin: as-of scoring against the rolling raw
        # distribution; SQL-oracled (final batch == batch scores over the
        # drained corpus). Stream family exposed via stream_hourly /
        # stream_dedup_exact / stream_sessionize_stateful
        "stream_dsir_scores",
        # exact-integer PageRank over the customer->supplier order graph;
        # SQL-oracled (MATERIALIZED per-iteration CTEs). Iterative-algorithm
        # family driver-exercised via emb_kmeans / dedup_fuzzy_keep
        "graph_pagerank",
        # exact-integer PCA moment matrix (SQL-oracled); the fit/projection
        # ride on it and are pytest-oracled vs numpy. Embedding-statistics
        # family driver-exercised via emb_dim_stats / dedup_semantic
        "emb_pca_moments",
        "doc_repetition",
        "doc_stats",
        "q7_nation_volume",
        # plain per-segment agg + count-distinct: aggregate family covered
        # by q1/grouping_sets/dedup_exact_stats; hidden to give the
        # composed pipeline_curate flagship a driver row
        "segment_stats",
        "route_snap",
        "window_running_total",
        "q11_important_stock",
        "q13_order_histogram",
        # q2/q12/q15/q20 complete the 22-shape TPC-H sweep; their operator
        # families (correlated scalar subquery, CASE-in-SUM, CTE + scalar
        # MAX, nested IN semi joins) are already represented among the
        # exposed 50 (q17, q1, cte_revenue_share, q16/q22); pytest-oracled
        # ANALYZE-style profile + declarative DQ audit: data-QA family
        # driver-exercised via skew_key_report/corpus_report; pytest-oracled
        "profile_orders",
        "dq_audit_orders",
        # Spark-4 recursive CTE (calendar spine); set-op/CTE families
        # driver-exercised via cte_revenue_share/union_buckets siblings;
        # pytest-oracled with byte-identical SQL on both engines
        "recursive_date_spine",
        "q2_min_cost_supplier",
        "q12_priority_shipping",
        "q15_top_supplier",
        "q20_excess_stock",
        "q14_promo_effect",
        "q16_supplier_variety",
        "q17_small_quantity_revenue",
        "q21_sole_blame",
        "q18_large_orders",
        "q19_disjunctive_predicates",
        "q4_order_priority",
        "q8_market_share",
        "q9_profit_proxy",
        "rollup_revenue",
        "events_cohorts",
        # event transition bigrams: events family driver-exercised via
        # events_hourly/sessionize/funnel siblings; pytest-oracled
        "events_transitions",
        # per-session rollup downstream of events_sessionize (exposed);
        # pytest-oracled
        "events_session_stats",
        # robust median/MAD outlier bounds; percentile family driver-
        # exercised via percentiles_by_priority; pytest-oracled
        "events_outlier_bounds",
        "events_funnel",
        "route_batch_throughput",
        # value-hash-oracled twin of route_batch_throughput: identical
        # pair-gen/repartition/kernel/aggregation shape on the oracle grid
        # (a 40k-node recursive CTE is intractable for DuckDB); closes the
        # one rows-only driver row with a real durations oracle
        "route_batch_durations",
        # Delta-protocol sink roundtrip (write commits -> snapshot read ->
        # aggregate) vs the same aggregate straight over the source table;
        # sink families driver-exercised via pipeline_curate/
        # sim_ann_index_probe store lifecycles
        "lake_delta_roundtrip",
        # same table consumed through the Spark-4 Python DataSource
        # (format("deltalog") — executor-side pyarrow file reads +
        # protocol partitionValues) instead of read_delta; same oracle
        "lake_delta_scan",
        "route_isochrone",
        "route_node_count",
        # train->score composition of the exposed doc_quality_classifier:
        # same scorer, weights learned in-engine; the oracle replays the
        # full gradient loop as unrolled SQL; pytest-oracled
        "doc_trained_quality",
        # per-dim normalization stats: decimal-exact sums; pytest-oracled
        "emb_dim_stats",
        # int8 scalar quantization: storage tier beside sim_pq_codes;
        # pytest-oracled
        "emb_int8_codes",
        # hard-negative mining: same kernel as sim_topk_cosine with label
        # exclusion; pytest-oracled
        "emb_hard_negatives",
        "sim_pq_codes",
        "sim_pq_topk",
        # ⊂ sim_ann_index_probe (now exposed): identical cells/probe kernel
        # and the SAME oracle, but the probe additionally exercises the
        # persisted store lifecycle (build/extend/partition-pruned scan);
        # the in-memory twin stays pytest-oracled
        "sim_ivf_topk",
        "stream_dedup_minhash",
        "stream_interval_join",
        "stream_session_window",
        "union_buckets",
        # sketch family: register-exact oracle, pytest-covered; distinct-
        # count shape already driver-exercised via dedup_exact_stats
        "sketch_hll_registers",
        # span surgery output of the dup-span stage above; pytest-oracled
        "dedup_span_cut",
        # cross-source dup rollup over the LSH candidates; pytest-oracled
        "dedup_source_matrix",
        # asymmetric containment over the shared shingle base; dedup family
        # driver-exercised via dedup_near_dups; pytest-oracled
        "dedup_containment_pairs",
        # substring-level dup spans: dedup family driver-exercised via
        # dedup_exact_stats/dedup_minhash_lsh/dedup_near_dups; pytest-oracled
        "dedup_dup_spans",
        # histogram bin table: same mergeable-sketch family; exact
        # percentiles driver-exercised via percentiles_by_priority
        "sketch_hist_bins",
        # Z-order clustering key: layout primitive, pytest-oracled; the
        # storage-layout family is studied in tools/scale_study.py --bucketed
        "layout_zorder_key",
        # retrieval family: pytest-oracled (search shape is term-keyed
        # postings + doc-keyed folds; text family driver-exercised)
        "search_conjunctive",
        "search_bm25_components",
        # one-row data-card rollup; stats families driver-exercised via
        # doc_text_features/dedup_exact_stats; pytest-oracled
        "corpus_report",
        # CDC snapshot diff: incremental-processing primitive; pytest-
        # oracled (full-outer fingerprint join)
        "snapshot_diff_docs",
        # skew diagnostic report: the skew toolkit's oracled row
        # (salted join / two-phase agg equivalence stays in test_skew)
        "skew_key_report",
        # CMS frequency prefilter: result-identical to plain HAVING (the
        # bloom_semi_revenue pattern); pytest-oracled
        "cms_frequent_customers",
        # CMS cell table: same mergeable-sketch family as sketch_hll_registers
        # (register-exact oracle, pytest-covered)
        "sketch_cms_cells",
        # bloom runtime-filter semi join: result-identical to the plain
        # semi join (anti/semi family driver-exercised via
        # anti_join_quiet_customers/q22); pytest-oracled
        "bloom_semi_revenue",
        # lexicon-as-data scoring (blocklist shape); pytest-oracled
        "doc_lexicon_score",
        # corpus-bigram LM score: text-quality family driver-exercised via
        # doc_text_features; pytest-oracled on the integer surrogate
        "doc_lm_score",
        # TF-IDF salient terms: text family driver-exercised via
        # doc_text_features/doc_token_stats; pytest-oracled
        "doc_tfidf_terms",
        # streaming curation: drained == pipeline_curate (its oracle row
        # is driver-exposed); pytest-oracled
        "stream_curate",
        # windowed streaming CMS: same bounded-state contract as the
        # streaming HLL below; pytest-oracled (drained == batch cells)
        "stream_cms_hourly",
        # windowed streaming HLL: stream family driver-exercised via
        # stream_hourly/stream_dedup_exact/stream_sessionize_stateful;
        # pytest-oracled (drained == batch registers)
        "stream_hll_hourly",
        # training-export family (round 6): sampling/export families are
        # driver-exercised via doc_hash_split/doc_quota_sample/pipeline_curate;
        # both fully oracled in test_oracle_parity (mixture generate_series
        # lateral + shard-manifest key ranges)
        "doc_mix_sources",
        "doc_shard_manifest",
        # SemDeDup (round 6): embedding-dedup family driver-exercised via
        # dedup_embedding_cosine + sim_ivf_topk (same quantizer); fully
        # SQL-oracled in test_oracle_parity
        # --- hidden late round 6 to hand their driver rows to the new
        # corpus-hygiene flagships (dedup_semantic, doc_quality_classifier,
        # dedup_fuzzy_keep), all driver-emulation-verified under a
        # default-config session before the swap:
        # anti/semi family stays driver-exercised via q22_dormant_rich
        "anti_join_quiet_customers",
        # join-agg family stays driver-exercised via q3/q5; still a bench
        # headline (bench reads the registry directly)
        "q10_returned_items",
        # travel_time fan-out over a VALUES view: the same UDF surface as
        # route_travel_time/route_modes/route_matrix (all exposed)
        "route_fanout",
        # BPE tokenizer (round 6): train-on-sample + broadcast-ranks encode;
        # greedy rank merging is not one-SQL-expressible, so the oracle is
        # test_bpe.py's independent pure-Python reference (exact match on
        # merges AND encodings); token family driver-exercised via
        # doc_token_stats
        "doc_bpe_tokens",
        # text -> input_ids training windows (round 6): BPE ids + row-local
        # seq_len slicing; pytest-oracled (decode-back + window-shape
        # invariants in test_bpe.py)
        "doc_training_sequences",
        # cross-corpus fuzzy decontamination (round 6): contamination family
        # driver-exercised via doc_contamination's verbatim-overlap sibling
        # (hidden) + the exposed dedup family; fully SQL-oracled
        "dedup_decontaminate_pairs",
        # keep-best-copy policy variant of dedup_fuzzy_keep (same closure,
        # argmax-prefer survivor); fully SQL-oracled
        "dedup_fuzzy_keep_best",
        # bottom-k quantile sketch state (round 6): same mergeable-sketch
        # family as sketch_hll_registers/sketch_cms_cells (percentile shape
        # driver-exercised via percentiles_by_priority); fully SQL-oracled
        "sketch_quantile_sample",
        # model-free hashed doc embeddings (round 6): embedding family
        # driver-exercised via dedup_semantic/sim_* rows; fully SQL-oracled
        # on the exact integer component table
        "doc_hashed_embedding",
        # WKB route struct: shares kernel #4 with the exposed
        # route_travel_time (same snap + path + duration surface; the
        # byte-exact WKB layout stays pinned by test_wkb_linestring_layout
        # and test_route_wkb_all_input_kinds); hidden late round 7 to hand
        # its driver row to events_gapfill, the new time-series-family
        # flagship — swap driver-emulation-verified before exposure
        "route_wkb_duration",
        # SimHash banded pairs: the simhash family's exposed row handed to
        # er_customer_pairs (new record-linkage family); the banding
        # pigeonhole proof and 64-bit twin stay pytest-oracled
        # (test_properties + dedup_simhash/dedup_simhash64_pairs hidden
        # siblings), dedup family still driver-exercised via 6 rows
        # (exact/minhash/near_dups/fuzzy_keep/semantic/embedding_cosine)
        "dedup_simhash_pairs",
        # SCD2 dimension build (round 7): change-run collapse + validity
        # intervals; window family driver-exercised via window_topk_orders,
        # CDC family via snapshot_diff_docs sibling; fully SQL-oracled
        "scd2_customer_status",
        # hybrid RRF retrieval (round 7): lexical + hashed-embedding lists
        # fused by integer reciprocal-rank; retrieval family driver-
        # exercised via sim_ann_index_probe/sim_topk_cosine; fully
        # SQL-oracled
        "search_hybrid_rrf",
        # retrieval evaluation metrics (round 7): integer hits@k /
        # first-hit-rank / reciprocal rank of the hybrid list vs the
        # conjunctive truth set; same family as search_hybrid_rrf; fully
        # SQL-oracled
        "search_eval_hybrid",
        # incremental aggregate maintenance (round 7): mergeable keyed
        # state, merged(base, delta) == full recompute (the oracle IS the
        # recompute); agg family driver-exercised via q1/grouping_sets;
        # fully SQL-oracled
        "orders_incremental_agg",
        # k-anonymity privacy audit (round 7): quasi-identifier group-size
        # violations; QA family driver-exercised via skew_key_report/
        # corpus_report siblings + doc_pii_scrub; fully SQL-oracled
        "privacy_k_anonymity",
        # hourly->daily HLL register rollup (round 7): merge == sketch of
        # the union, oracle computes days directly; sketch family
        # pytest-oracled via sketch_hll_registers sibling; fully SQL-oracled
        "events_daily_hll_rollup",
        # train/val/test hash split: a 3-row split-count check, the weakest
        # row in the sampling family (doc_quota_sample stays exposed with a
        # 400-row value-hash); hidden late round 7 to hand its driver row
        # to geo_points_in_polygons, the new spatial-join family — swap
        # driver-emulation-verified before exposure; still fully SQL-oracled
        # in test_oracle_parity
        "doc_hash_split",
        # ER end-to-end golden record (round 7): pairs -> star components
        # -> argmax-acctbal survivor; linkage family driver-exercised via
        # the exposed er_customer_pairs; fully SQL-oracled (recursive
        # closure + ranked window)
        "er_customer_golden",
        # exact triangle counts over the ER graph (round 7): graph family
        # pytest+SQL-oracled via graph_pagerank/dedup_cluster siblings;
        # fully SQL-oracled (sorted-orientation wedge closure)
        "graph_triangles",
        # keyed pseudonymization (round 7): sha256(salt||value) tokens;
        # privacy family driver-exercised via doc_pii_scrub; fully
        # SQL-oracled
        "doc_pseudonymize",
        # UNPIVOT/melt (round 7): the reshaping inverse of the exposed
        # pivot_order_status (same family); fully SQL-oracled
        "unpivot_order_status",
        # Spark 4 VARIANT extraction (round 7): parse_json + typed
        # variant_get; JSON family driver-exercised via
        # events_json_extract; fully SQL-oracled
        "events_variant_extract",
    }
)
DRIVER_QUERY_CAP = 50


def register(name: str, oracle: str | None = None, headline: bool = False, doc: str = "",
             session_conf=None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline,
                                   doc=doc, session_conf=session_conf)
        return fn

    return deco


def bytes_scaled_shuffle(*tables: str, bytes_per_partition: int = 64 << 20):
    """A session_conf callable sizing this query's shuffle width from its
    INPUT bytes (one partition per `bytes_per_partition`, min 1) — the
    static-width equivalent of AQE's bytes-based coalescing without AQE's
    per-stage replanning latency. Rationale (measured, ARCHITECTURE.md):
    the events family shuffles a payload of the same order as its scan,
    and a global per-sf width splits those few MB into near-empty tasks;
    task scheduling then dominates. One partition per 64 MB keeps local
    benches on 1 task and scales to thousands of tasks at cluster volumes."""

    def conf(spark: SparkSession, sf_dir: str) -> dict:
        total = 0
        for t in tables:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            elif os.path.exists(p):
                total += os.path.getsize(p)
        width = max(1, total // bytes_per_partition)
        return {"spark.sql.shuffle.partitions": str(width)}

    return conf


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to plain TIMESTAMP.

    The driver fixture's `events.ts` is untagged parquet timestamp[us]
    (isAdjustedToUTC=false); Spark 4.x infers that as TIMESTAMP_NTZ, which
    most time functions (unix_micros, watermarks over LTZ windows) reject.
    Session tz is pinned UTC (session.py), so the cast is value-identical,
    and the DuckDB oracle side casts to plain TIMESTAMP too."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# session -> {(sf_dir, name): DataFrame}. DataFrames are immutable logical
# plans, so handing the same object to every caller is safe; caching skips
# the per-call parquet footer read + schema resolution (~20-40 ms of driver
# latency per table per query — material when bench times 16 queries x 4
# runs). WeakKeyDictionary so a stopped session's cache dies with it.
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


from duckdb_routing_spark.operators.common import literal_df  # noqa: F401  (re-export: query modules import it from here)


def register_table_override(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> None:
    """Point `table(spark, sf_dir, name)` at an arbitrary DataFrame.

    Storage-layout indirection: every registered query resolves its inputs
    through `table()`, so overriding a (sf_dir, name) binding runs the SAME
    query code unchanged over a different physical source — a bucketed
    `saveAsTable` catalog table (co-located joins, no exchange), a Delta /
    Iceberg table, or a temp view. Used by tools/scale_study.py --bucketed
    to measure the bucketed-layout join plans."""
    _TABLE_CACHE.setdefault(spark, {})[(sf_dir, name)] = normalize_timestamps(df)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table; plain parquet scan so Catalyst pushdown
    and pruning apply.

    Timestamp handling (the fixture's `events.ts` has shipped as both
    timestamp[ns] and untagged timestamp[us] across driver environments):
      - timestamp[ns]: read as nano-epoch long
        (spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
        TIMESTAMP — the same truncation DuckDB applies casting TIMESTAMP_NS
        to TIMESTAMP.
      - untagged timestamp[us]: would infer as TIMESTAMP_NTZ; read as plain
        TIMESTAMP (inferTimestampNTZ off + a defensive cast), matching the
        oracle's `cast(ts as timestamp)`."""
    cache = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    if name == "events":
        # the driver's own session won't have these in its builder; they are
        # dynamic SQLConfs, so set them defensively before touching the file
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = normalize_timestamps(df)
    cache[key] = df
    return df
