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


def test_st_length_and_wkb_identities(spark):
    """ST_Length = haversine sum over the linestring (the reference macro's
    semantics, ITALY.md:264-274); ST_GeomFromWKB/ST_AsWKB round-trip; and a
    LIVE route's WKB has a plausible, positive length."""
    import math

    from duckdb_routing_spark.routing.geometry import haversine_m_scalar

    register_geo_functions(spark)
    ls = build_wkb_linestring([13.0, 13.001, 13.002], [52.0, 52.0, 52.001])
    expect = haversine_m_scalar(13.0, 52.0, 13.001, 52.0) + haversine_m_scalar(
        13.001, 52.0, 13.002, 52.001
    )
    df = spark.createDataFrame([(ls,)], "g binary")
    row = df.selectExpr(
        "st_length(g) AS L",
        "st_length(st_geomfromwkb(st_aswkb(g))) AS L2",
        "st_npoints(st_geomfromwkb(g)) AS n",
        "st_length(st_point(13.0, 52.0)) AS pt_len",
    ).first()
    assert math.isclose(row.L, expect, rel_tol=1e-12)
    assert row.L2 == row.L
    assert row.n == 3
    assert row.pt_len == 0.0
    # registration surface includes the identities (catalog introspection;
    # note SHOW USER FUNCTIONS omits names that shadow a builtin — Spark 4.1
    # ships a builtin st_geomfromwkb — but listFunctions() and resolution
    # both pick the session-registered UDF, as the BinaryType result proves)
    names = {f.name for f in spark.catalog.listFunctions()}
    assert {"st_length", "st_geomfromwkb", "st_aswkb"} <= names


def test_st_length_on_live_route(spark):
    """Drive a real routed WKB geometry through ST_Length: the path length
    must be >= the straight-line haversine distance between its endpoints."""
    from duckdb_routing_spark.routing.engine import RoutingEngine
    from duckdb_routing_spark.routing.geometry import haversine_m_scalar
    from duckdb_routing_spark.testing import build_grid_graph

    eng = RoutingEngine(spark)
    eng.load_graph(build_grid_graph("auto"), "auto")
    eng.register()
    register_geo_functions(spark)
    row = spark.sql(
        "SELECT travel_time_route_wkb('POINT(13.000 52.000)', 'POINT(13.009 52.009)', 'auto') AS r"
    ).selectExpr("st_length(r.geometry) AS L", "st_npoints(r.geometry) AS n").first()
    straight = haversine_m_scalar(13.0, 52.0, 13.009, 52.009)
    assert row.n >= 2
    assert row.L >= straight * 0.99
    assert row.L < straight * 3.0


def test_geo_functions_null_handling(spark):
    register_geo_functions(spark)
    row = spark.sql(
        "SELECT st_astext(NULL) AS a, st_npoints(NULL) AS b, st_centroid(NULL) AS c"
    ).first()
    assert row.a is None and row.b is None and row.c is None


def test_new_operator_plans_are_scale_shaped(spark):
    """Plan audits for the round-2 operators: bucketed joins stay equi-joins
    (no cartesian products), small sides broadcast, the pair space never
    materializes globally."""
    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators import dedup, similarity

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")

    plans = {
        "ivf_topk": audit.formatted_plan(
            similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=10)
        ),
        "cosine_near_dup": audit.formatted_plan(
            similarity.cosine_near_dup_pairs(emb, threshold=0.3, dim=64)
        ),
        "lsh_candidates": audit.formatted_plan(dedup.lsh_candidate_pairs(docs)),
        "winnow": audit.formatted_plan(
            __import__("duckdb_routing_spark.operators.text", fromlist=["text"]).winnowed_fingerprints(docs)
        ),
    }
    for name, plan in plans.items():
        if name == "ivf_topk":
            # the ONLY cartesian allowed is vectors x the tiny seed table
            # (8 rows, broadcast) for cell assignment
            assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan, name
            continue
        assert "CartesianProduct" not in plan, f"{name} materializes the full pair space"
    # LSH candidates: NO join at all — pairs generate row-locally inside
    # (band, band_sig) buckets (one aggregate keyed on the bucket + a pair
    # explode); the old self-join form computed the MinHash pipeline twice
    # because its broadcast build side couldn't reuse the probe's exchange
    assert "Join" not in plans["lsh_candidates"], "bucket pairing must not re-join the signature stream"
    assert "hashpartitioning(band" in plans["lsh_candidates"]
    assert "Generate" in plans["lsh_candidates"]  # the row-local pair explode
    assert "hashpartitioning" in plans["winnow"] or "Window" in plans["winnow"]


def test_sql_udfs_use_batch_snap_not_scalar():
    """The locate/snap/route_wkb UDFs must snap through the vectorized
    nearest_main_nodes kernel — the per-row nearest_main_node loop was the
    last row-at-a-time hot path (~40k scalar calls per 20k-row batch). The
    scalar call remains legal only in the bounded JSON escape hatch
    (travel_time_request) and in driver-side single-point entry points."""
    import inspect

    from duckdb_routing_spark.routing.engine import RoutingEngine

    src = inspect.getsource(RoutingEngine.register)
    # slice out the escape-hatch UDF, which is allowed to snap per row
    start = src.index("def travel_time_request")
    end = src.index("def travel_time_is_loaded")
    vectorized_part = src[:start] + src[end:]
    assert "nearest_main_node(" not in vectorized_part, (
        "scalar nearest_main_node call found in a batch UDF path"
    )
    assert "nearest_main_nodes(" in src  # the batch kernel is actually wired


def test_sql_text_function_kit_matches_dataframe_forms(spark):
    """The SQL-defined text functions (functions/text.py) must agree exactly
    with the DataFrame column forms they mirror (operators/text.py) — same
    marker profiles, same constants, one source of truth; and they must stay
    JVM-side (no BatchEvalPython / ArrowEvalPython in the plan)."""
    from duckdb_routing_spark.functions.text import register_text_functions
    from duckdb_routing_spark.operators import text as T

    register_text_functions(spark)
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(300).cache()
    docs.createOrReplaceTempView("docs_sqlkit")

    via_sql = spark.sql(
        """
        SELECT doc_id,
               tok_count(text)        AS n_tokens,
               unique_tok_count(text) AS n_unique_tokens,
               avg_token_len(text)    AS avg_token_len,
               stopword_ratio(text)   AS stop_ratio,
               quality_score(text)    AS quality,
               doc_fingerprint(text)  AS fp,
               lang_id(text)          AS lang_pred,
               bpe_tok_count(text)    AS n_bpe
        FROM docs_sqlkit
        """
    )
    assert "EvalPython" not in via_sql._jdf.queryExecution().executedPlan().toString()
    got = via_sql.orderBy("doc_id").toPandas()

    t = F.col("text")
    want = (
        docs.select(
            "doc_id",
            T.token_count(t).alias("n_tokens"),
            T.unique_token_count(t).alias("n_unique_tokens"),
            T.avg_token_len(t).alias("avg_token_len"),
            T.stopword_ratio(t).alias("stop_ratio"),
            T.quality_score(t).alias("quality"),
            T.fingerprint(t).alias("fp"),
            T.lang_id(t).alias("lang_pred"),
            T.bpe_ish_token_count(t).alias("n_bpe"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    docs.unpersist()
    assert len(got) == len(want) > 0
    assert (got["lang_pred"] != "und").any()  # classifier actually fires
    for c in got.columns:
        assert got[c].equals(want[c]), f"column {c} differs between SQL and DataFrame forms"


def test_sql_vector_function_kit(spark):
    """dot/cosine/l2/norm SQL functions: JVM-side, agree with numpy to
    float64 tolerance, and satisfy exact identities (cos(a,a)=1 within eps,
    l2(a,a)=0, dot(a,a)=norm(a)^2 exactly — same fold order)."""
    import numpy as np

    from duckdb_routing_spark.functions.vector import register_vector_functions

    register_vector_functions(spark)
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(64).cache()
    emb.createOrReplaceTempView("emb_sqlkit")
    df = spark.sql(
        """
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               dot_product(a.embedding, b.embedding) AS dp,
               cosine_sim(a.embedding, b.embedding)  AS cs,
               l2_dist(a.embedding, b.embedding)     AS l2,
               vec_norm(a.embedding)                 AS na
        FROM emb_sqlkit a JOIN emb_sqlkit b ON b.vec_id = (a.vec_id + 1)
        """
    )
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()
    got = df.orderBy("ia").toPandas()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()}
    emb.unpersist()
    assert len(got) > 10
    for _, r in got.iterrows():
        va, vb = vecs[r.ia], vecs[r.ib]
        assert abs(r.dp - float(va @ vb)) < 1e-9
        assert abs(r.cs - float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))) < 1e-9
        assert abs(r.l2 - float(np.linalg.norm(va - vb))) < 1e-9
        assert abs(r.na - float(np.linalg.norm(va))) < 1e-9
    # identities on the self-pair
    ident = spark.sql(
        "SELECT max(abs(cosine_sim(embedding, embedding) - 1.0)) AS ce, "
        "       max(l2_dist(embedding, embedding)) AS le, "
        "       max(abs(dot_product(embedding, embedding) - vec_norm(embedding) * vec_norm(embedding))) AS de "
        "FROM emb_sqlkit"
    ).first()
    assert ident["ce"] < 1e-12 and ident["le"] == 0.0 and ident["de"] < 1e-12


def test_round4_operator_plans_are_scale_shaped(spark):
    """Plan audits for the round-4 operators: chunking / PII / repetition
    are shuffle-free row-local projections; contamination broadcasts the
    eval gram set; packing's only single-partition window runs over the
    32-row bucket-totals aggregate, never the data."""
    from duckdb_routing_spark.operators import chunking, text
    from duckdb_routing_spark.operators.sampling import temperature_sample

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")

    for name, df in {
        "chunks": chunking.chunk_documents(docs),
        "pii": text.scrub_pii(docs),
        "repetition": text.repetition_signals(docs),
    }.items():
        plan = audit.formatted_plan(df)
        assert "Exchange" not in plan, f"{name} should be shuffle-free"
        assert audit.python_eval_stages(df) == 0, f"{name} fell off the JVM fast path"

    bench = docs.filter("doc_id % 23 = 0")
    cand = docs.filter("doc_id % 23 <> 0")
    p_cont = audit.formatted_plan(text.contamination_overlap(cand, bench))
    assert "CartesianProduct" not in p_cont
    assert "BroadcastHashJoin" in p_cont, "eval gram set should broadcast"

    p_pack = audit.formatted_plan(chunking.pack_sequences(docs))
    assert "CartesianProduct" not in p_pack
    # the data-side window is per-bucket (hashpartitioning on _b); at most
    # one SinglePartition exchange exists and it carries the 32-row offsets
    assert "hashpartitioning(_b" in p_pack, "per-bucket cumsum must hash-partition the data"
    assert p_pack.count("Exchange SinglePartition") <= 2

    p_temp = audit.formatted_plan(temperature_sample(docs))
    assert "BroadcastHashJoin" in p_temp, "per-source rate table should broadcast"

    # training-export family: mixture explode and shard assignment are
    # row-local — zero exchanges before the caller's own shuffle/agg
    from duckdb_routing_spark.operators.sampling import mix_sources
    from duckdb_routing_spark.operators.shard import assign_shards

    p_mix = audit.formatted_plan(mix_sources(docs, {"src0": 2.5, "src1": 0.4}))
    assert "Exchange" not in p_mix, "mix_sources must stay shuffle-free"
    p_shard = audit.formatted_plan(assign_shards(docs, 1024))
    assert "Exchange" not in p_shard, "shard assignment must stay shuffle-free"
    assert audit.python_eval_stages(assign_shards(docs, 1024)) == 0


def test_round6_operator_plans_are_scale_shaped(spark):
    """Plan audits for the round-6 additions: the quality classifier is ONE
    broadcast model join + ONE doc-keyed partial-agg shuffle with zero
    Python; BPE encode is a single Arrow stage with no shuffle; semantic
    dedup's only unkeyed join is the broadcast seed table."""
    from duckdb_routing_spark.operators import bpe, similarity, text

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")

    clf = text.quality_classifier(docs, text.classifier_weights(spark))
    p_clf = audit.formatted_plan(clf)
    assert "BroadcastHashJoin" in p_clf, "model weights must broadcast"
    assert "SortMergeJoin" not in p_clf
    # physical toString spells exchanges inline ("Exchange hashpartitioning")
    p_clf_phys = clf._jdf.queryExecution().executedPlan().toString()
    assert p_clf_phys.count("Exchange hashpartitioning") == 1, "one doc-keyed agg shuffle only"
    assert audit.python_eval_stages(clf) == 0, "classifier fell off the JVM fast path"

    enc = bpe.bpe_encode(docs, [("e", "</w>"), ("t", "h")])
    p_enc = audit.formatted_plan(enc)
    assert "Exchange" not in p_enc, "BPE encode must be a row-local map"
    assert audit.python_eval_stages(enc) == 1, "one Arrow batch stage, not per-row Python"

    p_sem = audit.formatted_plan(similarity.semantic_dedup(emb, threshold=0.25))
    assert "CartesianProduct" not in p_sem, "pair space must stay cell-local"


def test_dup_span_plans_stay_keyed(spark):
    """Substring dedup must never materialize a pair space or a range join:
    span detection is two keyed shuffles past the spread repartition (gram
    hash for the duplicate test, doc_id for the island merge — the final
    groupBy(doc_id, island) must REUSE the window's doc_id partitioning),
    and span surgery's span->token expansion must be sequence(), planned as
    keyed hash joins only."""
    from duckdb_routing_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")

    spans = audit.formatted_plan(dedup.duplicated_spans(docs, n=8))
    cut = audit.formatted_plan(dedup.cut_duplicated_spans(docs, n=8))
    for name, plan in (("spans", spans), ("cut", cut)):
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} planned a range join"
    # exchange budget: spread + gram window + doc window; a 4th exchange
    # means the islands groupBy stopped reusing the doc_id partitioning
    assert spans.count("Exchange hashpartitioning") <= 3, spans
    assert cut.count("Exchange hashpartitioning") <= 5, cut


def test_no_cartesian_product_across_entire_registry(spark):
    """Sweep every BATCH registry query's physical plan at sf0.001: a
    CartesianProduct anywhere means an unkeyed pair space that would
    detonate at scale. (BroadcastNestedLoopJoin is allowed — every use in
    the registry is a one-row scalar or bounded seed table crossJoin;
    streaming queries execute streams and routing queries build graphs, so
    both audit their plans in their own suites.)"""
    from tests.conftest import SF_ORACLE

    skipped_prefixes = ("stream_", "route_")
    offenders = {}
    for name, spec in sorted(REGISTRY.items()):
        if name.startswith(skipped_prefixes):
            continue
        df = spec.fn(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = plan[:400]
    assert not offenders, list(offenders)


def test_round7_operator_plans_are_scale_shaped(spark):
    """Plan audits for the round-7 additions: every new operator stays on
    keyed shuffles and broadcasts — gapfill windows partition by key, SCD2
    windows by the dimension key, hybrid RRF's only broadcast-side join is
    the 16-row query vector (plus two bounded top-k lists), ER's self-join
    is an equi-join on the blocking columns, incremental merge is a keyed
    re-agg, and none of them materialize a cartesian pair space or fall
    into Python."""
    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators import er, incremental, scd, search, timeseries

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")

    gap = timeseries.bucket_gapfill(events.withColumn("ts", F.col("ts").cast("timestamp")))
    p_gap = audit.formatted_plan(gap)
    assert "CartesianProduct" not in p_gap
    assert "PartitionBy: [k" in p_gap or "partitionBy" in p_gap.lower() or "Window" in p_gap
    assert audit.python_eval_stages(gap) == 0, "gapfill must stay JVM-side"

    dim = scd.scd2_from_changelog(
        orders.select("o_custkey", F.col("o_orderdate").alias("ts"), "o_orderkey", "o_orderstatus"),
        "o_custkey", "ts", ["o_orderstatus"], tiebreak_col="o_orderkey",
    )
    p_dim = audit.formatted_plan(dim)
    assert "CartesianProduct" not in p_dim
    assert audit.python_eval_stages(dim) == 0
    # both windows cluster on the dimension key: exactly one key exchange
    phys = dim._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") == 1, "SCD2 must reuse one key partitioning"

    fused = search.hybrid_rrf_search(docs, "hash join batch")
    p_rrf = audit.formatted_plan(fused)
    assert "CartesianProduct" not in p_rrf
    assert "TakeOrderedAndProject" in p_rrf, "each list must end in a distributed top-k"
    assert audit.python_eval_stages(fused) == 0

    pairs = er.blocked_levenshtein_pairs(cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"])
    p_er = audit.formatted_plan(pairs)
    assert "CartesianProduct" not in p_er, "ER must equi-join on the block key"
    assert audit.python_eval_stages(pairs) == 0

    st = incremental.partial_agg_state(orders, ["o_orderpriority"], "o_totalprice")
    merged = incremental.merge_agg_states(st, st, ["o_orderpriority"])
    p_m = audit.formatted_plan(merged)
    assert "CartesianProduct" not in p_m and "partial" in p_m.lower()
    assert audit.python_eval_stages(merged) == 0


def test_spatial_join_blocking_and_semantics(spark):
    """points_in_polygons: exact containment (verified against an
    independent pure-Python ray cast on a planted fixture) and a blocked
    plan — the candidate join is an equi-join on grid cell, no cartesian,
    no Python stage."""
    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators.geo_join import points_in_polygons

    # unit square and a diamond, plus points in/out/near
    sq = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    di = [(25.0, 20.0), (20.0, 25.0), (15.0, 20.0), (20.0, 15.0), (25.0, 20.0)]
    polys = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in sq]), (2, [{"x": x, "y": y} for x, y in di])],
        "poly_id long, vertices array<struct<x double, y double>>",
    )
    pts = spark.createDataFrame(
        [(10, 5.0, 5.0), (11, 10.5, 5.0), (12, 20.0, 20.0), (13, 24.0, 20.5),
         (14, 24.0, 24.0), (15, -1.0, -1.0)],
        "point_id long, x double, y double",
    )
    out = points_in_polygons(pts, polys, cell_size=4.0)
    got = {(r.point_id, r.poly_id) for r in out.collect()}
    # 13: |dx|+|dy| from center (20,20) = 4.5 < 5 -> inside diamond;
    # 14: 8 > 5 -> outside (bbox cell would still candidate it)
    assert got == {(10, 1), (12, 2), (13, 2)}
    plan = audit.formatted_plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert audit.python_eval_stages(out) == 0


def test_single_task_worker_reuse(spark):
    """Single-task Arrow kernels must DRAIN their input iterator: a python
    worker whose input is not fully consumed is killed instead of returned
    to the reuse pool, and every later action pays a fresh worker spawn
    (~0.3-0.5 s — the round-7 bench bimodality). Repeated executions of
    the small-build kernel must land on ONE worker pid."""
    import pandas as pd

    from duckdb_routing_spark.routing.osm_build import build_cardinalities_from_grid

    # The deterministic property (independent of pool size/selection order,
    # which varies with session history): an UNDRAINED kernel's worker is
    # KILLED after its task — its pid never serves again and consecutive
    # undrained runs always get brand-new pids. Drained kernels' workers
    # return to the pool (their pids MAY repeat; with a large idle pool they
    # may not, so no assertion on repetition).
    def drained_task(batches):
        import os

        for _ in batches:
            pass
        yield pd.DataFrame({"pid": [os.getpid()]})

    def undrained_task(batches):
        import os

        yield pd.DataFrame({"pid": [os.getpid()]})

    d = spark.range(1, numPartitions=1).mapInPandas(drained_task, "pid long")
    u = spark.range(1, numPartitions=1).mapInPandas(undrained_task, "pid long")
    undrained = [u.collect()[0]["pid"] for _ in range(3)]
    assert len(set(undrained)) == 3, f"undrained worker unexpectedly reused: {undrained}"
    later = [d.collect()[0]["pid"] for _ in range(8)] + [u.collect()[0]["pid"]]
    assert set(undrained).isdisjoint(later), (
        f"a killed (undrained) worker pid reappeared: {set(undrained) & set(later)}"
    )

    # the real kernels produce stable results across reused-worker runs
    tb = build_cardinalities_from_grid(spark, 12, 12, "auto")
    assert [tuple(r) for r in tb.collect()] == [tuple(r) for r in tb.collect()]


def test_triangle_counts_semantics(spark):
    """Planted graph: a 4-clique holds 4 triangles (3 per member), an open
    path holds none; duplicate/reversed edges and self-loops are
    canonicalized away; the pair joins stay equi-joins."""
    from duckdb_routing_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        # K4 on 1-4 (+ a reversed duplicate + a self-loop), path 10-11-12
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 3), (2, 2),
         (10, 11), (11, 12)],
        "a long, b long",
    )
    out = triangle_counts(edges)
    got = {r.node: r.n_triangles for r in out.collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    plan = audit.formatted_plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_spatial_join_degenerate_polygons(spark):
    """Zero-area rings (r=0 diamonds, collinear strips) contain nothing
    under the strict even-odd predicate — no crash, no spurious pairs."""
    from duckdb_routing_spark.operators.geo_join import points_in_polygons

    polys = spark.createDataFrame(
        [
            (1, [{"x": 5.0, "y": 5.0}] * 5),                       # point ring
            (2, [{"x": 0.0, "y": 0.0}, {"x": 9.0, "y": 0.0}, {"x": 0.0, "y": 0.0}]),  # collinear
        ],
        "poly_id long, vertices array<struct<x double, y double>>",
    )
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 4.0, 0.0)], "point_id long, x double, y double"
    )
    assert points_in_polygons(pts, polys, cell_size=4.0).count() == 0


def test_bytes_scaled_shuffle_session_conf(spark):
    """The events-family per-query override sizes shuffle width from input
    bytes: tiny fixtures resolve to 1 partition (the measured sf0.1
    winner), and the width grows once inputs exceed bytes_per_partition —
    the self-scaling property that makes the override honest at volume."""
    from duckdb_routing_spark.queries.registry import REGISTRY, bytes_scaled_shuffle

    conf = bytes_scaled_shuffle("events")(spark, "/root/testdata/sf0.001")
    assert conf == {"spark.sql.shuffle.partitions": "1"}
    fine = bytes_scaled_shuffle("lineitem", bytes_per_partition=1024)(
        spark, "/root/testdata/sf0.001"
    )
    assert int(fine["spark.sql.shuffle.partitions"]) > 1
    # the wired queries carry the override; applying it must not change values
    for name in ("events_hourly", "events_sessionize"):
        spec = REGISTRY[name]
        assert callable(spec.session_conf)
        base = [tuple(r) for r in spec.fn(spark, "/root/testdata/sf0.001").collect()]
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            for k, v in spec.session_conf(spark, "/root/testdata/sf0.001").items():
                spark.conf.set(k, v)
            got = [tuple(r) for r in spec.fn(spark, "/root/testdata/sf0.001").collect()]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
        assert got == base
