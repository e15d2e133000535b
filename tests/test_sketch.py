"""HyperLogLog sketch: mergeability, estimate accuracy, and plan shape.

Register-table value parity vs DuckDB is covered by test_oracle_parity
(query `sketch_hll_registers`); these tests cover what the hash-oracle
cannot: the merge algebra, the estimate's error bound, and the map-side
partial aggregation that makes the sketch 100 TB-shaped."""

import math

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 20k rows over exactly 7,000 distinct keys, with skewed repetition
    df = spark.range(20_000).select(
        F.pmod(F.col("id") * 2654435761, 7_000).alias("k"),
        F.col("id"),
    )
    return df.cache()


def test_merge_of_splits_equals_whole(spark, keys):
    whole = hll_registers(keys, "k", b=10)
    lo = hll_registers(keys.filter(F.col("id") < 8_000), "k", b=10)
    hi = hll_registers(keys.filter(F.col("id") >= 8_000), "k", b=10)
    merged = hll_merge(lo, hi)
    a = {r.register: r.max_rank for r in whole.collect()}
    m = {r.register: r.max_rank for r in merged.collect()}
    assert a == m


def test_merge_idempotent_and_commutative(spark, keys):
    s = hll_registers(keys, "k", b=8)
    twice = hll_merge(s, s)
    assert {tuple(r) for r in twice.collect()} == {tuple(r) for r in s.collect()}
    ba = hll_merge(hll_registers(keys.filter(F.col("id") % 2 == 0), "k", b=8),
                   hll_registers(keys.filter(F.col("id") % 2 == 1), "k", b=8))
    ab = hll_merge(hll_registers(keys.filter(F.col("id") % 2 == 1), "k", b=8),
                   hll_registers(keys.filter(F.col("id") % 2 == 0), "k", b=8))
    assert {tuple(r) for r in ab.collect()} == {tuple(r) for r in ba.collect()}


def test_estimate_within_error_bound(spark, keys):
    exact = keys.select("k").distinct().count()
    for b in (10, 12):
        est = hll_estimate(hll_registers(keys, "k", b=b), b=b)
        rel = abs(est - exact) / exact
        # 1.04/sqrt(m) standard error; allow 4 sigma
        assert rel < 4 * 1.04 / math.sqrt(1 << b), (b, est, exact, rel)


def test_estimate_small_range_linear_counting(spark):
    # 50 distinct keys at b=12: deep in linear-counting territory, where the
    # estimate should be near-exact
    df = spark.range(500).select(F.pmod(F.col("id"), 50).alias("k"))
    est = hll_estimate(hll_registers(df, "k", b=12), b=12)
    assert abs(est - 50) < 2


def test_null_keys_ignored(spark):
    df = spark.range(100).select(
        F.when(F.col("id") < 50, F.col("id")).alias("k")
    )
    only = spark.range(50).select(F.col("id").alias("k"))
    a = {tuple(r) for r in hll_registers(df, "k", b=8).collect()}
    b = {tuple(r) for r in hll_registers(only, "k", b=8).collect()}
    assert a == b


def test_partial_aggregation_in_plan(spark, keys):
    """The groupBy(register) must partially aggregate map-side (HashAggregate
    below the exchange), so each partition ships <=2^b rows — the property
    that makes the sketch cheaper than exact distinct at scale."""
    plan = hll_registers(keys, "k", b=12)._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    # a partial_max aggregate must appear BELOW (after, in print order) the exchange
    assert "partial_max" in plan[first_exchange:], plan


def test_invalid_b_rejected(spark, keys):
    with pytest.raises(ValueError):
        hll_registers(keys, "k", b=3)
    with pytest.raises(ValueError):
        hll_registers(keys, "k", b=19)


# ---------------------------------------------------------------------------
# Count-Min sketch (cell-table value parity vs DuckDB is covered by
# test_oracle_parity, query `sketch_cms_cells`; these cover the merge
# algebra, the one-sided error guarantee, and the map-side partial agg)
# ---------------------------------------------------------------------------

from duckdb_routing_spark.operators.sketch import (  # noqa: E402
    cms_cells,
    cms_estimate,
    cms_merge,
)


def test_cms_merge_of_splits_equals_whole(spark, keys):
    whole = cms_cells(keys, "k", depth=4, width=128)
    lo = cms_cells(keys.filter(F.col("id") < 8_000), "k", depth=4, width=128)
    hi = cms_cells(keys.filter(F.col("id") >= 8_000), "k", depth=4, width=128)
    merged = cms_merge(lo, hi)
    a = {(r.row, r.col): r.cnt for r in whole.collect()}
    m = {(r.row, r.col): r.cnt for r in merged.collect()}
    assert a == m


def test_cms_estimates_one_sided_and_bounded(spark, keys):
    # est >= true always; est <= true + eps*N w.h.p. at width=e/eps
    depth, width = 4, 256
    cells = cms_cells(keys, "k", depth=depth, width=width)
    true = keys.groupBy("k").count().withColumnRenamed("k", "key")
    est = cms_estimate(cells, keys.select("k").distinct(), "k", depth=depth, width=width)
    joined = est.join(true, "key").collect()
    n_total = keys.count()
    eps = math.e / width
    assert all(r["est"] >= r["count"] for r in joined)
    over = [r for r in joined if r["est"] > r["count"] + eps * n_total]
    # delta = e^-depth ~ 1.8%; allow 5x slack on 7k point queries
    assert len(over) <= 0.09 * len(joined), len(over)


def test_cms_absent_key_estimates_from_zero_floor(spark, keys):
    # a key never inserted can still collide, but min() over depth rows
    # with the 0-floor for absent cells keeps tiny estimates tiny
    cells = cms_cells(keys, "k", depth=4, width=256)
    ghosts = spark.range(7_000, 7_050).select(F.col("id").alias("k"))
    est = cms_estimate(cells, ghosts, "k", depth=4, width=256)
    rows = est.collect()
    assert len(rows) == 50
    n_total = 20_000
    assert all(0 <= r["est"] <= math.e / 256 * n_total * 5 for r in rows)


def test_cms_partial_aggregation_in_plan(spark, keys):
    plan = cms_cells(keys, "k", depth=4, width=256)._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    assert "partial_count" in plan[first_exchange:], plan


def test_cms_invalid_params_rejected(spark, keys):
    with pytest.raises(ValueError):
        cms_cells(keys, "k", depth=0)
    with pytest.raises(ValueError):
        cms_cells(keys, "k", depth=9)


# ---------------------------------------------------------------------------
# fixed-bin histogram (bin-table value parity vs DuckDB is covered by
# test_oracle_parity, query `sketch_hist_bins`)
# ---------------------------------------------------------------------------

from duckdb_routing_spark.operators.sketch import (  # noqa: E402
    hist_bins,
    hist_merge,
    hist_quantile,
)


def test_hist_merge_of_splits_equals_whole(spark, keys):
    whole = hist_bins(keys, "k", 0.0, 7000.0, 64)
    lo = hist_bins(keys.filter(F.col("id") < 8_000), "k", 0.0, 7000.0, 64)
    hi = hist_bins(keys.filter(F.col("id") >= 8_000), "k", 0.0, 7000.0, 64)
    a = {r.bin: r.cnt for r in whole.collect()}
    m = {r.bin: r.cnt for r in hist_merge(lo, hi).collect()}
    assert a == m


def test_hist_quantile_within_bin_width(spark, keys):
    n_bins, lo, hi = 128, 0.0, 7000.0
    bins = hist_bins(keys, "k", lo, hi, n_bins)
    width = (hi - lo) / n_bins
    for q in (0.1, 0.5, 0.9):
        est = hist_quantile(bins, q, lo, hi, n_bins)
        exact = keys.selectExpr(f"percentile(k, {q}) p").collect()[0].p
        assert abs(est - exact) <= width + 1e-9, (q, est, exact)


def test_hist_out_of_range_clamps_into_edge_bins(spark):
    df = spark.range(10).select((F.col("id") * 1000 - 2000).cast("double").alias("v"))
    bins = {r.bin: r.cnt for r in hist_bins(df, "v", 0.0, 1000.0, 10).collect()}
    # values: -2000,-1000 clamp to bin 0; 0..900? no: 0,1000..7000 -> >=1000 clamp to 9
    assert sum(bins.values()) == 10
    assert bins[0] == 3  # -2000, -1000, 0
    assert bins[9] == 7  # 1000..7000 all clamp high


def test_hist_invalid_params_rejected(spark, keys):
    with pytest.raises(ValueError):
        hist_bins(keys, "k", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        hist_bins(keys, "k", 0.0, 1.0, 0)
    with pytest.raises(ValueError):
        hist_quantile(hist_bins(keys, "k", 0.0, 7000.0, 8), 1.5, 0.0, 7000.0, 8)


def test_cms_frequency_filter_result_identical_and_no_misses(spark, keys):
    from duckdb_routing_spark.operators.sketch import cms_frequency_filter

    probes = keys.select("k").distinct().withColumnRenamed("k", "pk")
    got = {
        (r.pk, r.n_facts)
        for r in cms_frequency_filter(keys, "k", probes, "pk", min_count=5, width=512).collect()
    }
    want = {
        (r.k, r.cnt)
        for r in keys.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5).collect()
    }
    assert got == want
    # tiny sketch (heavy collisions) still NEVER misses — only the exact
    # verify pass has to work harder
    got_tiny = {
        r.pk for r in cms_frequency_filter(keys, "k", probes, "pk", min_count=5,
                                           depth=2, width=32).collect()
    }
    assert got_tiny == {k for k, _ in want}


def test_topk_frequent_sketch_exact_when_capacity_covers(spark):
    """With capacity >= per-partition distinct keys the MG summaries make
    no decrements, so the sketch top-k equals the exact baseline
    byte-for-byte (keys, counts, ranks)."""
    from duckdb_routing_spark.operators.sketch import topk_frequent, topk_frequent_sketch

    rows = [(f"k{i % 37}",) for i in range(5000)] + [("hot",)] * 500 + [("warm",)] * 100
    df = spark.createDataFrame(rows, "tok string").repartition(4)
    exact = [(r.key, r.n, r.rank) for r in topk_frequent(df, "tok", k=10).collect()]
    approx = [(r.key, r.w, r.rank) for r in topk_frequent_sketch(df, "tok", k=10, capacity=64).collect()]
    assert approx == exact
    assert exact[0][0] == "hot" and exact[0][1] == 500


def test_mg_summaries_bounded_state_and_error(spark):
    """Capped capacity: per-partition summaries never exceed `capacity`
    rows, merged weights are LOWER bounds, and every key's underestimate is
    within the classic N/(capacity+1) Misra-Gries bound."""
    from duckdb_routing_spark.operators.sketch import mg_summaries

    import numpy as np

    rng = np.random.RandomState(7)
    # zipf-ish skew over 2000 distinct keys, 40k rows
    keys = [f"k{int(z)}" for z in rng.zipf(1.3, 40_000) % 2000]
    df = spark.createDataFrame([(k,) for k in keys], "tok string").repartition(4)
    capacity = 128
    summaries = mg_summaries(df, "tok", capacity=capacity)
    per_part = (
        df.rdd.getNumPartitions()
    )
    rows = summaries.collect()
    assert len(rows) <= per_part * capacity
    merged = {}
    for r in rows:
        merged[r.key] = merged.get(r.key, 0) + r.w
    true = {}
    for k in keys:
        true[k] = true.get(k, 0) + 1
    bound = len(keys) / (capacity + 1)
    for k, w in merged.items():
        assert w <= true[k], f"overestimate for {k}"
        assert true[k] - w <= bound
    # the heavy head survives the cap
    top_true = max(true, key=lambda k: true[k])
    assert top_true in merged


def test_topk_frequent_twins_agree_on_null_keys(spark):
    """NULL keys: both the exact and MG paths drop them, so the twins agree
    on inputs with missing values (SQL GROUP BY would keep a NULL group —
    the frequency operator's contract is explicit about dropping it)."""
    from duckdb_routing_spark.operators.sketch import topk_frequent, topk_frequent_sketch

    rows = [("a",)] * 5 + [("b",)] * 3 + [(None,)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "tok string").repartition(2)
    exact = [(r.key, r.n) for r in topk_frequent(df, "tok", k=5).collect()]
    approx = [(r.key, r.w) for r in topk_frequent_sketch(df, "tok", k=5, capacity=16).collect()]
    assert exact == [("a", 5), ("b", 3), ("c", 1)]
    assert approx == exact


# --- bottom-k quantile sketch ----------------------------------------------

from duckdb_routing_spark.operators.sketch import (  # noqa: E402
    quantile_sample,
    quantile_sample_estimate,
    quantile_sample_merge,
)


def test_quantile_sample_merge_is_exact(spark):
    """The sketch is a pure function of the row-id set: building over 3
    disjoint slices and merging must be BYTE-identical to building over
    the whole table, and re-merging is idempotent."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    whole = quantile_sample(events, "value", "event_id", k=128).collect()
    parts = [
        quantile_sample(events.filter(f"event_id % 3 = {i}"), "value", "event_id", k=128)
        for i in range(3)
    ]
    merged = quantile_sample_merge(*parts, k=128).collect()
    assert [(r.hkey, r.value) for r in merged] == [(r.hkey, r.value) for r in whole]
    again = quantile_sample_merge(*parts, *[p.limit(0) for p in parts], k=128).collect()
    assert [(r.hkey, r.value) for r in again] == [(r.hkey, r.value) for r in whole]


def test_quantile_sample_estimates_within_sampling_error(spark):
    """Deterministic accuracy check (the sample is fixed, so this cannot
    flake): every decile estimate's TRUE rank must sit inside the DKW
    uniform band at delta=1e-4 — sup-norm, so it covers the correlation
    between deciles of ONE sample (this fixture's sample runs ~2 sigma
    small across all deciles; a per-decile sigma bound is the wrong test)."""
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    k = 512
    sk = quantile_sample(events, "value", "event_id", k=k)
    qs = [i / 10 for i in range(1, 10)]
    est = quantile_sample_estimate(sk, qs)
    vals = sorted(r.value for r in events.select("value").collect())
    n = len(vals)
    import bisect

    tol = math.sqrt(math.log(2 / 1e-4) / (2 * k))  # ~0.098 at k=512
    for q, v in est.items():
        true_rank = bisect.bisect_right(vals, v) / n
        assert abs(true_rank - q) <= tol, (q, v, true_rank, tol)


def test_quantile_sample_plan_is_partial_topk(spark):
    """The build must plan as TakeOrderedAndProject — map-side partial
    bottom-k, k rows per task, no full shuffle/sort of the data."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        quantile_sample(events, "value", "event_id", k=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:500]
    assert "Exchange" not in plan


def test_hll_grouped_merge_equals_direct_sketch(spark):
    from duckdb_routing_spark.operators import sketch

    df = spark.createDataFrame(
        [(d, h, u) for d in ("a", "b") for h in range(3) for u in range(d == "a", 40 + 10 * h)],
        "day string, hr int, user_id long",
    )
    hourly = sketch.hll_registers_grouped(df, "user_id", ["day", "hr"], b=8)
    rolled = sketch.hll_merge_grouped(hourly, ["day"])
    for day in ("a", "b"):
        direct = sketch.hll_registers(df.filter(F.col("day") == day), "user_id", b=8)
        a = sorted((r.register, r.max_rank) for r in rolled.filter(F.col("day") == day).collect())
        b = sorted((r.register, r.max_rank) for r in direct.collect())
        assert a == b
