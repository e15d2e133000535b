"""Seeded-random reference checks for the round-7 operators: independent
pure-Python implementations replayed over randomized inputs (a handful of
seeds — each case is one Spark action, unlike per-example hypothesis).
The DuckDB oracles already pin one fixture bit-for-bit; these pin the
SEMANTICS over input shapes the fixtures don't reach (random run lengths,
ties, sparse series, disjoint lists)."""

import datetime as dt
import random
from decimal import Decimal

import pytest


def _scd2_ref(rows):
    """(k, ts, tb, status) -> {(k, status, valid_from, valid_to, version, is_current)}."""
    out = []
    for k in sorted({r[0] for r in rows}):
        seq = sorted((r for r in rows if r[0] == k), key=lambda r: (r[1], r[2]))
        points = []
        for _, ts, _tb, status in seq:
            if not points or status != points[-1][1]:
                points.append((ts, status))
        for i, (ts, status) in enumerate(points):
            nxt = points[i + 1][0] if i + 1 < len(points) else None
            out.append((k, status, ts, nxt, i + 1, nxt is None))
    return sorted(out, key=lambda r: (r[0], r[4]))


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_scd2_matches_reference_on_random_changelogs(spark, seed):
    from duckdb_routing_spark.operators.scd import scd2_from_changelog

    rng = random.Random(seed)
    rows = [
        (
            rng.randrange(6),
            dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(200)),
            i,
            rng.choice(["A", "B", "C", None]),
        )
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, status string")
    got = sorted(
        ((r["k"], r["status"], r["valid_from"], r["valid_to"], r["version"], r["is_current"])
         for r in scd2_from_changelog(df, "k", "ts", ["status"], tiebreak_col="tb").collect()),
        key=lambda r: (r[0], r[4]),
    )
    assert got == _scd2_ref(rows)


def _gapfill_ref(rows, step=3600):
    """(k, ts_epoch, v) -> {(k, bucket_epoch): (n, v_sum, locf, interp)}."""
    out = {}
    for k in {r[0] for r in rows}:
        obs = {}
        for _, t, v in (r for r in rows if r[0] == k):
            b = (t // step) * step
            n, s = obs.get(b, (0, Decimal(0)))
            obs[b] = (n + 1, s + Decimal(v).quantize(Decimal("0.0001")))
        lo, hi = min(obs), max(obs)
        buckets = list(range(lo, hi + 1, step))
        for i, b in enumerate(buckets):
            if b in obs:
                n, s = obs[b]
                out[(k, b)] = (n, float(s), float(s), float(s))
            else:
                prevs = [x for x in buckets[:i] if x in obs]
                nexts = [x for x in buckets[i + 1:] if x in obs]
                pv = float(obs[prevs[-1]][1]) if prevs else None
                interp = None
                if prevs and nexts:
                    pt, nt = prevs[-1], nexts[0]
                    nv = float(obs[nt][1])
                    interp = pv + (nv - pv) * ((b - pt) / (nt - pt))
                out[(k, b)] = (0, None, pv, interp)
    return out


@pytest.mark.parametrize("seed", [3, 11])
def test_gapfill_matches_reference_on_random_series(spark, seed):
    from duckdb_routing_spark.operators.timeseries import bucket_gapfill

    rng = random.Random(seed)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    rows = [
        (f"k{rng.randrange(3)}", base + rng.randrange(50) * 3600 + rng.randrange(3600),
         round(rng.uniform(-50, 50), 4))
        for _ in range(80)
    ]
    df = spark.createDataFrame(
        [(k, dt.datetime.utcfromtimestamp(t), v) for k, t, v in rows],
        "k string, ts timestamp, value double",
    )
    want = _gapfill_ref(rows)
    got = bucket_gapfill(df, ts_col="ts", key_col="k", value_col="value").collect()
    assert len(got) == len(want)
    for r in got:
        b = int(r["bucket"].replace(tzinfo=dt.timezone.utc).timestamp())
        n, vs, locf, interp = want[(r["k"], b)]
        assert r["n_events"] == n
        for a, w in ((r["v_sum"], vs), (r["v_locf"], locf), (r["v_interp"], interp)):
            if w is None:
                assert a is None
            else:
                assert a == pytest.approx(w, rel=1e-9)


@pytest.mark.parametrize("seed", [5, 17])
def test_ranking_metrics_matches_reference_on_random_lists(spark, seed):
    from duckdb_routing_spark.operators.search import ranking_metrics

    rng = random.Random(seed)
    ranked = [(q, d, r + 1) for q in ("a", "b", "c")
              for r, d in enumerate(rng.sample(range(100), rng.randrange(1, 20)))]
    truth = [(q, d) for q in ("a", "b", "c") for d in rng.sample(range(100), rng.randrange(0, 15))]
    k = rng.randrange(1, 10)
    rdf = spark.createDataFrame(ranked, "q string, doc_id long, rank long")
    tdf = spark.createDataFrame(truth, "q string, doc_id long") if truth else spark.createDataFrame([], "q string, doc_id long")
    got = {r["q"]: r for r in ranking_metrics(rdf, tdf, k=k, group_cols=["q"]).collect()}
    for q in ("a", "b", "c"):
        rl = [(d, r) for (qq, d, r) in ranked if qq == q]
        ts = {d for (qq, d) in truth if qq == q}
        hits = sorted(r for d, r in rl if d in ts)
        row = got[q]
        assert row["n_ranked"] == len(rl) and row["n_relevant"] == len(ts)
        assert row["hits_at_k"] == sum(1 for r in hits if r <= k)
        assert row["first_hit_rank"] == (hits[0] if hits else 0)
        assert row["rr_ppb"] == (1_000_000_000 // hits[0] if hits else 0)


@pytest.mark.parametrize("seed", [3, 11, 42])
@pytest.mark.parametrize("strict", [True, False])
def test_scd2_apply_delta_equals_rebuild_on_random_splits(spark, seed, strict):
    """Randomized fold-vs-rebuild pin for the round-8 last_seen fix: any
    changelog split at a per-key time boundary (delta strictly after every
    historical OBSERVATION — the enforceable precondition) must fold to the
    full rebuild exactly, for BOTH dimension shapes (emit_last_seen dims
    compare last_seen too). Random run lengths, same-ts ties resolved by
    tiebreak, multi-run keys, delta-only keys."""
    from duckdb_routing_spark.operators.scd import scd2_apply_delta, scd2_from_changelog

    rng = random.Random(seed)
    rows = [
        (
            rng.randrange(6),
            dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(60)),
            i,
            rng.choice(["A", "B", "C", None]),
        )
        for i in range(120)
    ]
    # per-key boundary: everything strictly after a random per-key cut goes
    # to the delta; keys 4 and 5 are delta-only (never in history)
    cuts = {k: dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(10, 50)) for k in range(4)}
    hist = [r for r in rows if r[0] < 4 and r[1] <= cuts[r[0]]]
    late = [r for r in rows if r[0] >= 4 or r[1] > cuts[r[0]]]
    if not hist or not late:
        pytest.skip("degenerate split for this seed")
    sch = "k bigint, ts timestamp, tb bigint, status string"
    hist_df = spark.createDataFrame(hist, sch)
    late_df = spark.createDataFrame(late, sch)
    full_df = spark.createDataFrame(hist + late, sch)
    dim = scd2_from_changelog(hist_df, "k", "ts", ["status"], tiebreak_col="tb",
                              emit_last_seen=strict)
    merged = scd2_apply_delta(dim, late_df, "k", "ts", ["status"], tiebreak_col="tb")
    want = scd2_from_changelog(full_df, "k", "ts", ["status"], tiebreak_col="tb",
                               emit_last_seen=strict)
    nonesafe = lambda t: tuple((v is None, str(v)) for v in t)
    canon = lambda df: sorted(map(tuple, df.select(*want.columns).collect()), key=nonesafe)
    assert canon(merged) == canon(want)
