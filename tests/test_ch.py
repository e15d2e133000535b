"""Contraction-hierarchy index: artifact/broadcast persistence and the
engine's p2p-accelerator conf switch (`SET spark.routing.p2p = ch`)."""

import numpy as np
import pytest

from duckdb_routing_spark.routing import ch, kernels
from duckdb_routing_spark.routing.graph import RoutingGraph
from duckdb_routing_spark.testing import build_grid_graph


@pytest.fixture(scope="module")
def grid_with_ch():
    g = build_grid_graph("auto", 10, 10, island=False)
    g._ch = ch.build_ch(g)
    return g


def _query_pairs(g):
    n = g.num_nodes
    return [(0, n - 1), (9, n - 10), (3, n // 2)]


def test_ch_artifact_roundtrip(grid_with_ch, tmp_path):
    """save() persists the prepared index as a ch_<mode>.npz sidecar and
    load() restores it — executors/loaders never re-run the ordering, the
    same contract as the reference's prepared .routing artifact."""
    g = grid_with_ch
    g.save(str(tmp_path), "auto")
    assert (tmp_path / "ch_auto.npz").exists()
    g2 = RoutingGraph.load(str(tmp_path), "auto")
    idx2 = getattr(g2, "_ch", None)
    assert idx2 is not None
    assert idx2.n_shortcuts == g._ch.n_shortcuts
    np.testing.assert_array_equal(idx2.rank, g._ch.rank)
    np.testing.assert_array_equal(idx2.up_weights, g._ch.up_weights)
    for s, t in _query_pairs(g):
        assert ch.ch_p2p_path(g2, s, t)[0] == kernels.dijkstra_p2p(g, s, t)


def test_ch_payload_roundtrip(grid_with_ch):
    g = grid_with_ch
    g.p2p_accelerator = "ch"
    payload = g.to_payload()
    assert "_ch_arrays" in payload
    g2 = RoutingGraph.from_payload(payload)
    assert g2.p2p_accelerator == "ch"
    assert getattr(g2, "_ch", None) is not None
    for s, t in _query_pairs(g):
        # the dispatcher must route through the SHIPPED index (no rebuild)
        assert kernels.p2p_path(g2, s, t)[0] == kernels.dijkstra_p2p(g, s, t)


def test_engine_p2p_conf_switch(spark):
    """`SET spark.routing.p2p = ch` + ensure_conf() re-broadcasts the graph
    with the CH accelerator baked in; SQL results are identical to the ALT
    default (all accelerators are exact)."""
    from duckdb_routing_spark.routing.engine import RoutingEngine

    eng = RoutingEngine(spark)
    g = build_grid_graph("auto", 10, 10, island=False)
    g._ch = ch.build_ch(g)
    eng.load_graph(g, "auto")
    eng.register()
    q = "SELECT travel_time(52.0, 13.0, 52.018, 13.018, 'auto') AS s"
    base = spark.sql(q).collect()[0]["s"]
    assert base is not None and base > 0
    try:
        spark.conf.set("spark.routing.p2p", "ch")
        eng.ensure_conf()
        assert eng._local["auto"].p2p_accelerator == "ch"
        got = spark.sql(q).collect()[0]["s"]
        assert got == base
    finally:
        spark.conf.unset("spark.routing.p2p")
        eng.ensure_conf()
    assert eng._local["auto"].p2p_accelerator == "alt"


def test_ch_many_to_many_matches_dijkstra(grid_with_ch):
    """Bucket many-to-many (ch_many_to_many / kernels.matrix_rows_ch) is
    exact: every cell's duration equals per-pair Dijkstra, every cell's
    distance equals the CH p2p path distance (same pred trees -> same
    paths), negative snaps and unreachable targets yield None cells."""
    g = grid_with_ch
    rng = np.random.default_rng(11)
    srcs = rng.integers(0, g.num_nodes, 7).tolist() + [-1]
    dsts = rng.integers(0, g.num_nodes, 5).tolist() + [-1]
    rows = kernels.matrix_rows_ch(g, srcs, dsts)
    assert len(rows) == len(srcs) * len(dsts)
    for i, j, dm, ds in rows:
        s, t = srcs[i], dsts[j]
        if s < 0 or t < 0:
            assert dm is None and ds is None
            continue
        want = kernels.dijkstra_p2p(g, s, t)
        assert ds is not None and abs(ds * 1000.0 - want) < 1e-9
        _, p2p_path = ch.ch_p2p_path(g, s, t)
        assert abs(dm - kernels.path_distance_m(g, p2p_path)) < 1e-9
    # src == dst cell: zero duration, zero distance
    [(_, _, dm0, ds0)] = kernels.matrix_rows_ch(g, [4], [4])
    assert ds0 == 0.0 and dm0 == 0.0


def test_engine_matrix_conf_switch(spark):
    """`SET spark.routing.matrix = ch` swaps the matrix kernel for the
    bucket many-to-many; durations and distances are identical to the
    frontier default on both the single-task and distributed paths."""
    from duckdb_routing_spark.routing.engine import RoutingEngine

    eng = RoutingEngine(spark)
    g = build_grid_graph("auto", 10, 10, island=False)
    g._ch = ch.build_ch(g)
    eng.load_graph(g, "auto")
    eng.register()
    lats = [52.0, 52.005, 52.018]
    lons = [13.0, 13.012, 13.018]
    base = eng.matrix(lats, lons, lats[::-1], lons[::-1]).collect()
    assert len(base) == 9
    try:
        spark.conf.set("spark.routing.matrix", "ch")
        got = eng.matrix(lats, lons, lats[::-1], lons[::-1]).collect()
    finally:
        spark.conf.unset("spark.routing.matrix")
    # durations are exact across kernels; distances may differ by meters on
    # DURATION-TIED paths (the grid has many equal-time geometries, and the
    # frontier tight-tree and CH pred-tree break ties differently — both
    # are valid time-optimal paths; CH distance exactness vs its own p2p
    # path is pinned in test_ch_many_to_many_matches_dijkstra)
    assert [(r.from_idx, r.to_idx, r.duration_s) for r in got] == [
        (r.from_idx, r.to_idx, r.duration_s) for r in base
    ]
    for rg, rb in zip(got, base):
        assert (rg.distance_m is None) == (rb.distance_m is None)
        if rg.distance_m is not None:
            assert rg.distance_m == pytest.approx(rb.distance_m, rel=0.05)

    # force the DISTRIBUTED mapInPandas path (threshold to 0) and re-check
    from duckdb_routing_spark.routing import engine as eng_mod

    saved = eng_mod.SINGLE_TASK_MATRIX_WORK
    try:
        eng_mod.SINGLE_TASK_MATRIX_WORK = 0
        spark.conf.set("spark.routing.matrix", "ch")
        dist_rows = eng_mod.RoutingEngine.matrix(
            eng, lats, lons, lats[::-1], lons[::-1]
        ).collect()
    finally:
        eng_mod.SINGLE_TASK_MATRIX_WORK = saved
        spark.conf.unset("spark.routing.matrix")
    assert [(r.from_idx, r.to_idx, r.duration_s) for r in dist_rows] == [
        (r.from_idx, r.to_idx, r.duration_s) for r in base
    ]


def test_roadlike_ch_exact_and_linear_shape():
    """The road-like generator (tiers + degree-2 geometry midpoints +
    dead-end drops) is the country-scale topology: CH must stay EXACT vs
    Dijkstra there, contract with bounded shortcut growth, and answer
    sub-10ms warm (tools/country_scale.py scales this same check to
    multi-million nodes)."""
    import time

    import numpy as np

    from duckdb_routing_spark.routing import ch as chm
    from duckdb_routing_spark.routing import kernels
    from duckdb_routing_spark.testing import build_roadlike_csr

    g = build_roadlike_csr(60, 60)
    # topology sanity: majority degree-2 geometry nodes, like real OSM
    deg = np.diff(g.indptr)
    assert (deg == 2).sum() > g.num_nodes * 0.4
    idx = chm.build_ch(g)
    assert idx.n_shortcuts < 4 * g.num_nodes
    pairs = [(0, 59 * 60 + 59), (8 * 60, 16 * 60 + 48), (0, 24), (5, 5)]
    for s, t in pairs:
        w_ch, *_ = chm.ch_p2p(idx, s, t)
        wd = kernels.sssp_frontier_ms(g, s)[t]
        want = -1.0 if wd == np.iinfo(np.int64).max else float(wd)
        assert w_ch == want, (s, t, w_ch, want)
    t0 = time.perf_counter()
    chm.ch_p2p(idx, 0, 59 * 60 + 59)
    assert time.perf_counter() - t0 < 0.05
