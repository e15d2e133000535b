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
