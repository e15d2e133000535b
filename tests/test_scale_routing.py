"""Scale-trend validation for the p2p accelerator: a 250k-node lattice
(country-scale direction; Italy is 9.7M nodes per ITALY.md:55-56). Checks
that ALT A* stays exact and keeps beating plain Dijkstra as the graph
grows — the property that makes warm single-pair queries feasible where
the reference uses contraction hierarchies (rust/src/lib.rs:260)."""

import time

from duckdb_routing_spark.routing import kernels
from duckdb_routing_spark.testing import build_big_grid_csr


def test_alt_astar_scales_to_quarter_million_nodes():
    g = build_big_grid_csr(500, 500)
    assert g.num_nodes == 250_000

    t0 = time.perf_counter()
    kernels._alt_data(g)
    prep = time.perf_counter() - t0

    pairs = [(0, g.num_nodes - 1), (0, g.num_nodes // 2), (499, 250_000 - 500)]
    t_uni = t_alt = 0.0
    for s, t in pairs:
        t0 = time.perf_counter()
        w_uni, _ = kernels.dijkstra_p2p_path(g, s, t)
        t_uni += time.perf_counter() - t0
        t0 = time.perf_counter()
        w_alt, path = kernels.astar_p2p_path(g, s, t)
        t_alt += time.perf_counter() - t0
        assert w_alt == w_uni
        assert path[0] == s and path[-1] == t
    # preprocessing amortizes: it must stay cheaper than a handful of
    # unaccelerated queries, and warm queries must win clearly
    assert t_alt * 1.5 < t_uni, f"ALT {t_alt:.2f}s vs uni {t_uni:.2f}s"
    assert prep < t_uni * 5, f"ALT preprocessing {prep:.2f}s too heavy vs {t_uni:.2f}s"
