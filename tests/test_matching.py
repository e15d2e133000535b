"""HMM map matching (routing/matching.py) and the k-NN candidate query.

The reference's trace actions use Valhalla's HMM matcher
(valhalla-wrapper/src/wrapper.cpp:440-443); these tests pin the two
properties that distinguish an HMM from nearest-node snapping: candidate
sets are correct, and a noisy off-road sample is pulled back onto the
route the surrounding evidence supports."""

import numpy as np

from duckdb_routing_spark.routing.matching import hmm_match
from duckdb_routing_spark.testing import BASE_LAT, BASE_LON, SPACING_DEG, build_grid_graph


def _pt(r, c):
    return BASE_LAT + r * SPACING_DEG, BASE_LON + c * SPACING_DEG


def test_knearest_consistent_with_nearest():
    g = build_grid_graph("auto", 10, 10, island=False)
    rng = np.random.default_rng(7)
    for _ in range(50):
        lat = BASE_LAT + rng.uniform(-0.002, 0.011)
        lon = BASE_LON + rng.uniform(-0.002, 0.011)
        nodes, d2 = g.knearest_main_nodes(lon, lat, 5)
        assert len(nodes) == 5
        # first candidate == the exact nearest snap
        assert int(nodes[0]) == g.nearest_main_node(lon, lat)
        # sorted by (distance, node_id)
        assert all(d2[i] <= d2[i + 1] for i in range(len(d2) - 1))
        # brute-force check of the candidate set
        bd2 = (g.node_lon[g.main_nodes] - lon) ** 2 + (g.node_lat[g.main_nodes] - lat) ** 2
        order = np.lexsort((g.main_nodes, bd2))[:5]
        assert list(nodes) == list(g.main_nodes[order])


def test_knearest_fewer_than_k():
    g = build_grid_graph("auto", 2, 2, island=False)
    nodes, _ = g.knearest_main_nodes(BASE_LON, BASE_LAT, 10)
    assert len(nodes) == len(g.main_nodes)  # all of them, no crash


def test_hmm_recovers_route_through_noisy_sample():
    """Trace along row 0 with the middle sample perturbed 0.55 cells north:
    nearest-node snaps it to row 1 (a detour), the HMM keeps it on row 0
    because the detour's transition penalty outweighs the small emission
    advantage — the exact failure mode of the old matcher."""
    g = build_grid_graph("auto", 10, 10, oneway_row=9, island=False)
    lats, lons = [], []
    for c in [0, 1, 2, 3, 4]:
        lat, lon = _pt(0, c)
        if c == 2:
            lat += 0.55 * SPACING_DEG  # noisy sample, nearer to row 1
        lats.append(lat)
        lons.append(lon)
    noisy_nearest = g.nearest_main_node(lons[2], lats[2])
    assert noisy_nearest == 1 * 10 + 2  # sanity: nearest-node DOES detour
    matched = hmm_match(g, lons, lats)
    assert matched == [0, 1, 2, 3, 4]  # row 0 all the way


def test_hmm_exact_points_match_their_nodes():
    g = build_grid_graph("auto", 10, 10, island=False)
    pts = [(0, 0), (0, 3), (3, 3), (6, 3)]
    lats = [_pt(r, c)[0] for r, c in pts]
    lons = [_pt(r, c)[1] for r, c in pts]
    assert hmm_match(g, lons, lats) == [r * 10 + c for r, c in pts]


def test_hmm_k1_degenerates_to_nearest_node():
    """With a single candidate per point the trellis has one path: the HMM
    must return exactly the nearest-node sequence (for connected
    candidates) — pins the two matchers to the same snapping semantics."""
    g = build_grid_graph("auto", 10, 10, island=False)
    rng = np.random.default_rng(11)
    lats = BASE_LAT + rng.uniform(0, 0.009, 6)
    lons = BASE_LON + rng.uniform(0, 0.009, 6)
    want = [g.nearest_main_node(lo, la) for lo, la in zip(lons, lats)]
    assert hmm_match(g, lons, lats, k=1) == want
