"""Property-based tests (hypothesis) for the pure kernels: geometry
round-trips, haversine metric properties, convex hull invariants, and
Dijkstra vs brute-force Floyd-Warshall on random graphs."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_routing_spark.routing import kernels
from duckdb_routing_spark.routing.geometry import (
    EARTH_RADIUS_M,
    build_wkb_linestring,
    build_wkb_point,
    convex_hull,
    haversine_m_scalar,
    looks_like_wkb,
    parse_wkb_linestring,
    wkb_to_centroid,
    wkt_to_centroid,
)
from duckdb_routing_spark.routing.graph import RoutingGraph

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@given(lons, lats)
def test_wkb_point_roundtrip(lon, lat):
    wkb = build_wkb_point(lon, lat)
    assert looks_like_wkb(wkb)
    assert wkb_to_centroid(wkb) == (lon, lat)


@given(st.lists(st.tuples(lons, lats), min_size=1, max_size=50))
def test_wkb_linestring_roundtrip(pts):
    wkb = build_wkb_linestring([p[0] for p in pts], [p[1] for p in pts])
    assert parse_wkb_linestring(wkb) == [(float(x), float(y)) for x, y in pts]


@given(lons, lats)
def test_wkt_point_roundtrip(lon, lat):
    got = wkt_to_centroid(f"POINT({lon!r} {lat!r})")
    assert got == (lon, lat)


@given(lons, lats, lons, lats)
def test_haversine_metric_properties(lon1, lat1, lon2, lat2):
    d = haversine_m_scalar(lon1, lat1, lon2, lat2)
    assert d >= 0.0
    # symmetry (same formula, commutative inputs)
    assert d == haversine_m_scalar(lon2, lat2, lon1, lat1)
    # bounded by half the great circle
    assert d <= math.pi * EARTH_RADIUS_M * 1.0000001
    assert haversine_m_scalar(lon1, lat1, lon1, lat1) == 0.0


@given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False)), min_size=1, max_size=60))
def test_convex_hull_invariants(pts):
    hull = convex_hull(np.array(pts))
    assert set(hull) <= {(float(x), float(y)) for x, y in pts}
    if len(hull) >= 3:
        # every input point is inside or on the hull (ccw cross products)
        for px, py in pts:
            for (x1, y1), (x2, y2) in zip(hull, hull[1:] + hull[:1]):
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                assert cross >= -1e-6 * max(1.0, abs(px), abs(py)) * 200


def _random_graph(rng, n):
    density = rng.uniform(0.15, 0.5)
    src, dst, w = [], [], []
    for i in range(n):
        for j in range(n):
            if i != j and rng.random() < density:
                src.append(i)
                dst.append(j)
                w.append(int(rng.integers(1, 1000)))
    if not src:  # ensure at least one edge
        src, dst, w = [0], [min(1, n - 1)], [1]
    return RoutingGraph.from_arrays(
        node_lon=rng.uniform(0, 1, n),
        node_lat=rng.uniform(0, 1, n),
        src=np.array(src),
        dst=np.array(dst),
        weight_ms=np.array(w),
        length_m=np.array(w, dtype=float),
        main_nodes=np.arange(n),
    )


@settings(deadline=None, max_examples=25)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=2, max_value=12))
def test_dijkstra_matches_floyd_warshall(seed, n):
    rng = np.random.default_rng(seed)
    g = _random_graph(rng, n)
    # brute-force all-pairs shortest paths
    dist = np.full((n, n), np.inf)
    np.fill_diagonal(dist, 0.0)
    for u in range(n):
        for ei in range(g.indptr[u], g.indptr[u + 1]):
            dist[u, g.indices[ei]] = min(dist[u, g.indices[ei]], g.weights_ms[ei])
    for k in range(n):
        dist = np.minimum(dist, dist[:, k : k + 1] + dist[k : k + 1, :])
    for s in range(n):
        for t in range(n):
            got = kernels.dijkstra_p2p(g, s, t)
            want = dist[s, t]
            if math.isinf(want):
                assert got == kernels.NO_ROUTE
            else:
                assert got == want
    # multi-target agrees too
    targets = np.arange(n)
    w, _ = kernels.dijkstra_multi_target(g, 0, targets)
    for t in range(n):
        want = dist[0, t]
        assert (w[t] == kernels.NO_ROUTE and math.isinf(want)) or w[t] == want


@settings(deadline=None, max_examples=15)
@given(st.integers(min_value=0, max_value=10_000))
def test_isochrone_matches_bounded_shortest_paths(seed):
    rng = np.random.default_rng(seed)
    n = 10
    g = _random_graph(rng, n)
    cutoff = 800
    nodes, costs = kernels.dijkstra_isochrone(g, 0, cutoff)
    reach = dict(zip(nodes.tolist(), costs.tolist()))
    for t in range(n):
        d = kernels.dijkstra_p2p(g, 0, t)
        if 0 <= d <= cutoff:
            assert reach.get(t) == d
        else:
            assert t not in reach


# ---------------------------------------------------------------------------
# round-2 kernels: frontier SSSP, concave hull, point-in-ring
# ---------------------------------------------------------------------------


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_frontier_sssp_equals_dijkstra_on_random_graphs(n, seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, n * 3))
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return
    w = rng.integers(1, 10_000, len(src)).astype(np.int64)
    lons_a = rng.uniform(-1, 1, n)
    lats_a = rng.uniform(-1, 1, n)
    g = RoutingGraph.from_arrays(
        lons_a, lats_a, src, dst, w, np.ones(len(src)), np.arange(n, dtype=np.int64)
    )
    s = int(rng.integers(0, n))
    dist = kernels.sssp_frontier_ms(g, s)
    for t in range(n):
        want = kernels.dijkstra_p2p(g, s, t)
        got = float(dist[t]) if dist[t] != kernels._INF else kernels.NO_ROUTE
        assert got == want


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_tight_edge_tree_yields_valid_shortest_paths(n, seed):
    """shortest_path_tree: every reachable node's pred-walk is a real path
    whose edge-weight sum equals the SSSP label (i.e. the tree is a valid
    shortest-path tree, not just label-consistent)."""
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, n * 3))
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return
    w = rng.integers(1, 10_000, len(src)).astype(np.int64)
    g = RoutingGraph.from_arrays(
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), src, dst, w,
        np.ones(len(src)), np.arange(n, dtype=np.int64),
    )
    s = int(rng.integers(0, n))
    dist = kernels.sssp_frontier_ms(g, s)
    pred = kernels.shortest_path_tree(g, dist, s)
    edge_w = {}
    for u, v, ww in zip(src, dst, w):
        key = (int(u), int(v))
        edge_w[key] = min(edge_w.get(key, np.inf), int(ww))
    for t in range(n):
        if dist[t] == kernels._INF:
            assert pred[t] == -1
            continue
        path = kernels.path_from_pred(pred, s, t)
        assert path is not None and path[0] == s and path[-1] == t
        total = sum(edge_w[(path[i], path[i + 1])] for i in range(len(path) - 1))
        assert total == int(dist[t])


@given(st.lists(st.tuples(st.floats(0, 10, allow_nan=False), st.floats(0, 10, allow_nan=False)),
                min_size=3, max_size=60, unique=True))
@settings(max_examples=40, deadline=None)
def test_concave_hull_contains_all_points(pts):
    from duckdb_routing_spark.routing.geometry import _point_in_ring, concave_hull_knn

    arr = np.asarray(pts)
    ring = concave_hull_knn(arr)
    if len(ring) < 3:
        return  # degenerate (collinear) input
    for p in pts:
        assert _point_in_ring((float(p[0]), float(p[1])), ring)


# ---------------------------------------------------------------------------
# round-4 kernels: p2p accelerators (bidirectional Dijkstra, ALT A*)
# ---------------------------------------------------------------------------


def _p2p_accel_case(n, seed, accel):
    """Shared harness: `accel` must return dijkstra_p2p's exact weight on
    every pair of a random graph, and its path must be a REAL path whose
    edge-weight sum equals the weight."""
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, n * 3))
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return
    w = rng.integers(1, 10_000, len(src)).astype(np.int64)
    g = RoutingGraph.from_arrays(
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), src, dst, w,
        np.ones(len(src)), np.arange(n, dtype=np.int64),
    )
    edge_w = {}
    for u, v, ww in zip(src, dst, w):
        key = (int(u), int(v))
        edge_w[key] = min(edge_w.get(key, np.inf), int(ww))
    for s in range(n):
        for t in range(n):
            want = kernels.dijkstra_p2p(g, s, t)
            got, path = accel(g, s, t)
            assert got == want
            if want == kernels.NO_ROUTE:
                assert path is None
            else:
                assert path[0] == s and path[-1] == t
                total = sum(edge_w[(path[i], path[i + 1])] for i in range(len(path) - 1))
                assert total == int(want)


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_bidirectional_dijkstra_equals_dijkstra(n, seed):
    _p2p_accel_case(n, seed, kernels.bidij_p2p_path)


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_alt_astar_equals_dijkstra(n, seed):
    _p2p_accel_case(n, seed, kernels.astar_p2p_path)


def test_alt_astar_faster_on_long_grid_routes():
    """Long p2p routes on the 40k-node grid: ALT A* (the engine's p2p
    accelerator, the CH stand-in per rust/src/lib.rs:260) must beat plain
    Dijkstra wall-clock while returning the identical weight — including
    corner-to-corner diagonals, where bidirectional search degenerates
    (boundary clipping) and great-circle A* degenerates (Manhattan
    geometry). Measured typical: 3-8x; the bar is a generous 1.5x to stay
    robust against host noise. ALT preprocessing runs once per graph and is
    excluded (it is the per-executor warm-up, amortized across queries)."""
    import time

    from duckdb_routing_spark.testing import build_grid_graph

    g = build_grid_graph("auto", 200, 200, island=False)
    kernels._alt_data(g)  # warm the landmark cache (one-time, per process)
    pairs = [(0, g.num_nodes - 1), (199, g.num_nodes - 200), (0, g.num_nodes // 2)]
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
    assert t_alt * 1.5 < t_uni, f"ALT A* {t_alt:.3f}s not faster than {t_uni:.3f}s"


@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_contraction_hierarchy_equals_dijkstra(n, seed):
    from duckdb_routing_spark.routing import ch

    _p2p_accel_case(n, seed, ch.ch_p2p_path)


def test_ch_warm_queries_fast_on_grid():
    """CH on a 2.5k-node grid: warm queries must return Dijkstra-exact
    weights and beat plain Dijkstra wall-clock by a wide margin (the
    preprocessing trade CH exists for). Build time is excluded — it is the
    once-per-executor warm-up, like ALT's landmark SSSPs."""
    import time

    from duckdb_routing_spark.routing import ch
    from duckdb_routing_spark.testing import build_grid_graph

    g = build_grid_graph("auto", 50, 50, island=False)
    idx = ch.build_ch(g)
    g._ch = idx
    assert idx.n_shortcuts > 0  # a grid genuinely needs shortcuts
    pairs = [(0, g.num_nodes - 1), (49, g.num_nodes - 50), (0, g.num_nodes // 2), (7, 2020)]
    t_uni = t_ch = 0.0
    for s, t in pairs:
        t0 = time.perf_counter()
        w_uni, _ = kernels.dijkstra_p2p_path(g, s, t)
        t_uni += time.perf_counter() - t0
        t0 = time.perf_counter()
        w_ch, path = ch.ch_p2p_path(g, s, t)
        t_ch += time.perf_counter() - t0
        assert w_ch == w_uni
        assert path[0] == s and path[-1] == t
    assert t_ch * 1.5 < t_uni, f"CH {t_ch:.4f}s not faster than Dijkstra {t_uni:.4f}s"


# ---------------------------------------------------------------------------
# round-6 kernels: CH bucket many-to-many, mixture plans, shard ranges
# ---------------------------------------------------------------------------


@settings(deadline=None, max_examples=15)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=2, max_value=10))
def test_ch_many_to_many_equals_dijkstra_on_random_graphs(seed, n):
    """The bucket kernel is exact on arbitrary digraphs, not just grids:
    every (s, t) duration equals per-pair Dijkstra, including unreachable
    cells and s == t."""
    from duckdb_routing_spark.routing import ch

    rng = np.random.default_rng(seed)
    g = _random_graph(rng, n)
    chx = ch.build_ch(g)
    nodes = list(range(n))
    time_ms, meets, sstates, dstates = ch.ch_many_to_many(chx, nodes, nodes)
    for s in range(n):
        for t in range(n):
            want = kernels.dijkstra_p2p(g, s, t)
            got = time_ms[s, t]
            if want == kernels.NO_ROUTE:
                assert got == -1.0
            else:
                assert got == want
                # the memoized chain distance matches the unpacked path walk
                d_chain = ch.ch_m2m_distance_m(chx, g, s, t, int(meets[s, t]),
                                               sstates[s], dstates[t])
                path = ch.ch_m2m_path(chx, s, t, int(meets[s, t]), sstates[s], dstates[t])
                assert abs(d_chain - kernels.path_distance_m(g, path)) < 1e-9


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=6), st.floats(min_value=0.0, max_value=20.0),
        max_size=8,
    ),
    st.floats(min_value=0.0, max_value=20.0),
)
def test_mix_weights_plan_is_an_exact_integer_decomposition(weights, default_weight):
    """Every weight decomposes to (whole epochs, 10k-bucket threshold) with
    reps == floor(w) and the threshold recovering the fraction to 1/20000 —
    the contract that keeps Spark and DuckDB bit-identical."""
    from duckdb_routing_spark.operators.sampling import SPLIT_BUCKETS, mix_weights_plan

    plan = mix_weights_plan(weights, default_weight)
    assert set(plan) == set(weights) | {None}
    for s, (reps, frac) in plan.items():
        w = default_weight if s is None else weights[s]
        assert reps == int(w + 1e-9)
        assert 0 <= frac <= SPLIT_BUCKETS
        assert abs((reps + frac / SPLIT_BUCKETS) - w) <= 0.5 / SPLIT_BUCKETS + 1e-9


@given(st.integers(min_value=1, max_value=1 << 30))
def test_shard_width_ranges_partition_the_key_space(n):
    """Equal-width ceil division: n ranges cover [0, 2^60), every shard id
    in [0, n) is reachable, and the extreme keys land in shards 0 and n-1."""
    from duckdb_routing_spark.operators.shard import SHARD_SPACE, shard_width

    w = shard_width(n)
    assert w * n >= SHARD_SPACE  # ranges cover the space
    assert (n - 1) * w <= SHARD_SPACE - 1  # last shard non-empty
    assert 0 // w == 0
    assert (SHARD_SPACE - 1) // w == n - 1


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_geometry_sniffer_never_raises_on_bytes(data):
    """any_geometry_to_lonlat is the user-input boundary (the reference's
    ExtractGeometryData dispatch): arbitrary blobs must produce (lon, lat)
    or None — never an exception (the SQL UDFs turn None into NULL)."""
    from duckdb_routing_spark.routing.geometry import any_geometry_to_lonlat

    out = any_geometry_to_lonlat(data)
    assert out is None or (
        isinstance(out, tuple) and len(out) == 2
        and all(isinstance(v, float) for v in out)
    )


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_geometry_sniffer_never_raises_on_text(s):
    from duckdb_routing_spark.routing.geometry import any_geometry_to_lonlat

    out = any_geometry_to_lonlat(s)
    assert out is None or (isinstance(out, tuple) and len(out) == 2)


# ---------------------------------------------------------------------------
# geometry-input sniffing: the ANY-typed argument surface must never raise
# (the reference returns NULL for unparseable geometry, never errors)
# ---------------------------------------------------------------------------

@given(st.binary(min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_geometry_sniffers_never_raise_on_random_bytes(data):
    from duckdb_routing_spark.routing.geometry import (
        any_geometry_to_lonlat,
        looks_like_geometry_internal,
        looks_like_wkb,
    )

    looks_like_wkb(data)
    looks_like_geometry_internal(data)
    out = any_geometry_to_lonlat(data)
    assert out is None or (len(out) == 2 and all(isinstance(v, float) for v in out))


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_wkt_parsing_never_raises_on_random_text(s):
    from duckdb_routing_spark.routing.geometry import any_geometry_to_lonlat

    out = any_geometry_to_lonlat(s)
    assert out is None or len(out) == 2
