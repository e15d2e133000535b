import math
import struct

from duckdb_routing_spark.routing.geometry import (
    any_geometry_to_lonlat,
    build_wkb_linestring,
    build_wkb_point,
    haversine_m_scalar,
    looks_like_geometry_internal,
    looks_like_wkb,
    parse_wkb_linestring,
    wkb_to_centroid,
    wkt_to_centroid,
)


def test_haversine_known_distance():
    # 1 degree of latitude ~ 111.2 km on the mean-radius sphere
    d = haversine_m_scalar(13.0, 52.0, 13.0, 53.0)
    assert abs(d - 111195) < 100


def test_wkt_point_and_centroids():
    assert wkt_to_centroid("POINT(7.42 43.73)") == (7.42, 43.73)
    assert wkt_to_centroid("  point ( -1.5 2.5 ) ") == (-1.5, 2.5)
    lon, lat = wkt_to_centroid("LINESTRING(0 0, 2 0)")
    assert (lon, lat) == (1.0, 0.0)
    lon, lat = wkt_to_centroid("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert abs(lon - 1.0) < 1e-12 and abs(lat - 1.0) < 1e-12
    assert wkt_to_centroid("not a geometry") is None
    assert wkt_to_centroid("") is None


def test_wkb_point_roundtrip_and_sniffing():
    wkb = build_wkb_point(7.42, 43.73)
    assert len(wkb) == 21
    assert looks_like_wkb(wkb)
    assert wkb_to_centroid(wkb) == (7.42, 43.73)
    # big-endian WKB point
    be = struct.pack(">BIdd", 0x00, 1, 7.42, 43.73)
    assert looks_like_wkb(be)
    assert wkb_to_centroid(be) == (7.42, 43.73)
    # garbage is rejected
    assert not looks_like_wkb(b"\x07garbagegarbagegarbage")
    assert not looks_like_wkb(b"\x01\x63" + b"\x00" * 19)


def test_duckdb_internal_format_sniffing():
    # 12-byte small header + type 1 at offset 12 + padding + 2 doubles
    blob = bytes(12) + struct.pack("<I", 1) + struct.pack("<dd", 7.42, 43.73)
    assert looks_like_geometry_internal(blob)
    assert not looks_like_wkb(blob)  # the 12-zero-byte rule diverts it
    assert any_geometry_to_lonlat(blob) == (7.42, 43.73)


def test_any_geometry_dispatch():
    assert any_geometry_to_lonlat("POINT(1 2)") == (1.0, 2.0)
    assert any_geometry_to_lonlat(build_wkb_point(1.0, 2.0)) == (1.0, 2.0)
    assert any_geometry_to_lonlat(b"POINT(3 4)") == (3.0, 4.0)  # WKT-as-blob
    assert any_geometry_to_lonlat(None) is None
    assert any_geometry_to_lonlat(12.5) is None


def test_wkb_linestring_layout():
    wkb = build_wkb_linestring([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
    # exact reference layout: 0x01, type=2, count, then lon/lat pairs
    assert wkb[0] == 0x01
    assert struct.unpack_from("<I", wkb, 1)[0] == 2
    assert struct.unpack_from("<I", wkb, 5)[0] == 3
    assert len(wkb) == 9 + 16 * 3
    assert parse_wkb_linestring(wkb) == [(1.0, 4.0), (2.0, 5.0), (3.0, 6.0)]
    assert build_wkb_linestring([], []) is None


def test_linestring_centroid_is_length_weighted():
    lon, lat = wkt_to_centroid("LINESTRING(0 0, 0 1, 10 1)")
    # segment lengths 1 and 10: centroid pulled toward the long segment
    expected_lon = (1 * 0 + 10 * 5) / 11
    expected_lat = (1 * 0.5 + 10 * 1) / 11
    assert abs(lon - expected_lon) < 1e-9
    assert abs(lat - expected_lat) < 1e-9
    assert not math.isnan(lat)


# ---------------------------------------------------------------------------
# marching-squares gridded contours (pure-numpy kernel behind
# engine.isochrone_contours(method="grid"))
# ---------------------------------------------------------------------------

def test_marching_squares_radial_field():
    """On a dense radial time field the level-set shell must approximate the
    circle: area within 25% of pi*r^2, nearly all reached points inside,
    nearly all unreached points outside."""
    import numpy as np

    from duckdb_routing_spark.routing.geometry import (
        _point_in_ring,
        grid_contour_shell,
        ring_area,
    )

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(4000, 2))
    minutes = np.hypot(pts[:, 0], pts[:, 1]) * 10.0
    for level in (3.0, 6.0, 9.0):
        shell, _ = grid_contour_shell(pts[:, 0], pts[:, 1], minutes, level, n_cells=48)
        assert shell[0] == shell[-1] and ring_area(shell) > 0
        assert abs(ring_area(shell) - 3.14159 * (level / 10) ** 2) < 0.25 * 3.14159 * (level / 10) ** 2
        inside = minutes <= level
        hit = np.mean([_point_in_ring((x, y), shell) for x, y in pts[inside][:300]])
        miss = np.mean([_point_in_ring((x, y), shell) for x, y in pts[~inside][:300]])
        assert hit > 0.85 and miss < 0.05


def test_marching_squares_properties():
    """Random clouds: every emitted ring closes, total signed area is
    non-negative (holes sit inside shells), all vertices stay inside the
    padded grid bbox, and the output is deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from duckdb_routing_spark.routing.geometry import (
        marching_squares_rings,
        ring_area,
        time_grid_from_points,
    )

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.integers(5, 300), st.floats(0.5, 9.5))
    def check(seed, n, level):
        rng = np.random.default_rng(seed)
        lons = rng.uniform(10, 11, n)
        lats = rng.uniform(50, 51, n)
        minutes = rng.uniform(0, 10, n)
        V, lon0, lat0, dx, dy = time_grid_from_points(lons, lats, minutes, n_cells=24)
        rings = marching_squares_rings(V, level, lon0, lat0, dx, dy)
        rings2 = marching_squares_rings(V, level, lon0, lat0, dx, dy)
        assert rings == rings2
        ny, nx = V.shape
        hi_x, hi_y = lon0 + (nx - 1) * dx, lat0 + (ny - 1) * dy
        total = 0.0
        for r in rings:
            assert r[0] == r[-1] and len(r) >= 4
            for x, y in r:
                assert lon0 - 1e-9 <= x <= hi_x + 1e-9
                assert lat0 - 1e-9 <= y <= hi_y + 1e-9
            total += ring_area(r)
        if (minutes <= level).any():
            assert rings, "reached points must produce at least one ring"
        assert total >= -1e-12

    check()
