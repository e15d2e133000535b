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
