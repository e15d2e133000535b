"""Unit tests mirroring the reference's Rust unit tests
(rust/src/lib.rs:1018-1032): speed-table lookups and main-road classifier."""

from duckdb_routing_spark.routing.speeds import get_speed_kmh, is_main_road, segment_weight_ms


def test_speed_table_reference_values():
    assert get_speed_kmh("motorway", "auto") == 120.0
    assert get_speed_kmh("residential", "auto") == 30.0
    assert get_speed_kmh("cycleway", "bicycle") == 20.0
    assert get_speed_kmh("footway", "pedestrian") == 5.0
    assert get_speed_kmh("railway", "auto") is None
    assert get_speed_kmh("motorway", "spaceship") is None


def test_main_road_classifier():
    assert is_main_road("motorway")
    assert is_main_road("residential")
    assert is_main_road("service")
    assert not is_main_road("footway")
    assert not is_main_road("cycleway")
    assert not is_main_road("")


def test_weight_truncates_to_int_ms():
    # 1 km at 30 km/h = 120000 ms exactly
    assert segment_weight_ms(1000.0, 30.0) == 120000
    # truncation, not rounding (Rust `as u32`)
    assert segment_weight_ms(1.0, 120.0) == 30
    assert segment_weight_ms(0.0, 50.0) == 0
