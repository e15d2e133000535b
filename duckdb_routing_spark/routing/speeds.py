"""Per-(highway class, travel mode) speed model and main-road classifier.

These lookup tables reproduce the reference's routing cost model
(`/root/reference/rust/src/lib.rs:43-118`, unit-tested there at
lib.rs:1018-1032): speeds are km/h; a highway class absent from a mode's table
means that mode cannot use the way at all (the way is dropped from that mode's
graph). "Main road" classes are the only snap-index candidates — snapping to a
service alley or footpath gives unreliable connectivity.
"""

from __future__ import annotations

MODES = ("auto", "bicycle", "pedestrian")

SPEED_KMH: dict[str, dict[str, float]] = {
    "auto": {
        "motorway": 120.0,
        "motorway_link": 80.0,
        "trunk": 100.0,
        "trunk_link": 60.0,
        "primary": 80.0,
        "primary_link": 50.0,
        "secondary": 60.0,
        "secondary_link": 40.0,
        "tertiary": 50.0,
        "tertiary_link": 30.0,
        "residential": 30.0,
        "living_street": 20.0,
        "service": 20.0,
        "unclassified": 40.0,
    },
    "bicycle": {
        "cycleway": 20.0,
        "path": 15.0,
        "track": 12.0,
        "bridleway": 10.0,
        "residential": 18.0,
        "living_street": 15.0,
        "service": 15.0,
        "tertiary": 20.0,
        "tertiary_link": 20.0,
        "secondary": 18.0,
        "secondary_link": 18.0,
        "primary": 15.0,
        "primary_link": 15.0,
        "unclassified": 18.0,
        "trunk": 12.0,
        "trunk_link": 12.0,
        "motorway": 5.0,
        "motorway_link": 5.0,
        "footway": 10.0,
        "pedestrian": 8.0,
        "steps": 3.0,
    },
    "pedestrian": {
        "footway": 5.0,
        "path": 4.5,
        "pedestrian": 5.0,
        "steps": 3.0,
        "track": 4.0,
        "bridleway": 4.0,
        "residential": 5.0,
        "living_street": 5.0,
        "service": 5.0,
        "cycleway": 5.0,
        "tertiary": 5.0,
        "tertiary_link": 5.0,
        "secondary": 5.0,
        "secondary_link": 5.0,
        "primary": 5.0,
        "primary_link": 5.0,
        "unclassified": 5.0,
        "trunk": 5.0,
        "trunk_link": 5.0,
        "motorway": 3.0,
        "motorway_link": 3.0,
    },
}

MAIN_ROAD_CLASSES = frozenset(
    {
        "motorway",
        "motorway_link",
        "trunk",
        "trunk_link",
        "primary",
        "primary_link",
        "secondary",
        "secondary_link",
        "tertiary",
        "tertiary_link",
        "residential",
        "living_street",
        "service",
        "unclassified",
    }
)


def get_speed_kmh(highway: str, mode: str) -> float | None:
    """km/h for a (highway class, mode), or None if the mode can't use it."""
    return SPEED_KMH.get(mode, {}).get(highway)


def is_main_road(highway: str) -> bool:
    return highway in MAIN_ROAD_CLASSES


def segment_weight_ms(length_m: float, speed_kmh: float) -> int:
    """Travel time in integer milliseconds for a segment.

    Matches the reference's truncating conversion
    (`(dist_m / 1000.0 / speed_kmh) * 3600.0 * 1000.0` cast to u32,
    rust/src/lib.rs:205); zero-ms segments are dropped by the graph builder.
    """
    return int((length_m / 1000.0 / speed_kmh) * 3600.0 * 1000.0)
