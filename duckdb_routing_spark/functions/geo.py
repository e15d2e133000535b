"""Minimal spatial function kit over WKT/WKB.

The reference's examples lean on DuckDB-spatial scalar functions
(ST_Point, ST_GeomFromWKB, ST_AsWKB, ST_NPoints, ST_GeomType, ST_AsText,
ST_StartPoint, ST_EndPoint, ST_Centroid, ST_AsGeoJSON — SURVEY §2.4). Spark
has no geometry type, and the routing engine only ever produces POINTs and
WKB LINESTRINGs, so this kit implements exactly that envelope: geometry
values are WKT strings or WKB bytes; functions are vectorized pandas UDFs
over the same parsers the routing engine uses.
"""

from __future__ import annotations

import json
import struct

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_routing_spark.routing.geometry import (
    any_geometry_to_lonlat,
    build_wkb_point,
    haversine_m_scalar,
    looks_like_wkb,
    parse_wkb_linestring,
)


def try_register_sedona(spark: SparkSession) -> bool:
    """Upgrade the SQL surface to a REAL spatial GEOMETRY type when Apache
    Sedona is available (python package + JARs on the classpath) — the
    reference's `travel_time_route` macro returns spatial-extension GEOMETRY
    via ST_GeomFromWKB (examples/geometry_macro.sql:31-37); with Sedona
    registered, `ST_GeomFromWKB(travel_time_route_wkb(...))` does exactly
    that over a GeometryUDT, and this kit's identity st_geomfromwkb/st_aswkb
    stand aside in favor of Sedona's typed versions.

    Returns False (pure no-op) when Sedona is absent — every in-repo ST_*
    consumer works over WKB bytes, so the alias surface stays complete."""
    try:
        from sedona.spark import SedonaContext  # noqa: PLC0415
    except Exception:  # package not installed (this container)
        return False
    try:
        SedonaContext.create(spark)
        return True
    except Exception:  # package present but JARs missing from the session
        return False


def _geom_points(value):
    """All coordinate pairs of a WKT/WKB geometry (POINT or LINESTRING)."""
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray, memoryview)):
        data = bytes(value)
        if looks_like_wkb(data):
            geom_type = struct.unpack_from("<I" if data[0] == 1 else ">I", data, 1)[0] & 0x0FFFFFFF
            if geom_type == 2:
                return parse_wkb_linestring(data)
            pt = any_geometry_to_lonlat(data)
            return [pt] if pt else None
    pt = any_geometry_to_lonlat(value)
    return [pt] if pt else None


def register_geo_functions(spark: SparkSession) -> None:
    @F.pandas_udf(T.BinaryType())
    def st_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if pd.isna(x) or pd.isna(y) else build_wkb_point(float(x), float(y))
                for x, y in zip(lon, lat)
            ]
        )

    @F.pandas_udf(T.StringType())
    def st_astext(g: pd.Series) -> pd.Series:
        out = []
        for v in g:
            pts = _geom_points(v)
            if not pts:
                out.append(None)
            elif len(pts) == 1:
                out.append(f"POINT({pts[0][0]} {pts[0][1]})")
            else:
                out.append("LINESTRING(" + ", ".join(f"{x} {y}" for x, y in pts) + ")")
        return pd.Series(out)

    @F.pandas_udf(T.IntegerType())
    def st_npoints(g: pd.Series) -> pd.Series:
        return pd.Series([len(_geom_points(v)) if _geom_points(v) else None for v in g], dtype="Int32")

    @F.pandas_udf(T.StringType())
    def st_geomtype(g: pd.Series) -> pd.Series:
        out = []
        for v in g:
            pts = _geom_points(v)
            out.append(None if not pts else ("POINT" if len(pts) == 1 else "LINESTRING"))
        return pd.Series(out)

    @F.pandas_udf(T.BinaryType())
    def st_startpoint(g: pd.Series) -> pd.Series:
        return pd.Series(
            [build_wkb_point(*_geom_points(v)[0]) if _geom_points(v) else None for v in g]
        )

    @F.pandas_udf(T.BinaryType())
    def st_endpoint(g: pd.Series) -> pd.Series:
        return pd.Series(
            [build_wkb_point(*_geom_points(v)[-1]) if _geom_points(v) else None for v in g]
        )

    @F.pandas_udf(T.BinaryType())
    def st_centroid(g: pd.Series) -> pd.Series:
        out = []
        for v in g:
            c = any_geometry_to_lonlat(v)
            out.append(build_wkb_point(*c) if c else None)
        return pd.Series(out)

    @F.pandas_udf(T.DoubleType())
    def st_length(g: pd.Series) -> pd.Series:
        """Geodesic length in meters: haversine sum over consecutive points
        (the reference's route-length macro sums haversine over the WKB
        linestring — README.md:27, ITALY.md:264-274). POINTs have length 0."""
        out = []
        for v in g:
            pts = _geom_points(v)
            if not pts:
                out.append(None)
            else:
                out.append(
                    float(
                        sum(
                            haversine_m_scalar(x1, y1, x2, y2)
                            for (x1, y1), (x2, y2) in zip(pts, pts[1:])
                        )
                    )
                )
        return pd.Series(out, dtype="float64")

    @F.pandas_udf(T.BinaryType())
    def st_geomfromwkb(g: pd.Series) -> pd.Series:
        """Identity with validation: geometry IS WKB in this kit; non-WKB
        bytes become NULL (mirrors the reference's typed-geometry boundary)."""
        return pd.Series(
            [bytes(v) if v is not None and looks_like_wkb(bytes(v)) else None for v in g]
        )

    @F.pandas_udf(T.BinaryType())
    def st_aswkb(g: pd.Series) -> pd.Series:
        """Identity: this kit's geometry representation already is WKB."""
        return pd.Series([None if v is None else bytes(v) for v in g])

    @F.pandas_udf(T.StringType())
    def st_asgeojson(g: pd.Series) -> pd.Series:
        out = []
        for v in g:
            pts = _geom_points(v)
            if not pts:
                out.append(None)
            elif len(pts) == 1:
                out.append(json.dumps({"type": "Point", "coordinates": [pts[0][0], pts[0][1]]}))
            else:
                out.append(
                    json.dumps({"type": "LineString", "coordinates": [[x, y] for x, y in pts]})
                )
        return pd.Series(out)

    kit = {
        "st_point": st_point,
        "st_astext": st_astext,
        "st_npoints": st_npoints,
        "st_geomtype": st_geomtype,
        "st_startpoint": st_startpoint,
        "st_endpoint": st_endpoint,
        "st_centroid": st_centroid,
        "st_asgeojson": st_asgeojson,
        "st_length": st_length,
        "st_geomfromwkb": st_geomfromwkb,
        "st_aswkb": st_aswkb,
    }
    if try_register_sedona(spark):
        # Sedona owns the typed-geometry boundary: its ST_GeomFromWKB/ST_AsWKB
        # return/consume a real GeometryUDT — don't clobber them with the
        # WKB-identity versions
        kit.pop("st_geomfromwkb")
        kit.pop("st_aswkb")
    for name, fn in kit.items():
        spark.udf.register(name, fn)
