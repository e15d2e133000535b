"""Sinks: the COPY-to-file surface the reference examples use
(COPY (...) TO 'route.geojson' — examples/monaco_end_to_end.sql:85-103;
TO 'routes.json' (FORMAT JSON, ARRAY true) — ITALY.md:314-332).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from duckdb_routing_spark.routing.geometry import looks_like_wkb, parse_wkb_linestring, wkb_to_centroid


def _geometry_to_geojson(value):
    if value is None:
        return None
    data = bytes(value)
    if looks_like_wkb(data):
        import struct

        geom_type = struct.unpack_from("<I" if data[0] == 1 else ">I", data, 1)[0] & 0x0FFFFFFF
        if geom_type == 2:
            pts = parse_wkb_linestring(data)
            return {"type": "LineString", "coordinates": [[x, y] for x, y in pts]}
        pt = wkb_to_centroid(data)
        if pt:
            return {"type": "Point", "coordinates": [pt[0], pt[1]]}
    return None


def write_geojson(df: DataFrame, path: str, geometry_col: str = "geometry") -> int:
    """Write a FeatureCollection: one feature per row, `geometry_col` (WKB)
    becomes the feature geometry, every other column a property.

    Driver-side by design: GeoJSON is a single-document format, so this is a
    small-result export (route shapes, contours) — bulk data uses
    df.write.json/parquet. Returns the number of features written."""
    cols = [c for c in df.columns if c != geometry_col]
    features = []
    for row in df.collect():
        features.append(
            {
                "type": "Feature",
                "geometry": _geometry_to_geojson(row[geometry_col]),
                "properties": {c: row[c] for c in cols},
            }
        )
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)
    return len(features)


def write_json_array(df: DataFrame, path: str) -> int:
    """The `COPY ... (FORMAT JSON, ARRAY true)` shape: one JSON array of row
    objects. Driver-side, small results; bulk path is df.write.json."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    for r in rows:
        for k, v in r.items():
            if isinstance(v, (bytes, bytearray)):
                r[k] = bytes(v).hex()
            elif hasattr(v, "isoformat"):
                r[k] = v.isoformat()
    with open(path, "w") as f:
        json.dump(rows, f)
    return len(rows)


def write_table_format(df: DataFrame, path: str, fmt: str = "delta", mode: str = "append", **options) -> None:
    """Lakehouse table-format sink (Delta Lake / Apache Iceberg): the
    100 TB-scale landing zone for pipeline outputs (ACID appends, compaction,
    time travel). The format JARs are not in this image, so the call is
    gated on the runtime actually knowing the format; the plumbing —
    DataFrameWriter options, mode, partitioning via options — is real and
    identical to a cluster run with the packages on the classpath."""
    if fmt not in ("delta", "iceberg"):
        raise ValueError(f"unsupported table format: {fmt}")
    writer = df.write.format(fmt).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.save(path)
    except Exception as e:  # noqa: BLE001 — classify the classpath gate
        msg = str(e)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg or "ClassNotFound" in msg:
            raise NotImplementedError(
                f"{fmt} writer requires the {fmt} runtime on the Spark classpath "
                f"(e.g. spark-submit --packages io.delta:delta-spark_2.13:<ver> or "
                f"org.apache.iceberg:iceberg-spark-runtime); not present in this "
                f"image. For Delta, sources.deltalog.write_delta is the in-repo "
                f"dependency-free protocol writer (append/overwrite/time-travel, "
                f"tested end-to-end here)"
            ) from e
        raise
