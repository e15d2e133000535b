"""Spatial join: points-in-polygons with grid-cell blocking.

The geo complement of the blocked pair spaces elsewhere (SemDeDup cells,
simhash bands, ER blocks): polygons explode onto the grid cells their
bounding box covers, points map to exactly ONE cell, and the candidate
space is an equi-join on cell — sum-over-cells(points_b × polys_b), never
|points| × |polys|. The exact predicate is an even-odd ray cast evaluated
row-locally as a constant-size higher-order-function expression (no
Python, no UDF), so the join stays inside whole-stage codegen.

Because a point lands in one cell and a polygon registers every bbox cell,
each (point, polygon) candidate appears at most once — no distinct needed
after the filter.

Engine portability: the crossing test is one fixed IEEE expression
(`(bx-ax)*(py-ay)/(by-ay)+ax`) written identically in the DuckDB oracle,
and the candidate structure is integer cells — results hash-match with no
float surrogate. Boundary points follow the predicate's strict
inequalities (measure-zero for the hashed fixtures; document your own
tolerance policy for surveyed data).

At 100 TB: pick cell_size near the median polygon diameter — smaller
cells multiply polygon replication, larger cells grow per-cell candidate
lists; skewed cells (a metro area) are the standard salting case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# even-odd ray cast over a CLOSED ring (first vertex == last): count edges
# whose y-span straddles the point and whose x-intercept at py lies right
# of px. slice/zip_with pair consecutive vertices; aggregate folds exactly
# left-to-right (the oracle mirrors this expression text)
_CROSSINGS = """
aggregate(
  zip_with(
    slice({v}, 1, size({v}) - 1),
    slice({v}, 2, size({v}) - 1),
    (a, b) -> CASE WHEN ((a.y > {py}) != (b.y > {py}))
                    AND ({px} < (b.x - a.x) * ({py} - a.y) / (b.y - a.y) + a.x)
              THEN 1 ELSE 0 END),
  0, (acc, x) -> acc + x)
"""


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    vertices_col: str = "vertices",
) -> DataFrame:
    """(point_id, poly_id) pairs where the point lies inside the polygon.

    `polygons.vertices` is an array<struct<x double, y double>> CLOSED ring
    (first == last). Blocking: polygons explode onto the grid cells of
    their bbox, points hash to their one cell, candidates equi-join on
    (cx, cy)."""
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        F.floor(F.col(x_col) / cell_size).cast("long").alias("cx"),
        F.floor(F.col(y_col) / cell_size).cast("long").alias("cy"),
    )
    g = polygons.select(
        F.col(poly_id).alias("poly_id"),
        F.col(vertices_col).alias("vs"),
        F.expr(f"transform({vertices_col}, v -> v.x)").alias("_xs"),
        F.expr(f"transform({vertices_col}, v -> v.y)").alias("_ys"),
    ).select(
        "poly_id",
        "vs",
        F.explode(
            F.expr(
                f"sequence(cast(floor(array_min(_xs) / {cell_size}) as bigint),"
                f" cast(floor(array_max(_xs) / {cell_size}) as bigint))"
            )
        ).alias("cx"),
        F.expr(
            f"sequence(cast(floor(array_min(_ys) / {cell_size}) as bigint),"
            f" cast(floor(array_max(_ys) / {cell_size}) as bigint))"
        ).alias("_cys"),
    ).select("poly_id", "vs", "cx", F.explode("_cys").alias("cy"))
    cand = p.join(g, ["cx", "cy"])
    inside = F.expr(_CROSSINGS.format(v="vs", px="px", py="py") + " % 2 = 1")
    return cand.where(inside).select("point_id", "poly_id")
