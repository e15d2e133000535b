"""SRTM .hgt DEM ingestion: format parsing, voids, and the height action
end-to-end over a synthetic tile (the file is written by the test in the
exact public format — big-endian int16 square grid, north row first)."""

import json

import numpy as np
import pytest

from duckdb_routing_spark.routing.elevation import HGT_VOID, parse_hgt_name, read_hgt


N = 121  # any square side works; SRTM proper is 1201/3601


def _write_tile(path, lat0=47, lon0=11, void_at=None):
    # height(row, col) = 100 + 2*row + col — linear, so bilinear sampling
    # reproduces it exactly anywhere inside the tile
    rows = np.arange(N).reshape(-1, 1)
    cols = np.arange(N).reshape(1, -1)
    grid = (100 + 2 * rows + cols).astype(">i2")
    if void_at is not None:
        grid[void_at] = HGT_VOID
    grid.tofile(path)
    return path


def test_parse_hgt_name():
    assert parse_hgt_name("N47E011.hgt") == (47, 11)
    assert parse_hgt_name("/some/dir/S01W072.hgt") == (-1, -72)
    with pytest.raises(ValueError):
        parse_hgt_name("tile_47_11.hgt")


def test_read_hgt_grid_and_voids(tmp_path):
    p = _write_tile(str(tmp_path / "N47E011.hgt"), void_at=(3, 4))
    pdf = read_hgt(p)
    assert len(pdf) == N * N - 1  # void dropped
    # north row first: row 0 is lat0+1
    assert pdf["lat"].max() == 48.0 and pdf["lat"].min() == 47.0
    assert pdf["lon"].min() == 11.0 and pdf["lon"].max() == 12.0
    # spot value: row 10, col 20
    got = pdf[(pdf["lat"] == 48.0 - 10 / (N - 1)) & (pdf["lon"] == 11.0 + 20 / (N - 1))]
    assert got["height_m"].iloc[0] == 100 + 2 * 10 + 20


def test_read_hgt_stride_keeps_extent(tmp_path):
    p = _write_tile(str(tmp_path / "N47E011.hgt"))
    pdf = read_hgt(p, stride=7)
    assert pdf["lat"].min() == 47.0 and pdf["lat"].max() == 48.0
    assert pdf["lon"].min() == 11.0 and pdf["lon"].max() == 12.0
    assert len(pdf) < N * N / 40


def test_height_action_over_hgt_tile(spark, tmp_path):
    from duckdb_routing_spark.routing.engine import RoutingEngine
    from duckdb_routing_spark.testing import build_grid_graph

    _write_tile(str(tmp_path / "N47E011.hgt"))
    eng = RoutingEngine(spark)
    eng.load_graph(build_grid_graph("auto"), "auto")  # height gates on a loaded engine
    eng.load_elevation_hgt(str(tmp_path))
    # exact lattice point: row 10, col 20
    lat = 48.0 - 10 / (N - 1)
    lon = 11.0 + 20 / (N - 1)
    # off-lattice midpoint: bilinear of the linear surface is exact
    lat_m = 48.0 - 10.5 / (N - 1)
    lon_m = 11.0 + 20.5 / (N - 1)
    out = json.loads(
        eng.request(
            "height",
            json.dumps({"locations": [
                {"lat": lat, "lon": lon},
                {"lat": lat_m, "lon": lon_m},
            ]}),
        )
    )
    assert out["height"][0] == pytest.approx(100 + 2 * 10 + 20)
    assert out["height"][1] == pytest.approx(100 + 2 * 10.5 + 20.5)
