"""SRTM `.hgt` DEM tile ingestion for the `height` action.

The reference's Valhalla wrapper samples elevation from DEM tiles
(valhalla-wrapper height action); this engine's `RoutingEngine.height`
interpolates over a loaded raster. This module closes the ingestion gap:
it reads the public SRTM HGT format (NASA SRTM documentation — a square
grid of big-endian int16 meters, 1201x1201 for SRTM3 or 3601x3601 for
SRTM1, row 0 at the NORTH edge, the tile's SW corner encoded in the file
name, e.g. N47E011.hgt; voids are -32768) into the (lat, lon, height_m)
sample table `load_elevation` consumes.

Scale posture: DEM tiles for a service area are a bounded static sidecar
(one 1-degree SRTM1 tile = ~25 MB), held driver-side like the reference's
elevation dir; `stride` thins the raster when full 30 m resolution is more
than the height action needs.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

HGT_VOID = -32768

_NAME_RE = re.compile(r"^([NS])(\d{1,2})([EW])(\d{1,3})\.hgt$", re.IGNORECASE)


def parse_hgt_name(filename: str) -> tuple[int, int]:
    """SW-corner (lat0, lon0) from an HGT file name like N47E011.hgt."""
    m = _NAME_RE.match(os.path.basename(filename))
    if not m:
        raise ValueError(f"not an SRTM .hgt file name: {filename!r}")
    ns, lat, ew, lon = m.groups()
    lat0 = int(lat) * (1 if ns.upper() == "N" else -1)
    lon0 = int(lon) * (1 if ew.upper() == "E" else -1)
    return lat0, lon0


def read_hgt(path: str, stride: int = 1) -> pd.DataFrame:
    """One HGT tile -> (lat, lon, height_m) samples; voids dropped.

    The grid spans [lat0, lat0+1] x [lon0, lon0+1] with row 0 at the north
    edge; n is inferred from the file size (SRTM1 3601, SRTM3 1201, or any
    square int16 grid). ``stride`` keeps every k-th row/column (the corner
    rows/cols are always kept so the tile keeps covering its full extent)."""
    lat0, lon0 = parse_hgt_name(path)
    raw = np.fromfile(path, dtype=">i2")
    n = int(np.sqrt(raw.size))
    if n * n != raw.size:
        raise ValueError(f"{path}: size {raw.size} int16s is not a square grid")
    grid = raw.reshape(n, n).astype(np.float64)
    idx = np.arange(0, n, stride)
    if idx[-1] != n - 1:
        idx = np.append(idx, n - 1)
    grid = grid[np.ix_(idx, idx)]
    # row i (after striding) is latitude lat0 + 1 - orig_row/(n-1)
    lat_axis = lat0 + 1.0 - idx / (n - 1)
    lon_axis = lon0 + idx / (n - 1)
    lats = np.repeat(lat_axis, len(lon_axis))
    lons = np.tile(lon_axis, len(lat_axis))
    hts = grid.ravel()
    keep = hts != HGT_VOID
    return pd.DataFrame({"lat": lats[keep], "lon": lons[keep], "height_m": hts[keep]})


def read_hgt_dir(dir_path: str, stride: int = 1) -> pd.DataFrame:
    """All `.hgt` tiles in a directory, concatenated (adjacent tiles share
    edge rows/cols; duplicates collapse to one sample)."""
    frames = [
        read_hgt(os.path.join(dir_path, f), stride)
        for f in sorted(os.listdir(dir_path))
        if f.lower().endswith(".hgt")
    ]
    if not frames:
        raise FileNotFoundError(f"no .hgt tiles under {dir_path}")
    out = pd.concat(frames, ignore_index=True)
    return out.drop_duplicates(subset=["lat", "lon"], ignore_index=True)
