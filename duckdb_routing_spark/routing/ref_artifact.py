"""Reader for the reference engine's cached graph artifact
(`<pbf>.<mode>.routing`) — real-OSM interop without a PBF decoder.

The reference builds its graph from an .osm.pbf once and caches it as
bincode of `RoutingData { node_positions, fast_graph, spatial_index,
adj_list }` (rust/src/lib.rs:147-153, save at lib.rs:271-276; bincode 1.3 =
little-endian fixed-width ints, u64 lengths). This module parses that
artifact into a :class:`RoutingGraph`:

  - node_positions: Vec<(f64 lon, f64 lat)> -> node coordinate arrays;
  - fast_graph (fast_paths 1.0 CH structure) -> SKIPPED: it is a pure
    accelerator whose distances equal Dijkstra's, and this engine has its
    own vectorized SSSP kernel (kernels.sssp_frontier_ms);
  - spatial_index (rstar 0.12 RTree<IndexedPoint{lon,lat,idx:usize}>) ->
    WALKED for its leaf `idx` set = the reference's snap candidates
    (nodes on main-road ways, lib.rs:121-142), which seeds main_nodes so
    snapping agrees with the reference;
  - adj_list: Vec<Vec<(usize to, u32 weight_ms)>> -> the directed edge
    list (the same edges the CH was built from).

Edge lengths are not stored in the artifact; they are re-derived as the
haversine of the endpoints, matching the reference's own path-distance
semantics (it sums haversine over path node coordinates, lib.rs:779-795,
never a stored length).
"""

from __future__ import annotations

import struct

import numpy as np

from duckdb_routing_spark.routing.geometry import haversine_m
from duckdb_routing_spark.routing.graph import RoutingGraph

_U64 = struct.Struct("<Q")
_U32 = struct.Struct("<I")


class _Cursor:
    __slots__ = ("buf", "off")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u64(self) -> int:
        v = _U64.unpack_from(self.buf, self.off)[0]
        self.off += 8
        return v

    def u32(self) -> int:
        v = _U32.unpack_from(self.buf, self.off)[0]
        self.off += 4
        return v

    def skip(self, n: int) -> None:
        self.off += n
        if self.off > len(self.buf):
            raise ValueError("truncated artifact")

    def f64_array(self, count: int) -> np.ndarray:
        out = np.frombuffer(self.buf, dtype="<f8", count=count, offset=self.off)
        self.off += 8 * count
        return out


def _skip_fast_graph(c: _Cursor) -> None:
    """fast_paths 1.0 FastGraph: num_nodes + ranks:Vec<usize> +
    edges_fwd:Vec<FastGraphEdge{5 x usize}> + first_edge_ids_fwd:Vec<usize>
    + edges_bwd + first_edge_ids_bwd. All fixed-width u64 under bincode."""
    c.u64()  # num_nodes
    for item_size in (8, 40, 8, 40, 8):
        n = c.u64()
        c.skip(n * item_size)


def _walk_rtree_leaves(c: _Cursor) -> list[int]:
    """rstar 0.12 RTree{root: ParentNode, size: usize, params: ()} with
    ParentNode{children: Vec<RTreeNode>, envelope: AABB{[f64;2],[f64;2]}}
    and RTreeNode = enum{0: Leaf(IndexedPoint{f64,f64,usize}), 1: Parent}.
    Iterative walk collecting leaf idx values."""
    leaves: list[int] = []

    def read_parent_header() -> int:
        return c.u64()  # children count; envelope follows the children

    # stack of remaining-children counters; envelope is AFTER the children
    # vec in field order (children, envelope), so when a parent's counter
    # hits zero we consume its 32-byte envelope
    stack = [read_parent_header()]
    while stack:
        if stack[-1] == 0:
            stack.pop()
            c.skip(32)  # this parent's AABB envelope
            continue
        stack[-1] -= 1
        tag = c.u32()
        if tag == 0:  # Leaf(IndexedPoint)
            c.skip(16)  # lon, lat
            leaves.append(c.u64())  # idx
        elif tag == 1:  # Parent(ParentNode)
            stack.append(read_parent_header())
        else:
            raise ValueError(f"unexpected RTreeNode tag {tag} at offset {c.off - 4}")
    size = c.u64()
    if size != len(leaves):
        raise ValueError(f"rtree size field {size} != leaves walked {len(leaves)}")
    return leaves


def read_reference_artifact(path: str) -> RoutingGraph:
    """Parse a `<pbf>.<mode>.routing` artifact into a RoutingGraph."""
    with open(path, "rb") as fh:
        buf = fh.read()
    c = _Cursor(buf)

    n_nodes = c.u64()
    pos = c.f64_array(2 * n_nodes)  # (lon, lat) interleaved
    node_lon = np.ascontiguousarray(pos[0::2])
    node_lat = np.ascontiguousarray(pos[1::2])

    _skip_fast_graph(c)
    main_nodes = np.asarray(sorted(set(_walk_rtree_leaves(c))), dtype=np.int64)

    n_adj = c.u64()
    if n_adj != n_nodes:
        raise ValueError(f"adj_list len {n_adj} != node count {n_nodes}")
    pair_dtype = np.dtype([("to", "<u8"), ("w", "<u4")])
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    ws: list[np.ndarray] = []
    for u in range(n_nodes):
        k = c.u64()
        if k:
            pairs = np.frombuffer(c.buf, dtype=pair_dtype, count=k, offset=c.off)
            c.skip(k * 12)
            srcs.append(np.full(k, u, dtype=np.int64))
            dsts.append(pairs["to"].astype(np.int64))
            ws.append(pairs["w"].astype(np.int64))
    if c.off != len(buf):
        raise ValueError(f"artifact has {len(buf) - c.off} trailing bytes — format drift?")

    src = np.concatenate(srcs) if srcs else np.zeros(0, dtype=np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, dtype=np.int64)
    w = np.concatenate(ws) if ws else np.zeros(0, dtype=np.int64)
    length_m = haversine_m(node_lon[src], node_lat[src], node_lon[dst], node_lat[dst])
    return RoutingGraph.from_arrays(node_lon, node_lat, src, dst, w, length_m, main_nodes)
