"""PARTITIONED contraction-hierarchy build — the distributed/bounded-RSS
path past the single-process ceiling.

Why: `build_ch` holds the whole remaining graph as Python dict-of-dicts —
measured 1813 B/node peak (COUNTRY_SCALE.json, 20.2M-node row), a ~75M-node
ceiling on a 128 GiB driver. The reference's largest published build is
Europe (~30 GB PBF, scripts/BUILD_EUROPE_TILES.md:20-60 — 200M+ routing
nodes), which no single process at that constant can reach. This module is
the partitioned path the round-9 README named: the graph memory a build
holds at once becomes ONE CELL, not the country.

Algorithm (the standard partition-based parallel CH — Geisberger et al.
2008 §5 discusses the parallelization; partition orderings are also the
basis of customizable CH variants; all public literature):

1. PARTITION nodes into cells (a lon/lat grid here; any partitioner works).
   A node with an edge leaving its cell is a BOUNDARY node; the rest are
   INTERIOR.
2. Per cell, contract ONLY the interior nodes (boundary nodes are frozen
   with +inf priority), witness searches restricted to the cell subgraph.
   Interior nodes' neighbors are all inside their own cell, so cells touch
   disjoint state and contract in PARALLEL (Spark executors via
   applyInPandas, or sequentially for bounded driver RSS); the result
   equals a sequential contraction order (cell 0's interior, then cell
   1's, ...). Restricting witness searches to the cell can only MISS
   witnesses, which only ADDS redundant shortcuts — exactness preserved,
   the same argument as the settle limit (routing/ch.py docstring).
3. The OVERLAY — boundary nodes + their surviving edges (original
   boundary-boundary edges, boundary-boundary shortcuts from step 2, and
   all original cross-cell edges) — is contracted normally on the driver.
   Road networks cut on a grid have O(sqrt(n*k)) boundary nodes, so the
   overlay is a small fraction of the graph.
4. RANKS: cell interiors take consecutive blocks (ascending cell id), the
   overlay ranks sit above all of them — exactly the sequential order of
   step 2's equivalence. Final up/down CSR assembly is vectorized numpy
   (the per-edge Python loop of the in-memory build would dominate at
   100M+ hierarchy edges).

The produced `CHIndex` is byte-compatible with every consumer (`ch_p2p`,
many-to-many, path unpacking, `.npz` sidecars) — only the build differs,
and queries remain EXACT (pytest: partitioned vs `build_ch` vs Dijkstra on
grids and road-like graphs, both modes).

In Spark mode the cell results land in a parquet spill dir written by the
EXECUTORS and are read back columnar (pyarrow) — the driver never holds a
row-wise frame of the hierarchy (105M+ edges at country scale). At cluster
scale the same shape holds: the edge table is parquet partitioned by cell,
one applyInPandas task per cell, only the sqrt-sized overlay is
driver-side — the reference's Europe bar stops being a single-machine
memory question. Reference parity anchor: rust/src/lib.rs:260 (fast_paths
CH prepare), scripts/BUILD_EUROPE_TILES.md:20-60 (the Europe build bar).
"""

from __future__ import annotations

import numpy as np

from duckdb_routing_spark.routing.ch import (
    CHIndex,
    _priority,
    _witness_search,
)
from duckdb_routing_spark.routing.graph import RoutingGraph

_INF = float("inf")


def grid_cells(g: RoutingGraph, n_cells: int) -> np.ndarray:
    """Cell id per node: a ~sqrt(n_cells) x sqrt(n_cells) lon/lat grid over
    the graph's bounding box. Any partitioner works (exactness never
    depends on the cut); a coordinate grid keeps road-network cuts small."""
    k = max(1, int(round(n_cells ** 0.5)))
    lon, lat = g.node_lon, g.node_lat
    lo_x, hi_x = float(lon.min()), float(lon.max())
    lo_y, hi_y = float(lat.min()), float(lat.max())
    sx = (hi_x - lo_x) or 1.0
    sy = (hi_y - lo_y) or 1.0
    cx = np.minimum(((lon - lo_x) / sx * k).astype(np.int64), k - 1)
    cy = np.minimum(((lat - lo_y) / sy * k).astype(np.int64), k - 1)
    return cy * k + cx


def _contract_subgraph(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    contractible: np.ndarray,
):
    """Contract every `contractible` node of the (local-id) subgraph with
    the batched independent-set algorithm of `ch._build_ch_inner`; frozen
    nodes carry +inf priority, so they never block a neighbor's local
    minimum and are never contracted.

    Returns (order, hier_edges, rem_edges):
      order       int64[#contracted] — local ids in contraction order
      hier_edges  (u, v, w, mid) int64 arrays — every input edge plus every
                  added shortcut (mid = -1 for originals)
      rem_edges   (u, v, w) int64 arrays — the remaining graph on frozen
                  nodes (min parallel weight per pair, like the input load)
    """
    import gc

    gc_was_enabled = gc.isenabled()
    gc.disable()
    try:
        return _contract_subgraph_inner(n, src, dst, w, contractible)
    finally:
        if gc_was_enabled:
            gc.enable()


def _contract_subgraph_inner(n, src, dst, w, contractible):
    fwd: list[dict] = [dict() for _ in range(n)]
    bwd: list[dict] = [dict() for _ in range(n)]
    for u, v, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
        if u == v:
            continue
        if wt < fwd[u].get(v, _INF):
            fwd[u][v] = wt
            bwd[v][u] = wt

    edges: list[tuple[int, int, int, int]] = [
        (u, v, wt, -1) for u in range(n) for v, wt in fwd[u].items()
    ]

    can = contractible.tolist()  # plain-list lookups in the hot loop
    deleted_neighbors = [0] * n
    prio = [0.0] * n
    order: list[int] = []
    live = {v for v in range(n) if can[v]}
    dirty = set(live)
    while live:
        for v in dirty:
            prio[v] = _priority(fwd, bwd, v) + deleted_neighbors[v]
        dirty = set()
        # independent set: strict local minima of (priority, id) among
        # LIVE neighbors; frozen neighbors (not contractible) never block
        # — conceptually +inf priority. fwd/bwd only hold live + frozen
        # nodes (contracted ones are disconnected), so `u in live` is
        # equivalent to `can[u]` here.
        batch = []
        for v in live:
            pv = (prio[v], v)
            ok = True
            for u in fwd[v]:
                if can[u] and (prio[u], u) < pv:
                    ok = False
                    break
            if ok:
                for u in bwd[v]:
                    if can[u] and (prio[u], u) < pv:
                        ok = False
                        break
            if ok:
                batch.append(v)
        in_batch = set(batch)
        batch_ins = {v: list(bwd[v].items()) for v in batch}
        batch_outs = {v: list(fwd[v].items()) for v in batch}
        for v in batch:
            order.append(v)
            ins = batch_ins[v]
            outs = batch_outs[v]
            for u, wu in ins:
                need = [t for t, _ in outs if t != u]
                if not need:
                    continue
                cap = max(wu + wt for t, wt in outs if t != u)
                wit = _witness_search(fwd, u, in_batch, need, cap)
                for t, wt in outs:
                    if t == u:
                        continue
                    via = wu + wt
                    if wit.get(t, _INF) > via:
                        if via < fwd[u].get(t, _INF):
                            fwd[u][t] = via
                            bwd[t][u] = via
                            edges.append((u, t, via, v))
                            dirty.add(u)
                            dirty.add(t)
            for u, _ in ins:
                fwd[u].pop(v, None)
                deleted_neighbors[u] += 1
                dirty.add(u)
            for t, _ in outs:
                bwd[t].pop(v, None)
                deleted_neighbors[t] += 1
                dirty.add(t)
            fwd[v].clear()
            bwd[v].clear()
        live -= in_batch
        dirty &= live

    rem = [
        (u, v, wt)
        for u in range(n)
        if not can[u]
        for v, wt in fwd[u].items()
    ]
    e = np.array(edges, dtype=np.int64).reshape(-1, 4)
    r = np.array(rem, dtype=np.int64).reshape(-1, 3)
    return (
        np.array(order, dtype=np.int64),
        (e[:, 0], e[:, 1], e[:, 2], e[:, 3]),
        (r[:, 0], r[:, 1], r[:, 2]),
    )


def _contract_cell_global(cell_src, cell_dst, cell_w, boundary_ids):
    """Contract one cell given GLOBAL-id edge arrays and the (sorted,
    global) boundary node ids present in it. Returns global-id results:
    (order, hier (u,v,w,mid), rem (u,v,w))."""
    nodes = np.unique(np.concatenate([cell_src, cell_dst]))
    ls = np.searchsorted(nodes, cell_src)
    ld = np.searchsorted(nodes, cell_dst)
    contractible = ~np.isin(nodes, boundary_ids, assume_unique=False)
    order, (hu, hv, hw, hm), (ru, rv, rw) = _contract_subgraph(
        len(nodes), ls, ld, cell_w, contractible
    )
    hm_g = np.where(hm >= 0, nodes[np.maximum(hm, 0)], -1)
    return (
        nodes[order],
        (nodes[hu], nodes[hv], hw, hm_g),
        (nodes[ru], nodes[rv], rw),
    )


def _csr_from_edges(n, key, other, w, mid):
    """Vectorized CSR build keyed on `key` (numpy sort, no Python loop)."""
    o = np.argsort(key, kind="stable")
    key, other, w, mid = key[o], other[o], w[o], mid[o]
    counts = np.bincount(key, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, other.astype(np.int64), w.astype(np.int64), mid.astype(np.int64)


def build_ch_partitioned(
    g: RoutingGraph,
    n_cells: int = 16,
    cells: np.ndarray | None = None,
    spark=None,
    max_concurrent_cells: int | None = None,
) -> CHIndex:
    """Partitioned CH build (module docstring). `cells` overrides the grid
    partitioner. With `spark`, cell contraction fans out over executors via
    groupBy(cell).applyInPandas — cap concurrent Python workers (memory =
    one cell's dict graph each) with `max_concurrent_cells`, which sets the
    job's shuffle width; without Spark, cells contract sequentially on the
    driver with bounded RSS (one cell's dicts at a time)."""
    n = g.num_nodes
    if cells is None:
        cells = grid_cells(g, n_cells)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
    dst = g.indices.astype(np.int64)
    w = g.weights_ms.astype(np.int64)
    cross = cells[src] != cells[dst]
    boundary = np.zeros(n, dtype=bool)
    boundary[src[cross]] = True
    boundary[dst[cross]] = True

    in_cell = ~cross
    cs, cd, cw = src[in_cell], dst[in_cell], w[in_cell]
    cell_of_edge = cells[cs]

    # per-cell contraction -> flat result arrays:
    #   hier: (u, v, w, mid)            all cell edges + cell shortcuts
    #   rem:  (u, v, w)                 surviving boundary-boundary edges
    #   orders: (cell, seq, node)       contraction sequence per cell
    if spark is not None:
        hier, rem, orders = _contract_cells_spark(
            spark, cs, cd, cw, cell_of_edge, boundary, max_concurrent_cells
        )
    else:
        hs, rs, os_ = [], [], []
        for c in np.unique(cell_of_edge):
            m = cell_of_edge == c
            b_ids = np.unique(
                np.concatenate([cs[m][boundary[cs[m]]], cd[m][boundary[cd[m]]]])
            )
            order, h, r = _contract_cell_global(cs[m], cd[m], cw[m], b_ids)
            hs.append(h)
            rs.append(r)
            os_.append(
                (np.full(len(order), c), np.arange(len(order)), order)
            )
        hier = tuple(np.concatenate([x[i] for x in hs]) for i in range(4))
        rem = tuple(np.concatenate([x[i] for x in rs]) for i in range(3))
        orders = tuple(np.concatenate([x[i] for x in os_]) for i in range(3))

    # ----- overlay: boundary nodes + surviving edges + cross-cell edges
    o_u = np.concatenate([src[cross], rem[0]])
    o_v = np.concatenate([dst[cross], rem[1]])
    o_w = np.concatenate([w[cross], rem[2]])
    b_nodes = np.flatnonzero(boundary)
    o_local = np.full(n, -1, dtype=np.int64)
    o_local[b_nodes] = np.arange(len(b_nodes))
    ov_order_l, (ou, ov, ow, om), _ = _contract_subgraph(
        len(b_nodes), o_local[o_u], o_local[o_v], o_w,
        np.ones(len(b_nodes), dtype=bool),
    )

    # ----- ranks: interior cell blocks (ascending cell id, contraction
    # sequence within), overlay on top
    rank = np.full(n, -1, dtype=np.int64)
    oc, oseq, onode = orders
    blk = np.lexsort((oseq, oc))  # cell-major, sequence-minor
    rank[onode[blk]] = np.arange(len(onode))
    base = len(onode)
    rank[b_nodes[ov_order_l]] = base + np.arange(len(ov_order_l))
    base += len(ov_order_l)
    # isolated nodes (no edges at all) appear in no order; rank value moot
    missing = np.flatnonzero(rank < 0)
    rank[missing] = base + np.arange(len(missing))

    # ----- final hierarchy edge set:
    #   every cell's (original + shortcut) edges, cross-cell originals,
    #   overlay SHORTCUTS only (overlay input edges already exist in the
    #   cell hier lists / cross-cell slice — re-adding them would only
    #   duplicate parallel edges)
    sc = om >= 0
    eu = np.concatenate([src[cross], hier[0], b_nodes[ou[sc]]])
    ev = np.concatenate([dst[cross], hier[1], b_nodes[ov[sc]]])
    ew = np.concatenate([w[cross], hier[2], ow[sc]])
    em = np.concatenate(
        [np.full(int(cross.sum()), -1, dtype=np.int64), hier[3], b_nodes[om[sc]]]
    )

    up_mask = rank[ev] > rank[eu]
    up = _csr_from_edges(n, eu[up_mask], ev[up_mask], ew[up_mask], em[up_mask])
    dn = _csr_from_edges(n, ev[~up_mask], eu[~up_mask], ew[~up_mask], em[~up_mask])
    return CHIndex(rank, up, dn, n_shortcuts=int((em >= 0).sum()))


def _contract_cells_spark(
    spark, cs, cd, cw, cell_of_edge, boundary, max_concurrent_cells
):
    """Fan cell contraction out over Spark executors: one applyInPandas
    group per cell. Each worker rebuilds its cell's edge arrays from the
    Arrow batch (per-edge boundary flags travel WITH the rows — no
    side-channel state), contracts, and writes kind-tagged int rows
    (0 = hierarchy edge, 1 = remaining boundary edge, 2 = order entry).
    Results spill to a parquet dir written by the executors and are read
    back COLUMNAR via pyarrow — the driver never materializes a row-wise
    frame of the hierarchy (105M+ edges at country scale)."""
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow.dataset as pa_ds

    pdf = pd.DataFrame(
        {
            "cell": cell_of_edge,
            "u": cs,
            "v": cd,
            "w": cw,
            "ub": boundary[cs],
            "vb": boundary[cd],
        }
    )
    sdf = spark.createDataFrame(pdf)
    if max_concurrent_cells:
        sdf = sdf.repartition(int(max_concurrent_cells), "cell")

    schema = "cell long, kind int, a long, b long, c long, d long"

    def contract(key, batch: pd.DataFrame):
        cell = int(key[0])
        gsrc = batch["u"].to_numpy(np.int64)
        gdst = batch["v"].to_numpy(np.int64)
        gw = batch["w"].to_numpy(np.int64)
        b_ids = np.unique(
            np.concatenate(
                [gsrc[batch["ub"].to_numpy(bool)], gdst[batch["vb"].to_numpy(bool)]]
            )
        )
        order, (eu, ev, ew, em), (ru, rv, rw) = _contract_cell_global(
            gsrc, gdst, gw, b_ids
        )
        return pd.concat(
            [
                pd.DataFrame({"cell": cell, "kind": 0, "a": eu, "b": ev, "c": ew, "d": em}),
                pd.DataFrame({"cell": cell, "kind": 1, "a": ru, "b": rv, "c": rw, "d": -1}),
                pd.DataFrame(
                    {"cell": cell, "kind": 2, "a": order,
                     "b": np.arange(len(order)), "c": 0, "d": -1}
                ),
            ],
            ignore_index=True,
        )

    spill = tempfile.mkdtemp(prefix="ch_cells_")
    try:
        (
            sdf.groupBy("cell")
            .applyInPandas(contract, schema)
            .write.mode("overwrite")
            .parquet(spill)
        )
        ds = pa_ds.dataset(spill, format="parquet")

        def cols(kind, names):
            t = ds.to_table(
                columns=names, filter=pa_ds.field("kind") == kind
            )
            return tuple(t.column(c).to_numpy() for c in names)

        ha, hb, hc, hd = cols(0, ["a", "b", "c", "d"])
        ra, rb, rc = cols(1, ["a", "b", "c"])
        oc, ob, oa = cols(2, ["cell", "b", "a"])
        return (
            (ha, hb, hc, hd),
            (ra, rb, rc),
            (oc, ob, oa),
        )
    finally:
        shutil.rmtree(spill, ignore_errors=True)
