"""Exact-integer PageRank: parity vs an independent pure-Python simulator
(dangling nodes, parallel edges, weights), partitioning invariance, and
random-walk semantics."""

import pytest
from pyspark.sql import functions as F

from duckdb_routing_spark.operators import graph

MU = graph.MU


def _reference(edges, iterations=5, num=85, den=100):
    """Independent integer simulator of the documented update."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    r = {v: MU for v in nodes}
    n = len(nodes)
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (r[s] * w) // out_w[s]
        dangle = sum(r[v] for v in nodes if v not in out_w)
        r = {
            v: ((den - num) * MU + num * (inflow[v] + dangle // n)) // den
            for v in nodes
        }
    return r


EDGES = [
    # a cycle, a hub, a dangling sink, and a PARALLEL edge (a->b twice)
    ("a", "b", 2), ("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
    ("a", "hub", 5), ("b", "hub", 3), ("c", "hub", 2),
    ("hub", "sink", 1),
]


def test_pagerank_matches_reference_simulator(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string, w long")
    got = {r.node: r.rank_mu for r in graph.pagerank(e, iterations=5).collect()}
    assert got == _reference(EDGES)


def test_pagerank_partitioning_invariant(spark):
    """Integer algebra leaves no aggregation-order wiggle room: 1 vs 7
    partitions give byte-identical ranks."""
    e1 = spark.createDataFrame(EDGES, "src string, dst string, w long").coalesce(1)
    e7 = spark.createDataFrame(EDGES, "src string, dst string, w long").repartition(7)
    r1 = sorted((r.node, r.rank_mu) for r in graph.pagerank(e1, iterations=4).collect())
    r7 = sorted((r.node, r.rank_mu) for r in graph.pagerank(e7, iterations=4).collect())
    assert r1 == r7


def test_pagerank_random_walk_semantics(spark):
    """A star's center outranks its leaves; total mass is conserved up to
    floor truncation (strictly within n * iterations micro-units)."""
    star = [(f"leaf{i}", "center", 1) for i in range(10)]
    e = spark.createDataFrame(star, "src string, dst string, w long")
    iters = 5
    got = {r.node: r.rank_mu for r in graph.pagerank(e, iterations=iters).collect()}
    assert all(got["center"] > v for k, v in got.items() if k != "center")
    n = len(got)
    total = sum(got.values())
    assert n * MU - n * iters * 3 <= total <= n * MU


def test_pagerank_empty_raises(spark):
    e = spark.createDataFrame([], "src string, dst string, w long")
    with pytest.raises(ValueError):
        graph.pagerank(e)


def test_pagerank_unweighted_default(spark):
    """weight_col=None means w=1 everywhere — same as an explicit 1."""
    e = spark.createDataFrame([(s, d) for s, d, _ in EDGES], "src string, dst string")
    ew = spark.createDataFrame([(s, d, 1) for s, d, _ in EDGES], "src string, dst string, w long")
    r1 = sorted((r.node, r.rank_mu) for r in graph.pagerank(e, 3, weight_col=None).collect())
    r2 = sorted((r.node, r.rank_mu) for r in graph.pagerank(ew, 3).collect())
    assert r1 == r2
