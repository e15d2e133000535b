"""Graph analytics over relational edges: exact-integer PageRank.

PageRank is the canonical iterative distributed computation — and the
repo already runs two of its cousins (k-means Lloyd iterations,
min-label propagation for dedup clusters), so this completes the family
with the damped random-walk fixpoint.

The update is formulated entirely in BIGINT micro-units so an iteration
is a pure function of integers — byte-deterministic under any
partitioning and reproducible in DuckDB for the oracle (the same exact-
integer discipline as the quantized classifier training loop):

    contrib(e)  = (r[src] * w(e)) div out_w(src)        (floor division)
    inflow(v)   = sum of contribs over v's in-edges
    dangle      = sum of r over nodes with no out-edges
    r'(v)       = ((den - num) * MU + num * (inflow(v) + dangle div n)) div den

with damping num/den (default 85/100) and ranks starting at MU per node
(total mass n * MU, conserved up to floor truncation). All operands are
positive, so floor division is identical across engines.

Scale shape: edges carry (src, dst, w, out_w) — out_w precomputed ONCE.
Each iteration is one src-keyed join (ranks are |V| rows, edges |E|) and
one dst-keyed partial aggregation, plus a 1-row dangling-mass aggregate;
the per-round result is localCheckpoint'd (the measured lesson from the
BPE/label-propagation loops: without truncation Catalyst re-analysis
grows superlinearly in the iteration count). Nothing is ever collected
to the driver except the 1-row scalars inside the lineage truncation."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MU = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "w",
) -> DataFrame:
    """(node, rank_mu) after `iterations` exact-integer damped updates
    over the (src, dst[, w]) edge table. Unweighted edges (weight_col=None)
    get w = 1. Parallel edges are allowed (their weights add through the
    contribution sum)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.cast("long").alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # one static enriched edge table reused every round
    ee = e.join(out_w, "src").localCheckpoint()
    nodes = nodes.localCheckpoint()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank over an empty edge table")

    ranks = nodes.select("node", F.lit(MU).cast("long").alias("rank_mu")).localCheckpoint()
    residual = (damping_den - damping_num) * MU
    # every step is integral `div`, never float `/`: a float quotient is
    # only exact below 2^53, and a hub's inflow can exceed that at scale
    update = (
        f"({residual}L + {damping_num} * (coalesce(inflow, 0L) + dangle div {{n}})) "
        f"div {damping_den}"
    )
    for _ in range(iterations):
        contribs = (
            ranks.join(ee, ranks.node == ee.src)
            .select("dst", F.expr("rank_mu * w div out_w").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        dangle = (
            ranks.join(out_w, ranks.node == out_w.src, "left_anti")
            .agg(F.coalesce(F.sum("rank_mu"), F.lit(0)).alias("dangle"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangle))
            .select("node", F.expr(update.format(n=n_nodes)).cast("long").alias("rank_mu"))
            .localCheckpoint()
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB twin: the identical integer update unrolled one MATERIALIZED
    CTE per iteration (plain CTEs inline per reference — a self-joined
    30-level chain explodes exponentially, the round-7 lesson).
    `edges_sql` must yield (src, dst, w)."""
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "ow AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS out_w FROM e GROUP BY 1)",
        "nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes)",
        f"r0 AS MATERIALIZED (SELECT node, {MU}::BIGINT AS rank_mu FROM nodes)",
    ]
    residual = (damping_den - damping_num) * MU
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum((r.rank_mu * e.w) // o.out_w)::BIGINT AS inflow
  FROM r{i - 1} r JOIN e ON e.src = r.node JOIN ow o ON o.src = e.src
  GROUP BY 1)"""
        )
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT coalesce(sum(rank_mu), 0)::BIGINT AS dangle FROM r{i - 1}
  WHERE node NOT IN (SELECT src FROM ow))"""
        )
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT n.node,
         (({residual} + {damping_num} * (coalesce(c.inflow, 0) + d.dangle // nn.n))
          // {damping_den})::BIGINT AS rank_mu
  FROM nodes n LEFT JOIN c{i} c USING (node) CROSS JOIN d{i} d CROSS JOIN nn)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node, rank_mu FROM r{iterations} ORDER BY node"
    )


def triangle_counts(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Exact per-node triangle counts over an undirected edge list.

    Classic distributed formulation (the MapReduce NodeIterator++ shape,
    Suri & Vassilvitskii 2011): canonicalize every edge to (a < b), build
    wedges a-b-c with a < b < c by joining the edge list to itself on the
    middle vertex, and close each wedge against the edge list — every
    triangle is found exactly once in its sorted orientation. Returns
    (node, n_triangles) for nodes in >= 1 triangle.

    Scale shape: two equi-joins keyed on single vertex columns; the wedge
    count is sum-over-vertices(deg^2) under the a<b<c ordering (which
    routes each wedge through its MIDDLE vertex, halving hub blowup vs
    naive orientation). A power-law hub is the standard skew case
    (operators/skew.py) — production systems split high-degree vertices
    first. All integers; no floats anywhere."""
    e = (
        edges.select(
            F.least(a_col, b_col).alias("a"), F.greatest(a_col, b_col).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    w = (
        e.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
        .join(e.select(F.col("a").alias("wb"), F.col("b").alias("wc")), "wb")
    )
    tri = w.join(
        e.select(F.col("a").alias("wa"), F.col("b").alias("wc")), ["wa", "wc"]
    )
    nodes = tri.select(F.explode(F.array("wa", "wb", "wc")).alias("node"))
    return nodes.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def triangle_oracle_sql(edges_sql: str) -> str:
    """The identical sorted-orientation derivation in portable DuckDB SQL;
    `edges_sql` must yield columns (a, b)."""
    return f"""
WITH raw AS ({edges_sql}),
e AS (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM raw WHERE a <> b
),
tri AS (
  SELECT w1.a AS wa, w1.b AS wb, w2.b AS wc
  FROM e w1 JOIN e w2 ON w2.a = w1.b
  JOIN e c ON c.a = w1.a AND c.b = w2.b
),
n AS (
  SELECT wa AS node FROM tri UNION ALL SELECT wb FROM tri UNION ALL SELECT wc FROM tri
)
SELECT node, count(*)::BIGINT AS n_triangles FROM n GROUP BY node
"""
