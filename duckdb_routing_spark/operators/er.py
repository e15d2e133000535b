"""Entity resolution: blocked pairwise matching over string identity fields.

Record linkage for dimension hygiene (the customer/vendor-master problem):
exact keys disagree, names almost agree. The classic two-stage recipe —
BLOCK so the pair space is per-block, then score candidate pairs with an
edit-distance predicate (Fellegi-Sunter's deterministic core). Matched
pairs feed the existing cluster machinery (operators/graph.py components /
dedup_clusters) to elect canonical survivors, exactly like the fuzzy-dedup
family does for documents.

Scale shape: the self-join keys on the block columns, so the shuffle moves
each record once and the pair space is sum-over-blocks(n_b^2)/2, never
n^2 — identical posture to SemDeDup's cell-local pairs. A skewed block is
the skew-toolkit case (operators/skew.py): salt the block key or add a
secondary blocking column. Levenshtein runs JVM-side (built-in), and the
id_a < id_b predicate halves the pair space before scoring.

Engine portability: unit-cost Levenshtein distance is the same integer in
every implementation, so pairs + distances hash-match cross-engine (no
float anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, dist) with id_a < id_b, same block,
    and Levenshtein(name_a, name_b) <= max_dist."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
    )
    cond = [a[f"_b_{c}"] == b[f"_b_{c}"] for c in block_cols]
    pairs = a.join(b, cond).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
