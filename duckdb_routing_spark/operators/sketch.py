"""Mergeable cardinality sketches: HyperLogLog over any key column.

100 TB posture: exact COUNT(DISTINCT) is a full shuffle of every distinct
key; an HLL sketch reduces map-side to 2^b (register, rank) rows, merges
associatively across partitions / files / days (groupBy register, MAX rank),
and answers within ~1.04/sqrt(2^b) relative error. The register TABLE is
the operator's output contract here — registers are deterministic integers
(md5-derived, same construction as the dedup family's Carter-Wegman hashes,
`operators/dedup.py`), so stock DuckDB derives the byte-identical table and
the driver-style value-hash oracle applies; the float estimate is a final
O(2^b) fold kept separate (`hll_estimate`), accuracy-tested rather than
hash-matched.

Reference parity note: the reference engine ships no sketches — this is
part of the LLM-data-pipeline surface (corpus cardinality: distinct URLs,
shingles, users) the brief adds on top of SURVEY §2.

Hash layout (60-bit, portable across Spark and DuckDB SQL):
  h        = first 15 hex chars of md5(key) as a BIGINT   (60 bits)
  register = top b bits of h          -> h >> (60 - b)
  tail     = low (60-b) bits of h
  rank     = leading zeros of tail within its (60-b)-bit width, + 1
           = (60-b) + 1 - bit_length(tail);   tail == 0 -> (60-b) + 1
bit_length via length(bin(x)) — both engines' bin() print minimal-width
binary for positive integers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

HASH_BITS = 60


def hll_register_rank(key_col: str, b: int):
    """(register, rank) Columns for one key — the per-row map step, shared
    by the batch aggregate below and the streaming windowed sketch
    (streaming/events.py)."""
    if not 4 <= b <= 18:
        raise ValueError(f"b must be in [4, 18], got {b}")
    w = HASH_BITS - b
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long")
    tail = h % F.lit(1 << w).cast("long")
    rank = F.when(tail == 0, F.lit(w + 1)).otherwise(F.lit(w + 1) - F.length(F.bin(tail)))
    # integer shift, NOT division: h has 60 significant bits and a
    # double-typed divide would round past the 53-bit mantissa
    return F.shiftright(h, w).cast("int").alias("register"), rank.cast("int").alias("rank")


def hll_registers(df: DataFrame, key_col: str, b: int = 12) -> DataFrame:
    """Per-register max rank for the distinct values of `key_col`.

    Output: (register INT, max_rank INT), one row per NON-EMPTY register
    (≤ 2^b rows). NULL keys are ignored (COUNT DISTINCT semantics). This is
    the map-side-combinable shape: Spark's partial aggregation reduces each
    partition to ≤2^b rows before the single tiny shuffle."""
    register, rank = hll_register_rank(key_col, b)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(register, rank)
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_registers_grouped(
    df: DataFrame, key_col: str, group_cols: list[str], b: int = 12
) -> DataFrame:
    """One register table PER GROUP: (group_cols..., register, max_rank),
    ≤ 2^b rows per group. The grouped form of hll_registers — the slice
    sketches an incremental pipeline persists (per hour, per day, per
    source) and later folds with hll_merge_grouped without re-reading the
    events."""
    register, rank = hll_register_rank(key_col, b)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, register, rank)
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge_grouped(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold register tables up a grouping hierarchy (hours -> days,
    days -> sources): groupBy the COARSER keys, MAX rank per register.
    Exactly the sketch of the union per coarse group — associativity means
    the fold sees ≤ 2^b rows per fine slice, never the underlying data."""
    return sketches.groupBy(*group_cols, "register").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables into one sketch: groupBy register, MAX rank.

    Associative and commutative — partial sketches from any partitioning of
    the data (per file, per day, per source) merge into exactly the sketch
    of the union. This is the whole point of shipping the register table as
    the operator output: incremental pipelines persist ≤2^b rows per slice
    and never rescan history."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(registers: DataFrame, b: int = 12) -> float:
    """Standard HLL estimate (Flajolet et al. 2007) from a register table.

    Collects ≤2^b (register, max_rank) rows — the sketch, not the data —
    and folds driver-side: raw = alpha_m * m^2 / sum(2^-M_j) with empty
    registers contributing 2^0, linear-counting correction below 2.5m.
    Relative error ~1.04/sqrt(m)."""
    m = 1 << b
    rows = registers.collect()
    n_filled = len(rows)
    inv_sum = sum(2.0 ** -r["max_rank"] for r in rows) + (m - n_filled) * 1.0
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(b, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / inv_sum
    zeros = m - n_filled
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def hll_registers_oracle_sql(table: str, key_col: str, b: int = 12) -> str:
    """The byte-identical register derivation in portable DuckDB SQL."""
    w = HASH_BITS - b
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM {table} WHERE {key_col} IS NOT NULL
),
rr AS (
  SELECT CAST(hv // {1 << w} AS INTEGER) AS register,
         CAST(CASE WHEN hv % {1 << w} = 0 THEN {w + 1}
              ELSE {w + 1} - length(bin(hv % {1 << w})) END AS INTEGER) AS rank
  FROM h
)
SELECT register, max(rank) AS max_rank FROM rr GROUP BY register
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency counts / heavy hitters
# ---------------------------------------------------------------------------
#
# 100 TB posture: an exact per-key frequency table over a heavy-tailed key
# (URLs, shingles, user ids) is a full shuffle of every distinct key; a CMS
# reduces map-side to <= depth*width cells, merges associatively across
# partitions / files / days (groupBy cell, SUM), and answers point queries
# with one-sided error: est >= true always, est <= true + eps*N with
# probability 1-delta at width=e/eps, depth=ln(1/delta) (Cormode &
# Muthukrishnan 2005). The cell TABLE is the output contract — cells are
# deterministic integers off the same md5 double-hash idiom as
# operators/bloom.py (Kirsch-Mitzenmacher: pos_i = h1 + i*h2), so stock
# DuckDB derives the byte-identical table and the value-hash oracle
# applies. The reference engine ships no sketches; this is LLM-pipeline
# surface on top of SURVEY §2, same family as hll_registers above.


def _cms_h1h2(key_col: str):
    md5 = F.md5(F.col(key_col).cast("string"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
    return h1, h2


def cms_rowcol(key_col: str, depth: int, width: int):
    """posexplode generator yielding the (row, col) cells for one key — the
    per-row map step, shared by the batch aggregate below and the streaming
    windowed sketch (streaming/events.py). Alias as ("row", "col")."""
    h1, h2 = _cms_h1h2(key_col)
    return F.posexplode(
        F.array(*[((h1 + F.lit(i) * h2) % F.lit(width)).cast("int") for i in range(depth)])
    )


def cms_cells(df: DataFrame, key_col: str, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-Min cell table of `key_col`: (row INT, col INT, cnt BIGINT),
    one output row per NON-EMPTY cell (<= depth*width rows). NULL keys are
    ignored. Map-side combinable: partial aggregation reduces each partition
    to <= depth*width rows before the single tiny shuffle."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}x{width}")
    if depth > 8:  # h1 + (depth-1)*h2 < depth * 2^60 must stay in int64
        raise ValueError("depth too large for the 60-bit hash base")
    if width > 1 << 26:  # col is INT; also a >512 MB dense table is no sketch
        raise ValueError(f"width {width} too large for a sketch")
    cell = cms_rowcol(key_col, depth, width)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(cell.alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union cell tables into one sketch: groupBy cell, SUM. Associative and
    commutative — the sketch of any partitioning's union is exactly the
    merged sketch (counters are linear)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cells: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query estimates for `keys[key_col]`: (key, est BIGINT) with
    est = min over the key's depth cells (absent cell -> 0). The cell table
    is tiny (<= depth*width rows) so the join broadcasts; the keys side
    never shuffles."""
    h1, h2 = _cms_h1h2(key_col)
    cell = F.posexplode(
        F.array(*[((h1 + F.lit(i) * h2) % F.lit(width)).cast("int") for i in range(depth)])
    )
    probes = keys.select(F.col(key_col).alias("key"), cell.alias("row", "col"))
    from pyspark.sql.functions import broadcast

    return (
        probes.join(broadcast(cells), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_cells_oracle_sql(table: str, key_col: str, depth: int = 4, width: int = 256) -> str:
    """The byte-identical cell derivation in portable DuckDB SQL."""
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT AS h1,
         ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 16, 15))::BIGINT AS h2
  FROM {table} WHERE {key_col} IS NOT NULL
),
cells AS (
  SELECT CAST(i AS INTEGER) AS row, CAST((h1 + i * h2) % {width} AS INTEGER) AS col
  FROM h, range({depth}) t(i)
)
SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col
"""


# ---------------------------------------------------------------------------
# quantile sketch over UNBOUNDED domains: bottom-k-by-hash row sample
# ---------------------------------------------------------------------------
#
# The histogram below needs a known [lo, hi); this sketch does not. State =
# the k rows whose md5(row id) is smallest — a uniform k-row sample that is
# a PURE FUNCTION of the row-id set: order-independent, byte-deterministic,
# and exactly mergeable (bottom-k of a union == bottom-k over the parts'
# bottom-k's, for disjoint parts). Quantiles read off the sorted sample with
# standard sampling error O(sqrt(q(1-q)/k)). Unlike KLL/t-digest the state
# carries no run-dependent compaction randomness, so the full value-hash
# oracle applies to the STATE itself, and Spark plans the build as
# TakeOrderedAndProject — map-side partial bottom-k per partition, k rows
# per task to the driver-side merge, no full shuffle.


def _sample_hash(id_col: str):
    """60-bit md5 of the row id — uniform, engine-portable (DuckDB:
    ('0x'||substr(md5(id::VARCHAR),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")


def quantile_sample(df: DataFrame, value_col: str, id_col: str, k: int = 1024) -> DataFrame:
    """Quantile-sketch state: (hkey, value), the k rows with smallest
    hashed id. `id_col` must be row-unique (the sample is uniform over
    ROWS, so duplicate values weigh correctly). NULL values drop — they
    have no rank."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(_sample_hash(id_col).alias("hkey"), F.col(value_col).cast("double").alias("value"))
        .orderBy("hkey", "value")
        .limit(k)
    )


def quantile_sample_merge(*sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Merge sketches built over DISJOINT row sets (shards, days, streams):
    union + re-take bottom-k — byte-identical to building over the union."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.orderBy("hkey", "value").limit(k)


def quantile_sample_estimate(sketch: DataFrame, qs: list[float]) -> dict[float, float]:
    """Quantile estimates from the sketch: value at floor(q*(m-1)) of the
    sorted sample (type-1, deterministic). Collects <= k rows — the same
    bounded-state contract as the HLL/CMS estimators."""
    vals = sorted(r.value for r in sketch.select("value").collect())
    if not vals:
        return {q: float("nan") for q in qs}
    m = len(vals)
    return {q: vals[int(q * (m - 1))] for q in qs}


def quantile_sample_oracle_sql(table: str, value_col: str, id_col: str, k: int = 1024) -> str:
    return f"""
SELECT ('0x' || substr(md5({id_col}::VARCHAR), 1, 15))::BIGINT AS hkey,
       {value_col}::DOUBLE AS value
FROM {table}
WHERE {value_col} IS NOT NULL
ORDER BY hkey, value
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# fixed-bin histogram: mergeable quantiles / distribution sketch
# ---------------------------------------------------------------------------
#
# 100 TB posture: exact percentiles need a global sort (or Spark's
# percentile agg holding every distinct value); a fixed-bin histogram
# reduces map-side to <= n_bins rows, merges linearly across slices like
# the CMS above, and answers any quantile within one bin width. The bin
# TABLE is the output contract — bin indices are exact integer arithmetic
# over doubles that both engines evaluate identically (same expression,
# same IEEE ops), so the value-hash oracle applies. Range [lo, hi) is
# caller-supplied (a first pass or domain knowledge); values outside clamp
# into the edge bins, so the sketch never drops rows.


def hist_bins(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int = 128
) -> DataFrame:
    """Histogram cell table of `value_col`: (bin INT, cnt BIGINT), one row
    per NON-EMPTY bin (<= n_bins rows). NULL values are ignored; out-of-range
    values clamp into bins 0 / n_bins-1. Map-side combinable."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(x.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Union bin tables: groupBy bin, SUM — linear, like cms_merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(bins: DataFrame, q: float, lo: float, hi: float, n_bins: int = 128) -> float:
    """Quantile estimate from a bin table: the upper edge of the bin where
    the cumulative count crosses q * total (error <= one bin width +
    whatever mass clamped into the edge bins). Collects <= n_bins rows —
    the sketch, not the data."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    rows = sorted((r["bin"], r["cnt"]) for r in bins.collect())
    total = sum(c for _, c in rows)
    if total == 0:
        raise ValueError("empty sketch")
    target = q * total
    width = (hi - lo) / n_bins
    acc = 0
    for b, c in rows:
        acc += c
        if acc >= target:
            return lo + (b + 1) * width
    return hi


def hist_bins_oracle_sql(
    table: str, value_col: str, lo: float, hi: float, n_bins: int = 128
) -> str:
    """The byte-identical bin derivation in portable DuckDB SQL. The
    clamped floor runs the same IEEE double ops in the same order, so bin
    indices match Spark exactly."""
    return f"""
WITH b AS (
  SELECT CAST(least(greatest(
           floor((CAST({value_col} AS DOUBLE) - {float(lo)!r}) / {float(hi - lo)!r} * {float(n_bins)!r}),
           0), {n_bins - 1}) AS INTEGER) AS bin
  FROM {table} WHERE {value_col} IS NOT NULL
)
SELECT bin, count(*) AS cnt FROM b GROUP BY bin
"""


def cms_frequency_filter(
    facts: DataFrame,
    fact_key: str,
    probes: DataFrame,
    probe_key: str,
    min_count: int,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Result-identical frequency threshold via a CMS prefilter — the
    frequency analog of operators/bloom.py's runtime join filter.

    Returns the probe rows whose key occurs >= min_count times in `facts`,
    EXACTLY. The CMS's one-sided guarantee (est >= true) makes the sketch a
    safe prefilter: candidates = probes whose estimate clears the bar (a
    superset of the truth, never a miss), then one exact keyed count over
    the candidate-semi-joined facts trims the false positives. At 100 TB
    the first pass is sketch-sized (<= depth*width rows broadcast), and the
    exact groupBy only ever shuffles facts belonging to candidate keys."""
    cells = cms_cells(facts, fact_key, depth, width)
    est = cms_estimate(cells, probes.select(probe_key).distinct(), probe_key, depth, width)
    cand = est.filter(F.col("est") >= min_count).select(F.col("key").alias(probe_key))
    exact = (
        facts.join(F.broadcast(cand.withColumnRenamed(probe_key, fact_key)), fact_key, "left_semi")
        .groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("n_facts"))
        .filter(F.col("n_facts") >= min_count)
        .withColumnRenamed(fact_key, probe_key)
    )
    return probes.join(exact, probe_key)


# ---------------------------------------------------------------------------
# Heavy hitters: exact top-k and mergeable Misra-Gries summaries
# ---------------------------------------------------------------------------


def topk_frequent(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Exact top-k most frequent keys: (key, n, rank), rank ties broken by
    key ascending so the result is total-ordered and hash-oracle-able.

    One hash-partition aggregate, then orderBy().limit(k) — Catalyst
    compiles that to TakeOrderedAndProject (per-partition top-k heaps, no
    global sort, no single-partition exchange of the count table, which for
    shingle-like keys can itself be huge). The rank column is assigned over
    the k surviving rows only. This is the baseline the MG sketch below is
    property-tested against."""
    from pyspark.sql import Window

    # NULL keys are dropped, matching the MG summaries (value_counts
    # dropna) so the exact and sketch twins agree on any input
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


def mg_summaries(df: DataFrame, key_col: str, capacity: int = 1024) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries: (key, w) with at most
    `capacity` rows PER PARTITION — the mergeable heavy-hitters sketch
    (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
    Summaries", PODS'12).

    100 TB posture: a raw groupBy over a high-cardinality key (URLs,
    shingles, n-grams) shuffles every distinct key; MG caps map-side state
    at `capacity` entries per partition and the merged table at
    partitions x capacity rows, with the classic guarantee
    true_n - N/(capacity+1) <= sum(w) <= true_n for every key (N = total
    rows). With capacity >= the partition's distinct-key count the summary
    is EXACT (no decrements) — which is what makes the small-scale oracle
    byte-checkable.

    Decrement rule on overflow (per Arrow batch): subtract the
    (capacity+1)-th largest weight from every entry and drop the non-
    positive ones — the batched equivalent of MG's unit decrements. The
    summary depends on batch boundaries only through WHICH lower bounds are
    kept; the bound above holds regardless."""
    import pandas as pd

    def summarize(batches):
        acc: dict = {}
        for pdf in batches:
            vc = pdf[key_col].value_counts(dropna=True)
            for key, n in vc.items():
                acc[key] = acc.get(key, 0) + int(n)
            if len(acc) > capacity:
                # batched MG decrement: remove the smallest weights' mass
                cut = sorted(acc.values(), reverse=True)[capacity]
                acc = {key: n - cut for key, n in acc.items() if n > cut}
        if acc:
            yield pd.DataFrame({"key": list(acc.keys()), "w": list(acc.values())})

    key_t = df.schema[key_col].dataType.simpleString()
    return df.select(key_col).mapInPandas(summarize, f"key {key_t}, w long")


def topk_frequent_sketch(
    df: DataFrame, key_col: str, k: int = 20, capacity: int = 1024
) -> DataFrame:
    """Approximate top-k via merged MG summaries: (key, w, rank) where w is
    a LOWER bound on the true count (within N/(capacity+1) of it).

    The merge is one groupBy-sum over <= partitions x capacity rows — the
    only shuffle, sketch-sized regardless of key cardinality. Exact when
    every partition's distinct-key count fits `capacity` (tested against
    :func:`topk_frequent`)."""
    from pyspark.sql import Window

    merged = mg_summaries(df, key_col, capacity).groupBy("key").agg(F.sum("w").alias("w"))
    top = merged.orderBy(F.desc("w"), F.asc("key")).limit(k)  # TakeOrderedAndProject
    w = Window.orderBy(F.desc("w"), F.asc("key"))
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")
