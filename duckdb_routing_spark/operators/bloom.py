"""Bloom-filter runtime join pruning: shrink a shuffle join's probe side
with a broadcast bitmap when the build side is too large to broadcast.

100 TB posture: a 100M-key build side is ~3 GB as a broadcast hash relation
(not broadcastable) but ~120 MB as a 10-bit/key Bloom bitmap — and the
bitmap removes probe rows BEFORE the shuffle, so the exchange carries only
(true matches + false-positive rate) of the fact table. The exact join
still runs afterwards, so results are byte-identical to the plain join:
the bloom stage is transparent, purely a data-movement optimization (the
same pattern as Spark's own InjectRuntimeFilter, applied explicitly and
available for any join shape).

Construction (Kirsch-Mitzenmacher double hashing, deterministic md5 base —
same 60-bit idiom as operators/dedup.py and operators/sketch.py):
  h1 = first 15 hex chars of md5(key),  h2 = hex chars 16..30
  position_i = (h1 + i*h2) mod n_bits,  i in [0, k)
The bitmap builds DISTRIBUTED (explode positions -> groupBy word -> bit_or)
and only the packed ≤ n_bits/64-row word table is collected; membership
tests run as a vectorized Arrow-batched pandas UDF over JVM-computed
(h1, h2) columns — no per-row Python hashing, no shuffle, no join."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _h1h2(key_col: str):
    md5 = F.md5(F.col(key_col).cast("string"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
    return h1, h2


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Distributed Bloom bitmap of `key_col`'s values: (word LONG, bits LONG),
    one row per non-zero 64-bit word (≤ n_bits/64 rows). Mergeable across
    slices with groupBy(word).agg(bit_or) — same algebra as hll_merge."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    h1, h2 = _h1h2(key_col)
    pos = F.explode(
        F.array(*[((h1 + F.lit(i) * h2) % F.lit(n_bits)).alias(f"p{i}") for i in range(k)])
    ).alias("pos")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(F.shiftright(F.col("pos"), 6).alias("word"), (F.col("pos") % 64).alias("bit"))
        .groupBy("word")
        # expr form: the Python shiftleft() helper only takes a literal count
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(bit AS int))")).alias("bits"))
    )


def _bitmap_array(bloom: DataFrame, n_bits: int) -> np.ndarray:
    arr = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in bloom.collect():
        # mask to the unsigned range first: a word with bit 63 set arrives
        # as a negative Java long, and numpy refuses the direct cast
        arr[r["word"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return arr


def bloom_might_contain(
    df: DataFrame, key_col: str, bloom: DataFrame, n_bits: int = 1 << 20, k: int = 5,
    out_col: str = "might_contain",
) -> DataFrame:
    """Adds a boolean `out_col`: false ⇒ the key is DEFINITELY not in the
    build side; true ⇒ probably is (fp rate ~(1-e^{-kn/m})^k). The bitmap
    (n_bits/8 bytes) ships once per executor inside the UDF closure; h1/h2
    stay JVM-side so Python only does vectorized integer arithmetic."""
    bitmap = _bitmap_array(bloom, n_bits)

    @F.pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a = h1.to_numpy(dtype=np.uint64)
        b = h2.to_numpy(dtype=np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(n_bits)
            word = (pos >> np.uint64(6)).astype(np.int64)
            bit = np.uint64(1) << (pos & np.uint64(63))
            ok &= (bitmap[word] & bit) != 0
        return pd.Series(ok)

    h1, h2 = _h1h2(key_col)
    return df.withColumn(out_col, F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(_probe(h1, h2)))


def bloom_semi_join(
    large: DataFrame, small: DataFrame, large_key: str, small_key: str | None = None,
    n_bits: int = 1 << 20, k: int = 5, how: str = "left_semi",
) -> DataFrame:
    """`large ⋉ small` with a Bloom pre-filter on the probe side.

    Result-identical to large.join(small, ...): the bitmap only DROPS rows
    that cannot match (no false negatives by construction), and survivors —
    true matches plus the fp tail — still pass through the exact join. What
    changes is data movement: the shuffle exchange under the join carries
    the filtered probe side. Worth it exactly when `small`'s key set
    exceeds the broadcast threshold but n_bits/8 bytes does not; below the
    threshold let Catalyst broadcast-join directly."""
    small_key = small_key or large_key
    bloom = bloom_build(small, small_key, n_bits=n_bits, k=k)
    filtered = (
        bloom_might_contain(large, large_key, bloom, n_bits=n_bits, k=k, out_col="__bloom_ok")
        .filter(F.col("__bloom_ok"))
        .drop("__bloom_ok")
    )
    cond = filtered[large_key] == small[small_key]
    return filtered.join(small, cond, how)
