"""WordPiece tokenizer (the BERT-family recipe), beside operators/bpe.py.

Same two-phase shape as BPE — and the same scale story:

  - TRAIN (`wordpiece_train`): like BPE, training operates on the
    WORD-FREQUENCY table (one corpus-wide groupBy collapses any corpus to
    its bounded distinct vocabulary), then runs the merge loop
    driver-local over the collected table. WordPiece differs from BPE only
    in the merge objective: instead of the most FREQUENT adjacent pair it
    merges the pair maximizing the likelihood score
    count(ab) / (count(a) * count(b)) — the published WordPiece criterion
    (Schuster & Nakajima 2012; the score form popularized by the BERT
    repo / HuggingFace tokenizers docs). Non-initial subword units carry
    the '##' continuation prefix.

  - ENCODE (`wordpiece_encode`): greedy longest-match-first against the
    trained vocabulary (BERT's WordPieceTokenizer algorithm), as an
    Arrow-batched pandas UDF with per-batch word memoization; words with
    an unmatchable remainder emit [UNK] (whole-word, per the reference
    algorithm).

Determinism: pair scores tie-break by (a ASC, b ASC); scores compare as
exact integer cross-products (score(p) > score(q) iff
n_p * d_q > n_q * d_p) so no float division ever decides a merge —
training is bit-reproducible on any host.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from duckdb_routing_spark.operators.bpe import word_freqs

UNK = "[UNK]"
CONT = "##"


def _initial_wp_symbols(word: str) -> list[str]:
    return [word[0]] + [CONT + ch for ch in word[1:]]


def _merge_label(a: str, b: str) -> str:
    """The merged symbol: b's continuation prefix is interior and drops."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def wordpiece_train(
    docs: DataFrame,
    n_merges: int = 40,
    min_count: int = 2,
    text_col: str = "text",
    local_vocab_threshold: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` WordPiece merges; returns the ordered merge list.

    One distributed pass (word_freqs) collapses the corpus; the loop runs
    driver-local over the collected bounded table (the bpe_train dispatch
    rationale — a 30k-piece vocabulary is 30k O(affected-words) rounds,
    never 30k Spark jobs). Vocabularies past local_vocab_threshold raise:
    unlike BPE's count argmax, the likelihood score's denominator changes
    with every merge that touches a or b, so there is no cheap
    one-aggregation-per-round distributed formulation — raise the
    threshold (the table is (word, freq) longs; 10^7 rows fit a driver).

    Merge choice per round: maximize count(ab)/(count(a)*count(b)) among
    pairs with count(ab) >= min_count, ties (a ASC, b ASC). Unit counts
    are OCCURRENCE counts over the current segmentation (freq-weighted),
    the same bookkeeping the pair counts use."""
    wf = word_freqs(docs, text_col).localCheckpoint()
    n_words = wf.count()
    if n_words > local_vocab_threshold:
        raise ValueError(
            f"vocabulary {n_words} exceeds local_vocab_threshold "
            f"{local_vocab_threshold}; raise it (driver memory permitting)"
        )
    return _train_local(
        [(r["word"], r["freq"]) for r in wf.collect()], n_merges, min_count
    )


def _train_local(
    freqs: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """The post-collect merge loop (factored so the fuzz suite can drive
    it Spark-free): incremental pair/unit bookkeeping, exact-integer
    likelihood argmax."""
    words = [_initial_wp_symbols(w) for w, _ in freqs]
    fs = [f for _, f in freqs]
    pair_counts: dict[tuple[str, str], int] = {}
    unit_counts: dict[str, int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        f = fs[wi]
        for s in syms:
            unit_counts[s] = unit_counts.get(s, 0) + f
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        # argmax of n/(ca*cb) by exact integer cross-multiplication —
        # the candidate set is bounded (live pairs), one scan per round.
        # (A heap doesn't apply: scores change when ANY merge touches a
        # unit's count, not just the merged pair's.)
        best = None  # (a, b, n, denom)
        for (a, b), n in pair_counts.items():
            if n < min_count:
                continue
            denom = unit_counts[a] * unit_counts[b]
            if (
                best is None
                or n * best[3] > best[2] * denom
                or (n * best[3] == best[2] * denom and (a, b) < (best[0], best[1]))
            ):
                best = (a, b, n, denom)
        if best is None:
            break
        a, b, _n, _d = best
        merges.append((a, b))
        merged = _merge_label(a, b)
        affected = pair_words.pop((a, b), set())
        for wi in affected:
            syms = words[wi]
            f = fs[wi]
            # stale membership (word rewritten since) → identity rewrite,
            # all deltas cancel
            for s in syms:
                unit_counts[s] -= f
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                    pair_words.pop(p, None)
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            words[wi] = out
            for s in out:
                unit_counts[s] = unit_counts.get(s, 0) + f
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
        for u in list(unit_counts):
            if unit_counts[u] <= 0:
                del unit_counts[u]
    return merges


def wordpiece_vocab(docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text") -> list[str]:
    """The encode-side vocabulary: corpus alphabet (initial + continuation
    forms), every merge product, and [UNK] at position 0. Sorted for a
    deterministic id table, mirroring bpe_vocab."""
    from pyspark.sql import functions as F

    chars = [
        r.c
        for r in docs.select(F.explode(F.split(F.lower(F.col(text_col)), "")).alias("c"))
        .filter((F.col("c") != "") & (F.col("c") != " "))
        .distinct()
        .collect()
    ]
    syms = set(chars) | {CONT + c for c in chars}
    syms |= {_merge_label(a, b) for a, b in merges}
    return [UNK] + sorted(syms)


def wordpiece_encode_udf(vocab: list[str], max_word_chars: int = 100):
    """Arrow-batched greedy longest-match-first encoder over the broadcast
    vocabulary set — BERT's WordPieceTokenizer: per word, take the longest
    vocab prefix (continuation-prefixed after the first piece), repeat on
    the remainder; if no prefix matches (or the word exceeds
    max_word_chars), the WHOLE word becomes [UNK]."""
    vset = frozenset(vocab)

    def _encode_word(w: str) -> list[str]:
        if len(w) > max_word_chars:
            return [UNK]
        out: list[str] = []
        start = 0
        while start < len(w):
            end = len(w)
            piece = None
            while start < end:
                cand = w[start:end]
                if start > 0:
                    cand = CONT + cand
                if cand in vset:
                    piece = cand
                    break
                end -= 1
            if piece is None:
                return [UNK]
            out.append(piece)
            start = end
        return out

    @pandas_udf(ArrayType(StringType()))
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, list[str]] = {}  # per-task (iterator form), not per-batch

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.lower().split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w)
                out.extend(got)
            return out

        for texts in batches:
            yield texts.map(enc)

    return encode


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents against a trained WordPiece vocabulary:
    (doc_id, wp_tokens, n_wp_tokens)."""
    from pyspark.sql import functions as F

    enc = wordpiece_encode_udf(vocab)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        enc(F.col(text_col)).alias("wp_tokens"),
    ).select("doc_id", "wp_tokens", F.size("wp_tokens").alias("n_wp_tokens"))


def wordpiece_encode_ids_udf(vocab: list[str], max_word_chars: int = 100):
    """text -> input_ids in one Arrow pass: the longest-match encoder with
    the id mapping (id = position in the wordpiece_vocab list, [UNK] = 0)
    folded into the same closure — no extra stage, mirroring
    bpe.bpe_encode_ids_udf."""
    from pyspark.sql.types import IntegerType

    ids = {s: i for i, s in enumerate(vocab)}
    vset = frozenset(vocab)

    def _encode_word(w: str) -> list[int]:
        if len(w) > max_word_chars:
            return [ids[UNK]]
        out: list[int] = []
        start = 0
        while start < len(w):
            end = len(w)
            piece = None
            while start < end:
                cand = w[start:end]
                if start > 0:
                    cand = CONT + cand
                if cand in vset:
                    piece = cand
                    break
                end -= 1
            if piece is None:
                return [ids[UNK]]
            out.append(ids[piece])
            start = end
        return out

    @pandas_udf(ArrayType(IntegerType()))
    def encode_ids(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, list[int]] = {}  # per-task (iterator form), not per-batch

        def enc(text) -> list[int]:
            if text is None:
                return []
            out: list[int] = []
            for w in text.lower().split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w)
                out.extend(got)
            return out

        for texts in batches:
            yield texts.map(enc)

    return encode_ids


def training_sequences(
    docs: DataFrame,
    vocab: list[str],
    seq_len: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Text -> fixed-length WordPiece input_ids windows — the same
    windowing mile as bpe.training_sequences (shared sequences_from_ids)."""
    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators.bpe import sequences_from_ids

    enc = wordpiece_encode_ids_udf(vocab)
    with_ids = docs.select(F.col(id_col).alias("doc_id"), enc(F.col(text_col)).alias("ids"))
    return sequences_from_ids(with_ids, seq_len)
