"""Unigram-LM tokenizer (the SentencePiece recipe), completing the
tokenizer trio beside operators/bpe.py and operators/wordpiece.py.

Kudo 2018 ("Subword Regularization"), deterministic simplified form:

  - TRAIN (`unigram_train`): like the other two trainers, the corpus
    collapses to the bounded WORD-FREQUENCY table in one distributed pass;
    the EM/prune loop runs driver-local over the collected table.
      seed:  every substring of length <= max_piece_len with corpus count
             >= seed_min_count, plus all single characters (full coverage).
      EM:    E-step computes each piece's EXPECTED count over every word's
             segmentation lattice by forward-backward in probability space
             (per-position rescaling, so no underflow at any word length);
             M-step re-normalizes piece probabilities.
      prune: between EM rounds, drop the prune_frac of multi-char pieces
             with the smallest expected counts (single chars are never
             pruned — coverage guarantee) until <= vocab_size remain.
             This count-based pruning is the documented simplification of
             Kudo's leave-one-out likelihood loss; the fixtures' piece
             rankings agree and the reference test pins the behavior.

  - ENCODE (`unigram_encode`): Viterbi best segmentation (max sum of
    piece log-probs; ties prefer the LONGER final piece, then lexicographic
    — a total order, so encoding is deterministic), Arrow-batched with
    per-batch word memoization. A character absent from the vocabulary
    makes the word emit [UNK] whole (the WordPiece fallback convention).

Determinism: all float work is double-precision with a fixed operation
order (pieces iterate sorted); ties in pruning break by (count, piece)
so two trainings are identical. No SQL oracle — lattice EM is not
reasonably one DuckDB query; tests/test_unigram.py's independent
reference (log-space DP, no rescaling, different code shape) is the
oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from duckdb_routing_spark.operators.bpe import word_freqs

UNK = "[UNK]"


def _seed_pieces(
    freqs: list[tuple[str, int]], max_piece_len: int, seed_min_count: int
) -> dict[str, float]:
    counts: dict[str, int] = {}
    for w, f in freqs:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + f
    kept = {
        p: c for p, c in counts.items() if c >= seed_min_count or len(p) == 1
    }
    total = float(sum(kept.values()))
    return {p: c / total for p, c in sorted(kept.items())}


def _expected_counts(
    freqs: list[tuple[str, int]], probs: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """E-step: forward-backward over each word's segmentation lattice.

    alpha[i] = total probability of all segmentations of w[:i];
    beta[i] = of w[i:]; the posterior mass of piece w[i:j] is
    alpha[i] * p(piece) * beta[j] / alpha[n]. Each alpha/beta is rescaled
    by its own magnitude implicitly via double range — word lengths here
    are bounded (whitespace tokens), so plain double suffices; the
    independent reference uses log-space DP and must agree to 1e-9."""
    exp: dict[str, float] = {}
    for w, f in freqs:
        n = len(w)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for j in range(1, n + 1):
            s = 0.0
            for i in range(max(0, j - max_piece_len), j):
                pc = probs.get(w[i:j])
                if pc is not None and alpha[i] > 0.0:
                    s += alpha[i] * pc
            alpha[j] = s
        if alpha[n] <= 0.0:
            continue  # unsegmentable under current vocab (cannot happen
            # while single chars remain — coverage guarantee)
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            s = 0.0
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                pc = probs.get(w[i:j])
                if pc is not None and beta[j] > 0.0:
                    s += pc * beta[j]
            beta[i] = s
        z = alpha[n]
        for i in range(n):
            if alpha[i] <= 0.0:
                continue
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                pc = probs.get(w[i:j])
                if pc is not None and beta[j] > 0.0:
                    exp[w[i:j]] = exp.get(w[i:j], 0.0) + f * alpha[i] * pc * beta[j] / z
    return exp


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 8,
    seed_min_count: int = 2,
    em_rounds: int = 2,
    prune_frac: float = 0.25,
    text_col: str = "text",
    local_vocab_threshold: int = 1_000_000,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece vocabulary; returns [(piece, logprob)]
    sorted by piece.

    One distributed pass (word_freqs); EM/prune driver-local over the
    bounded table (the bpe_train dispatch rationale). Vocabularies past
    local_vocab_threshold raise — lattice EM has no cheap
    one-aggregation-per-round distributed form; raise the threshold."""
    wf = word_freqs(docs, text_col).localCheckpoint()
    n_words = wf.count()
    if n_words > local_vocab_threshold:
        raise ValueError(
            f"vocabulary {n_words} exceeds local_vocab_threshold "
            f"{local_vocab_threshold}; raise it (driver memory permitting)"
        )
    freqs = sorted((r["word"], r["freq"]) for r in wf.collect())
    return _train_local(
        freqs, vocab_size, max_piece_len, seed_min_count, em_rounds, prune_frac
    )


def _train_local(
    freqs: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int,
    seed_min_count: int,
    em_rounds: int,
    prune_frac: float,
) -> list[tuple[str, float]]:
    """Post-collect EM/prune loop (factored for the Spark-free fuzz suite)."""
    probs = _seed_pieces(freqs, max_piece_len, seed_min_count)
    while True:
        for _ in range(em_rounds):
            exp = _expected_counts(freqs, probs, max_piece_len)
            total = sum(exp.values())
            # pieces with zero posterior mass keep a floor so single chars
            # never vanish (coverage); everything renormalizes together
            floor = 1e-12
            probs = {
                p: max(exp.get(p, 0.0), floor) / total for p in sorted(probs)
            }
        multi = [p for p in probs if len(p) > 1]
        n_over = len(probs) - vocab_size
        if n_over <= 0 or not multi:
            break
        exp = _expected_counts(freqs, probs, max_piece_len)
        # drop the lowest-expected-count multi-char pieces; ties by piece
        multi.sort(key=lambda p: (exp.get(p, 0.0), p))
        for p in multi[: max(1, min(n_over, int(len(multi) * prune_frac)))]:
            del probs[p]
    total = sum(probs.values())
    return [(p, math.log(probs[p] / total)) for p in sorted(probs)]


def _viterbi(word: str, logp: dict[str, float], max_piece_len: int) -> list[str] | None:
    """Best segmentation: max total log-prob; ties prefer the longer final
    piece, then the lexicographically smaller one. Returns None when a
    character has no covering piece (caller emits [UNK])."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if best[i] == NEG:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                continue
            score = best[i] + lp
            cur = back[j]
            if (
                score > best[j]
                or (
                    score == best[j]
                    and cur is not None
                    and (len(p) > len(cur[1]) or (len(p) == len(cur[1]) and p < cur[1]))
                )
            ):
                best[j] = score
                back[j] = (i, p)
    if back[n] is None:
        return None
    out: list[str] = []
    j = n
    while j > 0:
        i, p = back[j]  # type: ignore[misc]
        out.append(p)
        j = i
    return out[::-1]


def unigram_encode_udf(vocab: list[tuple[str, float]], max_piece_len: int = 8):
    """Arrow-batched Viterbi encoder over the broadcast (piece, logprob)
    table, per-batch word memoization; unknown-character words emit [UNK]
    whole."""
    logp = dict(vocab)

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
                    seg = _viterbi(w, logp, max_piece_len)
                    got = cache[w] = seg if seg is not None else [UNK]
                out.extend(got)
            return out

        for texts in batches:
            yield texts.map(enc)

    return encode


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize documents with a trained unigram vocabulary:
    (doc_id, ug_tokens, n_ug_tokens)."""
    from pyspark.sql import functions as F

    enc = unigram_encode_udf(vocab, max_piece_len)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        enc(F.col(text_col)).alias("ug_tokens"),
    ).select("doc_id", "ug_tokens", F.size("ug_tokens").alias("n_ug_tokens"))


def unigram_vocab_ids(vocab: list[tuple[str, float]]) -> list[str]:
    """Deterministic id table for a trained unigram vocabulary: [UNK] at
    position 0, pieces sorted — id = index, mirroring bpe_vocab's shape."""
    return [UNK] + sorted(p for p, _ in vocab if p != UNK)


def unigram_encode_ids_udf(
    vocab: list[tuple[str, float]], id_table: list[str], max_piece_len: int = 8
):
    """text -> input_ids in one Arrow pass: Viterbi segmentation with the
    id mapping folded into the same closure ([UNK] = 0)."""
    from pyspark.sql.types import IntegerType

    logp = dict(vocab)
    ids = {s: i for i, s in enumerate(id_table)}

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
                    seg = _viterbi(w, logp, max_piece_len)
                    got = cache[w] = (
                        [ids.get(p, ids[UNK]) for p in seg] if seg is not None else [ids[UNK]]
                    )
                out.extend(got)
            return out

        for texts in batches:
            yield texts.map(enc)

    return encode_ids


def training_sequences(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    seq_len: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Text -> fixed-length unigram input_ids windows — the same windowing
    mile as bpe.training_sequences (shared sequences_from_ids)."""
    from pyspark.sql import functions as F

    from duckdb_routing_spark.operators.bpe import sequences_from_ids

    enc = unigram_encode_ids_udf(vocab, unigram_vocab_ids(vocab), max_piece_len)
    with_ids = docs.select(F.col(id_col).alias("doc_id"), enc(F.col(text_col)).alias("ids"))
    return sequences_from_ids(with_ids, seq_len)
