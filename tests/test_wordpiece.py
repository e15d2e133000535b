"""WordPiece trainer/encoder vs an independent pure-Python reference.

The reference recomputes unit and pair counts from scratch every round and
compares likelihood scores with Fractions (no incremental bookkeeping, no
integer-cross-product trick), so it shares no structure with the
implementation under test beyond the published recipe."""

from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_routing_spark.operators import wordpiece as wp

from tests.conftest import SF_SMOKE

SF = SF_SMOKE


# --- pure-Python reference (recompute-everything formulation) ---------------

def ref_train(texts, n_merges, min_count=2):
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.lower().split(" ") if w)
    vocab = {w: tuple([w[0]] + ["##" + c for c in w[1:]]) for w in freqs}
    merges = []
    for _ in range(n_merges):
        units, pairs = Counter(), Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for s in syms:
                units[s] += f
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        cands = [
            (Fraction(n, units[a] * units[b]), (a, b))
            for (a, b), n in pairs.items()
            if n >= min_count
        ]
        if not cands:
            break
        best = min(cands, key=lambda sv: (-sv[0], sv[1]))[1]
        merges.append(best)
        a, b = best
        merged = a + (b[2:] if b.startswith("##") else b)
        new_vocab = {}
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges


def ref_encode_word(w, vset, max_chars=100):
    if len(w) > max_chars:
        return ["[UNK]"]
    out, start = [], 0
    while start < len(w):
        end = len(w)
        piece = None
        while start < end:
            cand = w[start:end] if start == 0 else "##" + w[start:end]
            if cand in vset:
                piece = cand
                break
            end -= 1
        if piece is None:
            return ["[UNK]"]
        out.append(piece)
        start = end
    return out


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(60)


@pytest.fixture(scope="module")
def texts(docs):
    return [r.text for r in docs.select("text").collect()]


@pytest.fixture(scope="module")
def merges(docs):
    return wp.wordpiece_train(docs, n_merges=25)


def test_train_matches_reference(merges, texts):
    assert merges == ref_train(texts, n_merges=25)
    assert len(merges) == 25


def test_deep_train_matches_reference(docs, texts, merges):
    """Train to corpus exhaustion: the incremental bookkeeping must track
    the recompute-everything reference at every depth, and greedy training
    extends (never rewrites) shallower runs."""
    deep = wp.wordpiece_train(docs, n_merges=500, min_count=1)
    assert deep[:25] == merges
    assert len(deep) > 50
    assert deep == ref_train(texts, n_merges=500, min_count=1)


def test_encode_matches_reference_and_reconstructs(spark, docs, merges, texts):
    vocab = wp.wordpiece_vocab(docs, merges)
    vset = frozenset(vocab)
    got = {r.doc_id: list(r.wp_tokens) for r in wp.wordpiece_encode(docs, vocab).collect()}
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for doc_id, text in zip(ids, texts):
        want = []
        for w in text.lower().split(" "):
            if w:
                want.extend(ref_encode_word(w, vset))
        assert got[doc_id] == want, f"doc {doc_id}"
        # full-coverage vocab (alphabet included): every word reconstructs
        rebuilt = " ".join(
            "".join(p[2:] if p.startswith("##") else p for p in ref_encode_word(w, vset))
            for w in text.lower().split(" ")
            if w
        )
        assert rebuilt == " ".join(w for w in text.lower().split(" ") if w)


def test_unknown_word_and_limits(spark, docs, merges):
    vocab = wp.wordpiece_vocab(docs, merges)
    rows = [(0, "table " + "q" * 120 + " scan"), (1, "über table")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: list(r.wp_tokens) for r in wp.wordpiece_encode(d, vocab).collect()}
    assert got[0][0] != "[UNK]" and got[0][-1] != "[UNK]"  # known words encode
    assert "[UNK]" in got[0]  # the 120-char word hits max_word_chars
    assert got[1][0] == "[UNK]"  # unseen alphabet char -> whole-word UNK


@settings(max_examples=120, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x24F), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
def test_train_fuzz_matches_reference(words, n_merges):
    """Property: on arbitrary lowercase unicode corpora the incremental
    trainer (the module's own post-collect loop, driven Spark-free)
    equals the Fraction-scored recompute reference exactly."""
    texts = [" ".join(words)]
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.lower().split(" ") if w)
    got = wp._train_local(sorted(freqs.items()), n_merges, min_count=2)
    assert got == ref_train(texts, n_merges, min_count=2)


def test_training_sequences_ids_decode_back(spark, docs, merges, texts):
    """input_ids windows: ids map back through the vocab to the reference
    encoding, windows are contiguous seq_len slices, final partial kept."""
    vocab = wp.wordpiece_vocab(docs, merges)
    vset = frozenset(vocab)
    seqs = wp.training_sequences(docs, vocab, seq_len=32).collect()
    by_doc = {}
    for r in seqs:
        by_doc.setdefault(r.doc_id, []).append(r)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for doc_id, text in zip(ids, texts):
        rows = sorted(by_doc[doc_id], key=lambda r: r.seq_id)
        stream = [i for r in rows for i in r.input_ids]
        want = []
        for w in text.lower().split(" "):
            if w:
                want.extend(ref_encode_word(w, vset))
        assert [vocab[i] for i in stream] == want, f"doc {doc_id}"
        assert all(r.n_ids == 32 for r in rows[:-1]) and 1 <= rows[-1].n_ids <= 32
