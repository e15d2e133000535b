"""Unigram-LM tokenizer vs an independent log-space reference.

The reference implements the same published recipe (seed substrings,
forward-backward EM, count-prune, Viterbi) in a deliberately different
code shape: log-space DP with logsumexp (the module works in probability
space), dict-comprehension state, recursive backtrace — so shared bugs
can't hide in shared structure. Float agreement is to 1e-9 relative (the
two formulations differ in operation order)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_routing_spark.operators import unigram as ug

from tests.conftest import SF_SMOKE

SF = SF_SMOKE


# --- independent reference (log-space formulation) ---------------------------

def _logsumexp(xs):
    m = max(xs)
    if m == float("-inf"):
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def ref_seed(freqs, L, min_count):
    from collections import Counter

    c = Counter()
    for w, f in freqs:
        for i in range(len(w)):
            for j in range(i + 1, min(i + L, len(w)) + 1):
                c[w[i:j]] += f
    kept = {p: n for p, n in c.items() if n >= min_count or len(p) == 1}
    tot = sum(kept.values())
    return {p: n / tot for p, n in sorted(kept.items())}


def ref_expected(freqs, probs, L):
    exp = {}
    lp = {p: math.log(v) for p, v in probs.items()}
    for w, f in freqs:
        n = len(w)
        la = [float("-inf")] * (n + 1)
        la[0] = 0.0
        for j in range(1, n + 1):
            terms = [
                la[i] + lp[w[i:j]]
                for i in range(max(0, j - L), j)
                if w[i:j] in lp and la[i] != float("-inf")
            ]
            la[j] = _logsumexp(terms) if terms else float("-inf")
        if la[n] == float("-inf"):
            continue
        lb = [float("-inf")] * (n + 1)
        lb[n] = 0.0
        for i in range(n - 1, -1, -1):
            terms = [
                lp[w[i:j]] + lb[j]
                for j in range(i + 1, min(i + L, n) + 1)
                if w[i:j] in lp and lb[j] != float("-inf")
            ]
            lb[i] = _logsumexp(terms) if terms else float("-inf")
        for i in range(n):
            if la[i] == float("-inf"):
                continue
            for j in range(i + 1, min(i + L, n) + 1):
                p = w[i:j]
                if p in lp and lb[j] != float("-inf"):
                    exp[p] = exp.get(p, 0.0) + f * math.exp(la[i] + lp[p] + lb[j] - la[n])
    return exp


def ref_viterbi(w, logp, L):
    n = len(w)

    def key(j):
        # (score, len of last piece, reversed-lex of last piece) maximized
        return best[j]

    best = {0: (0.0, 0, "")}
    back = {}
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - L), j):
            if i not in best:
                continue
            p = w[i:j]
            if p in logp:
                cands.append((best[i][0] + logp[p], len(p), p, i))
        if not cands:
            continue
        # max score; ties longer piece; ties lexicographically smaller
        s = max(c[0] for c in cands)
        tied = [c for c in cands if c[0] == s]
        ln = max(c[1] for c in tied)
        tied = [c for c in tied if c[1] == ln]
        _sc, _ln, p, i = min(tied, key=lambda c: c[2])
        best[j] = (s, ln, p)
        back[j] = (i, p)
    if n not in back and n > 0:
        return None
    out, j = [], n
    while j > 0:
        i, p = back[j]
        out.append(p)
        j = i
    return out[::-1]


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(60)


@pytest.fixture(scope="module")
def texts(docs):
    return [r.text for r in docs.select("text").collect()]


def _freqs(texts):
    from collections import Counter

    return sorted(Counter(w for t in texts for w in t.lower().split(" ") if w).items())


def test_expected_counts_match_logspace_reference(texts):
    freqs = _freqs(texts)
    probs = ug._seed_pieces(freqs, 6, 2)
    got = ug._expected_counts(freqs, probs, 6)
    want = ref_expected(freqs, probs, 6)
    assert set(got) == set(want)
    for p in got:
        assert got[p] == pytest.approx(want[p], rel=1e-9), p


def test_train_converges_and_is_deterministic(docs, texts):
    v1 = ug.unigram_train(docs, vocab_size=80, max_piece_len=6)
    v2 = ug.unigram_train(docs, vocab_size=80, max_piece_len=6)
    assert v1 == v2
    pieces = [p for p, _ in v1]
    assert len(pieces) <= 80 + 30  # single chars never pruned; small slack
    alphabet = {c for t in texts for c in t.lower() if c != " "}
    assert alphabet <= set(pieces)  # coverage guarantee
    assert any(len(p) > 1 for p in pieces)  # learned real multi-char pieces
    # probabilities normalize
    assert sum(math.exp(lp) for _, lp in v1) == pytest.approx(1.0, rel=1e-9)


def test_encode_matches_reference_and_reconstructs(spark, docs, texts):
    vocab = ug.unigram_train(docs, vocab_size=80, max_piece_len=6)
    logp = dict(vocab)
    got = {
        r.doc_id: list(r.ug_tokens)
        for r in ug.unigram_encode(docs, vocab, max_piece_len=6).collect()
    }
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for doc_id, text in zip(ids, texts):
        want = []
        for w in text.lower().split(" "):
            if w:
                want.extend(ref_viterbi(w, logp, 6) or ["[UNK]"])
        assert got[doc_id] == want, f"doc {doc_id}"
        assert "".join(got[doc_id]) == text.lower().replace(" ", "")


def test_unknown_char_emits_unk(spark, docs):
    vocab = ug.unigram_train(docs, vocab_size=80, max_piece_len=6)
    d = spark.createDataFrame([(0, "table über scan")], "doc_id long, text string")
    toks = list(ug.unigram_encode(d, vocab).collect()[0].ug_tokens)
    assert "[UNK]" in toks
    assert toks[0] != "[UNK]" and toks[-1] != "[UNK]"


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=7),
        min_size=1,
        max_size=8,
    )
)
def test_em_fuzz_matches_reference(words):
    """Property: expected counts from the probability-space forward-backward
    equal the log-space reference on arbitrary small corpora."""
    from collections import Counter

    freqs = sorted(Counter(w for w in words if w).items())
    if not freqs:
        return
    probs = ug._seed_pieces(freqs, 4, 1)
    got = ug._expected_counts(freqs, probs, 4)
    want = ref_expected(freqs, probs, 4)
    assert set(got) == set(want)
    for p in got:
        assert got[p] == pytest.approx(want[p], rel=1e-9, abs=1e-12), p


def test_training_sequences_ids_decode_back(spark, docs, texts):
    """Unigram input_ids windows decode back through the id table to the
    reference Viterbi encoding."""
    vocab = ug.unigram_train(docs, vocab_size=80, max_piece_len=6)
    logp = dict(vocab)
    table = ug.unigram_vocab_ids(vocab)
    seqs = ug.training_sequences(docs, vocab, seq_len=32, max_piece_len=6).collect()
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
                want.extend(ref_viterbi(w, logp, 6) or ["[UNK]"])
        assert [table[i] for i in stream] == want, f"doc {doc_id}"
        assert all(r.n_ids == 32 for r in rows[:-1]) and 1 <= rows[-1].n_ids <= 32
