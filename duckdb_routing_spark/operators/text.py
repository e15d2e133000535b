"""Text-analysis operators over a document table.

Everything is a JVM-side Catalyst expression (no UDFs): token ops ride on
split/higher-order array functions, fingerprints on md5, language ID on a
tiny marker-word profile. Deterministic by construction so results can be
oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A tiny, public, language-marker profile (common function words). The
# classifier scores each language by marker hits per token and picks the
# argmax above a minimum ratio; 'und' (undetermined) otherwise.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
}
MIN_MARKER_RATIO = 0.01

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the fixture is single-space separated; for
    real corpora swap in the regex split)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + lexical diversity +
    stopword presence — the shape of a pretraining quality filter, fully
    deterministic."""
    toks = tokens(text)
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    len_ok = F.when((n >= 10) & (n <= 2000), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) > 0.0, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + diversity + stop_ok) / F.lit(3.0)


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the lowercased text (hex string —
    identical in every engine)."""
    return F.md5(F.lower(text))


def lang_id(text: Column) -> Column:
    """Marker-word language ID. Scores = hits/token; argmax wins if above
    MIN_MARKER_RATIO, ties broken by language-code order; else 'und'."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    best_lang = F.lit("und")
    best_score = F.lit(MIN_MARKER_RATIO)
    # iterate in reverse alphabetical order so earlier codes win ties with >
    for code in sorted(LANG_MARKERS, reverse=True):
        markers = LANG_MARKERS[code]
        score = F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("double") / n
        better = score > best_score
        best_lang = F.when(better, F.lit(code)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature block — one narrow projection, no shuffle."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        unique_token_count(t).alias("n_unique_tokens"),
        avg_token_len(t).alias("avg_token_len"),
        stopword_ratio(t).alias("stop_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
        lang_id(t).alias("lang_pred"),
    )


# Carter-Wegman-style portable hash modulus (see operators.dedup.MH_PRIME)
FP_PRIME = 1_000_000_007


def char_gram_hashes(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                     k: int = 8) -> DataFrame:
    """(doc_id, pos, h, n_grams): rolling char k-gram hashes of the
    lowercased text. Grams come from the arrays_zip-of-slices trick over the
    char array (row-local, zero shuffle); the hash is the md5-derived 60-bit
    integer mod FP_PRIME — portable to the DuckDB oracle."""
    chars = F.split(F.lower(F.col(text_col)), "")
    n = F.size(chars)
    zipped = F.arrays_zip(*[F.slice(chars, j + 1, n - (k - 1)) for j in range(k)])
    grams = (
        docs.filter(n >= k)
        .select(F.col(id_col).alias("doc_id"), (n - (k - 1)).alias("n_grams"), F.posexplode(zipped).alias("pos", "g"))
        .select(
            "doc_id",
            "n_grams",
            "pos",
            F.concat_ws("", *[F.col(f"g.{j}") for j in range(k)]).alias("gram"),
        )
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long") % FP_PRIME
    return grams.select("doc_id", "n_grams", "pos", h.alias("h"))


def winnowed_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                          k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of the
    MOSS winnowing paper): for every complete window of w consecutive
    k-gram hashes keep the minimum; the distinct kept hashes are the doc's
    fingerprint set. Guarantees any shared substring of length >= k+w-1
    contributes at least one common fingerprint. Returns DISTINCT
    (doc_id, fp)."""
    from pyspark.sql import Window

    gh = char_gram_hashes(docs, id_col, text_col, k)
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        gh.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - w)  # complete windows only
        .select("doc_id", "fp")
        .distinct()
    )


def _word_kgrams(ws: Column, k: int) -> Column:
    """Array of word k-grams from a token array — the arrays_zip-of-slices
    trick (row-local, zero shuffle; see operators.dedup.shingles for the
    rejected alternatives and why)."""
    n = F.size(ws)
    zipped = F.arrays_zip(*[F.slice(ws, j + 1, n - (k - 1)) for j in range(k)])
    return F.transform(zipped, lambda g: F.concat_ws(" ", *[g[str(j)] for j in range(k)]))


def repetition_signals(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 — the published repetition filters), on
    word n-grams:

      - dup_2gram_frac / dup_3gram_frac: fraction of k-gram occurrences that
        are repeats of an earlier occurrence (1 - distinct/total).
      - top_2gram_frac: fraction of 2-gram occurrences taken by the single
        most frequent 2-gram (the "fraction of characters in the most common
        n-gram" signal, occurrence-weighted).
      - repeated_word_frac: fraction of adjacent token pairs that are the
        same token twice ("aaa aaa" stutter).

    Everything is row-local Catalyst (no shuffle, no Python): distinct via
    array_distinct; the top-2-gram count is the longest equal run of the
    SORTED gram array, folded with one aggregate() pass. The higher-order
    lambdas evaluate interpreted (not codegen), but stay JVM-side and
    per-row — at cluster scale this keeps the operator shuffle-free, which
    beats the exploded groupBy formulation by the width of a full shuffle
    of every n-gram occurrence."""
    ws = tokens(F.col(text_col))
    n = F.size(ws)
    g2 = _word_kgrams(ws, 2)
    g3 = _word_kgrams(ws, 3)

    def dup_frac(g: Column) -> Column:
        total = F.size(g)
        return F.when(
            total > 0,
            (total - F.size(F.array_distinct(g))).cast("double") / total,
        ).otherwise(F.lit(0.0))

    # longest equal run of the sorted array == max occurrence count
    sorted_g2 = F.array_sort(g2)
    run_state = F.aggregate(
        sorted_g2,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top2 = F.when(
        F.size(g2) > 0, run_state["best"].cast("double") / F.size(g2)
    ).otherwise(F.lit(0.0))

    pairs = F.arrays_zip(F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1))
    rep_word = F.when(
        n > 1,
        F.size(F.filter(pairs, lambda p: p["0"] == p["1"])).cast("double") / (n - 1),
    ).otherwise(F.lit(0.0))

    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        dup_frac(g2).alias("dup_2gram_frac"),
        dup_frac(g3).alias("dup_3gram_frac"),
        top2.alias("top_2gram_frac"),
        rep_word.alias("repeated_word_frac"),
    )


def contamination_overlap(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for every candidate document, how many
    of its distinct word k-grams appear anywhere in the benchmark/eval set
    (the n-gram-overlap decontamination used for pretraining corpora, e.g.
    GPT-3 appendix C / PaLM §C — published methodology).

    Scale shape: the benchmark side is tiny relative to the corpus, so its
    distinct-gram set is BROADCAST and the corpus-side gram stream is
    semi-join-counted against it — the 100 TB corpus never shuffles on gram;
    the only aggregation is the per-doc count, partial-aggregated map-side.
    Returns (doc_id, n_grams, n_overlap) per candidate doc."""
    cand_grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(_word_kgrams(tokens(F.col(text_col)), k))).alias("gram"),
        )
    )
    bench_grams = (
        bench.select(F.explode(_word_kgrams(tokens(F.col(text_col)), k)).alias("gram")).distinct()
    )
    hit = F.broadcast(bench_grams.withColumn("hit", F.lit(1)))
    return (
        cand_grams.join(hit, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_overlap"),
        )
    )


# PII patterns kept to the regex subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): plain classes, counted repeats, no
# backrefs/lookarounds. Replacement order matters: emails first (an email's
# host part must not be half-eaten by the IP pattern), then phones, then IPs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}"),
)


def scrub_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact emails / phone numbers / IPv4s with typed placeholders and
    count what was removed — the standard pre-training PII scrub, entirely
    JVM-side (regexp_count + chained regexp_replace; no Python in the path,
    row-local, zero shuffle — the shape that survives a 100 TB corpus).

    Returns (doc_id, n_email, n_phone, n_ip, scrubbed)."""
    t = F.col(text_col)
    cols = [F.col(id_col).alias("doc_id")]
    scrubbed = t
    for name, pat in PII_PATTERNS:
        cols.append(F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    cols.append(scrubbed.alias("scrubbed"))
    return docs.select(*cols)


# BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
# non-alphanumeric marks — the coarse segmentation BPE vocabularies are
# trained over. Kept to a regex subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB) so counts oracle-match.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenization (JVM-side regexp_count
    — no Python, no explode)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def tfidf_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-(doc, term) TF-IDF over whitespace tokens:
    (doc_id, term, tf, df, tfidf) with the smooth-idf formula
    tfidf = tf * (ln((N + 1) / (df + 1)) + 1).

    Plan shape at 100 TB: one explode -> groupBy(doc, term) with map-side
    partial counts (the dominant shuffle carries one row per distinct
    (doc, term), not per token), a term-keyed groupBy for document
    frequencies (≤ vocabulary rows), and the corpus size N broadcast as a
    one-row crossJoin. All Catalyst — no Python in the pipeline.

    Float caveat (measured): Spark's ln (JVM StrictMath) and DuckDB's libm
    differ by 1 ulp on ~8% of inputs, so the `tfidf` column is NOT
    hash-oracle-able; oracled queries rank by the exact integer surrogate
    (tf DESC, df ASC, term) and the float column is reference-tested in
    pytest instead."""
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.select(F.countDistinct(F.col(id_col)).alias("n_docs"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1).cast("double")) + 1.0)
            ).alias("tfidf"),
        )
    )


def lm_doc_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-bigram language-model score per document — the CCNet-style
    quality signal (Wenzek et al. 2020 filter corpora by LM perplexity; the
    distributable core is the same: score each doc under a model fit on the
    corpus itself, low-probability docs are boilerplate/noise/outliers).

    Model: add-one-smoothed bigram conditional over lowercased whitespace
    tokens, P(w2|w1) = (C2(w1,w2) + 1) / (C1(w1) + V), fit on the corpus
    being scored. Output per doc:
      (doc_id, n_bigrams, sum_c2, sum_c1, avg_logprob)
    where sum_c2 / sum_c1 are the integer corpus-count sums over the doc's
    bigrams — the exact surrogate the hash oracle checks — and avg_logprob
    = mean ln P(w2|w1) is the float consumers threshold on (ln differs by
    1 ulp across engines ~8% of the time, so it is reference-tested in
    pytest, not hash-oracled; see tfidf_terms).

    Plan shape at 100 TB: bigram extraction is row-local (arrays_zip); the
    corpus bigram table is one (w1,w2)-keyed groupBy; unigram counts are a
    w1-keyed groupBy (≤ vocabulary rows); scoring joins the doc bigrams to
    both count tables on their keys (the dominant shuffle carries one row
    per doc-bigram occurrence) and folds per doc_id. All Catalyst."""
    ws = F.split(F.lower(F.col(text_col)), " ")
    pairs = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_word_kgrams(ws, 2)).alias("bg"))
        # drop pairs touching an empty token: leading/trailing/double space
        # in the joined bigram betrays an empty w1/w2 (tokens never contain
        # spaces by construction)
        .filter(
            ~F.col("bg").contains("  ")
            & ~F.col("bg").startswith(" ")
            & ~F.col("bg").endswith(" ")
        )
    )
    corpus_bg = pairs.groupBy("bg").agg(F.count("*").alias("c2"))
    w1 = F.substring_index(F.col("bg"), " ", 1)
    corpus_w1 = pairs.select(w1.alias("w1")).groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = corpus_w1.select(F.countDistinct("w1").alias("v"))
    scored = (
        pairs.join(corpus_bg, "bg")
        .withColumn("w1", w1)
        .join(corpus_w1, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("c2").alias("sum_c2"),
        F.sum("c1").alias("sum_c1"),
        F.avg(
            F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double"))
        ).alias("avg_logprob"),
    )


def lm_doc_scores_oracle_sql(table: str = "documents") -> str:
    """Integer-surrogate oracle (n_bigrams, sum_c2, sum_c1) in portable
    DuckDB SQL — the float avg_logprob column is excluded (ln ulp)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM {table}
),
pos_ AS (
  SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks WHERE len(ws) >= 2
),
pairs AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg, ws[i] AS w1
  FROM pos_ WHERE ws[i] != '' AND ws[i + 1] != ''
),
corpus_bg AS (SELECT bg, count(*) AS c2 FROM pairs GROUP BY bg),
corpus_w1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams, CAST(sum(c2) AS BIGINT) AS sum_c2, CAST(sum(c1) AS BIGINT) AS sum_c1
FROM pairs JOIN corpus_bg USING (bg) JOIN corpus_w1 USING (w1)
GROUP BY doc_id
"""


def lexicon_hits(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """Per-document lexicon scoring: (doc_id, n_tokens, n_hits, hit_frac)
    against an arbitrary wordlist DATAFRAME — the toxicity / blocklist /
    domain-term filter shape. Unlike the fixed stopword_ratio (a literal
    IN over 7 words), the lexicon here is data: a 100k-term wordlist
    broadcasts as a join relation (or shuffles if huge), which an
    IN-literal cannot express without exploding the plan.

    Token hits use the lexicon's terms lowercased-distinct; a token
    matching multiple lexicon rows counts once (semi-join semantics).
    One explode (row-local) + one broadcast semi join + one doc-keyed
    fold."""
    lex = lexicon.select(F.lower(F.col(term_col)).alias("_lex_term")).distinct()
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    hits = (
        toks.join(F.broadcast(lex), toks["tok"] == lex["_lex_term"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_tokens")).alias("hit_frac"),
        )
    )


def hashed_bucket(col: Column, n_features: int) -> Column:
    """Feature-hashing bucket for a token: first 32 bits of md5, mod
    n_features. Engine-portable (DuckDB: ('0x'||substr(md5(t),1,8))::BIGINT
    % n), always non-negative."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_features


def classifier_weights(spark, n_features: int = 256, salt: str = "qw") -> DataFrame:
    """Deterministic surrogate for a trained linear classifier's weight
    table: (bucket, weight) with integer weights in [-1000, 1000] derived
    from md5 so both engines reproduce them bit-for-bit. A real fastText /
    logistic quality model drops in unchanged — the weight table is DATA
    (possibly millions of hashed-n-gram rows), which is why scoring joins
    it rather than inlining literals."""
    return spark.range(n_features).select(
        F.col("id").alias("bucket"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col("id").cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 2001
            - 1000
        ).alias("weight"),
    )


def _feature_stream(docs: DataFrame, id_col: str, text_col: str, word_ngrams: int) -> DataFrame:
    """(doc_id, tok): hashed-classifier feature stream — lowercased
    whitespace unigrams plus word n-grams up to `word_ngrams` (space-
    joined, fastText style). One row-local explode, shared by the scorer
    and the trainer so a trained model scores over EXACTLY the features it
    saw."""
    ws = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")

    # bind n in a closure factory: a default-arg lambda would take TWO
    # params, which F.transform interprets as an (element, index) lambda
    def _gram(n: int):
        return lambda i: F.concat_ws(
            " ", *[F.get(ws, (i + F.lit(j)).cast("int")) for j in range(n)]
        )

    grams = [ws]
    for n in range(2, word_ngrams + 1):
        # guard short docs: sequence(0, negative) would count DOWN in Spark
        grams.append(
            F.when(
                F.size(ws) >= n,
                F.transform(F.sequence(F.lit(0), F.size(ws) - n), _gram(n)),
            ).otherwise(F.array().cast("array<string>"))
        )
    feats = F.flatten(F.array(*grams)) if len(grams) > 1 else grams[0]
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(feats).alias("tok"),
    ).filter(F.col("tok") != "")


def quality_classifier(
    docs: DataFrame,
    weights: DataFrame,
    n_features: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_ngrams: int = 1,
) -> DataFrame:
    """fastText-style linear quality classifier over hashed unigram
    features: tokens hash into `n_features` buckets, the (broadcast)
    weight table scores each token, and a doc-keyed fold yields
    (doc_id, n_tokens, raw_score, quality, keep).

    Exactness: integer weights summed in BIGINT, one final double
    division — hash-parity safe. Scale: one row-local explode, one
    broadcast hash join (the model is small relative to the corpus; a
    huge model shuffles instead — Spark picks), one doc-keyed partial
    aggregation. No Python in the hot path.

    The weight join is LEFT with missing buckets scoring 0: a trained or
    pruned model covering only its nonzero buckets must not silently drop
    tokens from n_tokens — and a document whose every token misses the
    table still gets its (zero-score) row. Docs with NULL/empty text have
    no tokens and no rank; they drop out, as documented.

    word_ngrams=2 adds hashed word-bigram features (space-joined, the
    fastText wordNgrams recipe) to the same bucket space — the feature
    stream stays one row-local explode (flatten of per-n transforms);
    n_tokens then counts FEATURES, the quantity the score normalizes by."""
    toks = _feature_stream(docs, id_col, text_col, word_ngrams)
    scored = toks.withColumn("bucket", hashed_bucket(F.col("tok"), n_features)).join(
        F.broadcast(weights), "bucket", "left"
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("raw_score"),
    ).select(
        "doc_id",
        "n_tokens",
        "raw_score",
        (F.col("raw_score").cast("double") / (F.lit(1000) * F.col("n_tokens"))).alias("quality"),
        (F.col("raw_score") > 0).alias("keep"),
    )


def hashed_doc_embedding_components(
    docs: DataFrame,
    dim: int = 16,
    n_features: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-free document embeddings, exact-integer form: feature-hashed
    bag-of-words randomly projected to `dim` dims (the classic
    hashing-trick + random-projection baseline — JL distance preservation
    without any trained model), so the embedding operators (cosine top-k,
    LSH/IVF ANN, SemDeDup) run on a corpus that arrives as TEXT. Returns
    (doc_id, j, s, n): s = BIGINT dot product of the doc's integer bucket
    counts with projection column j, n = the doc's feature count.

    Deterministic and engine-portable: projection components are
    md5-derived integers in [-1000, 1000], every sum exact BIGINT. Plan:
    one row-local explode, one (doc, bucket) count agg, one broadcast join
    against the n_features x dim component table, one doc-keyed fold."""
    counts = (
        _feature_stream(docs, id_col, text_col, word_ngrams=1)
        .withColumn("bucket", hashed_bucket(F.col("tok"), n_features))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = docs.sparkSession
    # component(bucket, j) = md5("emb:<bucket>:<j>") % 2001 - 1000 — the
    # same deterministic-surrogate idiom as classifier_weights
    comp = (
        spark.range(n_features)
        .select(F.col("id").alias("bucket"))
        .crossJoin(spark.range(dim).select(F.col("id").alias("j")))
        .select(
            "bucket",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("emb:"),
                                F.col("bucket").cast("string"),
                                F.lit(":"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 2001
                - 1000
            ).alias("v"),
        )
    )
    return (
        counts.join(F.broadcast(comp), "bucket")
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("cnt") * F.col("v")).alias("s"), F.sum("cnt").alias("n"))
    )


def hashed_doc_embeddings(
    docs: DataFrame,
    dim: int = 16,
    n_features: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding array<float>) from the exact integer components
    above: component j = s / (1000 * n) — a count-normalized projection, so
    document length cancels and the floats appear only in this last
    single-op division (the repo float policy; the component table is what
    the oracle value-hashes)."""
    comps = hashed_doc_embedding_components(docs, dim, n_features, id_col, text_col)
    return comps.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "s", "n"))),
            lambda e: (e["s"].cast("double") / (F.lit(1000.0) * e["n"])).cast("float"),
        ).alias("embedding")
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    n_features: int = 256,
    iterations: int = 20,
    lr: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_ngrams: int = 1,
) -> DataFrame:
    """TRAIN the hashed-n-gram logistic quality model in-engine:
    full-batch gradient descent over (doc_id, bucket, cnt) counts, labels
    in {0, 1}. Returns the (bucket, weight) table `quality_classifier`
    consumes, with weights quantized to the same integer 1e-3 units as
    `classifier_weights` (so raw_score stays an exact BIGINT sum and
    quality ~= the mean per-feature weight).

    Determinism contract (the repo-wide float policy, see dim_stats):
    per-iteration margins are exact BIGINT sums of cnt * micro-weight;
    the per-doc residual sigmoid(m) - y is a per-row IEEE op; each doc's
    gradient contribution quantizes to micro-units BEFORE the bucket sum,
    so the aggregate is exact under ANY partitioning — two trainings
    produce byte-identical weights, on one machine or a thousand.

    Scale: the count table builds once (one explode + one (doc, bucket)
    groupBy) and persists across iterations; each iteration is one
    broadcast weights join + a doc-keyed and a bucket-keyed aggregation;
    the driver only ever sees n_features gradient longs (the kmeans /
    dedup_clusters iteration pattern)."""
    counts = (
        _feature_stream(docs, id_col, text_col, word_ngrams)
        .withColumn("bucket", hashed_bucket(F.col("tok"), n_features))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(
            docs.select(F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("y")),
            "doc_id",
        )
        # persist HASH-PARTITIONED ON doc_id (guide §2.4 — two operations
        # keyed the same way share one exchange): every iteration's margin
        # aggregation groups by (doc_id, y) and the gradient join keys on
        # doc_id, so caching the partitioning removes the per-iteration
        # margins exchange from all `iterations` gradient actions (the
        # one-off repartition here is paid once). Width stays conf-driven.
        .repartition("doc_id")
        .persist()
    )
    try:
        n_docs = counts.select("doc_id").distinct().count()
        spark = docs.sparkSession
        w = [0.0] * n_features
        for _ in range(iterations):
            # Weight lookup as ONE literal-array expression (single py4j
            # parse per iteration) instead of a per-iteration
            # createDataFrame + broadcast join: hashed_bucket is always in
            # [0, n_features), so the former inner join kept every row and
            # element_at(arr, bucket+1) yields the identical LONG
            # micro-weight — the margins are byte-equal by construction.
            w_arr = F.expr(
                "array("
                + ",".join(f"{int(round(w[b] * 1_000_000))}L" for b in range(n_features))
                + ")"
            )
            w_micro_col = F.element_at(w_arr, (F.col("bucket") + 1).cast("int"))
            margins = (
                counts.groupBy("doc_id", "y")
                .agg((F.sum(F.col("cnt") * w_micro_col) / 1e6).alias("m"))
                .select(
                    "doc_id",
                    (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y")).alias("r"),
                )
            )
            grad = (
                counts.join(margins, "doc_id")
                .groupBy("bucket")
                .agg(
                    F.sum(F.floor(F.col("cnt") * F.col("r") * 1_000_000 + 0.5).cast("long")).alias(
                        "g_micro"
                    )
                )
                .collect()
            )
            for row in grad:
                w[row.bucket] -= lr * (row.g_micro / 1e6) / n_docs
        return spark.createDataFrame(
            [(b, int(round(w[b] * 1000))) for b in range(n_features)], "bucket INT, weight LONG"
        )
    finally:
        counts.unpersist()


def train_quality_oracle_sql(
    docs_table: str,
    label_sql: str,
    n_features: int = 64,
    iterations: int = 6,
    lr: float = 2.0,
    train_where_sql: str = "TRUE",
) -> str:
    """DuckDB oracle for train_quality_classifier -> quality_classifier,
    the full train-then-score composition, as ONE portable SQL query: the
    gradient-descent loop UNROLLS into `iterations` CTE levels (the state
    is the n_features-row weight table — tiny — so unrolling is cheap and
    avoids engine-specific recursive-CTE aggregation limits).

    Portability rests on the trainer's determinism contract: every
    cross-row aggregate is an exact BIGINT sum of pre-quantized integers,
    so engines may aggregate in any order; the per-row float ops (sigmoid
    residual, weight update) replicate the trainer's operation order
    exactly. round_even matches Python round()'s banker's rounding. The
    one residual hazard is exp() differing in the last ulp between libm
    and the JVM — the floor(x + 0.5) micro-quantization absorbs it except
    when x sits within an ulp of an integer boundary (odds ~1e-10/row).

    Every state CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    reference, and each iteration references the previous weight table
    three times — inlined, the plan would expand 3^iterations.

    label_sql: SQL expression over `docs_table` columns producing the
    0/1 label. train_where_sql restricts the TRAINING slice (class
    rebalancing by deterministic subsample — the production shape for
    rare-positive corpora); scoring always covers the full corpus."""
    n, T = n_features, iterations
    head = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM {docs_table}
),
tokb AS MATERIALIZED (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % {n} AS bucket
  FROM t WHERE tok != ''
),
c AS (
  SELECT doc_id, bucket, count(*) AS cnt FROM tokb GROUP BY doc_id, bucket
),
lab AS (
  SELECT doc_id, CASE WHEN {label_sql} THEN 1.0 ELSE 0.0 END AS y FROM {docs_table}
),
cl AS MATERIALIZED (
  SELECT c.doc_id, c.bucket, c.cnt, lab.y FROM c JOIN lab USING (doc_id)
  WHERE {train_where_sql}
),
nd AS MATERIALIZED (SELECT count(DISTINCT doc_id) AS n_docs FROM cl),
w0 AS MATERIALIZED (SELECT unnest(range(0, {n}))::INT AS bucket, 0.0::DOUBLE AS w)"""
    steps = []
    for i in range(1, T + 1):
        p = i - 1
        steps.append(f""",
wm{i} AS MATERIALIZED (
  SELECT bucket, CAST(round_even(w * 1000000, 0) AS BIGINT) AS w_micro FROM w{p}
),
m{i} AS MATERIALIZED (
  SELECT cl.doc_id, cl.y,
         CAST(sum(cl.cnt * wm{i}.w_micro) AS BIGINT) / 1000000.0 AS m
  FROM cl JOIN wm{i} USING (bucket) GROUP BY cl.doc_id, cl.y
),
r{i} AS MATERIALIZED (
  SELECT doc_id, 1.0 / (1.0 + exp(-m)) - y AS r FROM m{i}
),
g{i} AS MATERIALIZED (
  SELECT cl.bucket,
         CAST(sum(CAST(floor(cl.cnt * r{i}.r * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS g_micro
  FROM cl JOIN r{i} USING (doc_id) GROUP BY cl.bucket
),
w{i} AS MATERIALIZED (
  SELECT w{p}.bucket,
         w{p}.w - {lr!r} * (COALESCE(g{i}.g_micro, 0) / 1000000.0) / nd.n_docs AS w
  FROM w{p} LEFT JOIN g{i} USING (bucket) CROSS JOIN nd
)""")
    tail = f""",
wt AS MATERIALIZED (SELECT bucket, CAST(round_even(w * 1000, 0) AS BIGINT) AS weight FROM w{T}),
scored AS (
  SELECT tokb.doc_id, count(*) AS n_tokens,
         CAST(sum(COALESCE(wt.weight, 0)) AS BIGINT) AS raw_score
  FROM tokb LEFT JOIN wt USING (bucket) GROUP BY tokb.doc_id
)
SELECT doc_id, n_tokens, raw_score,
       raw_score::DOUBLE / (1000 * n_tokens) AS quality,
       raw_score > 0 AS keep
FROM scored ORDER BY doc_id
"""
    return head + "".join(steps) + tail


def phrase_lexicon_hits(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """Per-document PHRASE lexicon hits: (doc_id, n_hits) where lexicon
    entries may be multi-word ("credit card number") — token-level
    matching misses these. The lexicon's distinct phrase lengths are
    collected driver-side (the list is small by definition); for each
    length n the document's word n-gram stream (row-local arrays_zip)
    semi-joins the length-n phrases. Hits count matching n-gram
    OCCURRENCES (overlaps included); docs with no hits are absent (join
    the result back for zero-filled scoring, as lexicon_hits does)."""
    lex = lexicon.select(F.lower(F.col(term_col)).alias("p")).distinct()
    lengths = [
        r.n for r in lex.select(F.size(F.split("p", " ")).alias("n")).distinct().collect()
    ]
    if not lengths:
        raise ValueError("empty lexicon")
    ws = F.split(F.lower(F.col(text_col)), " ")
    parts = []
    for n in sorted(lengths):
        lex_n = lex.filter(F.size(F.split("p", " ")) == n)
        grams = docs.select(
            F.col(id_col).alias("doc_id"), F.explode(_word_kgrams(ws, n)).alias("g")
        )
        parts.append(
            grams.join(F.broadcast(lex_n), grams["g"] == lex_n["p"], "left_semi")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))


def pseudonymize(
    df: DataFrame, cols: list[str], salt: str, id_col: str | None = None
) -> DataFrame:
    """Deterministic keyed pseudonymization of identifier columns: each
    value is replaced by sha256(salt || ':' || value) — the GDPR-grade
    tokenization beside scrub_pii (scrubbing destroys the value;
    pseudonymization preserves JOINABILITY: the same value under the same
    salt maps to the same token everywhere, so keyed joins and group-bys
    still work across pseudonymized tables, while reversal requires the
    salt). NULLs stay NULL (a NULL identifier is already non-identifying).

    Row-local, zero shuffle, JVM-side sha2 — the shape that survives any
    corpus size. Rotating the salt re-keys the whole release in one pass.
    """
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.sha2(F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string")), 256),
            ),
        )
    if id_col:
        out = out.orderBy(id_col)
    return out
