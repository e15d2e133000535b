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


# BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
# non-alphanumeric marks — the coarse segmentation BPE vocabularies are
# trained over. Kept to a regex subset with identical semantics in Java
# regex (Spark) and RE2 (DuckDB) so counts oracle-match.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenization (JVM-side regexp_count
    — no Python, no explode)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")
