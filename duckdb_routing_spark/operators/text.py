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
