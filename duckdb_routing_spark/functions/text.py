"""SQL surface for the text-analysis kit.

The reference exposes its capabilities as SQL scalar functions; this module
does the same for the text operators using Spark SQL-defined functions
(``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``, Spark 4) —
the bodies are pure Catalyst expressions, so the functions run fully
JVM-side inside whole-stage codegen, exactly like the DataFrame forms in
:mod:`duckdb_routing_spark.operators.text` they mirror (same marker
profiles, same constants — one source of truth for both surfaces).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from duckdb_routing_spark.operators.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    MIN_MARKER_RATIO,
    STOPWORDS,
)


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _lang_id_body() -> str:
    """CASE-chain argmax over the marker profiles, mirroring
    operators.text.lang_id exactly: languages iterated in reverse code
    order with strict >, so earlier codes win ties."""
    toks = "split(lower(t), ' ')"
    score = {
        code: (
            f"size(filter({toks}, x -> x IN ({_in_list(markers)})))"
            f" / cast(size({toks}) as double)"
        )
        for code, markers in LANG_MARKERS.items()
    }
    # fold: start at ('und', MIN_MARKER_RATIO), replace when score is
    # strictly greater — expressed as one nested CASE per language
    best_lang, best_score = "'und'", str(MIN_MARKER_RATIO)
    for code in sorted(LANG_MARKERS, reverse=True):
        s = score[code]
        best_lang = f"CASE WHEN {s} > {best_score} THEN '{code}' ELSE {best_lang} END"
        best_score = f"CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END"
    return best_lang


def register_text_functions(spark: SparkSession) -> None:
    """Register the kit: tok_count, unique_tok_count, avg_token_len,
    stopword_ratio, quality_score, doc_fingerprint, lang_id,
    bpe_tok_count — all session-scoped temporary functions."""
    toks = "split(t, ' ')"
    stop_hits = f"size(filter({toks}, x -> x IN ({_in_list(STOPWORDS)})))"
    defs = {
        "tok_count": f"(t STRING) RETURNS INT RETURN size({toks})",
        "unique_tok_count": f"(t STRING) RETURNS INT RETURN size(array_distinct({toks}))",
        "avg_token_len": (
            "(t STRING) RETURNS DOUBLE RETURN "
            f"aggregate({toks}, 0, (acc, x) -> acc + length(x)) / cast(size({toks}) as double)"
        ),
        "stopword_ratio": (
            f"(t STRING) RETURNS DOUBLE RETURN {stop_hits} / cast(size({toks}) as double)"
        ),
        "quality_score": (
            "(t STRING) RETURNS DOUBLE RETURN ("
            f"  (CASE WHEN size({toks}) BETWEEN 10 AND 2000 THEN 1.0 ELSE 0.0 END)"
            f"  + size(array_distinct({toks})) / cast(size({toks}) as double)"
            f"  + (CASE WHEN {stop_hits} > 0 THEN 1.0 ELSE 0.0 END)"
            ") / 3.0"
        ),
        "doc_fingerprint": "(t STRING) RETURNS STRING RETURN md5(lower(t))",
        "lang_id": f"(t STRING) RETURNS STRING RETURN {_lang_id_body()}",
        "bpe_tok_count": (
            f"(t STRING) RETURNS BIGINT RETURN regexp_count(t, '{BPE_ISH_PATTERN}')"
        ),
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
