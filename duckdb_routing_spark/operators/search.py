"""Corpus search / retrieval: inverted postings, conjunctive search, BM25.

100 TB posture: the postings table (term, doc_id, tf) is the retrieval
complement of the dedup/quality family — one explode + one (term, doc_id)
keyed groupBy builds it (the dominant shuffle carries one row per distinct
doc-term, not per token), and every search below touches only the query
terms' postings (a term-keyed semi join against a tiny broadcast term
list), never the corpus. Conjunctive search is a doc-keyed count fold;
BM25 joins the candidate postings to the (<= vocabulary-row) df table and
per-doc lengths, both keyed. Scoring stays in Catalyst.

Float policy (see tfidf_terms): BM25 needs ln(), which differs by 1 ulp
across engines, so the hash oracle checks the exact integer component
table (tf, df, dl) and the float ranking is reference-tested in pytest.

Reference parity note: the reference engine ships no text retrieval; this
is LLM-pipeline surface (benchmark/contamination lookups, corpus QA) on
top of SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Inverted postings: (term, doc_id, tf) over lowercased whitespace
    tokens. One explode (row-local) + one keyed groupBy with map-side
    partial counts."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def conjunctive_search(
    docs: DataFrame, terms: list[str], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Documents containing ALL of `terms`: (doc_id, total_tf). The term
    list broadcasts (it is a literal IN filter); the postings shuffle only
    carries the query terms' rows; the AND is a doc-keyed distinct-count
    fold — no corpus scan past the postings build, no self-join."""
    if not terms:
        raise ValueError("need at least one term")
    lowered = [t.lower() for t in terms]
    p = postings(docs, id_col, text_col).filter(F.col("term").isin(lowered))
    return (
        p.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_matched"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("n_matched") == len(set(lowered)))
        .select("doc_id", "total_tf")
    )


def bm25_components(
    docs: DataFrame, terms: list[str], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The exact-integer BM25 inputs for `terms`: (doc_id, term, tf, df, dl)
    with dl = the doc's token count. This is the hash-oracle-able surface;
    bm25_topk folds it into float scores."""
    lowered = sorted({t.lower() for t in terms})
    p = postings(docs, id_col, text_col)
    cand = p.filter(F.col("term").isin(lowered))
    dfreq = cand.groupBy("term").agg(F.count("*").alias("df"))
    ws = F.split(F.lower(F.col(text_col)), " ")
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(ws, lambda w: w != "")).cast("long").alias("dl"),
    )
    return cand.join(dfreq, "term").join(dl, "doc_id").select("doc_id", "term", "tf", "df", "dl")


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by BM25 (Robertson/Sparck Jones):
    score = sum_t ln(1 + (N - df + 0.5)/(df + 0.5))
                  * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    N and avgdl are corpus scalars (one-row broadcast crossJoin); ties
    break on doc_id for determinism."""
    comp = bm25_components(docs, terms, id_col, text_col)
    scalars = docs.agg(
        F.countDistinct(F.col(id_col)).alias("n_docs"),
    ).crossJoin(
        docs.select(
            F.size(F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")).alias("l")
        ).agg(F.avg("l").alias("avgdl"))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (
        comp.crossJoin(F.broadcast(scalars))
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_components_oracle_sql(terms: list[str], table: str = "documents") -> str:
    """The byte-identical component table in portable DuckDB SQL."""
    lowered = sorted({t.lower() for t in terms})
    in_list = ", ".join(f"'{t}'" for t in lowered)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM {table}
),
p AS (
  SELECT term, doc_id, count(*) AS tf FROM toks WHERE term != '' GROUP BY term, doc_id
),
cand AS (SELECT * FROM p WHERE term IN ({in_list})),
dfreq AS (SELECT term, count(*) AS df FROM cand GROUP BY term),
dl AS (
  SELECT doc_id, CAST(len(list_filter(string_split(lower(text), ' '), w -> w != '')) AS BIGINT) AS dl
  FROM {table}
)
SELECT doc_id, term, tf, df, dl
FROM cand JOIN dfreq USING (term) JOIN dl USING (doc_id)
"""


def conjunctive_search_oracle_sql(terms: list[str], table: str = "documents") -> str:
    lowered = sorted({t.lower() for t in terms})
    in_list = ", ".join(f"'{t}'" for t in lowered)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM {table}
),
p AS (
  SELECT term, doc_id, count(*) AS tf FROM toks WHERE term != '' GROUP BY term, doc_id
),
cand AS (SELECT * FROM p WHERE term IN ({in_list}))
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf
FROM cand GROUP BY doc_id HAVING count(DISTINCT term) = {len(lowered)}
"""
