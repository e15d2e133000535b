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

from duckdb_routing_spark.operators.common import literal_df
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


def hybrid_rrf_search(
    docs: DataFrame,
    query: str,
    k_each: int = 50,
    k: int = 20,
    rrf_c: int = 60,
    dim: int = 16,
    n_features: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hybrid retrieval: lexical + embedding candidate lists fused with
    reciprocal-rank fusion (Cormack et al. 2009: score = sum 1/(C + rank)).

    Lexical list: disjunctive postings match ranked by (matched terms,
    total tf, doc_id) — all integers. Semantic list: exact BIGINT inner
    product of the corpus' hashed-projection components
    (text.hashed_doc_embedding_components) against the SAME hashing of the
    query string — model-free, so the whole pipeline runs on text alone.
    RRF contributions are integer micro-units (1e9 // (C + rank)), so the
    fused ordering is engine-portable with no float anywhere.

    Scale shape: each list is a keyed aggregation ending in a distributed
    top-k (TakeOrderedAndProject) — the rank windows run over the k_each
    SURVIVORS only, never the corpus; the fusion join is k_each x k_each.
    Docs absent from a list carry rank 0 (contributing nothing) rather
    than NULL, keeping the rank columns integer end to end.
    """
    from pyspark.sql import Window

    from duckdb_routing_spark.operators import text as _text

    spark = docs.sparkSession
    terms = sorted({t for t in query.lower().split() if t})
    p = postings(docs, id_col, text_col)
    lex = (
        p.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
    )
    lex_order = [F.desc("n_terms"), F.desc("total_tf"), F.asc("doc_id")]
    lex_ranked = (
        lex.orderBy(*lex_order)
        .limit(k_each)
        .withColumn("rank_lex", F.row_number().over(Window.orderBy(*lex_order)))
        .select("doc_id", "rank_lex")
    )
    dcomp = _text.hashed_doc_embedding_components(
        docs, dim=dim, n_features=n_features, id_col=id_col, text_col=text_col
    )
    qdf = literal_df(spark, [(0, query)], f"{id_col} long, {text_col} string")
    qcomp = _text.hashed_doc_embedding_components(
        qdf, dim=dim, n_features=n_features, id_col=id_col, text_col=text_col
    ).select("j", F.col("s").alias("qs"))
    sem = (
        dcomp.join(F.broadcast(qcomp), "j")
        .groupBy("doc_id")
        .agg(F.sum(F.col("s") * F.col("qs")).alias("dot"))
    )
    sem_order = [F.desc("dot"), F.asc("doc_id")]
    sem_ranked = (
        sem.orderBy(*sem_order)
        .limit(k_each)
        .withColumn("rank_sem", F.row_number().over(Window.orderBy(*sem_order)))
        .select("doc_id", "rank_sem")
    )
    fused = (
        lex_ranked.join(sem_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).cast("long").alias("rank_lex"),
            F.coalesce("rank_sem", F.lit(0)).cast("long").alias("rank_sem"),
        )
        .withColumn(
            "rrf_ppb",
            (
                F.when(F.col("rank_lex") > 0, F.expr(f"1000000000 div ({rrf_c} + rank_lex)")).otherwise(F.lit(0))
                + F.when(F.col("rank_sem") > 0, F.expr(f"1000000000 div ({rrf_c} + rank_sem)")).otherwise(F.lit(0))
            ).cast("long"),
        )
    )
    return fused.orderBy(F.desc("rrf_ppb"), F.asc("doc_id")).limit(k)


def hybrid_rrf_oracle_sql(
    query: str,
    k_each: int = 50,
    k: int = 20,
    rrf_c: int = 60,
    dim: int = 16,
    n_features: int = 256,
    table: str = "documents",
) -> str:
    """The fused ranking in portable DuckDB SQL (exact integers throughout)."""
    terms = sorted({t for t in query.lower().split() if t})
    in_list = ", ".join("'{}'".format(t.replace("'", "''")) for t in terms)
    q_lit = query.lower().replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM {table}
),
p AS (
  SELECT term, doc_id, count(*) AS tf FROM toks WHERE term != '' GROUP BY term, doc_id
),
lex AS (
  SELECT doc_id, count(DISTINCT term) AS n_terms, sum(tf)::BIGINT AS total_tf
  FROM p WHERE term IN ({in_list}) GROUP BY doc_id
),
lex_ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_terms DESC, total_tf DESC, doc_id) AS rank_lex
  FROM lex QUALIFY rank_lex <= {k_each}
),
c AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 8))::BIGINT % {n_features} AS bucket, count(*) AS cnt
  FROM toks WHERE term != '' GROUP BY doc_id, bucket
),
comp AS (
  SELECT b.bucket, j.j,
         ('0x' || substr(md5('emb:' || b.bucket || ':' || j.j), 1, 8))::BIGINT % 2001 - 1000 AS v
  FROM (SELECT unnest(range(0, {n_features})) AS bucket) b,
       (SELECT unnest(range(0, {dim})) AS j) j
),
dcomp AS (
  SELECT c.doc_id, comp.j, sum(c.cnt * comp.v)::BIGINT AS s
  FROM c JOIN comp USING (bucket) GROUP BY c.doc_id, comp.j
),
qt AS (SELECT unnest(string_split('{q_lit}', ' ')) AS tok),
qc AS (
  SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % {n_features} AS bucket, count(*) AS cnt
  FROM qt WHERE tok != '' GROUP BY bucket
),
qv AS (
  SELECT comp.j, sum(qc.cnt * comp.v)::BIGINT AS qs
  FROM qc JOIN comp USING (bucket) GROUP BY comp.j
),
sem AS (
  SELECT d.doc_id, sum(d.s * qv.qs)::BIGINT AS dot
  FROM dcomp d JOIN qv USING (j) GROUP BY d.doc_id
),
sem_ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY dot DESC, doc_id) AS rank_sem
  FROM sem QUALIFY rank_sem <= {k_each}
),
f AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
         coalesce(l.rank_lex, 0)::BIGINT AS rank_lex,
         coalesce(s.rank_sem, 0)::BIGINT AS rank_sem
  FROM lex_ranked l FULL OUTER JOIN sem_ranked s ON l.doc_id = s.doc_id
)
SELECT doc_id, rank_lex, rank_sem,
       ((CASE WHEN rank_lex > 0 THEN 1000000000 // ({rrf_c} + rank_lex) ELSE 0 END)
        + (CASE WHEN rank_sem > 0 THEN 1000000000 // ({rrf_c} + rank_sem) ELSE 0 END))::BIGINT AS rrf_ppb
FROM f
ORDER BY rrf_ppb DESC, doc_id LIMIT {k}
"""


def ranking_metrics(
    ranked: DataFrame,
    truth: DataFrame,
    k: int,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Integer-exact retrieval evaluation: how well a ranked candidate list
    covers a relevance set.

    `ranked` carries (group_cols..., id_col, rank_col) with 1-based ranks;
    `truth` carries (group_cols..., id_col) — the relevant ids. Returns one
    row per group (one row total when group_cols is None):
      n_ranked        — candidate list size
      n_relevant      — truth set size
      hits_at_k       — relevant ids at rank <= k
      first_hit_rank  — best rank holding a relevant id (0 = no hit)
      rr_ppb          — reciprocal rank in integer micro-units
                        (1e9 // first_hit_rank; the MRR numerator summed
                        across groups stays exact)

    All columns are BIGINT, so cross-engine parity is exact — the float
    forms (MRR, recall) are one final division away. Plan: one keyed join
    of the (small) ranked list to the truth set + keyed one-row folds; at
    fleet scale group_cols = the query id and everything shuffles on it.
    """
    g = list(group_cols or [])
    r = ranked.select(*g, F.col(id_col).alias("_id"), F.col(rank_col).cast("long").alias("_rk"))
    t = truth.select(*g, F.col(id_col).alias("_id"), F.lit(1).alias("_rel"))
    hits = r.join(t, g + ["_id"], "inner") if g else r.join(t, ["_id"], "inner")

    def _agg(df, cols):
        gb = df.groupBy(*cols) if cols else df.groupBy()
        return gb

    n_ranked = _agg(r, g).agg(F.count(F.lit(1)).alias("n_ranked"))
    n_rel = _agg(t, g).agg(F.count(F.lit(1)).alias("n_relevant"))
    h = _agg(hits, g).agg(
        F.sum(F.when(F.col("_rk") <= k, 1).otherwise(0)).cast("long").alias("hits_at_k"),
        F.min("_rk").alias("_best"),
    )
    if g:
        out = n_ranked.join(n_rel, g, "full_outer").join(h, g, "left")
    else:
        out = n_ranked.crossJoin(n_rel).crossJoin(
            h.select("hits_at_k", "_best")
        )
    return out.select(
        *g,
        F.coalesce("n_ranked", F.lit(0)).cast("long").alias("n_ranked"),
        F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
        F.coalesce("hits_at_k", F.lit(0)).cast("long").alias("hits_at_k"),
        F.coalesce("_best", F.lit(0)).cast("long").alias("first_hit_rank"),
        F.coalesce(F.expr("1000000000 div _best"), F.lit(0)).cast("long").alias("rr_ppb"),
    )
