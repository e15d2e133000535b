"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the published Data Selection via Importance Resampling recipe
(Xie et al., NeurIPS 2023): estimate two bag-of-hashed-n-gram unigram
distributions — `raw` over the big crawled corpus and `target` over a
small high-quality corpus — score every raw document by its importance
log-weight sum_grams log(p_target(bucket)/p_raw(bucket)), then resample
top-k under Gumbel noise (Gumbel-top-k IS sampling-without-replacement
proportional to the importance weights).

Everything is Catalyst-side and exact-integer where a value crosses the
oracle boundary (the repo float policy): per-bucket log ratios are
quantized once to BIGINT micro-units (floor(1e6 * ln(int_num/int_den)) —
integer numerator/denominator, one IEEE division, one ln, identical in
both engines on the same inputs), so every per-document sum is exact
BIGINT under ANY aggregation order.

Scale shape (the 100 TB story):
  - feature stream: one row-local explode (no shuffle);
  - the two distributions: partial-agg shuffles onto <= n_features keys
    (map-side combine collapses any corpus to n_features rows);
  - the log-ratio table: n_features rows, broadcast to the scorer;
  - per-doc scores: one (doc_id) aggregation shuffle;
  - selection: TakeOrderedAndProject (global top-k, never a full sort).
The reference engine has no data-selection surface (SURVEY §2 covers its
SQL/routing operators); this module is part of the training-data tier the
rebuild adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_routing_spark.operators.text import _feature_stream, hashed_bucket

MU = 1_000_000  # micro-unit quantization scale for log-space values


def hashed_bucket_counts(
    docs: DataFrame,
    n_features: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_ngrams: int = 2,
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed bag-of-n-grams per document — the
    same lowercased whitespace unigram+bigram feature stream the quality
    classifier uses (shared _feature_stream), bucketed by the engine-
    portable md5 hash."""
    return (
        _feature_stream(docs, id_col, text_col, word_ngrams)
        .withColumn("bucket", hashed_bucket(F.col("tok"), n_features))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_distribution(
    docs: DataFrame,
    n_features: int = 4096,
    text_col: str = "text",
    word_ngrams: int = 2,
) -> DataFrame:
    """(bucket, c): corpus-level hashed-n-gram counts — the unigram
    bucket distribution DSIR fits per corpus. One explode + one
    partial-agg shuffle onto <= n_features keys."""
    return (
        _feature_stream(docs, "doc_id", text_col, word_ngrams)
        .withColumn("bucket", hashed_bucket(F.col("tok"), n_features))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_ratio_table(
    raw_dist: DataFrame,
    target_dist: DataFrame,
    n_features: int = 4096,
) -> DataFrame:
    """(bucket, lam_mu): quantized per-bucket importance log-ratio

        lam_mu = floor(MU * ln( ((c_t + 1) * (N_r + F))
                               / ((c_r + 1) * (N_t + F)) ))

    with add-one smoothing over the F = n_features buckets (so unseen
    buckets are defined in both distributions). The ratio's numerator and
    denominator are exact BIGINTs; the only float ops are one division and
    one ln, identical on both engines for identical integer inputs. The
    table is n_features rows — broadcast it."""
    spark = raw_dist.sparkSession
    buckets = spark.range(n_features).select(F.col("id").alias("bucket"))
    # coalesce: an EMPTY corpus sums to NULL; with add-one smoothing that
    # degrades cleanly to the uniform distribution instead of NULL scores
    nr = raw_dist.agg((F.coalesce(F.sum("c"), F.lit(0)) + n_features).alias("nr"))
    nt = target_dist.agg((F.coalesce(F.sum("c"), F.lit(0)) + n_features).alias("nt"))
    joined = (
        buckets.join(raw_dist.withColumnRenamed("c", "cr"), "bucket", "left")
        .join(target_dist.withColumnRenamed("c", "ct"), "bucket", "left")
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nt))
    )
    num = (F.coalesce(F.col("ct"), F.lit(0)) + 1) * F.col("nr")
    den = (F.coalesce(F.col("cr"), F.lit(0)) + 1) * F.col("nt")
    return joined.select(
        "bucket",
        F.floor(F.lit(MU) * F.log(num.cast("double") / den.cast("double")))
        .cast("long")
        .alias("lam_mu"),
    )


def dsir_scores(
    docs: DataFrame,
    target_docs: DataFrame,
    n_features: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_ngrams: int = 2,
) -> DataFrame:
    """(doc_id, n_grams, score_mu): per-document importance log-weight in
    exact micro-units — sum over the doc's hashed n-grams of the bucket
    log ratio. raw distribution = `docs` itself (DSIR scores the corpus it
    selects from), target distribution = `target_docs`."""
    lam = dsir_log_ratio_table(
        bucket_distribution(docs, n_features, text_col, word_ngrams),
        bucket_distribution(target_docs, n_features, text_col, word_ngrams),
        n_features,
    )
    counts = hashed_bucket_counts(docs, n_features, id_col, text_col, word_ngrams)
    return (
        counts.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lam_mu")).alias("score_mu"),
        )
    )


def _gumbel_mu(id_col: Column, salt: str) -> Column:
    """Deterministic micro-unit Gumbel noise keyed on the document id:
    u = (h + 0.5)/1e5 with h an md5-derived integer in [0, 1e5), then
    floor(MU * -ln(-ln(u))) — the hash-u idiom every sampling operator in
    this repo uses (engine-portable, replayable)."""
    h = (
        F.conv(
            F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{salt}"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100000
    )
    u = (h.cast("double") + 0.5) / 100000.0
    return F.floor(F.lit(MU) * -F.log(-F.log(u))).cast("long")


def dsir_select(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_features: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_ngrams: int = 2,
    gumbel: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """Select k documents by Gumbel-top-k over the importance log-weights
    (the paper's resampling step: adding Gumbel(0,1) noise to log-weights
    and taking the top k draws a without-replacement sample proportional
    to the weights). gumbel=False degrades to deterministic top-k by
    score — the greedy variant. Returns (doc_id, n_grams, score_mu,
    key_mu) — key_mu = score_mu + Gumbel micro-units, the sort key.

    The plan ends in TakeOrderedAndProject: no global sort at any scale."""
    scored = dsir_scores(docs, target_docs, n_features, id_col, text_col, word_ngrams)
    noise = _gumbel_mu(F.col("doc_id"), salt) if gumbel else F.lit(0).cast("long")
    return (
        scored.withColumn("key_mu", (F.col("score_mu") + noise).cast("long"))
        .orderBy(F.desc("key_mu"), "doc_id")
        .limit(k)
    )


def _bigram_sql(words_list: str) -> str:
    """DuckDB bigram list from a filtered word list expression."""
    return (
        f"list_transform(range(1, len({words_list})), "
        f"i -> {words_list}[i] || ' ' || {words_list}[i + 1])"
    )


def dsir_oracle_sql(
    k: int,
    n_features: int = 4096,
    target_pred: str = "lang = 'en'",
    table: str = "documents",
    gumbel: bool = True,
    salt: str = "dsir",
    scores_only: bool = False,
    scores_where: str = "",
) -> str:
    """The DuckDB twin of dsir_scores / dsir_select over `table`, with the
    target corpus defined by `target_pred`. Every aggregate the hash sees
    is BIGINT-cast (DuckDB sum() widens to HUGEINT — the round-6 driver
    lesson)."""
    grams = f"""
ws AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS w
       FROM {table}),
toks AS (
  SELECT doc_id, unnest(w) AS tok FROM ws
  UNION ALL
  SELECT doc_id, unnest({_bigram_sql('w')}) AS tok FROM ws
),
b AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % {n_features} AS bucket
      FROM toks),
cnts AS (SELECT doc_id, bucket, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2),
rawd AS (SELECT bucket, sum(cnt)::BIGINT AS c FROM cnts GROUP BY 1),
tgtd AS (SELECT bucket, sum(cnt)::BIGINT AS c FROM cnts
         WHERE doc_id IN (SELECT doc_id FROM {table} WHERE {target_pred})
         GROUP BY 1),
tot AS (SELECT coalesce((SELECT sum(c) FROM rawd), 0)::BIGINT + {n_features} AS nr,
               coalesce((SELECT sum(c) FROM tgtd), 0)::BIGINT + {n_features} AS nt),
lam AS (
  SELECT g.range AS bucket,
         floor(1000000 * ln(((coalesce(t.c, 0) + 1) * tot.nr)::DOUBLE
                            / ((coalesce(r.c, 0) + 1) * tot.nt)))::BIGINT AS lam_mu
  FROM range({n_features}) g
  LEFT JOIN rawd r ON r.bucket = g.range
  LEFT JOIN tgtd t ON t.bucket = g.range
  CROSS JOIN tot
),
scored AS (
  SELECT c.doc_id, sum(c.cnt)::BIGINT AS n_grams,
         sum(c.cnt * l.lam_mu)::BIGINT AS score_mu
  FROM cnts c JOIN lam l USING (bucket) GROUP BY 1
)"""
    if scores_only:
        return (
            f"WITH {grams}\nSELECT doc_id, n_grams, score_mu FROM scored "
            f"{scores_where} ORDER BY doc_id"
        )
    noise = (
        "floor(1000000 * -ln(-ln("
        f"((('0x' || substr(md5(doc_id || ':{salt}'), 1, 15))::BIGINT % 100000)::DOUBLE + 0.5)"
        " / 100000.0)))::BIGINT"
        if gumbel
        else "0"
    )
    return f"""WITH {grams},
keyed AS (SELECT doc_id, n_grams, score_mu,
                 (score_mu + {noise})::BIGINT AS key_mu FROM scored)
SELECT doc_id, n_grams, score_mu, key_mu
FROM keyed ORDER BY key_mu DESC, doc_id LIMIT {k}"""
