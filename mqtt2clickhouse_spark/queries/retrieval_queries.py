"""Lexical-retrieval surface over the ``documents`` fixture: sparse
TF-IDF document similarity, BM25 ranking, and vocabulary Zipf statistics.

These complement the dense-embedding similarity ops (ops/similarity.py)
with the SPARSE modality a training-data pipeline also needs: lexical
near-dup scoring, query-document retrieval for decontamination /
eval-set mining, and corpus-health vocabulary diagnostics.

Oracle discipline (same as every module): md5-free pure arithmetic,
round before any ordering or threshold, threshold on the UNROUNDED
value, CAST counts to BIGINT, alias identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out

_DUCK_TOK = """
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                      x -> x <> '')) AS token
    FROM documents
"""

#: document-frequency band for the tfidf_cosine pair join: df >= 2 makes
#: a term pair-generating at all; df <= cap bounds the quadratic blowup
#: per term (the same hot-key discipline as dedup_jaccard's max_df).
_COS_MAX_DF = 25
_COS_THRESHOLD = 0.2


@register(
    "tfidf_cosine",
    oracle=f"""
    WITH tok AS ({_DUCK_TOK}),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS w
        FROM tf JOIN df USING (token) CROSS JOIN n
        WHERE df.df BETWEEN 2 AND {_COS_MAX_DF}),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
    dot AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT d.id_a, d.id_b,
           round(d.dot / (na.nrm * nb.nrm), 4) AS cosine
    FROM dot d
    JOIN nrm na ON na.doc_id = d.id_a
    JOIN nrm nb ON nb.doc_id = d.id_b
    WHERE d.dot / (na.nrm * nb.nrm) >= {_COS_THRESHOLD}
    """,
    description=f"Sparse TF-IDF cosine pairs (idf=ln(N/df), terms with "
    f"2 <= df <= {_COS_MAX_DF}, threshold {_COS_THRESHOLD}) — lexical "
    "near-dup scoring on the inverted index, the sparse twin of "
    "dedup_embedding's dense cosine.",
)
def tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index self-join: weights partition by TERM, the self-join
    and the dot-product aggregation reuse that one hash partitioning
    (same load-bearing-exchange shape NOTES documents for jaccard), and
    the df band caps the per-term pair count — the quadratic term is
    bounded by max_df² per term, never corpus².  The df table is NOT
    broadcast (vocabulary is corpus-sized at 100 TB); norms are one
    partial-aggregable shuffle on doc_id."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(df.filter(F.col("df").between(2, _COS_MAX_DF)), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias(
                "w"
            ),
        )
    )
    w = w.localCheckpoint(eager=False)  # feeds norms AND both join sides
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col("doc_id").alias("id_a"), "token", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "token", F.col("w").alias("wb"))
    dot = (
        a.join(b, ["token"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dot.join(nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .filter(cos >= _COS_THRESHOLD)
        .select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
    )


#: BM25 shape parameters (the standard Robertson defaults) and the
#: deterministic query: the token set of doc 0.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS ({_DUCK_TOK}),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     avg(CAST(dl AS DOUBLE)) AS avgdl
              FROM dl),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT token FROM tok WHERE doc_id = 0),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / s.avgdl))) AS score
        FROM tf
        JOIN q USING (token)
        JOIN df USING (token)
        JOIN dl USING (doc_id)
        CROSS JOIN stats s
        WHERE tf.doc_id <> 0
        GROUP BY tf.doc_id)
    SELECT doc_id, round(score, 4) AS bm25
    FROM scored
    ORDER BY round(score, 4) DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
    description=f"BM25 retrieval (k1={_BM25_K1}, b={_BM25_B}, Lucene-style "
    "idf): score every document against the token set of doc 0, top-20 — "
    "the ranked-retrieval op behind eval-set mining and targeted "
    "decontamination.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One token explode feeds tf, doc-length, df, and the query terms
    (localCheckpoint-pinned diamond).  The query term set broadcasts —
    genuinely tiny (one document's vocabulary; in production, the query)
    — while tf and df stay partitioned by token for the scoring join;
    the final top-k plans as TakeOrderedAndProject (no global sort)."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)  # feeds dl/df/q AND the scoring join
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    q = tf.filter(F.col("doc_id") == 0).select("token")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.filter(F.col("doc_id") != 0)
        .join(F.broadcast(q), "token")
        .join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_part).alias("score"))
        .select("doc_id", F.round("score", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


_ZIPF_TOPK = 100


@register(
    "zipf_fit",
    oracle=f"""
    WITH tok AS ({_DUCK_TOK}),
    cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
    top AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
        FROM cnt ORDER BY n DESC, token LIMIT {_ZIPF_TOPK}),
    xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
           FROM top),
    fit AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM xy)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cnt) AS n_vocab,
           (SELECT CAST(sum(n) AS BIGINT) FROM cnt) AS total_tokens,
           round((sxy - sx * sy / k) / (sxx - sx * sx / k), 4) AS zipf_slope
    FROM fit
    """,
    description=f"Vocabulary Zipf diagnostic: OLS slope of ln(freq) vs "
    f"ln(rank) over the top-{_ZIPF_TOPK} terms (a healthy natural-language "
    "corpus fits ~-1; synthetic/boilerplate corpora deviate) plus vocab "
    "size and token total.",
)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts are one partial-aggregable shuffle; the top-100 is a
    TakeOrderedAndProject (never a global sort over the vocabulary); the
    regression is a single-row aggregate over 100 values.  The global
    row_number window runs on 100 rows, not the vocab."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token"),
    )
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    cnt = cnt.localCheckpoint(eager=False)  # feeds totals AND the top-k
    totals = cnt.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("n").cast("long").alias("total_tokens"),
    )
    top = (
        cnt.orderBy(F.desc("n"), "token")
        .limit(_ZIPF_TOPK)
        .select(
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), "token"))
            .alias("rank"),
        )
    )
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    fit = xy.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("k")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("k")
    )
    return (
        F.broadcast(totals)
        .crossJoin(fit)
        .select("n_vocab", "total_tokens", F.round(slope, 4).alias("zipf_slope"))
    )


#: RRF fusion geometry: the standard k=60 damping, a 50-deep candidate
#: pool from each ranker, 20 fused results out.
_RRF_K = 60
_RRF_POOL = 50
_RRF_TOPK = 20


@register(
    "rrf_fusion",
    oracle=f"""
    WITH tok AS ({_DUCK_TOK}),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     avg(CAST(dl AS DOUBLE)) AS avgdl
              FROM dl),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT token, tf AS tfq FROM tf WHERE doc_id = 0),
    bm AS (
        SELECT tf.doc_id,
               round(sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * ({_BM25_K1} + 1.0)
                   / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * dl.dl / s.avgdl))), 4) AS score
        FROM tf JOIN q USING (token) JOIN df USING (token)
        JOIN dl USING (doc_id) CROSS JOIN stats s
        WHERE tf.doc_id <> 0 GROUP BY tf.doc_id),
    bm_pool AS (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
                   AS rank_bm25
        FROM (SELECT * FROM bm ORDER BY score DESC, doc_id
              LIMIT {_RRF_POOL})),
    nd AS (SELECT doc_id, sqrt(sum(CAST(tf * tf AS DOUBLE))) AS nrm
           FROM tf GROUP BY 1),
    nq AS (SELECT sqrt(sum(CAST(tfq * tfq AS DOUBLE))) AS nrm FROM q),
    cs AS (
        SELECT tf.doc_id,
               round(sum(CAST(tf.tf * q.tfq AS DOUBLE))
                     / (any_value(nd.nrm) * any_value(nq.nrm)), 4) AS score
        FROM tf JOIN q USING (token)
        JOIN nd USING (doc_id) CROSS JOIN nq
        WHERE tf.doc_id <> 0 GROUP BY tf.doc_id),
    cs_pool AS (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
                   AS rank_cos
        FROM (SELECT * FROM cs ORDER BY score DESC, doc_id
              LIMIT {_RRF_POOL})),
    fused AS (
        SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
               CAST(b.rank_bm25 AS BIGINT) AS rank_bm25,
               CAST(c.rank_cos AS BIGINT) AS rank_cos,
               round(coalesce(1.0 / ({_RRF_K} + b.rank_bm25), 0)
                     + coalesce(1.0 / ({_RRF_K} + c.rank_cos), 0), 6)
                   AS rrf
        FROM bm_pool b FULL OUTER JOIN cs_pool c USING (doc_id))
    SELECT doc_id, rank_bm25, rank_cos, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
    """,
    description=f"Reciprocal-rank fusion (k={_RRF_K}) of two retrieval "
    f"rankers — BM25 and raw term-frequency cosine — against the token "
    f"set of doc 0: each ranker contributes a {_RRF_POOL}-deep pool, "
    f"fused by Σ 1/(k+rank), top-{_RRF_TOPK} out; the standard hybrid-"
    "search merge step every RAG/retrieval stack runs between its "
    "lexical and second-stage rankers.",
)
def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking without a global sort: each ranker's pool is a
    TakeOrderedAndProject top-{pool} (distributed heap selection), and
    the row_number window then runs over {pool} rows — a bounded
    constant, not the corpus, so the single-partition window is as
    cheap as the driver-side offsets tables elsewhere.  Both rankers
    share ONE token explode and ONE tf aggregate (localCheckpoint-
    pinned diamond, the bm25_topk pattern); scores are rounded BEFORE
    ranking with doc_id tiebreak so pool membership and rank are
    engine-independent, and the fused score is a 2-term sum of exact
    reciprocals."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)  # feeds dl/df/q/norms + both scorers
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    q = tf.filter(F.col("doc_id") == 0).select(
        "token", F.col("tf").alias("tfq")
    )

    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    bm = (
        tf.filter(F.col("doc_id") != 0)
        .join(F.broadcast(q), "token")
        .join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tf_part), 4).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_POOL)
    )
    rank_w = Window.orderBy(F.desc("score"), "doc_id")  # bounded: pool rows
    bm_pool = bm.select("doc_id", F.row_number().over(rank_w).alias("rank_bm25"))

    nd = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum((F.col("tf") * F.col("tf")).cast("double"))).alias("nrm")
    )
    nq = q.agg(
        F.sqrt(F.sum((F.col("tfq") * F.col("tfq")).cast("double"))).alias("qnrm")
    )
    cs = (
        tf.filter(F.col("doc_id") != 0)
        .join(F.broadcast(q), "token")
        .join(nd, "doc_id")
        .crossJoin(F.broadcast(nq))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum((F.col("tf") * F.col("tfq")).cast("double"))
                / (F.first("nrm") * F.first("qnrm")),
                4,
            ).alias("score")
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_POOL)
    )
    cs_pool = cs.select("doc_id", F.row_number().over(rank_w).alias("rank_cos"))

    fused = bm_pool.join(cs_pool, "doc_id", "full_outer").select(
        "doc_id",
        F.col("rank_bm25").cast("long").alias("rank_bm25"),
        F.col("rank_cos").cast("long").alias("rank_cos"),
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rank_cos")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(_RRF_TOPK)
