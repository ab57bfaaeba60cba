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


#: retrieval_ndcg: 8 query docs, depth 10, graded gains 2^rel - 1 at
#: exact-Jaccard relevance cuts, and the log2 position discounts
#: QUANTIZED to shared integer literals (round(1e6/log2(i+1))) so no
#: runtime libm call can diverge the engines.
_NDCG_NQ = 8
_NDCG_K = 10
_NDCG_W = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
_NDCG_CUTS = ((0.7, 7), (0.5, 3), (0.3, 1))  # (unrounded-j cut, gain)


def _duck_ndcg() -> str:
    from mqtt2clickhouse_spark.queries.dedup_queries import (
        _DUCK_SHINGLES,
        _duck_minhash_pairs,
        _duck_minhash_sig,
    )

    est = " + ".join(
        f"CAST(c.m{i} = q.m{i} AS BIGINT)" for i in range(8)
    )
    wvals = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W))
    return f"""
    WITH sig AS ({_duck_minhash_sig(8)}),
    shingles AS ({_DUCK_SHINGLES}),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              FROM shingles GROUP BY 1),
    cand AS ({_duck_minhash_pairs(8, 4, max_bucket=64)}),
    cver AS (
        SELECT c.id_a FROM cand c
        JOIN (SELECT p.id_a AS ia, p.id_b AS ib,
                     CAST(count(*) AS BIGINT) AS ni
              FROM cand p
              JOIN shingles sa ON sa.doc_id = p.id_a
              JOIN shingles sb ON sb.doc_id = p.id_b
                              AND sb.shingle = sa.shingle
              GROUP BY 1, 2) i
          ON i.ia = c.id_a AND i.ib = c.id_b
        JOIN sizes za ON za.doc_id = c.id_a
        JOIN sizes zb ON zb.doc_id = c.id_b
        WHERE i.ni / (za.n + zb.n - i.ni) >= {_NDCG_CUTS[2][0]}),
    qset AS (SELECT DISTINCT id_a AS qid FROM cver ORDER BY 1
             LIMIT {_NDCG_NQ}),
    inter AS (
        SELECT sq.doc_id AS qid, sc.doc_id AS cid,
               CAST(count(*) AS BIGINT) AS ni
        FROM shingles sq
        JOIN qset ON qset.qid = sq.doc_id
        JOIN shingles sc ON sc.shingle = sq.shingle
                        AND sc.doc_id <> sq.doc_id
        GROUP BY 1, 2),
    pairs AS (
        SELECT q.doc_id AS qid, c.doc_id AS cid,
               {est} AS est,
               coalesce(i.ni, 0)
                   / (zq.n + zc.n - coalesce(i.ni, 0)) AS j
        FROM sig q
        JOIN qset ON qset.qid = q.doc_id
        JOIN sig c ON c.doc_id <> q.doc_id
        LEFT JOIN inter i ON i.qid = q.doc_id AND i.cid = c.doc_id
        JOIN sizes zq ON zq.doc_id = q.doc_id
        JOIN sizes zc ON zc.doc_id = c.doc_id),
    graded AS (
        SELECT qid, cid, est,
               CASE WHEN j >= {_NDCG_CUTS[0][0]} THEN {_NDCG_CUTS[0][1]}
                    WHEN j >= {_NDCG_CUTS[1][0]} THEN {_NDCG_CUTS[1][1]}
                    WHEN j >= {_NDCG_CUTS[2][0]} THEN {_NDCG_CUTS[2][1]}
                    ELSE 0 END AS gain
        FROM pairs),
    ranked AS (
        SELECT qid, gain,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY est DESC, cid) AS rnk,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY gain DESC, cid) AS irnk
        FROM graded),
    w(pos, wgt) AS (VALUES {wvals}),
    s AS (
        SELECT r.qid,
               CAST(sum(CASE WHEN r.gain > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_relevant,
               CAST(sum(CASE WHEN wr.wgt IS NOT NULL
                             THEN r.gain * wr.wgt ELSE 0 END)
                    AS BIGINT) AS dcg,
               CAST(sum(CASE WHEN wi.wgt IS NOT NULL
                             THEN r.gain * wi.wgt ELSE 0 END)
                    AS BIGINT) AS idcg
        FROM ranked r
        LEFT JOIN w wr ON wr.pos = r.rnk
        LEFT JOIN w wi ON wi.pos = r.irnk
        GROUP BY 1)
    SELECT qid AS query_id, n_relevant, dcg, idcg,
           CASE WHEN idcg > 0
                THEN round(CAST(dcg AS DOUBLE) / idcg, 6) END AS ndcg
    FROM s
    """


@register(
    "retrieval_ndcg",
    oracle=_duck_ndcg(),
    description=f"Ranking-quality evaluation of the MinHash sketch: "
    f"graded nDCG@{_NDCG_K} of the 8-hash estimated-Jaccard ranking "
    "against EXACT-Jaccard relevance grades (j>=0.7/0.5/0.3 -> gains "
    "7/3/1) for 8 query docs — how well does the sketch ORDER "
    "near-dups, not just recall them (completes the sketch-audit "
    "family with a rank-quality metric; log2 discounts are shared "
    "integer literals, so the score is arithmetic-exact).  Queries "
    "self-select: the 8 smallest doc ids with a verified >=0.3 "
    "partner among the LSH candidates.  At sf0.01 the sketch scores "
    "a perfect 1.0 on every query — honestly unsurprising: the "
    "fixture's relevance is near-duplicate-or-nothing (j~0.95 or "
    "j<0.1, nothing graded between), so 8 hashes order it trivially; "
    "the metric earns its keep on corpora with a graded middle.",
)
def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass builds shingle sets AND signatures; the 8 query
    rows broadcast onto the candidate table (8xN pairs — query-count
    bounded, never quadratic), exact Jaccard comes from array_intersect
    on the collected sets, the two rankings are per-query windows over
    the pair table, and DCG/IDCG are exact integer sums (gain x
    quantized weight).  At 100 TB the exact-j grading swaps to the
    verified-pair subset; the sketch ranking side is already
    sketch-only."""
    from mqtt2clickhouse_spark.ops import dedup as dd

    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    sh = dd.shingle_store(docs, sf_dir)
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    sets = sets.localCheckpoint(eager=False)  # cand + query + verify
    cand = sets.join(sig, sets.id == sig.doc_id).select(
        F.col("id").alias("cid"),
        "sh",
        *[F.col(f"m{i}").alias(f"c{i}") for i in range(8)],
    )
    # self-selecting query set: the 8 smallest doc ids with a VERIFIED
    # >= 0.3-Jaccard partner among the LSH band candidates (the scale
    # path for "which docs even have near-dups"; the rare true dups
    # are banding-caught with probability ~1)
    lsh = dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)
    va = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    vb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    vint = F.size(F.array_intersect("sh_a", "sh_b"))
    vj = vint / (F.size("sh_a") + F.size("sh_b") - vint)
    qset = (
        lsh.join(va, "id_a")
        .join(vb, "id_b")
        .filter(vj >= _NDCG_CUTS[2][0])
        .select(F.col("id_a").alias("qid"))
        .distinct()
        .orderBy("qid")
        .limit(_NDCG_NQ)
    )
    q = (
        sets.join(sig, sets.id == sig.doc_id)
        .join(qset, sets.id == qset.qid)
        .select(
            "qid",
            F.col("sh").alias("qsh"),
            *[F.col(f"m{i}").alias(f"q{i}") for i in range(8)],
        )
    )
    est = sum(
        (F.col(f"c{i}") == F.col(f"q{i}")).cast("long") for i in range(8)
    )
    inter = F.size(F.array_intersect("sh", "qsh"))
    j = inter / (F.size("sh") + F.size("qsh") - inter)
    gain = (
        F.when(j >= _NDCG_CUTS[0][0], _NDCG_CUTS[0][1])
        .when(j >= _NDCG_CUTS[1][0], _NDCG_CUTS[1][1])
        .when(j >= _NDCG_CUTS[2][0], _NDCG_CUTS[2][1])
        .otherwise(0)
    )
    graded = (
        cand.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .select("qid", "cid", est.alias("est"), gain.alias("gain"))
    )
    wr = Window.partitionBy("qid").orderBy(F.col("est").desc(), "cid")
    wi = Window.partitionBy("qid").orderBy(F.col("gain").desc(), "cid")
    warr = F.array(*[F.lit(w) for w in _NDCG_W])
    ranked = graded.select(
        "qid",
        "gain",
        F.row_number().over(wr).alias("rnk"),
        F.row_number().over(wi).alias("irnk"),
    )
    wgt_r = F.when(
        F.col("rnk") <= _NDCG_K, F.element_at(warr, F.col("rnk"))
    ).otherwise(0)
    wgt_i = F.when(
        F.col("irnk") <= _NDCG_K, F.element_at(warr, F.col("irnk"))
    ).otherwise(0)
    s = ranked.groupBy(F.col("qid").alias("query_id")).agg(
        F.sum(F.when(F.col("gain") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_relevant"),
        F.sum(F.col("gain") * wgt_r).cast("long").alias("dcg"),
        F.sum(F.col("gain") * wgt_i).cast("long").alias("idcg"),
    )
    return s.select(
        "query_id",
        "n_relevant",
        "dcg",
        "idcg",
        F.when(
            F.col("idcg") > 0,
            F.round(F.col("dcg").cast("double") / F.col("idcg"), 6),
        ).alias("ndcg"),
    )


# -- Heaps' law vocabulary growth -----------------------------------------
#: V(T) ~ K * T^beta: vocabulary size vs corpus token count, fit in
#: log-log space over _HEAPS_DECILES prefix checkpoints of the doc_id
#: stream order.  Natural language sits near beta ~ 0.5; boilerplate /
#: duplicated corpora flatten (new text stops minting new words) —
#: the vocabulary-growth twin of zipf_fit's frequency diagnostic.
_HEAPS_DECILES = 10


@register(
    "heaps_law",
    oracle=f"""
    WITH tok AS ({{tok}}),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    firsts AS (
        SELECT token, min(doc_id) AS fd FROM tok GROUP BY 1),
    v_by_dec AS (
        SELECT (f.fd * {_HEAPS_DECILES}) // nd.n_docs AS dec,
               CAST(count(*) AS BIGINT) AS nv
        FROM firsts f, nd GROUP BY 1),
    t_by_dec AS (
        SELECT (tok.doc_id * {_HEAPS_DECILES}) // nd.n_docs AS dec,
               CAST(count(*) AS BIGINT) AS nt
        FROM tok, nd GROUP BY 1),
    cum AS (
        SELECT t.dec,
               sum(COALESCE(v.nv, 0)) OVER (ORDER BY t.dec) AS v_k,
               sum(t.nt) OVER (ORDER BY t.dec) AS t_k
        FROM t_by_dec t LEFT JOIN v_by_dec v ON v.dec = t.dec),
    xy AS (SELECT ln(CAST(t_k AS DOUBLE)) AS x, ln(CAST(v_k AS DOUBLE)) AS y
           FROM cum),
    fit AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM xy),
    sl AS (SELECT k, sx, sy,
                  (sxy - sx * sy / k) / (sxx - sx * sx / k) AS slope
           FROM fit)
    SELECT (SELECT CAST(max(v_k) AS BIGINT) FROM cum) AS n_vocab,
           (SELECT CAST(max(t_k) AS BIGINT) FROM cum) AS total_tokens,
           -- signed-zero fold (the graph_modularity r7 lesson): on a
           -- saturated-vocab corpus the true slope is a ~1e-17 float
           -- residue whose SIGN depends on DuckDB's parallel summation
           -- order, so round() emits -0.0 nondeterministically (~7% of
           -- runs at sf0.01, caught by the negzero sweep) while Spark
           -- always returns +0.0
           CASE WHEN round(slope, 4) = 0 THEN 0.0
                ELSE round(slope, 4) END AS heaps_beta,
           round(exp(sy / k - slope * sx / k), 2) AS heaps_k
    FROM sl
    """.format(tok=_DUCK_TOK),
    description=f"Heaps'-law vocabulary-growth fit: V(T) ~ K*T^beta over "
    f"{_HEAPS_DECILES} doc-stream prefix checkpoints (log-log OLS).  "
    "Natural text grows vocabulary at beta ~ 0.4-0.6; near-duplicate "
    "or templated corpora flatten toward 0 — the growth-curve "
    "diagnostic next to zipf_fit's frequency-slope one.  Honest "
    "fixture finding: the synthetic corpus draws from a ~31-word "
    "vocabulary that is fully minted inside the first decile, so it "
    "measures beta = 0.0 exactly — the flat curve this detector "
    "exists to flag.",
)
def heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two partial-aggregable passes over the token stream (first-
    occurrence per token, token count per decile) — each token row
    crosses the wire at most once per pass, and every later stage is
    decile-sized (constant 10 rows).  The prefix V/T
    checkpoints come from per-decile counts + a running sum over the
    10-row table (bounded window, never the corpus).  Integer `div`
    assigns deciles, so bucket edges are exact in both engines."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    dec_of = lambda c: F.expr(f"{c} * {_HEAPS_DECILES} div n_docs")
    firsts = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    v_by_dec = (
        firsts.join(F.broadcast(n_docs))
        .groupBy(dec_of("fd").alias("dec"))
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    t_by_dec = (
        tok.join(F.broadcast(n_docs))
        .groupBy(dec_of("doc_id").alias("dec"))
        .agg(F.count(F.lit(1)).cast("long").alias("nt"))
    )
    cum = (
        t_by_dec.join(v_by_dec, "dec", "left")
        .select(
            "dec",
            F.sum(F.coalesce(F.col("nv"), F.lit(0)))
            .over(Window.orderBy("dec"))
            .alias("v_k"),
            F.sum("nt").over(Window.orderBy("dec")).alias("t_k"),
        )
        # 10-row output, full-token-scan input, TWO consumers (fit +
        # totals): the textbook cheap-OUTPUT pin — without it the token
        # explode re-plans once per consumer (diamond rule in NOTES)
        .localCheckpoint(eager=False)
    )
    xy = cum.select(
        F.log(F.col("t_k").cast("double")).alias("x"),
        F.log(F.col("v_k").cast("double")).alias("y"),
    )
    fit = xy.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("k")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("k")
    )
    totals = cum.agg(
        F.max("v_k").cast("long").alias("n_vocab"),
        F.max("t_k").cast("long").alias("total_tokens"),
    )
    rb = F.round(beta, 4)
    return (
        F.broadcast(totals)
        .crossJoin(fit)
        .select(
            "n_vocab",
            "total_tokens",
            # mirror of the oracle's signed-zero fold (Spark's round
            # returns +0.0 today, but the contract lives on both sides)
            F.when(rb == 0, F.lit(0.0)).otherwise(rb).alias("heaps_beta"),
            F.round(
                F.exp(
                    F.col("sy") / F.col("k")
                    - beta * F.col("sx") / F.col("k")
                ),
                2,
            ).alias("heaps_k"),
        )
    )


#: phrase queries answered FROM the positional inverted index
_PHRASES = [("fast table",), ("value table",), ("spark window",)]


@register(
    "phrase_search_index",
    oracle="""
    WITH lst AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    tok AS (
        SELECT doc_id, unnest(l) AS term,
               CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
        FROM lst),
    phrases AS (
        SELECT * FROM (VALUES {vals}) p(phrase, t1, t2)),
    hits AS (
        SELECT p.phrase, a.doc_id, CAST(count(*) AS BIGINT) AS k
        FROM phrases p
        JOIN tok a ON a.term = p.t1
        JOIN tok b ON b.doc_id = a.doc_id AND b.term = p.t2
                  AND b.pos = a.pos + 1
        GROUP BY 1, 2)
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k) AS BIGINT) AS n_occurrences
    FROM hits GROUP BY 1 ORDER BY 1
    """.format(
        vals=", ".join(
            "('{p}', '{a}', '{b}')".format(
                p=p, a=p.split()[0], b=p.split()[1]
            )
            for (p,) in _PHRASES
        )
    ),
    description="Positional inverted-index phrase search: the corpus "
    "explodes once into (doc, position, term) postings, and each "
    "two-word phrase is answered by self-joining the two terms' "
    "posting lists on (same doc, adjacent positions) — the classic "
    "search-engine phrase-query plan (posting-list intersection with "
    "position offsets), reported as matched-doc and occurrence counts "
    "per phrase.",
)
def phrase_search_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE tokenize pass builds the postings (posexplode — map-side,
    no shuffle until the join), pinned because every phrase consumes
    both of its terms' slices.  The phrase join keys on (term-filtered
    doc, position) — at index scale each term's postings are the join
    input, not the corpus, which is exactly why engines keep postings
    and not raw text; a production layout would bucket postings by
    term (see bucketed_join) to make this join shuffle-free.  Counts
    partial-aggregate; phrases ride a broadcast literal table."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "term"),
    ).select(
        "doc_id", "term", (F.col("pos0") + 1).cast("long").alias("pos")
    ).localCheckpoint(eager=False)
    phrases = [(p, p.split()[0], p.split()[1]) for (p,) in _PHRASES]
    pdf = F.array(
        *[
            F.struct(
                F.lit(p).alias("phrase"),
                F.lit(a).alias("t1"),
                F.lit(b).alias("t2"),
            )
            for p, a, b in phrases
        ]
    )
    pt = (
        docs.sparkSession.range(1)
        .select(F.explode(pdf).alias("z"))
        .select("z.*")
    )
    a = F.broadcast(pt).join(tok, tok["term"] == F.col("t1")).select(
        "phrase", "t2", "doc_id", F.col("pos").alias("pa")
    )
    b = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("term").alias("term_b"),
        F.col("pos").alias("pb"),
    )
    hits = (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_b"))
            & (F.col("term_b") == F.col("t2"))
            & (F.col("pb") == F.col("pa") + 1),
        )
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    return (
        hits.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("k").cast("long").alias("n_occurrences"),
        )
        .orderBy("phrase")
    )
