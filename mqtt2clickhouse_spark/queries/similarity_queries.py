"""Similarity-search query surface over the ``embeddings`` fixture
(vec_id, embedding float[64], label).

``similarity_topk`` is the exact baseline; ``similarity_ann_ivf`` is the
approximate scale path (IVF partition pruning).  Both are fully
deterministic (similarity rounded before ranking, ties broken by id) so
they hash-match a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import similarity as sim
from mqtt2clickhouse_spark.queries.base import register, t

_N_QUERIES = 8


@register(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id <> q.query_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM s)
    SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
    """,
    description="Exact brute-force cosine top-5 for 8 query vectors (ANN baseline)",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return sim.brute_force_topk(emb, queries, k=5)


@register(
    "similarity_ann_ivf",
    oracle=f"""
    WITH pivots AS (
        SELECT vec_id AS pivot_id, CAST(embedding AS DOUBLE[]) AS pv
        FROM embeddings ORDER BY vec_id LIMIT 16),
    cells AS (
        SELECT vid, cv, pivot_id AS cell FROM (
            SELECT e.vec_id AS vid, CAST(e.embedding AS DOUBLE[]) AS cv, p.pivot_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6) DESC,
                                p.pivot_id) AS prank
            FROM embeddings e CROSS JOIN pivots p) s
        WHERE prank = 1),
    qcells AS (
        SELECT query_id, qv, pivot_id AS cell FROM (
            SELECT q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv, p.pivot_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), p.pv), 6) DESC,
                                p.pivot_id) AS prank
            FROM embeddings q CROSS JOIN pivots p
            WHERE q.vec_id < {_N_QUERIES}) s
        WHERE prank <= 4),
    scored AS (
        SELECT qc.query_id, c.vid AS neighbor_id,
               round(list_cosine_similarity(qc.qv, c.cv), 4) AS sim
        FROM qcells qc JOIN cells c ON qc.cell = c.cell
        WHERE qc.query_id <> c.vid),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 5
    """,
    description="IVF-style ANN: 16 deterministic pivot cells, probe 4, top-5 within probed cells",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return sim.ivf_topk(emb, queries, n_pivots=16, nprobe=4, k=5)



#: mmr_diversify knobs: candidate pool, picks, relevance weight
_MMR_POOL = 24
_MMR_K = 8
_MMR_LAMBDA = 0.7


def _duck_mmr_round(i: int) -> str:
    """One MMR selection round: max rounded cosine to the selected set,
    score = lambda*rel - (1-lambda)*maxsim, argmax with id ties."""
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    return f"""
    m{i} AS MATERIALIZED (
        SELECT c.vec_id,
               max(round(list_cosine_similarity(c.v, s.v), 6)) AS maxsim
        FROM cand c CROSS JOIN sel{i - 1} s
        GROUP BY c.vec_id),
    s{i} AS MATERIALIZED (
        SELECT c.vec_id, c.v, c.rel, {i} AS pick,
               round({lam} * c.rel - {mu} * m.maxsim, 6) AS score
        FROM cand c JOIN m{i} m USING (vec_id)
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        ORDER BY round({lam} * c.rel - {mu} * m.maxsim, 6) DESC, c.vec_id
        LIMIT 1),
    sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})"""


_DUCK_MMR = (
    f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
                   AS rel
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id LIMIT {_MMR_POOL}),
    sel1 AS MATERIALIZED (
        SELECT vec_id, v, rel, 1 AS pick,
               round({_MMR_LAMBDA} * rel, 6) AS score
        FROM cand
        ORDER BY round({_MMR_LAMBDA} * rel, 6) DESC, vec_id LIMIT 1),"""
    + ",".join(_duck_mmr_round(i) for i in range(2, _MMR_K + 1))
    + f"""
    SELECT pick, vec_id, rel, score FROM sel{_MMR_K}
    """
)


@register(
    "mmr_diversify",
    oracle=_DUCK_MMR,
    description=f"Maximal-marginal-relevance diversified selection: from "
    f"the top-{_MMR_POOL} candidates by cosine to the query vector, pick "
    f"{_MMR_K} items greedily by lambda*relevance - (1-lambda)*max-"
    "similarity-to-already-picked (lambda=0.7) — the diverse-subset "
    "curation primitive, fully oracle-replayed round by round.",
)
def mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (Carbonell & Goldstein 1998) as unrolled DataFrame rounds:
    the candidate pool is ONE distributed top-k scan (everything after
    that runs on <= pool-size rows, so round cost is independent of
    corpus size); each round cross-joins candidates against the tiny
    pinned selected set (broadcast), takes the max rounded pairwise
    cosine, scores, and picks the argmax with a 1-row
    TakeOrderedAndProject.  All similarities and scores are rounded
    before every comparison and ties break on vec_id, so the greedy
    trajectory — and therefore the whole result — replays exactly in
    the oracle's chained CTEs (the semantic_dedup playbook).  At 100 TB
    scale: the pool scan is the only corpus-sized stage; pool and k stay
    user-bounded constants."""
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.round(sim.cosine(F.col("v"), F.col("qv")), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
        .localCheckpoint(eager=False)  # consumed by every round
    )
    sel = (
        cand.select(
            "vec_id",
            "v",
            "rel",
            F.lit(1).alias("pick"),
            F.round(F.lit(lam) * F.col("rel"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(1)
        .localCheckpoint(eager=False)
    )
    for i in range(2, _MMR_K + 1):
        maxsim = (
            cand.crossJoin(F.broadcast(sel.select(F.col("v").alias("sv"))))
            .select(
                "vec_id",
                F.round(sim.cosine(F.col("v"), F.col("sv")), 6).alias("s"),
            )
            .groupBy("vec_id")
            .agg(F.max("s").alias("maxsim"))
        )
        pick = (
            cand.join(maxsim, "vec_id")
            .join(F.broadcast(sel.select("vec_id")), "vec_id", "left_anti")
            .select(
                "vec_id",
                "v",
                "rel",
                F.lit(i).alias("pick"),
                F.round(
                    F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("maxsim"), 6
                ).alias("score"),
            )
            .orderBy(F.desc("score"), "vec_id")
            .limit(1)
        )
        sel = sel.unionAll(pick).localCheckpoint(eager=False)  # feeds 3 ops
    return sel.select("pick", "vec_id", "rel", "score")
