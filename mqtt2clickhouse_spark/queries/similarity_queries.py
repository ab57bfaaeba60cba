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

