"""Embedding feature-engineering surface: per-dimension standardization
(z-score normalization) — the preprocessing step in front of most
similarity / clustering pipelines (whitening-lite).

The corpus statistics are a single posexplode + groupBy(pos): 64 groups
regardless of corpus size, partial-aggregated map-side, so the stats
shuffle is O(partitions × dims).  The normalization pass broadcasts the
64-row stats table back — no second corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.base import register, t


@register(
    "embedding_normalize",
    oracle="""
    WITH flat AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings),
    stats AS (
        SELECT pos, avg(v) AS mu, stddev_samp(v) AS sd
        FROM flat GROUP BY 1)
    SELECT f.vec_id, f.pos, round((f.v - s.mu) / s.sd, 3) AS z
    FROM flat f JOIN stats s ON f.pos = s.pos
    WHERE s.sd > 1e-12
    """,
    description="Per-dimension z-score standardization of the embedding "
    "corpus, flattened to (vec_id, pos, z).",
)
def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats pass: posexplode → groupBy(pos) — exactly `dims` groups, so
    partial aggregation collapses each partition to ≤ dims rows before
    the shuffle.  Apply pass: broadcast-join the dims-row stats table
    onto the exploded corpus — the big side never shuffles.  Rounded to
    3 decimals so cross-engine float summation order can't flip the
    driver's value hash.
    """
    emb = t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "v")
    stats = flat.groupBy("pos").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    return (
        flat.join(F.broadcast(stats.filter(F.col("sd") > 1e-12)), "pos")
        .select(
            "vec_id", "pos", F.round((F.col("v") - F.col("mu")) / F.col("sd"), 3).alias("z")
        )
    )


@register(
    "semantic_dedup",
    oracle="""
    WITH pivots AS (
        SELECT vec_id AS pivot_id, CAST(embedding AS DOUBLE[]) AS pv
        FROM embeddings ORDER BY vec_id LIMIT 16),
    cells AS (
        SELECT vid, cv, pivot_id AS cell FROM (
            SELECT e.vec_id AS vid, CAST(e.embedding AS DOUBLE[]) AS cv,
                   p.pivot_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]), p.pv), 6) DESC,
                                p.pivot_id) AS prank
            FROM embeddings e CROSS JOIN pivots p) s
        WHERE prank = 1),
    dups AS (
        SELECT DISTINCT b.vid
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vid < b.vid
         AND round(list_cosine_similarity(a.cv, b.cv), 4) >= 0.45)
    SELECT c.vid AS vec_id, c.cell, (d.vid IS NULL) AS keep
    FROM cells c LEFT JOIN dups d ON c.vid = d.vid
    """,
    description="SemDeDup-style semantic dedup: IVF cell assignment "
    "bounds the pairwise cosine check to within-cluster pairs; a vector "
    "is dropped when an earlier (lower-id) cell-mate is ≥ 0.45 cosine.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup recipe (Abbas et al. 2023): cluster first, then
    compare only within clusters — the cluster granularity bounds the
    quadratic pair term, which is what makes embedding dedup feasible at
    100 TB (vs the corpus-wide all-pairs of ``dedup_embedding``).  Cell
    assignment is a broadcast join (corpus never shuffles for it); the
    within-cell self-join shuffles once on the cell id.  Deterministic
    keep rule (lowest id in each near-dup neighborhood survives) instead
    of kmeans-random representatives, so the result is oracle-checkable.
    Production upgrade: kmeans_pivots cells + a per-cell size cap, same
    shape as the LSH max_bucket guard.

    The within-cell compare is ONE numpy GEMM per cell
    (``within_cell_dups``), not a row-level self-join — measured 4.4s →
    sub-second at sf0.1 vs the interpreted-HOF pairwise version.
    """
    from mqtt2clickhouse_spark.ops import similarity as sim

    emb = t(spark, sf_dir, "embeddings")
    pivots = emb.orderBy("vec_id").limit(16)
    cells = sim.assign_cells(emb, pivots)
    return sim.within_cell_dups(cells, threshold=0.45).select(
        F.col("vid").alias("vec_id"), "cell", "keep"
    )
