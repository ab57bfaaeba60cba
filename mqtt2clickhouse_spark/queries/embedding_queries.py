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
