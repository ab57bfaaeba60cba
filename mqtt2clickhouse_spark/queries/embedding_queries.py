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
    SELECT f.vec_id, f.pos,
           -- fold -0.0 to 0.0: DuckDB round() preserves the sign bit,
           -- Spark does not, and the value hash is byte-level
           CASE WHEN round((f.v - s.mu) / s.sd, 3) = 0 THEN 0.0
                ELSE round((f.v - s.mu) / s.sd, 3) END AS z
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


#: semantic_dedup knobs: k-means cells, Lloyd rounds, per-cell cap
_SEM_K = 16
_SEM_ITERS = 2
_SEM_MAX_CELL = 32
_SEM_THRESHOLD = 0.45


def _duck_lloyd_round(prev_p: str, i: int) -> str:
    """One Lloyd round as CTEs: assign to argmax rounded cosine (ties →
    lowest pivot id), recompute per-dimension means, empty cells keep
    the previous pivot — exactly ops.similarity.kmeans_pivots."""
    return f"""
    a{i} AS (
        SELECT vid, cell, cv FROM (
            SELECT e.vec_id AS vid, CAST(e.embedding AS DOUBLE[]) AS cv,
                   p.pivot_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]), p.pv), 6) DESC,
                                p.pivot_id) AS rn
            FROM embeddings e CROSS JOIN {prev_p} p) s
        WHERE rn = 1),
    m{i} AS (
        SELECT cell, list(mv ORDER BY pos) AS pv FROM (
            SELECT cell, pos, avg(v) AS mv FROM (
                SELECT cell, unnest(range(1, len(cv) + 1)) AS pos,
                       unnest(cv) AS v
                FROM a{i}) f
            GROUP BY 1, 2) g
        GROUP BY 1),
    p{i} AS (
        SELECT p.pivot_id, coalesce(m.pv, p.pv) AS pv
        FROM {prev_p} p LEFT JOIN m{i} m ON m.cell = p.pivot_id)"""


_DUCK_SEMANTIC = (
    f"""
    WITH p0 AS (
        SELECT vec_id AS pivot_id, CAST(embedding AS DOUBLE[]) AS pv
        FROM embeddings ORDER BY vec_id LIMIT {_SEM_K}),"""
    + ",".join(_duck_lloyd_round(f"p{i - 1}", i) for i in range(1, _SEM_ITERS + 1))
    + f""",
    cells AS (
        SELECT vid, cv, cell,
               row_number() OVER (PARTITION BY cell ORDER BY vid) AS crank
        FROM (
            SELECT e.vec_id AS vid, CAST(e.embedding AS DOUBLE[]) AS cv,
                   p.pivot_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]), p.pv), 6) DESC,
                                p.pivot_id) AS rn
            FROM embeddings e CROSS JOIN p{_SEM_ITERS} p) s
        WHERE rn = 1),
    dups AS (
        SELECT DISTINCT b.vid
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vid < b.vid
         AND a.crank <= {_SEM_MAX_CELL} AND b.crank <= {_SEM_MAX_CELL}
         AND round(list_cosine_similarity(a.cv, b.cv), 4) >= {_SEM_THRESHOLD})
    SELECT c.vid AS vec_id, c.cell, (d.vid IS NULL) AS keep
    FROM cells c LEFT JOIN dups d ON c.vid = d.vid
    """
)


@register(
    "semantic_dedup",
    oracle=_DUCK_SEMANTIC,
    description=f"SemDeDup semantic dedup on k-means cells ({_SEM_K} "
    f"pivots, {_SEM_ITERS} deterministic Lloyd rounds) with a per-cell "
    f"participation cap of {_SEM_MAX_CELL} (the LSH max_bucket analogue); "
    f"a vector is dropped when an earlier cell-mate is ≥ {_SEM_THRESHOLD} "
    "cosine.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup recipe (Abbas et al. 2023) at production shape:
    k-means clustering first (``kmeans_pivots`` — deterministic Lloyd,
    k×d centroid state on the driver, one mapInPandas GEMM pass per
    round, zero shuffles), then pairwise cosine only within cells, with
    a per-cell participation cap so one degenerate cluster can't go
    quadratic (``within_cell_dups(max_cell=...)``).  Cell assignment is
    a broadcast join (the corpus never shuffles for it); the within-cell
    compare shuffles once on the cell id and runs ONE numpy GEMM per
    cell.  Deterministic keep rule (lowest id in each near-dup
    neighborhood survives) and fixed init/rounds make the whole
    pipeline — including both Lloyd rounds — replayable as DuckDB CTEs.
    """
    from mqtt2clickhouse_spark.ops import similarity as sim

    emb = t(spark, sf_dir, "embeddings")
    pivots = sim.kmeans_pivots(emb, k=_SEM_K, iters=_SEM_ITERS).select(
        F.col("pivot_id").alias("vec_id"), F.col("pv").alias("embedding")
    )
    cells = sim.assign_cells(emb, pivots)
    return sim.within_cell_dups(
        cells, threshold=_SEM_THRESHOLD, max_cell=_SEM_MAX_CELL
    ).select(F.col("vid").alias("vec_id"), "cell", "keep")


@register(
    "embedding_covariance",
    oracle="""
    WITH flat AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings)
    SELECT CAST(a.pos AS BIGINT) AS i, CAST(b.pos AS BIGINT) AS j,
           -- fold -0.0 to 0.0: DuckDB round() preserves the sign bit,
           -- Spark does not, and the value hash is byte-level
           CASE WHEN round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 4) = 0
                THEN 0.0
                ELSE round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 4) END AS cov
    FROM flat a JOIN flat b USING (vec_id)
    WHERE b.pos >= a.pos
    GROUP BY 1, 2
    """,
    description="Upper-triangle covariance matrix of the embedding corpus "
    "(d x d population covariance) — the statistic PCA/whitening/ZCA "
    "starts from, computed as one X'X GEMM pass with d^2-bounded "
    "partials.",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-correct moment computation (same shape MLlib's
    RowMatrix.computeCovariance uses): ONE mapInPandas pass emits per-
    partition partials — count, per-dim sums, and the d×d product matrix
    from a single numpy GEMM — so the shuffle carries at most
    n_partitions × d(d+1)/2 rows regardless of corpus size, and nothing
    row-shaped survives the map side.  The alternative (posexplode +
    self-join on vec_id) shuffles corpus×d² rows — 64× the corpus — and
    is exactly what this plan avoids at 100 TB.  Final aggregation sums
    the partials and closes the E[xy] − E[x]E[y] form, rounded before
    output."""
    import numpy as np
    import pandas as pd

    emb = t(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("cv")
    )

    def partials(batches):
        n = 0
        s = None
        p = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            p = g if p is None else p + g
        if n == 0:
            return
        d = len(s)
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu + 1,
                "j": ju + 1,
                "n": np.full(len(iu), n, dtype=np.int64),
                "sx": s[iu],
                "sy": s[ju],
                "sxy": p[iu, ju],
            }
        )

    part = emb.mapInPandas(
        partials, schema="i long, j long, n long, sx double, sy double, sxy double"
    )
    agg = part.groupBy("i", "j").agg(
        F.sum("n").alias("nn"),
        F.sum("sx").alias("tx"),
        F.sum("sy").alias("ty"),
        F.sum("sxy").alias("txy"),
    )
    cov = F.col("txy") / F.col("nn") - (F.col("tx") / F.col("nn")) * (
        F.col("ty") / F.col("nn")
    )
    return agg.select("i", "j", F.round(cov, 4).alias("cov"))
