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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import similarity as sim_ops
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
    # shared trained-quantizer materialization (k/iters identical to
    # similarity_ann_kmeans & kmeans_silhouette — one training serves all)
    pivots = sim.kmeans_pivots_cached(emb, sf_dir, k=_SEM_K, iters=_SEM_ITERS).select(
        F.col("pivot_id").alias("vec_id"), F.col("pv").alias("embedding")
    )
    cells = sim.assign_cells(emb, pivots)
    # raw (vid, cv) for the wide GEMM side: the assignment subtree
    # (broadcast pivot join + argmax agg) then evaluates once, in the
    # narrow ranking — the wide side pays only the corpus scan
    vectors = emb.select(
        F.col("vec_id").alias("vid"), sim.as_double(F.col("embedding")).alias("cv")
    )
    return sim.within_cell_dups(
        cells, threshold=_SEM_THRESHOLD, max_cell=_SEM_MAX_CELL, vectors=vectors
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
    output.  (Shared kernel: ops.similarity.covariance_upper, also the
    input of embedding_pca_power.)"""
    from mqtt2clickhouse_spark.ops.similarity import covariance_upper

    emb = t(spark, sf_dir, "embeddings")
    cov = covariance_upper(emb)
    return cov.select("i", "j", F.round(F.col("cov"), 4).alias("cov"))


#: embedding_pca_power: unrolled power-iteration rounds and the
#: rounding applied to the covariance input and each normalized iterate
#: (rounding the INPUTS keeps the cross-engine arithmetic on identical
#: doubles, so only the final sums carry float-order noise)
_PCA_ROUNDS = 3
_PCA_COV_DP = 6
_PCA_V_DP = 6


def _duck_pca_round(prev_v: str, i: int) -> str:
    """One power-iteration round as CTEs: w = C·v, then v = w/‖w‖
    rounded — exactly the Spark loop below."""
    return f"""
    w{i} AS (
        SELECT f.i AS pos, sum(f.cov * v.v) AS w
        FROM cfull f JOIN {prev_v} v ON f.j = v.pos
        GROUP BY 1),
    v{i} AS (
        SELECT pos,
               round(w / (SELECT sqrt(sum(w * w)) FROM w{i}), {_PCA_V_DP}) AS v
        FROM w{i})"""


_DUCK_PCA = (
    f"""
    WITH flat AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings),
    covu AS (
        SELECT CAST(a.pos AS BIGINT) AS i, CAST(b.pos AS BIGINT) AS j,
               round(avg(a.v * b.v) - avg(a.v) * avg(b.v), {_PCA_COV_DP}) AS cov
        FROM flat a JOIN flat b USING (vec_id)
        WHERE b.pos >= a.pos
        GROUP BY 1, 2),
    cfull AS (
        SELECT i, j, cov FROM covu
        UNION ALL
        SELECT j AS i, i AS j, cov FROM covu WHERE i < j),
    v0 AS (SELECT DISTINCT i AS pos, 1.0 AS v FROM cfull),"""
    + ",".join(_duck_pca_round(f"v{i - 1}", i) for i in range(1, _PCA_ROUNDS + 1))
    + f""",
    lamw AS (
        SELECT f.i AS pos, sum(f.cov * v.v) AS w
        FROM cfull f JOIN v{_PCA_ROUNDS} v ON f.j = v.pos
        GROUP BY 1),
    lam AS (
        SELECT round(sum(l.w * v.v), 6) AS eigenvalue
        FROM lamw l JOIN v{_PCA_ROUNDS} v ON l.pos = v.pos)
    SELECT v.pos, v.v AS loading, (SELECT eigenvalue FROM lam) AS eigenvalue
    FROM v{_PCA_ROUNDS} v
    """
)


@register(
    "embedding_pca_power",
    oracle=_DUCK_PCA,
    description=f"Top principal component by power iteration ({_PCA_ROUNDS} "
    "unrolled rounds on the covariance matrix from the X'X GEMM pass) with "
    "the Rayleigh-quotient eigenvalue — the PCA/whitening entry point, "
    "fully oracle-replayed because the rounds are deterministic and the "
    "iteration inputs are rounded to fixed precision.",
)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative linear algebra, Spark-shaped: the corpus is touched
    EXACTLY ONCE (the d²-bounded covariance GEMM of
    ``ops.similarity.covariance_upper``); every power-iteration round
    then runs on the d×d matrix — 4096 rows for d=64 — as one join +
    one d-row aggregate, so iteration cost is independent of corpus
    size.  The full matrix is pinned once (localCheckpoint) because all
    rounds reuse it; each round's matvec ``w`` is pinned because it has
    two consumers (the norm scalar and the normalized iterate — an
    unpinned diamond re-expands the round chain, NOTES.md).  Covariance
    entries and each normalized iterate are rounded to fixed precision
    so both engines iterate on identical doubles; v0 = all-ones
    (deterministic, non-orthogonal to the dominant eigenvector w.p. 1).
    The final row set carries the loading per dimension plus the
    Rayleigh-quotient eigenvalue estimate."""
    emb = t(spark, sf_dir, "embeddings")
    covu = sim_ops.covariance_upper(emb).select(
        "i", "j", F.round(F.col("cov"), _PCA_COV_DP).alias("cov")
    )
    cfull = covu.unionAll(
        covu.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    ).localCheckpoint(eager=False)  # every round joins it
    v = cfull.select(F.col("i").alias("pos")).distinct().select(
        "pos", F.lit(1.0).alias("v")
    )
    for _ in range(_PCA_ROUNDS):
        w = (
            cfull.join(v, cfull.j == v.pos)
            .groupBy(F.col("i").alias("wpos"))
            .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
            .localCheckpoint(eager=False)  # two consumers: norm + iterate
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            F.col("wpos").alias("pos"),
            F.round(F.col("w") / F.col("nrm"), _PCA_V_DP).alias("v"),
        )
    lamw = (
        cfull.join(v, cfull.j == v.pos)
        .groupBy(F.col("i").alias("wpos"))
        .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
    )
    lam = (
        lamw.join(v, lamw.wpos == v.pos)
        .agg(F.round(F.sum(F.col("w") * F.col("v")), 6).alias("eigenvalue"))
    )
    return v.crossJoin(F.broadcast(lam)).select(
        "pos", F.col("v").alias("loading"), "eigenvalue"
    )


#: embedding_pq knobs: 64 dims = 4 subspaces x 16 dims, 8 codes each,
#: 2 deterministic Lloyd rounds, 4 probe vectors, ADC top-10
_PQ_M = 4
_PQ_SUB = 16
_PQ_K = 8
_PQ_ITERS = 2
_PQ_NQ = 4
_PQ_TOPK = 10


def _duck_pq_lloyd(s: int, prev_p: str, i: int) -> str:
    """One Lloyd round over subspace ``s`` (dims [s*16+1 .. s*16+16]) as
    CTEs — the sliced-subvector twin of ``_duck_lloyd_round``, same
    assign/recompute/keep-empty semantics as ops.similarity.kmeans_pivots."""
    a, b = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
    sl = f"(CAST(e.embedding AS DOUBLE[]))[{a}:{b}]"
    return f"""
    s{s}a{i} AS (
        SELECT vid, cell, cv FROM (
            SELECT e.vec_id AS vid, {sl} AS cv, p.pivot_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity({sl}, p.pv), 6)
                                    DESC,
                                p.pivot_id) AS rn
            FROM embeddings e CROSS JOIN {prev_p} p) t
        WHERE rn = 1),
    s{s}m{i} AS (
        SELECT cell, list(mv ORDER BY pos) AS pv FROM (
            SELECT cell, pos, avg(v) AS mv FROM (
                SELECT cell, unnest(range(1, len(cv) + 1)) AS pos,
                       unnest(cv) AS v
                FROM s{s}a{i}) f
            GROUP BY 1, 2) g
        GROUP BY 1),
    s{s}p{i} AS (
        SELECT p.pivot_id, coalesce(m.pv, p.pv) AS pv
        FROM {prev_p} p LEFT JOIN s{s}m{i} m ON m.cell = p.pivot_id)"""


def _duck_pq() -> str:
    parts = []
    for s in range(_PQ_M):
        a, b = s * _PQ_SUB + 1, (s + 1) * _PQ_SUB
        parts.append(f"""
    s{s}p0 AS (
        SELECT vec_id AS pivot_id,
               (CAST(embedding AS DOUBLE[]))[{a}:{b}] AS pv
        FROM embeddings ORDER BY vec_id LIMIT {_PQ_K})""")
        for i in range(1, _PQ_ITERS + 1):
            parts.append(_duck_pq_lloyd(s, f"s{s}p{i - 1}", i))
        sl = f"(CAST(e.embedding AS DOUBLE[]))[{a}:{b}]"
        parts.append(f"""
    s{s}enc AS (
        SELECT vid, cell FROM (
            SELECT e.vec_id AS vid, p.pivot_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity({sl}, p.pv), 6)
                                    DESC,
                                p.pivot_id) AS rn
            FROM embeddings e CROSS JOIN s{s}p{_PQ_ITERS} p) t
        WHERE rn = 1)""")
    encoded = " UNION ALL ".join(
        f"SELECT vid AS vec_id, {s} AS sub, cell AS code FROM s{s}enc"
        for s in range(_PQ_M)
    )
    dtable = " UNION ALL ".join(
        f"SELECT p.probe_id, {s} AS sub, c.pivot_id AS code, "
        f"round(list_dot_product((p.pvec)[{s * _PQ_SUB + 1}:{(s + 1) * _PQ_SUB}],"
        f" c.pv), 6) AS pd "
        f"FROM probes p CROSS JOIN s{s}p{_PQ_ITERS} c"
        for s in range(_PQ_M)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f""",
    probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pvec
        FROM embeddings ORDER BY vec_id LIMIT {_PQ_NQ}),
    encoded AS ({encoded}),
    dtable AS ({dtable}),
    adc AS (
        SELECT d.probe_id, en.vec_id, round(sum(d.pd), 4) AS adc
        FROM encoded en JOIN dtable d
          ON en.sub = d.sub AND en.code = d.code
        GROUP BY 1, 2),
    exact AS (
        SELECT p.probe_id, e.vec_id,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pvec),
                     4) AS exact_dot
        FROM embeddings e CROSS JOIN probes p),
    ranked AS (
        SELECT a.probe_id, a.vec_id, a.adc, x.exact_dot,
               row_number() OVER (PARTITION BY a.probe_id
                                  ORDER BY a.adc DESC, a.vec_id) AS rank
        FROM adc a JOIN exact x
          ON a.probe_id = x.probe_id AND a.vec_id = x.vec_id)
    SELECT probe_id, CAST(rank AS BIGINT) AS rank, vec_id,
           CASE WHEN adc = 0 THEN 0.0 ELSE adc END AS adc,
           CASE WHEN exact_dot = 0 THEN 0.0 ELSE exact_dot END AS exact_dot
    FROM ranked WHERE rank <= {_PQ_TOPK}
    """
    )


@register(
    "embedding_pq",
    oracle=_duck_pq(),
    description=f"Product quantization ANN: {_PQ_M} subspaces x "
    f"{_PQ_SUB} dims, {_PQ_K}-code codebook per subspace trained by "
    f"{_PQ_ITERS} deterministic Lloyd rounds; corpus encoded to "
    f"{_PQ_M} codes/vector, then asymmetric-distance (ADC) top-"
    f"{_PQ_TOPK} for {_PQ_NQ} probes with the exact dot product "
    "alongside — the compressed-domain retrieval that makes "
    "billion-vector search fit in memory.",
)
def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ at its production shape (Jégou et al. 2011): codebooks are
    driver-state (m × k × d/m doubles — here 4×8×16), trained by the
    same zero-shuffle mapInPandas Lloyd kernel as semantic_dedup
    (``kmeans_pivots`` per subspace); encoding is a broadcast
    argmax-cosine join per subspace (``assign_cells`` — the corpus
    never shuffles for it); retrieval looks each code up in the
    probe's broadcast distance table (m·k·n_probes rows) and sums —
    the ONE shuffle in the query is the (probe, vec) ADC aggregate,
    carrying m rows per vector instead of d floats (a 16× wire
    reduction here; 64-256× in production PQ).  The exact-dot audit
    column rides a map-only broadcast pass.  Fixed init + fixed
    rounds + rounded assignment make all four codebooks replayable as
    DuckDB CTEs, so the driver hash-checks the whole pipeline:
    training, encoding, and retrieval.
    """
    emb = t(spark, sf_dir, "embeddings")
    probes = (
        emb.orderBy("vec_id")
        .limit(_PQ_NQ)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").cast("array<double>").alias("pvec"),
        )
        .localCheckpoint(eager=False)
    )
    # ^ r16: two broadcast consumers (dtable, exact) each replanned the
    # TakeOrdered over the full embeddings scan; pinned, the {nq}-row
    # probe table is computed once (guide §2.4).
    pivot_ids, books, pinned = sim_ops.pq_codebooks(
        emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS
    )
    encoded = sim_ops.pq_encode(pinned, pivot_ids, books).select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )
    centroids = spark.createDataFrame(
        [
            (s, int(pid), [float(v) for v in books[s, ki]])
            for s in range(_PQ_M)
            for ki, pid in enumerate(pivot_ids)
        ],
        "sub int, code long, pv array<double>",
    )
    dtable = probes.crossJoin(F.broadcast(centroids)).select(
        "probe_id",
        "sub",
        "code",
        F.round(
            sim_ops.dot(
                F.slice(
                    F.col("pvec"), F.col("sub") * _PQ_SUB + 1, F.lit(_PQ_SUB)
                ),
                F.col("pv"),
            ),
            6,
        ).alias("pd"),
    )
    adc = (
        encoded.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("probe_id", "vec_id")
        .agg(F.round(F.sum("pd"), 4).alias("adc"))
    )
    exact = emb.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        F.round(
            sim_ops.dot(F.col("embedding").cast("array<double>"), F.col("pvec")), 4
        ).alias("exact_dot"),
    )
    w = W.partitionBy("probe_id").orderBy(F.col("adc").desc(), "vec_id")
    ranked = (
        adc.join(exact, ["probe_id", "vec_id"])
        .select("probe_id", "vec_id", "adc", "exact_dot")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _PQ_TOPK)
    )
    zadc = F.when(F.col("adc") == 0, F.lit(0.0)).otherwise(F.col("adc"))
    zx = F.when(F.col("exact_dot") == 0, F.lit(0.0)).otherwise(
        F.col("exact_dot")
    )
    return ranked.select(
        "probe_id", "rank", "vec_id", zadc.alias("adc"), zx.alias("exact_dot")
    )


@register(
    "embedding_drift",
    oracle="""
    WITH flat AS (
        SELECT vec_id % 2 = 0 AS is_ref,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings),
    mu AS (
        -- zero-fold: DuckDB round() preserves -0.0, Spark does not
        SELECT pos,
               CASE WHEN round(avg(CASE WHEN is_ref THEN v END), 6) = 0
                    THEN 0.0
                    ELSE round(avg(CASE WHEN is_ref THEN v END), 6)
               END AS mu_ref,
               CASE WHEN round(avg(CASE WHEN NOT is_ref THEN v END), 6) = 0
                    THEN 0.0
                    ELSE round(avg(CASE WHEN NOT is_ref THEN v END), 6)
               END AS mu_cand
        FROM flat GROUP BY 1),
    d AS (
        SELECT pos, mu_ref, mu_cand,
               round(abs(mu_ref - mu_cand), 6) AS abs_diff
        FROM mu),
    l2 AS (
        SELECT round(sqrt(sum(abs_diff * abs_diff)), 4) AS mean_l2
        FROM d)
    SELECT d.pos, d.mu_ref, d.mu_cand, d.abs_diff, l2.mean_l2
    FROM d CROSS JOIN l2
    """,
    description="Embedding distribution drift monitor: per-dimension "
    "means of two deterministic halves of the corpus (the "
    "reference-vs-candidate split an ML-ops pipeline runs between "
    "model versions or data windows) with the absolute per-dim gap "
    "and the overall L2 mean-shift — the cheap first-line drift "
    "alarm in front of any re-embedding decision.",
)
def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both split means come from ONE conditional aggregate over the
    posexplode (64 groups regardless of corpus size — the
    embedding_normalize stats shape), so drift monitoring costs one
    partial-aggregable pass however large either side is; the L2
    summary is a second aggregate over the 64-row table, broadcast
    back onto it.  Means are rounded before differencing so the gap
    and the L2 fold run on identical doubles cross-engine."""
    emb = t(spark, sf_dir, "embeddings")
    flat = emb.select(
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "v"
        ),
    ).select("is_ref", (F.col("pos0") + 1).alias("pos"), "v")
    mr = F.round(F.avg(F.when(F.col("is_ref"), F.col("v"))), 6)
    mc = F.round(F.avg(F.when(~F.col("is_ref"), F.col("v"))), 6)
    mu = flat.groupBy("pos").agg(
        F.when(mr == 0, F.lit(0.0)).otherwise(mr).alias("mu_ref"),
        F.when(mc == 0, F.lit(0.0)).otherwise(mc).alias("mu_cand"),
    )
    d = mu.select(
        "pos",
        "mu_ref",
        "mu_cand",
        F.round(F.abs(F.col("mu_ref") - F.col("mu_cand")), 6).alias(
            "abs_diff"
        ),
    )
    l2 = d.agg(
        F.round(
            F.sqrt(F.sum(F.col("abs_diff") * F.col("abs_diff"))), 4
        ).alias("mean_l2")
    )
    return d.crossJoin(F.broadcast(l2))


# -- PCA reconstruction-error outliers ------------------------------------
#: residual power after removing the PC1 projection: r² = ‖x−μ‖² −
#: ((x−μ)·v)² (v unit up to the 6dp rounding) — vectors the dominant
#: direction can't explain.  μ and v are rounded to fixed precision
#: (the pca_power idiom), and every per-vector sum runs as a SEQUENTIAL
#: list fold in both engines (F.aggregate / list_sum), so no parallel
#: float-order can flip the ranking.
_OUT_TOPK = 10


def _duck_outliers() -> str:
    rounds = ",".join(
        _duck_pca_round(f"v{i - 1}", i) for i in range(1, _PCA_ROUNDS + 1)
    )
    return f"""
    WITH flat AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings),
    covu AS (
        SELECT CAST(a.pos AS BIGINT) AS i, CAST(b.pos AS BIGINT) AS j,
               round(avg(a.v * b.v) - avg(a.v) * avg(b.v), {_PCA_COV_DP}) AS cov
        FROM flat a JOIN flat b USING (vec_id)
        WHERE b.pos >= a.pos
        GROUP BY 1, 2),
    cfull AS (
        SELECT i, j, cov FROM covu
        UNION ALL
        SELECT j AS i, i AS j, cov FROM covu WHERE i < j),
    v0 AS (SELECT DISTINCT i AS pos, 1.0 AS v FROM cfull),{rounds},
    mus AS (
        SELECT pos, round(avg(v), {_PCA_V_DP}) AS mu
        FROM flat GROUP BY 1),
    mulist AS (SELECT list(mu ORDER BY pos) AS mu FROM mus),
    vlist AS (SELECT list(v ORDER BY pos) AS vv
              FROM v{_PCA_ROUNDS} ORDER BY 1),
    scored AS (
        SELECT e.vec_id,
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                   i -> (CAST(e.embedding AS DOUBLE[])[i] - m.mu[i])
                        * (CAST(e.embedding AS DOUBLE[])[i] - m.mu[i])))
               - pow(list_sum(list_transform(range(1, len(e.embedding) + 1),
                   i -> (CAST(e.embedding AS DOUBLE[])[i] - m.mu[i])
                        * l.vv[i])), 2) AS r2
        FROM embeddings e, mulist m, vlist l)
    SELECT vec_id, round(r2, 4) AS residual,
           CAST(row_number() OVER (ORDER BY round(r2, 4) DESC, vec_id)
                AS BIGINT) AS rank
    FROM scored
    ORDER BY residual DESC, vec_id LIMIT {_OUT_TOPK}
    """


@register(
    "embedding_outliers",
    oracle=_duck_outliers(),
    description=f"Top-{_OUT_TOPK} embedding outliers by PCA "
    "reconstruction error: residual power after removing the "
    "power-iteration PC1 projection (r² = ‖x−μ‖² − ((x−μ)·v)²) — "
    "vectors the corpus's dominant direction cannot explain, the "
    "anomaly screen that catches mislabeled / corrupted / off-"
    "distribution embeddings before they poison training.",
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The μ vector and PC1 come from corpus-size-independent state
    (d-row aggregates; the covariance GEMM touches the corpus once —
    the pca_power plan), collapsed to ONE broadcast row each (a d-array
    struct), then a single map-side pass scores every vector with
    sequential array folds — no per-vector shuffle, no N×d flat-form
    join.  The top-10 is a TakeOrderedAndProject."""
    emb = t(spark, sf_dir, "embeddings")
    covu = sim_ops.covariance_upper(emb).select(
        "i", "j", F.round(F.col("cov"), _PCA_COV_DP).alias("cov")
    )
    cfull = covu.unionAll(
        covu.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    ).localCheckpoint(eager=False)
    v = cfull.select(F.col("i").alias("pos")).distinct().select(
        "pos", F.lit(1.0).alias("v")
    )
    for _ in range(_PCA_ROUNDS):
        w = (
            cfull.join(v, cfull.j == v.pos)
            .groupBy(F.col("i").alias("wpos"))
            .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
            .localCheckpoint(eager=False)
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            F.col("wpos").alias("pos"),
            F.round(F.col("w") / F.col("nrm"), _PCA_V_DP).alias("v"),
        )
    vlist = v.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda x: x["v"],
        ).alias("vv")
    )
    flat = emb.select(
        "vec_id", F.posexplode(sim_ops.as_double(F.col("embedding")))
    ).select("vec_id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("x"))
    mulist = (
        flat.groupBy("pos")
        .agg(F.round(F.avg("x"), _PCA_V_DP).alias("mu"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                lambda s: s["mu"],
            ).alias("mu")
        )
    )
    xv = emb.select("vec_id", sim_ops.as_double(F.col("embedding")).alias("x"))
    dv = F.zip_with(F.col("x"), F.col("mu"), lambda a, b: a - b)
    r2 = F.aggregate(
        F.zip_with(dv, dv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, y: acc + y,
    ) - F.pow(
        F.aggregate(
            F.zip_with(dv, F.col("vv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, y: acc + y,
        ),
        2,
    )
    scored = (
        xv.crossJoin(F.broadcast(mulist))
        .crossJoin(F.broadcast(vlist))
        .select("vec_id", F.round(r2, 4).alias("residual"))
    )
    return (
        scored.orderBy(F.desc("residual"), "vec_id")
        .limit(_OUT_TOPK)
        .select(
            "vec_id",
            "residual",
            F.row_number()
            .over(W.orderBy(F.desc("residual"), "vec_id"))
            .cast("long")
            .alias("rank"),
        )
    )


#: label-noise audit: neighbors per vector / similarity floor the
#: blocked GEMM prunes at (every fixture vector's true 5th neighbor
#: sits well above it — 5th-NN sim min 0.24 at sf0.01)
_LNK_K = 5
_LNK_T = 0.15


@register(
    "label_noise_knn",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        FROM embeddings),
    f AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               round(list_cosine_similarity(a.v, b.v), 4) AS sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= {_LNK_T}),
    sym AS (
        SELECT ia AS vid, ib AS nid, sim FROM f
        UNION ALL
        SELECT ib, ia, sim FROM f),
    top AS (
        SELECT vid, nid
        FROM (SELECT vid, nid,
                     row_number() OVER (PARTITION BY vid
                                        ORDER BY sim DESC, nid) AS r
              FROM sym) z
        WHERE r <= {_LNK_K}),
    pv AS (
        SELECT t.vid, ev.label AS own,
               CAST(count(*) AS BIGINT) AS k_got,
               CAST(sum(CASE WHEN en.label = ev.label THEN 1 ELSE 0 END)
                    AS BIGINT) AS agree
        FROM top t
        JOIN e ev ON t.vid = ev.vec_id
        JOIN e en ON t.nid = en.vec_id
        GROUP BY 1, 2)
    SELECT CAST(own AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(CAST(sum(agree) AS DOUBLE) / sum(k_got), 4)
               AS mean_agreement,
           CAST(count(*) FILTER (WHERE 2 * agree < k_got) AS BIGINT)
               AS n_suspect,
           round(CAST(count(*) FILTER (WHERE 2 * agree < k_got) AS DOUBLE)
                 / count(*), 4) AS suspect_rate
    FROM pv GROUP BY 1 ORDER BY 1
    """,
    description=f"k-NN label-noise audit (Confident-Learning style): "
    f"each vector's {_LNK_K} nearest neighbors by cosine vote on its "
    "label; per label class, the mean neighbor-agreement rate and the "
    "count of suspects (vectors whose neighbors MAJORITY-disagree) — "
    "the screen run before trusting labels for training.  Honest "
    "fixture finding baked in: agreement sits at ~0.10 = 1/n_labels, "
    "i.e. the synthetic labels carry NO geometric signal — every "
    "class is ~all-suspect, exactly what the audit should report for "
    "randomly-assigned labels.",
)
def label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs scoring via the distributed block-pair GEMM
    (ops.similarity.cosine_pairs_blocked — O(N*B) shuffle, numpy BLAS
    per block pair, nothing on the driver), pruned at sim >= {t} BEFORE
    the per-vector top-{k} rank so the window input is the pruned pair
    list, not N^2 rows.  Labels join AFTER the top-k cut (two broadcast
    joins of the tiny id->label table), and the readout is one
    partial-aggregable rollup.  Beyond ~1e7 vectors swap the exact
    GEMM for the IVF/LSH candidate path like every other audit in this
    family; the vote/readout stages are unchanged.""".format(
        t=_LNK_T, k=_LNK_K
    )
    emb = t(spark, sf_dir, "embeddings")
    pairs = sim_ops.cosine_pairs_blocked(emb, threshold=_LNK_T).localCheckpoint(
        eager=False
    )
    # ^ r16 (re-landed from r15): the symmetrization below references
    # `pairs` TWICE, and the applyInPandas GEMM sits above the shuffle,
    # so ReusedExchange cannot dedup it — un-pinned, the block-pair GEMM
    # ran twice (cheap-output/heavy-upstream, the NOTES pin rule)
    sym = pairs.select(
        F.col("id_a").alias("vid"), F.col("id_b").alias("nid"), "sim"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("vid"), F.col("id_a").alias("nid"), "sim"
        )
    )
    w = W.partitionBy("vid").orderBy(F.desc("sim"), "nid")
    top = (
        sym.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _LNK_K)
        .select("vid", "nid")
    )
    lab = emb.select("vec_id", "label")
    own = lab.select(F.col("vec_id").alias("vid"), F.col("label").alias("own"))
    nb = lab.select(F.col("vec_id").alias("nid"), F.col("label").alias("nbl"))
    pv = (
        top.join(F.broadcast(own), "vid")
        .join(F.broadcast(nb), "nid")
        .groupBy("vid", "own")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_got"),
            F.sum(F.when(F.col("nbl") == F.col("own"), 1).otherwise(0))
            .cast("long")
            .alias("agree"),
        )
    )
    suspect = 2 * F.col("agree") < F.col("k_got")
    return (
        pv.groupBy(F.col("own").cast("long").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(
                F.sum("agree").cast("double") / F.sum("k_got"), 4
            ).alias("mean_agreement"),
            F.sum(F.when(suspect, 1).otherwise(0))
            .cast("long")
            .alias("n_suspect"),
            F.round(
                F.sum(F.when(suspect, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("suspect_rate"),
        )
        .orderBy("label")
    )
