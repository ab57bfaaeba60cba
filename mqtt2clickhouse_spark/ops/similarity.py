"""Vector similarity search over an embedding column (array<float>).

- ``cosine``: pure Column expression — double-precision, element-order
  dot product (deterministic, matches DuckDB's list_cosine_similarity
  after CAST to DOUBLE[]).
- ``brute_force_topk``: exact top-k — the correctness baseline.  Query
  side is broadcast; the corpus is scanned once, ranked per query via a
  windowed row_number.  At 100 TB this is the "small query batch × huge
  corpus" pattern: one broadcast + one shuffle of (n_queries × k) rows.
- ``ivf_topk``: the scale path — IVF-style partition pruning.  Vectors
  are assigned to their nearest pivot (coarse quantizer) at write time;
  a query probes only ``nprobe`` nearest pivot cells, cutting the
  scanned fraction to nprobe/n_pivots.  Pivots here are taken
  deterministically from the corpus (lowest ids) so results are
  reproducible and oracle-checkable; swap in k-means centroids for
  production quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    Returns (query_id, neighbor_id, rank, sim).  Similarity is rounded
    BEFORE ranking (ties broken by neighbor id) so the ranking is stable
    across engines/float summation orders.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    from mqtt2clickhouse_spark.tables import fan_out

    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """All-pairs cosine similarity above ``threshold`` via blocked GEMM.

    The per-pair Column-expression dot product evaluates higher-order
    functions per element — fine for a few thousand pairs, hopeless for
    N².  Here the (normalized) corpus matrix is broadcast once and each
    partition computes a numpy ``block @ corpus.T`` (BLAS, Arrow-batched)
    — the standard "broadcast the smaller side" brute-force pattern.

    Scale story: this is exact and O(N²·d) work but only O(N·d) traffic;
    it holds while the corpus matrix fits in executor memory (~1e7
    vectors × 64 dims × 8 B ≈ 5 GB).  Beyond that, switch to the LSH /
    IVF paths (``ivf_topk``, ops.dedup) to prune candidates first.

    Emits (id_a, id_b, sim) with id_a < id_b, sim rounded.
    """
    import numpy as np
    import pandas as pd

    from mqtt2clickhouse_spark.tables import fan_out

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def block_sim(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = np.round(block @ all_mat.T, round_to)
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            li, ri = np.nonzero(sims >= threshold)
            id_a, id_b, s = bids[li], all_ids[ri], sims[li, ri]
            keep = id_a < id_b  # dedupe the symmetric pair + self-match
            yield pd.DataFrame(
                {"id_a": id_a[keep], "id_b": id_b[keep], "sim": s[keep]}
            )

    # Block sizing: ≥ ~256 rows per GEMM block (BLAS efficiency + python
    # worker amortization), capped at cluster parallelism.  len(rows) is
    # already on the driver from the broadcast build.
    cores = corpus.sparkSession.sparkContext.defaultParallelism
    target = max(1, min(cores, len(rows) // 256))
    return fan_out(corpus.select(id_col, vec_col), target).mapInPandas(
        block_sim, schema="id_a long, id_b long, sim double"
    )


def assign_cells(
    corpus: DataFrame,
    pivots: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: each vector → nearest pivot id (by
    cosine; ties broken by pivot id).  One broadcast join, no shuffle of
    the corpus."""
    from mqtt2clickhouse_spark.tables import fan_out

    p = pivots.select(
        F.col(id_col).alias("pivot_id"), as_double(F.col(vec_col)).alias("pv")
    )
    c = fan_out(
        corpus.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("cv"))
    )
    scored = c.join(F.broadcast(p)).select(
        "vid",
        "cv",
        "pivot_id",
        F.round(cosine(F.col("cv"), F.col("pv")), 6).alias("psim"),
    )
    w = W.partitionBy("vid").orderBy(F.col("psim").desc(), F.col("pivot_id"))
    return (
        scored.withColumn("prank", F.row_number().over(w))
        .filter(F.col("prank") == 1)
        .select("vid", "cv", F.col("pivot_id").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_pivots: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` cells nearest each
    query.  Deterministic pivots = the ``n_pivots`` lowest-id corpus
    vectors."""
    # lowest-id vectors as deterministic pivots: orderBy+limit plans as
    # TakeOrderedAndProject (per-partition top-n + driver merge), NOT a
    # global single-partition sort — safe on an arbitrarily large corpus.
    pivots = corpus.orderBy(F.col(id_col)).limit(n_pivots)
    cells = assign_cells(corpus, pivots, id_col, vec_col)

    # query → nprobe nearest cells
    p = pivots.select(
        F.col(id_col).alias("pivot_id"), as_double(F.col(vec_col)).alias("pv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qcells = (
        q.join(F.broadcast(p))
        .select(
            "query_id",
            "qv",
            "pivot_id",
            F.round(cosine(F.col("qv"), F.col("pv")), 6).alias("psim"),
        )
        .withColumn(
            "prank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("psim").desc(), F.col("pivot_id"))
            ),
        )
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qv", F.col("pivot_id").alias("cell"))
    )

    scored = (
        F.broadcast(qcells)
        .join(cells, "cell")
        .filter(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
