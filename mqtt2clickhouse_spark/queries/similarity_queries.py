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
    """MMR (Carbonell & Goldstein 1998): ONE distributed top-k scan
    builds the candidate pool (the only corpus-sized stage), then —
    r15 optimization (guide §1.2/§2.6) — the greedy selection runs on
    the driver over the pool's PRECOMPUTED score table instead of as
    {k} unrolled Spark rounds.  The old shape paid ~2 broadcast jobs +
    a localCheckpoint per round over a ≤{pool}-row frame: ~15
    sequential fixed-overhead jobs for zero distributed work.

    Exactness: every float the greedy compares is computed BY SPARK
    with the same expressions the round form used — ``rel`` and the
    pairwise ``sim(c, x)`` are rounded 6dp in the pool/pair job, and
    the score a candidate would get if partner x set its max-sim,
    ``round(λ·rel_c − (1−λ)·sim(c,x), 6)``, is precomputed per ordered
    pair.  The driver loop does ONLY max/argmax comparisons over those
    collected doubles (max over a set of already-rounded sims equals
    the score-table key of whichever partner achieves it), so no
    Python float arithmetic can diverge from the JVM: the greedy
    trajectory — and therefore the whole result — replays exactly,
    matching the oracle's chained CTEs round for round.  Pool and k
    stay user-bounded constants, so the collect is O(pool²) rows of
    four scalars — the bounded-driver-reduction category (ANN
    centroids, watermark scalars) this repo already uses."""
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
        .localCheckpoint(eager=False)  # pair job + first-pick scores
    )
    # all ordered candidate pairs (c, x): rounded pairwise cosine and
    # the score c would get if x achieves its max-sim — one tiny job
    a = cand.select("vec_id", "v", "rel")
    b = cand.select(F.col("vec_id").alias("x_id"), F.col("v").alias("xv"))
    s = F.round(sim.cosine(F.col("v"), F.col("xv")), 6)
    pair_rows = (
        a.join(F.broadcast(b), F.col("vec_id") != F.col("x_id"))
        .select(
            "vec_id",
            "rel",
            "x_id",
            s.alias("s"),
            F.round(F.lit(lam) * F.col("rel") - F.lit(mu) * s, 6).alias(
                "score_if"
            ),
        )
        .collect()
    )
    first = {
        r["vec_id"]: (r["rel"], r["score1"])
        for r in cand.select(
            "vec_id",
            "rel",
            F.round(F.lit(lam) * F.col("rel"), 6).alias("score1"),
        ).collect()
    }
    sim_cx: dict[tuple, float] = {}
    score_cx: dict[tuple, float] = {}
    for r in pair_rows:
        sim_cx[(r["vec_id"], r["x_id"])] = r["s"]
        score_cx[(r["vec_id"], r["x_id"])] = r["score_if"]

    # greedy replay: argmax by (score desc, vec_id asc) each round;
    # a candidate's score comes from the score table keyed by the
    # partner achieving its max pairwise sim (ties share the value)
    out: list[tuple] = []
    if first:
        c0 = max(first, key=lambda c: (first[c][1], -c))
        out.append((1, c0, first[c0][0], first[c0][1]))
        selected = [c0]
        remaining = sorted(c for c in first if c != c0)
        for i in range(2, _MMR_K + 1):
            if not remaining:
                break
            best_c, best_score = None, None
            for c in remaining:
                x_star = max(selected, key=lambda x: (sim_cx[(c, x)], -x))
                sc = score_cx[(c, x_star)]
                if best_c is None or sc > best_score:
                    best_c, best_score = c, sc
            out.append((i, best_c, first[best_c][0], best_score))
            selected.append(best_c)
            remaining.remove(best_c)
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # pick is non-nullable to match the round form's F.lit() schema
    return spark.createDataFrame(
        out,
        StructType(
            [
                StructField("pick", IntegerType(), False),
                StructField("vec_id", LongType(), True),
                StructField("rel", DoubleType(), True),
                StructField("score", DoubleType(), True),
            ]
        ),
    )


#: ann_tuning_curve: nprobe sweep over the 16-cell IVF index
_TC_PIVOTS = 16
_TC_NPROBES = [1, 2, 4, 8]
_TC_K = 5


@register(
    "ann_tuning_curve",
    oracle=f"""
    WITH pivots AS (
        SELECT vec_id AS pivot_id, CAST(embedding AS DOUBLE[]) AS pv
        FROM embeddings ORDER BY vec_id LIMIT {_TC_PIVOTS}),
    cells AS (
        SELECT vid, cv, pivot_id AS cell FROM (
            SELECT e.vec_id AS vid, CAST(e.embedding AS DOUBLE[]) AS cv,
                   p.pivot_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]), p.pv), 6)
                                    DESC,
                                p.pivot_id) AS prank
            FROM embeddings e CROSS JOIN pivots p) s
        WHERE prank = 1),
    csize AS (SELECT cell, CAST(count(*) AS BIGINT) AS cnt
              FROM cells GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM embeddings),
    qp AS (
        SELECT query_id, qv, pivot_id AS cell, prank FROM (
            SELECT q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS qv,
                   p.pivot_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(q.embedding AS DOUBLE[]), p.pv), 6)
                                    DESC,
                                p.pivot_id) AS prank
            FROM embeddings q CROSS JOIN pivots p
            WHERE q.vec_id < {_N_QUERIES}) s),
    nps AS ({" UNION ALL ".join(f"SELECT {np} AS nprobe" for np in _TC_NPROBES)}),
    probed AS (
        SELECT nps.nprobe, qp.query_id, qp.qv, qp.cell
        FROM qp CROSS JOIN nps WHERE qp.prank <= nps.nprobe),
    top5 AS (
        SELECT nprobe, query_id, neighbor_id FROM (
            SELECT pr.nprobe, pr.query_id, c.vid AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY pr.nprobe, pr.query_id
                       ORDER BY round(list_cosine_similarity(pr.qv, c.cv), 4)
                                    DESC,
                                c.vid) AS rank
            FROM probed pr JOIN cells c ON pr.cell = c.cell
            WHERE c.vid <> pr.query_id) s
        WHERE rank <= {_TC_K}),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 4) DESC,
                                e.vec_id) AS rank
            FROM embeddings q CROSS JOIN embeddings e
            WHERE q.vec_id < {_N_QUERIES} AND e.vec_id <> q.vec_id) s
        WHERE rank <= {_TC_K}),
    rec AS (
        SELECT t.nprobe,
               round(CAST(count(*) AS DOUBLE)
                     / {_N_QUERIES * _TC_K}, 4) AS recall
        FROM top5 t JOIN exact x
          ON t.query_id = x.query_id AND t.neighbor_id = x.neighbor_id
        GROUP BY 1),
    sc AS (
        SELECT nprobe,
               round(avg(CAST(qsum AS DOUBLE) / nn), 4) AS scanned_frac
        FROM (SELECT pr.nprobe, pr.query_id, sum(cs.cnt) AS qsum
              FROM probed pr JOIN csize cs ON pr.cell = cs.cell
              GROUP BY 1, 2) g CROSS JOIN n
        GROUP BY 1)
    SELECT CAST(sc.nprobe AS BIGINT) AS nprobe, rec.recall, sc.scanned_frac
    FROM sc JOIN rec ON sc.nprobe = rec.nprobe
    """,
    description=f"IVF tuning curve: recall@{_TC_K} against the exact "
    f"top-{_TC_K} AND the fraction of the corpus scanned, for nprobe in "
    f"{_TC_NPROBES} over the {_TC_PIVOTS}-cell index — the cost/recall "
    "table an ANN deployment is tuned from (srp_recall and "
    "minhash_band_recall are the sketch-side twins; this closes the "
    "loop for the partition-pruning side).",
)
def ann_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One probe table serves the whole sweep: queries are scored
    against the 16 broadcast pivots ONCE (ranked pivot list per query),
    then the nprobe levels are a 4-row broadcast cross join filtered on
    the rank — so raising the sweep resolution adds rows to a tiny
    table, not passes over the corpus.  The candidate join runs once
    for ALL levels (the nprobe column rides along), shuffling on the
    cell key; recall joins the 40-row exact baseline broadcast-side;
    the scanned fraction joins the bounded cell-size table.  The exact
    baseline is the same blocked brute-force as similarity_topk —
    present for calibration, which is the point of the query.
    """
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    # ^ examined r16: two consumers, but each replan is a
    # predicate-pushed scan (PushedFilters: vec_id < 16) — cheaper at
    # every scale than a pin's materialization barrier (A/B'd slower
    # pinned)
    pivots = (
        emb.orderBy("vec_id")
        .limit(_TC_PIVOTS)
        .select(
            F.col("vec_id").alias("pivot_id"),
            F.col("embedding").cast("array<double>").alias("pv"),
        )
        .localCheckpoint(eager=False)
    )
    # ^ r16: two consumers (cell assignment, query-pivot scoring) each
    # replanned the TakeOrdered over the FULL embeddings scan — unlike
    # the queries slice above, this subtree cannot predicate-push, so
    # un-pinned it costs a whole corpus pass per consumer at scale.
    # The pin is 16 rows.  Before-plan read embeddings 5x, now 4x.
    cells = sim.assign_cells(emb, pivots.select(
        F.col("pivot_id").alias("vec_id"), F.col("pv").alias("embedding")
    ))
    n = emb.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    from pyspark.sql import Window as W

    qw = W.partitionBy("query_id").orderBy(
        F.col("psim").desc(), F.col("cell")
    )
    qp = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .crossJoin(F.broadcast(pivots))
        .select(
            "query_id",
            "qv",
            F.col("pivot_id").alias("cell"),
            F.round(sim.cosine(F.col("qv"), F.col("pv")), 6).alias("psim"),
        )
        .withColumn("prank", F.row_number().over(qw))
    )
    nps = spark.createDataFrame([(np,) for np in _TC_NPROBES], "nprobe long")
    probed = (
        qp.crossJoin(F.broadcast(nps))
        .filter(F.col("prank") <= F.col("nprobe"))
        .select("nprobe", "query_id", "qv", "cell")
    )
    pw = W.partitionBy("nprobe", "query_id")
    tw = pw.orderBy(F.col("sim").desc(), F.col("vid"))
    # ONE candidate pass serves both readouts: rank (top-k) and the
    # per-(level, query) candidate count share the window's shuffle;
    # the scanned cell mass is exactly n_candidates + 1 (the probe
    # itself sits in its own probed argmax cell and is the only row the
    # self-filter removed).  Pinned because two consumers follow and
    # the output is tiny (candidate rows across 4 levels) while the
    # subtree (pivot scoring + cell assignment) is the expensive part
    # — the cheap-output pin rule from NOTES.
    ranked = (
        probed.join(cells, "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "nprobe",
            "query_id",
            "vid",
            F.round(sim.cosine(F.col("qv"), F.col("cv")), 4).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(tw))
        .withColumn("ncand", F.count(F.lit(1)).over(pw))
        .localCheckpoint(eager=False)
    )
    top5 = ranked.filter(F.col("rank") <= _TC_K)
    exact = sim.brute_force_topk(emb, queries, k=_TC_K).select(
        "query_id", "neighbor_id"
    )
    rec = (
        top5.join(
            F.broadcast(exact),
            (top5.query_id == exact.query_id)
            & (top5.vid == exact.neighbor_id),
        )
        .groupBy("nprobe")
        .agg(
            F.round(
                F.count(F.lit(1)).cast("double") / (_N_QUERIES * _TC_K), 4
            ).alias("recall")
        )
    )
    # anchor the average on the (level, query) grid from `probed` (which
    # always has >= 1 row per pair), not on rank==1 rows — a query whose
    # probed cells hold only itself has NO candidate row, and dropping
    # it would diverge from the oracle's per-query cell-mass average
    counts = ranked.filter(F.col("rank") == 1).select(
        "nprobe", "query_id", "ncand"
    )
    sc = (
        probed.select("nprobe", "query_id")
        .distinct()
        .join(counts, ["nprobe", "query_id"], "left")
        .crossJoin(F.broadcast(n))
        .groupBy("nprobe")
        .agg(
            F.round(
                F.avg(
                    (F.coalesce(F.col("ncand"), F.lit(0)) + 1).cast("double")
                    / F.col("nn")
                ),
                4,
            ).alias("scanned_frac")
        )
    )
    return sc.join(rec, "nprobe").select("nprobe", "recall", "scanned_frac")


#: hard_negative_mining: anchors, positives-per-anchor, negatives-per-anchor
_HNM_QUERIES = 16
_HNM_K_NEG = 3


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                      label AS qlabel
               FROM embeddings WHERE vec_id < {_HNM_QUERIES}),
    s AS (SELECT q.query_id,
                 CASE WHEN e.label = q.qlabel
                      THEN 'positive' ELSE 'negative' END AS role,
                 e.vec_id AS neighbor_id,
                 CAST(e.label AS BIGINT) AS neighbor_label,
                 round(list_cosine_similarity(
                     qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id <> q.query_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id, role
                                       ORDER BY sim DESC, neighbor_id)
                        AS rank
          FROM s)
    SELECT query_id, role, CAST(rank AS BIGINT) AS rank,
           neighbor_id, neighbor_label, sim
    FROM r
    WHERE (role = 'positive' AND rank <= 1)
       OR (role = 'negative' AND rank <= {_HNM_K_NEG})
    """,
    description=f"Contrastive-pair mining for embedding training: for "
    f"{_HNM_QUERIES} anchors, the nearest SAME-label vector (the "
    f"positive) and the {_HNM_K_NEG} nearest DIFFERENT-label vectors "
    "(hard negatives — the near-misses that make contrastive losses "
    "learn, far more valuable than random negatives).  The label-aware "
    "counterpart of similarity_topk.",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus scan: anchors broadcast onto the fanned-out corpus,
    cosine rounded BEFORE ranking (ties by neighbor id, the
    similarity_topk discipline), one window partitioned by
    (anchor, role) — per-anchor work only, never a corpus self-join.
    At 100 TB the scorer swaps to the IVF/PQ path (ops/similarity)
    with the same label predicate pushed into the cell probe; the
    mining shape is unchanged."""
    from mqtt2clickhouse_spark.ops.similarity import as_double, cosine
    from mqtt2clickhouse_spark.tables import fan_out
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _HNM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
        F.col("label").alias("qlabel"),
    )
    c = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double(F.col("embedding")).alias("cv"),
            F.col("label").alias("nlabel"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            F.when(F.col("nlabel") == F.col("qlabel"), "positive")
            .otherwise("negative")
            .alias("role"),
            "neighbor_id",
            F.col("nlabel").cast("long").alias("neighbor_label"),
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("sim"),
        )
    )
    w = W.partitionBy("query_id", "role").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(
            ((F.col("role") == "positive") & (F.col("rank") <= 1))
            | ((F.col("role") == "negative") & (F.col("rank") <= _HNM_K_NEG))
        )
        .select("query_id", "role", "rank", "neighbor_id", "neighbor_label", "sim")
    )
