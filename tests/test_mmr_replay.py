"""mmr_diversify r15 rewrite pin: the driver-side greedy replay must be
bit-identical to the original unrolled-Spark-rounds formulation.

The rewrite moved the round loop (argmax over a <= pool-sized score
table) onto the driver; every compared float is still computed by
Spark (rounded rel / pairwise sims / per-partner scores collected from
one pair job), so the greedy trajectory must match the old round form
exactly — this test keeps the old implementation as the reference and
asserts row-for-row equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import similarity as sim
from mqtt2clickhouse_spark.queries import QUERIES
from mqtt2clickhouse_spark.queries.base import t
from mqtt2clickhouse_spark.queries.similarity_queries import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
)


def _mmr_rounds_reference(spark, sf_dir):
    """The pre-r15 unrolled-rounds implementation, verbatim."""
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
        .localCheckpoint(eager=False)
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
        sel = sel.unionAll(pick).localCheckpoint(eager=False)
    return sel.select("pick", "vec_id", "rel", "score")


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_mmr_driver_replay_matches_round_form(spark, sf_dir):
    new = QUERIES["mmr_diversify"].spark_fn(spark, sf_dir)
    ref = _mmr_rounds_reference(spark, sf_dir)
    new_rows = sorted(map(tuple, new.collect()))
    ref_rows = sorted(map(tuple, ref.collect()))
    assert new.schema == ref.schema
    assert new_rows == ref_rows
