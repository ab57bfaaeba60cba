"""r16 rewrite pins: the two optimization rewrites that changed an
operator's aggregation STRUCTURE (not just pinned a subtree) must stay
row-identical to the original formulations.

- negative_sampling: two count_distincts over the customers x K
  candidate table (3x Expand) -> (ck, pk) pre-aggregate + conditional
  sums + dimension-side customer counts.
- bigram_lm: corpus-wide prefix aggregate + two corpus joins ->
  prefix counts derived from the bigram counts (c(w1 .) = sum c_bg)
  and a per-distinct-bigram score joined back in one corpus join.

Each test keeps the pre-r16 implementation verbatim as the reference
and asserts row-for-row equality on the fixtures.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries import QUERIES
from mqtt2clickhouse_spark.queries.base import t
from mqtt2clickhouse_spark.tables import fan_out

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def _negative_sampling_reference(spark, sf_dir):
    """The pre-r16 count_distinct formulation, verbatim."""
    from mqtt2clickhouse_spark.ops.dedup import hash32
    from mqtt2clickhouse_spark.queries.pipeline_queries import _NEG_K

    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    part = t(spark, sf_dir, "part")

    pos = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    np_ = part.agg((F.max("p_partkey") + 1).cast("long").alias("np"))
    cand = (
        cust.select("c_custkey")
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("c_custkey").alias("ck"),
            F.explode(F.array(*[F.lit(i) for i in range(_NEG_K)])).alias("i"),
            "np",
        )
        .select(
            "ck",
            (
                hash32(
                    F.concat(
                        F.col("ck").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                )
                % F.col("np")
            ).alias("pk"),
        )
    )
    labeled = cand.join(
        pos.withColumn("hit", F.lit(1)), ["ck", "pk"], "left"
    ).select("ck", "pk", F.coalesce("hit", F.lit(0)).alias("collided"))
    seg = cust.select(
        F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("segment")
    )
    per_seg = (
        labeled.join(F.broadcast(seg), "ck")
        .groupBy("segment")
        .agg(
            F.count_distinct("ck").cast("long").alias("n_customers"),
            F.count_distinct(
                F.when(
                    F.col("collided") == 0,
                    F.concat(
                        F.col("ck").cast("string"),
                        F.lit(":"),
                        F.col("pk").cast("string"),
                    ),
                )
            )
            .cast("long")
            .alias("n_neg"),
            F.sum("collided").cast("long").alias("n_collisions"),
        )
    )
    pos_seg = (
        pos.join(F.broadcast(seg), "ck")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pos"))
    )
    return (
        per_seg.join(pos_seg, "segment")
        .select(
            "segment",
            "n_customers",
            "n_pos",
            "n_neg",
            "n_collisions",
            F.round(F.col("n_neg").cast("double") / F.col("n_pos"), 4).alias(
                "neg_per_pos"
            ),
        )
        .orderBy("segment")
    )


def _bigram_lm_reference(spark, sf_dir):
    """The pre-r16 two-corpus-join formulation, verbatim."""
    import re

    from mqtt2clickhouse_spark.ops import text as tx

    ws = re.compile(r"[ \t\n\r\f\v]+")

    @F.pandas_udf("array<string>")
    def bigrams(texts: pd.Series) -> pd.Series:
        def bg(t_):
            toks = [w for w in ws.split(t_.lower()) if w]
            return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

        return texts.map(bg)

    docs = fan_out(t(spark, sf_dir, "documents"))
    bg = docs.select(
        "doc_id", F.explode(bigrams(F.col("text"))).alias("bg")
    ).localCheckpoint(eager=False)
    cbg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    cw = (
        bg.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_w1"))
    )
    vocab = docs.select(F.explode(tx.tokens(F.col("text"))).alias("tok")).agg(
        F.count_distinct("tok").alias("vocab")
    )
    return (
        bg.join(cbg, "bg")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(cw, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.col("c_bg") + F.lit(1.0))
                        / (F.col("c_w1") + F.col("vocab"))
                    )
                ),
                4,
            ).alias("avg_logp"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_negative_sampling_rewrite_matches_reference(spark, sf_dir):
    new = QUERIES["negative_sampling"].spark_fn(spark, sf_dir)
    old = _negative_sampling_reference(spark, sf_dir)
    assert new.columns == old.columns
    assert _rows(new) == _rows(old)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_bigram_lm_rewrite_matches_reference(spark, sf_dir):
    new = QUERIES["bigram_lm"].spark_fn(spark, sf_dir)
    old = _bigram_lm_reference(spark, sf_dir)
    assert new.columns == old.columns
    assert _rows(new) == _rows(old)
