"""Classic TPC-H multi-join analytics (Q3/Q5/Q10 analogues on the
fixture's star schema) — the benchmark queries every warehouse user
knows, and the canonical plan-audit subjects for join strategy: the
fact table (lineitem) must never shuffle for the dimension joins, only
for the final aggregate.

House float rule: revenue = sum(extendedprice * (1 - discount)) is
rounded to 2dp BEFORE ranking (the q1_pricing_summary precedent), and
every ORDER BY carries a deterministic key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out

_REVENUE = "sum(l_extendedprice * (1 - l_discount))"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           round({_REVENUE}, 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY 1, 3
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    description="TPC-H Q3 analogue: top-10 unshipped BUILDING-segment "
    "orders by revenue (ordered before the cutoff, shipped after).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension filter pushes into the customer scan, the two joins
    broadcast (customer and orders shrink under their predicates;
    lineitem — the fact — never shuffles until the final aggregate),
    and the top-10 is a TakeOrderedAndProject."""
    cutoff = "1998-07-01"
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = fan_out(t(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate") > cutoff
    )
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle=f"""
    SELECT n.n_name, round({_REVENUE}, 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY revenue DESC, n.n_name
    """,
    description="TPC-H Q5 analogue: 1996 revenue by ASIA nation where "
    "the supplying and ordering nation match (local supplier volume).",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five dimension joins, every one a broadcast — the fact table
    flows through a single codegen stage and shuffles exactly once, for
    the per-nation aggregate.  The local-supplier condition
    (c_nationkey = s_nationkey) rides the supplier join as an extra
    equi-predicate, not a separate join."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = fan_out(t(spark, sf_dir, "lineitem"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round({_REVENUE}, 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    description="TPC-H Q10 analogue: top-20 customers by revenue lost to "
    "returned items in 1997Q1, with their nation.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The returned-items report: returnflag filter reaches the
    lineitem scan (PushedFilters), the quarter window shrinks orders
    to broadcast size, and the customer/nation dims broadcast — one
    shuffle total (the customer aggregate), top-20 as
    TakeOrderedAndProject."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = fan_out(t(spark, sf_dir, "lineitem")).filter(
        F.col("l_returnflag") == "R"
    )
    nation = t(spark, sf_dir, "nation")
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
