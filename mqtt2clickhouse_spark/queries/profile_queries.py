"""Data-profiling surface: per-column statistics of a table in ONE scan.

Profiling is the first thing a 100 TB ingest pipeline runs on a new
source: row count, null counts, exact distincts, min/max per column.
The plan shape matters at scale — the naive per-column loop runs K scans
for K columns; this implementation computes every column's statistics in
a SINGLE aggregation pass (Spark plans the multi-distinct aggregate as
one Expand + partial-aggregable groupBy, i.e. exactly one shuffle
whose volume is bounded by the distinct-value counts, not the row
count), then pivots the one wide result row into per-column rows with
an explode — driver never holds more than the K-row profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.base import register, t

#: (column, kind) profile spec for the orders table
_ORDERS_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _duck_profile_row(col: str, kind: str) -> str:
    base = (
        f"SELECT '{col}' AS column_name, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) - count({col}) AS BIGINT) AS n_null, "
        f"CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct, "
    )
    if kind == "num":
        base += (
            "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str, "
            f"CAST(round(min({col}), 2) AS DOUBLE) AS min_num, "
            f"CAST(round(max({col}), 2) AS DOUBLE) AS max_num "
        )
    elif kind == "str":
        base += (
            f"min({col}) AS min_str, max({col}) AS max_str, "
            "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num "
        )
    else:  # ts — format explicitly so both engines render identically
        base += (
            f"strftime(min({col}), '%Y-%m-%d %H:%M:%S') AS min_str, "
            f"strftime(max({col}), '%Y-%m-%d %H:%M:%S') AS max_str, "
            "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num "
        )
    return base + "FROM orders"


@register(
    "table_profile",
    oracle="\nUNION ALL\n".join(
        _duck_profile_row(c, k) for c, k in _ORDERS_COLS
    ),
    description="Single-scan column profile of orders: per-column row "
    "count, null count, exact distinct count, min/max (numerics rounded "
    "to 2dp, timestamps formatted) — all six columns' statistics from "
    "ONE aggregation pass.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One wide `.agg()` computes count/count(col)/count_distinct/min/max
    for every column simultaneously; Spark rewrites the multi-distinct
    aggregate into a single Expand + two-phase hash aggregate (one
    shuffle, partial-aggregated map-side).  The wide 1-row result is then
    exploded into the K-row per-column profile — so profiling K columns
    costs one scan + one bounded shuffle regardless of table size, vs
    the K-scan naive loop.  Exact distincts are deliberate (the oracle
    must match); the 100 TB fast path swaps ``count_distinct`` for
    ``approx_count_distinct`` with no other plan change (see
    ``distinct_approx``)."""
    orders = t(spark, sf_dir, "orders")

    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c, kind in _ORDERS_COLS:
        aggs.append(F.count(c).cast("long").alias(f"cnt_{c}"))
        aggs.append(F.count_distinct(c).cast("long").alias(f"nd_{c}"))
        if kind == "num":
            aggs.append(F.round(F.min(c), 2).cast("double").alias(f"mn_{c}"))
            aggs.append(F.round(F.max(c), 2).cast("double").alias(f"mx_{c}"))
        elif kind == "str":
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
        else:
            aggs.append(
                F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss").alias(f"mn_{c}")
            )
            aggs.append(
                F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias(f"mx_{c}")
            )
    wide = orders.agg(*aggs)

    def row(c: str, kind: str):
        null_s = F.lit(None).cast("string")
        null_d = F.lit(None).cast("double")
        return F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"cnt_{c}")).cast("long").alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            (null_s if kind == "num" else F.col(f"mn_{c}")).alias("min_str"),
            (null_s if kind == "num" else F.col(f"mx_{c}")).alias("max_str"),
            (F.col(f"mn_{c}") if kind == "num" else null_d).alias("min_num"),
            (F.col(f"mx_{c}") if kind == "num" else null_d).alias("max_num"),
        )

    return wide.select(
        F.explode(F.array(*[row(c, k) for c, k in _ORDERS_COLS])).alias("p")
    ).select("p.*")


#: skew_profile: (label, table, key column) triples + hot-key factor
_SKEW_KEYS = [
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
]
_SKEW_HOT_FACTOR = 10


def _duck_skew_one(label: str, table: str, key: str) -> str:
    return f"""
    SELECT '{label}' AS key_col, n_rows, n_keys, max_freq,
           round(avg_freq, 4) AS avg_freq,
           round(max_freq / avg_freq, 4) AS skew_ratio,
           n_hot_keys, round(hot_share, 4) AS hot_share
    FROM (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(cnt) AS BIGINT) AS max_freq,
               avg(cnt) AS avg_freq,
               CAST(sum(CASE WHEN cnt >= {_SKEW_HOT_FACTOR} * a.av
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_keys,
               sum(CASE WHEN cnt >= {_SKEW_HOT_FACTOR} * a.av
                        THEN cnt ELSE 0 END)
                   / CAST(sum(cnt) AS DOUBLE) AS hot_share
        FROM (SELECT {key} AS k, CAST(count(*) AS DOUBLE) AS cnt
              FROM {table} GROUP BY 1) f
        CROSS JOIN (SELECT CAST(count(*) AS DOUBLE)
                           / count(DISTINCT {key}) AS av
                    FROM {table}) a) s
    """


@register(
    "skew_profile",
    oracle=" UNION ALL ".join(_duck_skew_one(*k) for k in _SKEW_KEYS),
    description="Join-key skew diagnostics for three fact-table keys: "
    "key count, max/avg frequency, skew ratio, and the count + row "
    f"share of hot keys (>= {_SKEW_HOT_FACTOR}x average) — the "
    "monitoring query you run BEFORE choosing a salting factor or "
    "enabling AQE skew-join, computed without any global sort.",
)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything here partial-aggregates: each key's frequency table is
    one hash aggregate, its summary is a second (1-row) aggregate, and
    the hot-key cut compares against the broadcast average — no window,
    no global rank, so the plan survives a billion-key column (contrast
    top-N-share metrics, which need a global frequency sort; the
    hot-factor cut answers the same salting question shuffle-free).
    The skew_salted_join query is the treatment; this is the
    diagnosis."""
    parts = []
    for label, table, key in _SKEW_KEYS:
        freq = (
            t(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        )
        av = freq.agg(
            (F.sum("cnt") / F.count(F.lit(1))).alias("av")
        )
        hot = F.col("cnt") >= _SKEW_HOT_FACTOR * F.col("av")
        parts.append(
            freq.crossJoin(F.broadcast(av)).agg(
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("cnt").cast("long").alias("max_freq"),
                F.round(F.avg("cnt"), 4).alias("avg_freq"),
                F.round(F.max("cnt") / F.avg("cnt"), 4).alias("skew_ratio"),
                F.sum(F.when(hot, 1).otherwise(0))
                .cast("long")
                .alias("n_hot_keys"),
                F.round(
                    F.sum(F.when(hot, F.col("cnt")).otherwise(0.0))
                    / F.sum("cnt"),
                    4,
                ).alias("hot_share"),
            ).select(F.lit(label).alias("key_col"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
