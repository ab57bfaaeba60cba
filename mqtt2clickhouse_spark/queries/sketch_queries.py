"""Sketch / bucketing additions: a Count-Min frequency sketch with a
heavy-hitter readout, and deterministic decile bucketing.

CMS is the canonical fixed-memory frequency structure for 100 TB streams:
the sketch build is an explode(d) + groupBy whose map-side combine caps
each partition's shuffle contribution at d×w cells, so sketch shuffle
volume scales with partition COUNT, not row count.  The readout compares
the estimate against exact counts for the top keys, making the
overcount bias (always ≥ 0) visible and oracle-checkable — the md5-based
``hash32`` is engine-independent, so DuckDB builds the identical sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out

#: Count-Min geometry: d hash rows × w columns (4 KiB of counters).
_CMS_D = 4
_CMS_W = 512
#: heavy-hitter readout size
_CMS_TOPK = 20

#: cell for hash row r: 32-bit slice r of ONE md5(key) digest, mod w.
#: One digest yields all d rows (md5's 128 bits = 4 independent 32-bit
#: slices) — half the hash CPU of d separate salted digests.
def _duck_cell(key_expr: str, r_expr: str) -> str:
    return (
        "CAST(list_sum(list_transform(range(1, 9), i -> "
        f"(strpos('0123456789abcdef', substring(md5({key_expr}), "
        f"CAST({r_expr} * 8 + i AS INTEGER), 1)) - 1) "
        f"* (16 ** (8 - i)))) AS BIGINT) % {_CMS_W}"
    )


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH keys AS (
        SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
    cells AS (
        SELECT r, {_duck_cell("key", "r")} AS c, count(*) AS cnt
        FROM keys, range(0, {_CMS_D}) t(r)
        GROUP BY 1, 2),
    exact AS (
        SELECT key, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM keys GROUP BY 1
        ORDER BY exact_cnt DESC, key LIMIT {_CMS_TOPK}),
    probes AS (
        SELECT e.key, e.exact_cnt, t.r, {_duck_cell("e.key", "t.r")} AS c
        FROM exact e, range(0, {_CMS_D}) t(r)),
    est AS (
        SELECT p.key, p.exact_cnt, CAST(min(s.cnt) AS BIGINT) AS cms_cnt
        FROM probes p JOIN cells s ON s.r = p.r AND s.c = p.c
        GROUP BY 1, 2)
    SELECT key, exact_cnt, cms_cnt,
           cms_cnt - exact_cnt AS overcount
    FROM est
    """,
    description=f"Count-Min sketch ({_CMS_D}x{_CMS_W}) of part-key "
    "frequencies; top-20 heavy hitters with exact vs estimated counts.",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the sketch with explode(d) + groupBy(r, c): partial
    aggregation bounds each partition's shuffle output at d×w cells, so
    the sketch costs one bounded shuffle regardless of input size.  The
    readout broadcasts the tiny top-k list against the ≤ d×w-row sketch.

    CMS guarantees est ≥ exact, est ≤ exact + εN with ε = e/w — the
    ``overcount`` column exposes the realized bias.
    """
    # fan_out: the fixture scan is one row group → one task; the 4×md5
    # hashing below is the query's CPU and must spread across cores
    keys = fan_out(
        t(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("string").alias("key")
        )
    ).localCheckpoint(eager=False)

    def cells(key_col):
        # one md5 per key; row r reads hex chars [8r+1, 8r+8] of the digest
        digest = F.md5(key_col)
        return F.array(
            *[
                F.conv(F.substring(digest, 1 + 8 * r, 8), 16, 10).cast("long")
                % _CMS_W
                for r in range(_CMS_D)
            ]
        )

    sketch = (
        keys.select(F.posexplode(cells(F.col("key"))).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )

    exact = (
        keys.groupBy("key")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "key")
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "key", "exact_cnt", F.posexplode(cells(F.col("key"))).alias("r", "c")
    )

    return (
        F.broadcast(probes)
        .join(sketch, ["r", "c"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cms_cnt"))
        .select(
            "key",
            "exact_cnt",
            "cms_cnt",
            (F.col("cms_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


@register(
    "quantile_bucket",
    oracle="""
    WITH b AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS decile
        FROM events)
    SELECT event_type, decile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM b GROUP BY 1, 2
    """,
    description="Deterministic decile bucketing of event values per type "
    "(ntile), with per-bucket count and bounds.",
)
def q_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) with a fully deterministic sort key (value, event_id) so
    tie placement matches across engines.  At scale the per-type windows
    sort within hash partitions of ``event_type``; for a single giant
    group the scale path is range-partitioned `width_bucket` over
    approx quantile boundaries (see ``percentiles``'s docstring).
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )
