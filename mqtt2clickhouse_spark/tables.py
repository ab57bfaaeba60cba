"""Fixture-table access.

All test/bench data lives at ``/root/testdata/sf{0.001,0.01,0.1}/
{name}.parquet`` (see TESTDATA.md / FIXTURES.md).  Reads go through
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and vectorized decoding for free.  At 100 TB the same call
reads a partitioned directory tree; nothing here assumes single files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS).  Spark >= 4.1 reads it
        # natively as TIMESTAMP_NTZ truncated to micros (bit-identical
        # to DuckDB's ns→us truncation); older readers reject it, so
        # keep the legacy fallback: read the raw int64 nanos and
        # truncate with integer div (double math loses precision at
        # 1.7e18).  Downstream arithmetic must use timestamp functions
        # (timestampdiff/date_trunc), not CAST(ts AS BIGINT) — NTZ has
        # no epoch cast.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # normalize to TIMESTAMP: watermarks/event-time ops reject
            # NTZ, and the whole query surface (incl. the DuckDB
            # oracles) runs with session tz UTC, so the cast is a pure
            # retag — wall-clock values are unchanged
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy per-row
    work (shingling, hashing, per-token array folds).

    Parquet files split only at row-group boundaries, so a scan of few /
    single-row-group files yields fewer tasks than cores and the per-row
    compute serializes.  The round-robin shuffle here costs one pass over
    the rows; the per-row work it unlocks is 10-100x that, so it wins
    whenever upstream parallelism < cores.  Guarded: at production scale
    a 100 TB scan already yields thousands of splits and this is a no-op
    (no shuffle inserted), so the same code is correct at both extremes.
    """
    sess = df.sparkSession
    if target is None:
        target = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
