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
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 nanos and truncate to
        # microseconds (integer div — double math loses precision at
        # 1.7e18), matching DuckDB's ns→us truncation bit-for-bit.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
