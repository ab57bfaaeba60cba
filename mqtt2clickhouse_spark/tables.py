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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
