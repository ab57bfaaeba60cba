"""Continuous aggregate (hypertable-rollup style): a partitioned parquet
dataset of per-(time-bucket, key) aggregates maintained incrementally by
micro-batch — the materialized-rollup pattern the reference's ClickHouse
users would get from a SummingMergeTree/materialized view, re-expressed
as foreachBatch + dynamic partition overwrite.

Scale design:
- Each micro-batch partial-aggregates map-side first, so the merge input
  is (buckets × keys), not raw rows.
- Only the partitions TOUCHED by the batch are read back and rewritten
  (partition pruning on read; ``partitionOverwriteMode=dynamic`` on
  write) — late data for one old hour re-merges one partition, never the
  whole dataset.
- All metrics are partial-aggregable (count/sum/min/max; avg derives at
  read time), so merging batch partials with stored partials is exact
  regardless of how rows were batched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RollupSink:
    """Maintains ``path`` as a per-(bucket, key) aggregate dataset.

    Pass ``foreach_batch`` to ``DataStreamWriter.foreachBatch``, or call
    it directly with batch frames.  ``bucket`` is any window duration
    Spark accepts (default 1 hour).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        bucket: str = "1 hour",
        ts_col: str = "ts",
        key_col: str = "event_type",
        value_col: str = "value",
    ) -> None:
        self.spark = spark
        self.path = path
        self.bucket = bucket
        self.ts_col = ts_col
        self.key_col = key_col
        self.value_col = value_col

    def _partials(self, df: DataFrame) -> DataFrame:
        """Map-side combine: raw rows → per-(bucket, key) partials.
        The bucket is stored as epoch seconds (clean partition dirs)."""
        w = F.window(self.ts_col, self.bucket)
        return (
            df.groupBy(
                F.unix_timestamp(w.start).alias("bucket"),
                F.col(self.key_col).alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(self.value_col).alias("s"),
                F.min(self.value_col).alias("mn"),
                F.max(self.value_col).alias("mx"),
            )
        )

    def _epoch_path(self) -> str:
        return os.path.join(self.path, "_last_epoch")

    def _last_epoch(self) -> int:
        try:
            with open(self._epoch_path()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # effectively-once: a restarted stream replays its last
        # uncommitted epoch; merging it twice would double-count, so
        # already-applied epochs are skipped via the marker (committed
        # AFTER the overwrite).  A crash exactly between overwrite and
        # marker can still double-apply that one epoch — the standard
        # non-transactional foreachBatch caveat; a transactional table
        # format (Delta/Iceberg) closes it.
        if epoch_id <= self._last_epoch():
            return
        part = self._partials(batch_df).persist()
        try:
            touched = [r["bucket"] for r in part.select("bucket").distinct().collect()]
            if not touched:
                return
            merged = part
            if os.path.exists(self.path):
                existing = self.spark.read.parquet(self.path).filter(
                    F.col("bucket").isin(touched)  # partition-pruned scan
                )
                merged = (
                    part.unionByName(existing)
                    .groupBy("bucket", "key")
                    .agg(
                        F.sum("n").alias("n"),
                        F.sum("s").alias("s"),
                        F.min("mn").alias("mn"),
                        F.max("mx").alias("mx"),
                    )
                )
            (
                merged.repartition("bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(self.path)
            )
            with open(self._epoch_path(), "w") as f:
                f.write(str(epoch_id))
        finally:
            part.unpersist()

    def read(self) -> DataFrame:
        """The rollup with derived metrics — what a dashboard queries
        instead of scanning raw events."""
        df = self.spark.read.parquet(self.path)
        return df.select(
            F.col("bucket").cast("long").alias("bucket"),
            "key",
            "n",
            "s",
            "mn",
            "mx",
            F.round(F.col("s") / F.col("n"), 4).alias("avg"),
        )
