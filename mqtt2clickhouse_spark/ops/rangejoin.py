"""Interval / range join — match point events to containing intervals.

Spark expresses a range join as a join with inequality conditions, which
plans as BroadcastNestedLoopJoin (O(|L|·|R|) compares) unless rewritten.
The scalable formulation here is the classic *bucketed* range join:

1. choose a bucket width >= the maximum interval length;
2. each point maps to exactly one bucket; each interval is exploded to
   the (at most 2, for width >= max length) buckets it overlaps;
3. equi-join on (key..., bucket) — a plain shuffled hash join — then
4. refine with the exact range predicate.

Because a point lives in exactly one bucket and the interval copy in
that bucket is unique, no post-join dedup is needed.  Cost: one shuffle
of each side on (key, bucket) + a small interval blow-up factor — the
plan that survives 100 TB, versus the nested-loop's cross product.

Used by the ``range_join`` query (clicks within a window after a
purchase); as-of semantics live in ops.asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``start <= point_ts < end`` (and equal ``by`` keys).

    ``bucket_seconds`` must be >= the longest interval; wider buckets
    mean fewer interval copies but coarser pre-filtering.  Columns from
    both sides are kept (caller projects); name collisions must be
    resolved by the caller beforehand.

    Inner join only: an outer variant cannot be expressed as
    bucket-join-then-filter (the refine filter would drop the
    null-matched rows, silently degrading to inner) — it needs an
    explicit anti-join union, which callers should do deliberately.
    """
    if how != "inner":
        raise ValueError(
            "range_join supports how='inner' only; for left semantics, union "
            "the inner result with points anti-joined on the matched keys"
        )
    by = by or []
    p_bucket = F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    # interval → every bucket it overlaps (sequence is inclusive)
    i_buckets = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_ts)) / bucket_seconds),
        F.floor(F.unix_timestamp(F.col(end_ts)) / bucket_seconds),
    )
    p = points.withColumn("_bucket", p_bucket)
    i = intervals.withColumn("_bucket", F.explode(i_buckets))
    # rename interval-side join keys so output columns stay unambiguous
    for c in by:
        i = i.withColumnRenamed(c, f"_r_{c}")
    on = ["_bucket"] + [f"_r_{c}" for c in by]
    cond = None
    for pc, ic in zip(["_bucket"] + by, on):
        clause = p[pc] == i[ic]
        cond = clause if cond is None else (cond & clause)
    joined = p.join(i, cond, how)
    refined = joined.filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return refined.drop("_bucket", *on)
