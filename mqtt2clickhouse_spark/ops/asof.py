"""As-of join — for each left row, the most recent right row with
``right.ts <= left.ts`` within the same key group.

Spark has no native as-of join; the scalable formulation is the
union-and-carry-forward trick:

1. tag right rows 0 and left rows 1, union them;
2. one window per key ordered by (ts, tag, right-id):
   ``last(right_value, ignorenulls=True)`` carried forward to each row;
3. keep only left rows.

Cost: ONE shuffle on the key (the window partition) — same order as a
regular join on the key, no range explosion, no per-group Python.  This
is the pattern that survives 100 TB: skew is bounded by per-key row
counts, and the window is rows-based (no buffering beyond the running
last value).

Tie semantics: a right row at exactly left.ts IS visible (tag 0 sorts
before tag 1), matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: ``left`` keeps all its columns plus, for each
    name in ``value_cols``, the value from the latest ``right`` row with
    ``right[on] <= left[on]`` and equal ``by`` key (null if none).

    ``tiebreak``: a right-side column ordering right rows that share the
    same (by, on) — the greatest wins; keeps results deterministic.
    """
    lcols = left.columns
    tb = [F.col(f"_tb{suffix}")] if tiebreak else []
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        *([F.col(tiebreak).alias(f"_tb{suffix}")] if tiebreak else []),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    l = left.select(
        "*",
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on), F.col("_tag"), *tb)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *[c for c in lcols],
        "_tag",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_tag") == 1).drop("_tag")
