"""Skew mitigation: salted joins and two-phase distinct aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but two cases need explicit
plan-level treatment at 100 TB:

- a *join* where one key dominates (AQE can split sort-merge partitions
  but replication of the build side lets the hot key spread over N
  tasks deterministically);
- a *count-distinct* on a skewed group key (the distinct expand puts
  every value of the hot key in one partition; the two-phase form
  spreads phase 1 over (key, value)).

Both transforms are result-identical to their naive forms — tests assert
equality, and the salted join is exposed as an oracle-checked query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``n_salts``
    shuffle partitions.

    The left row's salt is a deterministic hash of its full row (stable
    across retries — no ``rand()``, which breaks task re-execution
    idempotence); the right side is replicated ``n_salts`` times.  Use
    when the right side is too big to broadcast and a left key is hot
    enough to dominate a task.  Cost: right side shuffled n× — pick
    n_salts ≈ (hot-key rows / target partition rows).

    Only left-preserving joins are supported: because the right side is
    replicated before the join, an unmatched right row would surface
    ``n_salts`` times NULL-extended under right/full (and ``n_salts``
    times plain under right_semi-style modes) — so those modes raise
    instead of silently multiplying rows.  Salting a RIGHT-preserving
    join is the mirror transform: swap the arguments.
    """
    # same normalization Spark's JoinType.apply uses: lowercase, no "_"
    if how.lower().replace("_", "") not in {
        "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"
    }:
        raise ValueError(
            f"salted_join supports only left-preserving joins "
            f"(inner/left/left_semi/left_anti); got how={how!r} — the "
            "n_salts-replicated right side would emit duplicate rows for every "
            "unmatched right row. For a right-preserving salted join, swap "
            "left/right."
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [on, "_salt"], how).drop("_salt")


def two_phase_count_distinct(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """count(DISTINCT value) per key, skew-proof.

    Phase 1 groups on (key, value) — the hot key's values spread across
    the full shuffle space; phase 2 counts rows per key.  Identical
    result to ``groupBy(key).agg(count_distinct(value))`` whose expand
    funnels each key into one partition.
    """
    return (
        df.groupBy(key, value)
        .agg(F.lit(1))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


def drop_oversize_keys(
    banded: DataFrame, keys: list[str], max_size: int | None
) -> DataFrame:
    """Skew-safe whole-group cap: drop every group with more than
    ``max_size`` members BEFORE its member list is collected.  Group
    sizes come from a COUNT (partial-aggregable — a hot key's
    multiplicity collapses map-side); the OVERSIZE keys anti-join back
    against the input rows.  Anti (not semi against survivors) keeps
    the broadcast side bounded at every scale — degenerate groups are
    rare by definition, while the survivor set grows with the corpus —
    and the join streams the hot group's rows into oblivion without
    ever buffering them.  A degenerate group therefore never
    materializes anywhere: not in an aggregation buffer, not in a
    task.  No-op when ``max_size`` is None.  Callers needing the
    keep-a-subset semantics instead use :func:`bounded_lowest`."""
    if max_size is None:
        return banded
    oversize = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_size)
        .select(*keys)
    )
    return banded.join(oversize, keys, "anti")


def bounded_lowest(
    df: DataFrame, key: str, item: str, cap: int
) -> DataFrame:
    """The ``cap`` LOWEST items per key, selected by a rank filter so
    no downstream aggregation buffer ever holds more than ``cap``
    members of a hot key — the keep-a-subset twin of
    :func:`drop_oversize_keys` (which drops oversize keys outright).
    The window sort pays one spillable per-key sort; the alternative
    (slice/substring after collect_list) buffers the hot key's FULL
    list first — the r10 link_prediction_ra OOM class.  Order ties on
    ``item`` must not exist (callers pass a unique column or a struct
    with a unique tiebreak) or the kept subset is nondeterministic."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(item)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
