"""Graph-construction helpers shared by the query surface.

The co-occurrence pair expansion (market baskets, co-purchase edges,
co-citation, …) is the canonical way row-level facts become graph
edges, and its scale hazard is always the same: pair count is quadratic
in GROUP size, so one mega-group dominates the job.  ``basket_pairs``
is the guarded building block both ``copurchase`` and the
``triangle_count``/``graph_kcore`` edge builder share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    df: DataFrame, group_col: str, item_col: str, cap: int
) -> DataFrame:
    """Strictly-ordered distinct item pairs per group, with each group
    capped to its ``cap`` lowest items.

    ONE partial-aggregable shuffle builds the capped baskets
    (``collect_set`` dedups items per group; ``sort_array`` + ``slice``
    keeps the cap deterministic), then the <=cap-element pair expansion
    runs map-side with nested HOF transforms — no self-join, and the
    quadratic blow-up of a hot group is bounded at cap^2/2 (the same
    hot-key guard family as the Jaccard ``max_df`` and LSH
    ``max_bucket`` caps).  Output columns: (u, v) with u < v.

    BUFFER CONTRACT (r11 collect-site audit): the cap truncates AFTER
    collect_set, so the aggregation buffer holds a group's full
    DISTINCT item set first — callers must group on a key whose set
    size is data-model-bounded (every registered consumer groups by
    ORDER: ≤7 lines at any SF, and the R=30 hot-part probe kept
    baskets at that bound).  A caller grouping on a potentially-hot
    key must rank-filter first (``ops.skew.bounded_lowest``) or
    pre-drop (``ops.skew.drop_oversize_keys``).
    """
    baskets = df.groupBy(group_col).agg(
        F.slice(F.sort_array(F.collect_set(item_col)), 1, cap).alias("ps")
    )
    return baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        # items strictly after 0-based position i: the
                        # 1-based slice starts at i + 2
                        F.slice(F.col("ps"), i + 2, cap),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.u", "p.v")
