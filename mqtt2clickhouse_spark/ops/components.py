"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS into dedup GROUPS (keep one canonical doc
per component).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-bounded formulation for massive graphs:

- large-star: every node points its larger neighbors at its smallest
  neighbor (or itself);
- small-star: every node points its smaller-or-equal neighbors at its
  smallest neighbor.

Each round is two groupBys + an explode (no joins growing with
component size); rounds converge in O(log n) for real graphs.  The
driver checks a fixed-point counter (one small count per round), and —
because every round SHRINKS the edge set toward one edge per non-root
node — cuts over to a driver-side union-find once the surviving edges
fit under a bounded cap (``max_local_edges``).  That hybrid is the
standard shape for iterative graph algorithms at scale: distributed
rounds do the data-parallel heavy lifting while the graph is huge, and
the tail — where each round is all fixed overhead and no work — is
finished locally in one pass.  Driver memory stays bounded by the cap
(set ``max_local_edges=0`` for the pure-distributed path).

Iterative algorithms sit outside single-query SQL, but components over
a *small* graph are expressible with a recursive CTE, which is exactly
what the DuckDB oracle does — so even this operator is value-checked.

BUFFER CONTRACT (r11 collect-site audit): both stars collect_set a
node's neighbor set, so the aggregation buffer is O(max degree).
Every registered consumer feeds near-dup PAIRS whose per-doc degree is
capped upstream (bands x max_bucket by the LSH generators, max_df by
the Jaccard path), so the buffer is bounded by construction.  If an
unbounded-degree graph ever lands here, the known rewrite is the
min-join star formulation — groupBy(u).agg(min(v)) (partial-aggregable)
joined back to the per-edge rows instead of materializing sets — which
trades one extra join per round for hub-proof buffers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: over the UNDIRECTED neighborhood N(u), attach every
    strictly-larger neighbor to m = min(N(u) ∪ {u})."""
    nbrs = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    grouped = nbrs.groupBy("u").agg(F.collect_set("v").alias("vs"))
    m = F.array_min(F.array_union(F.col("vs"), F.array(F.col("u"))))
    targets = F.filter(F.col("vs"), lambda v: v > F.col("u"))
    # no .distinct() here: the output feeds small-star's collect_set,
    # which dedupes for free — a distinct would add a full extra shuffle
    # per round for nothing
    return (
        grouped.select(m.alias("m"), F.explode(targets).alias("w"))
        .filter(F.col("w") != F.col("m"))
        .select(F.col("w").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient every edge larger→smaller, so N(u) holds only
    u's SMALLER neighbors; attach N(u) ∪ {u} to m = min(N(u))."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("vs"))
    m = F.array_min(F.col("vs"))
    members = F.array_union(F.col("vs"), F.array(F.col("u")))
    return (
        grouped.select(m.alias("m"), F.explode(members).alias("w"))
        .filter(F.col("w") != F.col("m"))
        .select(F.col("w").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _local_finish(edges: DataFrame) -> DataFrame:
    """Union-find over a collected edge set (bounded by the caller).
    Union-by-min-id keeps every set's root at its minimum node id, so
    the result is exactly the star-round fixpoint: (id, min reachable)."""
    pdf = edges.toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["src"], pdf["dst"]):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = set(map(int, pdf["src"])) | set(map(int, pdf["dst"]))
    rows = [(x, find(x)) for x in sorted(nodes)]
    return edges.sparkSession.createDataFrame(rows, "id long, component long")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
    max_local_edges: int = 1_000_000,
) -> DataFrame:
    """(id_a, id_b) undirected pairs → (id, component) with component =
    the minimum node id reachable from ``id``.

    Runs alternating star rounds while the edge set exceeds
    ``max_local_edges``, then finishes with one driver-side union-find
    pass (≤ ~16 MB at the default cap; 0 disables the cutover).  Each
    round costs ONE job: the convergence stats double as the action
    that materializes that round's lazy checkpoint.

    Nodes only appear if they occur in ``pairs``; callers union isolated
    ids afterwards if needed.  A degenerate self-pair ``(a, a)`` counts
    as an occurrence: ``a`` comes back as its own singleton component
    (unless a real pair also names it) — self-pairs are filtered out of
    the star/union-find edge set up front and the self-only nodes are
    unioned back at the end, so BOTH finishing paths emit the identical
    result (r14 review sweep: the star rounds used to drop such nodes
    while the union-find cutover kept them).
    """
    raw = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    ).localCheckpoint(eager=False)
    # ^ pinned: the self-pair split below references ``raw`` TWICE, and a
    # diamond re-expands its whole subtree per reference (NOTES "Hard-won
    # facts") — for every consumer the pairs subtree is the expensive part
    # (LSH banding / signature joins) while its output is two long columns,
    # exactly the cheap-output/heavy-upstream case the pin rule favors.
    # Measured r15 at sf0.1 the un-pinned diamond costs only ~0.2 s
    # (identical exchanges get ReusedExchange'd), but that reuse is
    # fragile — AQE re-optimization breaks exchange identity — and at
    # 100 TB a re-run pairs subtree is a full LSH pass; the pin makes
    # single-expansion a guarantee instead of an optimizer accident.
    self_nodes = (
        raw.filter(F.col("src") == F.col("dst")).select(F.col("src").alias("id")).distinct()
    )
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def stats(df: DataFrame) -> tuple:
        # one-job convergence proxy: (count, order-independent hash sum);
        # running it on a lazily-checkpointed frame also materializes
        # the checkpoint, so no separate eager-checkpoint job is needed
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: long sum of 64-bit hashes overflows under ANSI
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def with_singletons(result: DataFrame) -> DataFrame:
        # nodes that only ever appeared as (a, a) — their own components;
        # the anti-join is on the (small) node-level result, one shuffle,
        # and prunes to a no-op when no caller emits self-pairs
        singles = self_nodes.join(result.select("id"), "id", "left_anti").select(
            F.col("id"), F.col("id").alias("component")
        )
        return result.unionAll(singles)

    cur_stats = stats(edges)
    for _ in range(max_rounds):
        if max_local_edges and cur_stats[0] <= max_local_edges:
            return with_singletons(_local_finish(edges))
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        # fixpoint detection, cheap-first: the count+hash-sum decides
        # "changed" exactly (differing sets with equal count AND equal
        # 64-bit hash sum is negligible); the exact exceptAll
        # confirmation runs only once, at the suspected fixpoint.
        new_stats = stats(new_edges)
        if new_stats == cur_stats and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        cur_stats, edges = new_stats, new_edges
    # edges now map node → component min; add the roots themselves
    members = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("id"), F.col("dst").alias("component"))
    return with_singletons(members.unionAll(roots).distinct())
