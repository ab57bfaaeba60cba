"""Physical skew guards for the bucket/cell cap family (round 11).

The r10 skew probe proved the caps bound FLOPs; these tests pin that
they also bound TASK MEMORY — the caps must apply BEFORE a hot group
materializes, not after.  Pre-r11, ``within_cell_dups`` shipped every
hot-cell VECTOR into one applyInPandas frame and sliced afterwards
(task memory = cell_rows x dims x 8 B — corpus-scale for a 30%-hot
cell), and the three LSH candidate generators collect_list'd the full
hot bucket's ids before filtering it out.  Same class as the r10
link_prediction_ra hub OOM: green correctness, invisible at fixture
scale, fatal at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ---------------------------------------------------------------------------
# within_cell_dups: the GEMM task must receive participants only
# ---------------------------------------------------------------------------


def test_cell_participants_bounds_every_cell(spark):
    """The participant selector runs on a NARROW (id, cell) projection
    and returns at most max_cell LOWEST ids per cell — the hot cell's
    vectors never ride the ranking shuffle."""
    from mqtt2clickhouse_spark.ops.similarity import cell_participants

    rows = [(i, [float(i), 1.0], 0) for i in range(500)] + [
        (1000 + i, [0.0, 1.0], 1) for i in range(3)
    ]
    cells = spark.createDataFrame(rows, "vid long, cv array<double>, cell long")
    parts = cell_participants(cells, max_cell=8)
    assert parts.columns == ["vid", "cell"], "selector must stay narrow"
    per_cell = {r["cell"]: r["n"] for r in parts.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per_cell == {0: 8, 1: 3}
    got = sorted(r["vid"] for r in parts.filter(F.col("cell") == 0).collect())
    assert got == list(range(8)), "participants must be the LOWEST ids"


def test_within_cell_dups_caps_before_the_pandas_task(spark):
    """With max_cell set, the plan must join the corpus against the
    participant set BEFORE FlatMapGroupsInPandas — so the hot cell's
    non-participant vectors never enter the GEMM task.  Pre-r11 the
    plan had no join at all: every hot-cell row materialized in one
    pandas frame and the cap was a post-hoc slice."""
    from mqtt2clickhouse_spark.ops.similarity import within_cell_dups

    rows = [(i, [1.0, 0.0], 0) for i in range(100)]
    cells = spark.createDataFrame(rows, "vid long, cv array<double>, cell long")
    out = within_cell_dups(cells, threshold=0.9, max_cell=4)
    plan = _plan(out)
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" in plan, (
        "no participant join upstream of the pandas GEMM — the hot "
        "cell's full vector set materializes in one task:\n" + plan
    )
    # semantics unchanged: 100 clones, cap 4 -> vids 1..3 are dups of 0,
    # vids 4..99 are past the cap and kept unexamined
    got = {r.vid: r.keep for r in out.collect()}
    assert got == {i: (i == 0 or i >= 4) for i in range(100)}


def test_within_cell_dups_uncapped_path_unchanged(spark):
    """max_cell=None keeps the original single-pass shape (no selector
    join) — the caller opted out of the guard."""
    from mqtt2clickhouse_spark.ops.similarity import within_cell_dups

    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)]
    cells = spark.createDataFrame(rows, "vid long, cv array<double>, cell long")
    out = within_cell_dups(cells, threshold=0.9)
    got = {r.vid: r.keep for r in out.collect()}
    assert got == {0: True, 1: False, 2: True}


# ---------------------------------------------------------------------------
# LSH candidate generators: hot buckets die by COUNT, never by
# materializing their member list
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "maker",
    ["lsh_candidate_pairs", "srp_candidate_pairs", "lsh_incremental_candidates"],
)
def test_bucket_cap_filters_by_count_not_by_collected_list(spark, maker):
    """With max_bucket set, each generator must pre-filter buckets by a
    partial-aggregable COUNT (an anti-join against the oversize keys)
    so collect_list only ever aggregates groups <= max_bucket.  Pre-r11
    the full hot bucket's list materialized in one aggregation buffer
    and was then dropped by a size() filter."""
    if maker == "srp_candidate_pairs":
        from mqtt2clickhouse_spark.ops.similarity import srp_candidate_pairs

        sig = spark.createDataFrame(
            [(i, 0) for i in range(10)], "id long, sig long"
        )
        out = srp_candidate_pairs(sig, bits=60, bands=6, max_bucket=4)
    elif maker == "lsh_candidate_pairs":
        from mqtt2clickhouse_spark.ops.dedup import lsh_candidate_pairs

        sig = spark.createDataFrame(
            [(i, 1, 1, 2, 2) for i in range(10)],
            "doc_id long, m0 long, m1 long, m2 long, m3 long",
        )
        out = lsh_candidate_pairs(sig, "doc_id", k=4, bands=2, max_bucket=4)
    else:
        from mqtt2clickhouse_spark.ops.dedup import lsh_incremental_candidates

        sig = spark.createDataFrame(
            [(i, i % 2 == 0, 1, 1, 2, 2) for i in range(10)],
            "doc_id long, is_new boolean, m0 long, m1 long, m2 long, m3 long",
        )
        out = lsh_incremental_candidates(
            sig, "doc_id", "is_new", k=4, bands=2, max_bucket=4
        )
    plan = _plan(out)
    assert "collect_list" in plan
    assert "Join" in plan, (
        f"{maker}: no count-based pre-filter join before collect_list — "
        "a degenerate bucket materializes its full member list in one "
        "aggregation buffer before being dropped:\n" + plan
    )
    # every degenerate bucket (all 10 ids share every band) is dropped
    assert out.count() == 0


# ---------------------------------------------------------------------------
# Diamond hygiene: the cap's count+anti references its input twice; the
# expensive subtrees feeding it must not evaluate twice
# ---------------------------------------------------------------------------


def test_srp_candidate_pairs_pins_signature_single_gemm(spark):
    """The cap diamond references the signature subtree twice; with an
    on-the-fly srp_signature input (a pandas-UDF GEMM) the generator
    must pin the narrow (id, sig) table so the GEMM evaluates once —
    the plan downstream of the pin shows NO ArrowEvalPython (pre-pin it
    showed two, one per diamond leg)."""
    from mqtt2clickhouse_spark.ops.similarity import (
        srp_candidate_pairs,
        srp_signature,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    sig = srp_signature(corpus, bits=60, dim=2)
    out = srp_candidate_pairs(sig, bits=60, bands=6, max_bucket=4)
    plan = _plan(out)
    assert plan.count("ArrowEvalPython") <= 1, (
        "the srp_signature GEMM evaluates once per diamond leg — pin "
        "the narrow signature table:\n" + plan
    )
    out.count()  # the pinned plan must still execute


def test_within_cell_dups_raw_vectors_skip_reassignment(spark):
    """With ``vectors`` given, the wide GEMM side joins the RAW corpus
    against the participants' (vid, cell) — the assignment subtree
    (whose max_by argmax agg blocks column pruning) evaluates only in
    the narrow ranking.  Results are identical either way."""
    from mqtt2clickhouse_spark.ops.similarity import (
        assign_cells,
        within_cell_dups,
    )

    rows = [(i, [float(i % 5), 1.0]) for i in range(40)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    pivots = spark.createDataFrame(
        rows[:4], "vec_id long, embedding array<double>"
    )
    cells = assign_cells(corpus, pivots)
    vectors = corpus.selectExpr(
        "vec_id AS vid", "CAST(embedding AS array<double>) AS cv"
    )
    ref = within_cell_dups(cells, threshold=0.999, max_cell=3)
    new = within_cell_dups(cells, threshold=0.999, max_cell=3, vectors=vectors)
    assert sorted(map(tuple, ref.collect())) == sorted(
        map(tuple, new.collect())
    )
    # one assignment evaluation, not two: max_by appears once per
    # evaluated copy of the assign agg in the formatted plan
    assert _plan(new).count("max_by") < _plan(ref).count("max_by")


# ---------------------------------------------------------------------------
# Neighbor-set builders: the per-node cap must bound the aggregation
# buffer, not just the downstream expansion (r11 collect-site audit)
# ---------------------------------------------------------------------------


def test_ra_hub_neighbor_sets_never_materialize(spark, monkeypatch):
    """The r10 hub cap stopped the quadratic WEDGE expansion, but the
    hub's full neighbor array still materialized in the collect_set
    buffer before the size() filter dropped it — the same pre-collect
    class as the LSH bucket caps.  The cap must drop hub keys by COUNT
    (partial-aggregable) + anti-join BEFORE collect_set: the plan shows
    TWO LeftAnti joins (the hub drop + the existing-edge exclusion),
    and the hand-checked scores are unchanged."""
    from mqtt2clickhouse_spark.queries import graph_queries as gq

    monkeypatch.setattr(gq, "_RA_MAX_DEG", 3)
    edges = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"),
         ("a", "x"), ("b", "x")],
        "u string, v string",
    )
    out = gq._ra_from_edges(edges)
    # count joins in the TREE section only — the formatted details
    # section repeats each node's name.  The pre-fix shape had exactly
    # ONE LeftAnti (the existing-edge exclusion); the cap adds at least
    # one more (Catalyst may push it below the Union, one per branch).
    tree = _plan(out).split("\n\n")[0]
    assert tree.count("LeftAnti") >= 2, (
        "no count-based pre-drop before collect_set — a hub's full "
        "neighbor set materializes in one aggregation buffer:\n" + tree
    )
    rows = {
        (r["u"], r["v"]): (r["n_common"], r["ra_score"])
        for r in out.collect()
    }
    assert rows == {("h", "x"): (2, 1.0), ("a", "b"): (1, 0.5)}


def test_bounded_lowest_rank_filters_before_collect(spark):
    """graph_random_walks keeps the cap LOWEST neighbors per node; the
    selection must be a rank filter BEFORE collect_list (bounded sort
    buffer, spillable) — not slice-after-collect (the full hot node's
    list in one buffer).  Values match the slice-after-collect shape
    exactly."""
    from mqtt2clickhouse_spark.queries import graph_queries as gq

    e = spark.createDataFrame(
        [("h", f"n{i:03d}") for i in range(50)] + [("x", "a")],
        "src string, dst string",
    )
    out = gq._bounded_lowest(e, "src", "dst", 4).groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("arr")
    )
    plan = _plan(out)
    assert "row_number" in plan, (
        "neighbor cap is not a pre-collect rank filter:\n" + plan
    )
    rows = {r["src"]: r["arr"] for r in out.collect()}
    assert rows == {"h": ["n000", "n001", "n002", "n003"], "x": ["a"]}


def test_seq_pattern_match_rank_filters_before_collect(spark, monkeypatch):
    """The docstring's claim 'the string is capped so a hot user cannot
    blow up a task' must be TRUE at the aggregation buffer, not just at
    the output: pre-r11 the substring cap applied AFTER collect_list
    had buffered the user's ENTIRE event history (a bot user's 1e9
    events in one aggregation buffer — the within_cell_dups false-claim
    class).  The cap must be a rank filter BEFORE collect; values are
    unchanged (first cap events by (ts, event_id) == first cap chars of
    the ordered string)."""
    from mqtt2clickhouse_spark.queries import analytics_queries as aq
    from mqtt2clickhouse_spark.queries.base import t

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(aq, "_SEQ_CAP", 7)
    out = aq.seq_pattern_match(spark, sf)
    plan = _plan(out)
    assert "row_number" in plan, (
        "sequence cap is not a pre-collect rank filter — the full "
        "per-user history buffers before the substring cap:\n" + plan
    )
    # value parity vs the substring-after-collect shape at the same cap
    ev = t(spark, sf, "events")
    ref_seqs = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id",
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("z"),
        )
        .groupBy("user_id")
        .agg(
            F.substring(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("z")), lambda x: x["ch"]
                    ),
                    "",
                ),
                1,
                7,
            ).alias("seq")
        )
    )
    got = {
        (r["pattern_name"], r["n_users"], r["matched_users"],
         r["total_occurrences"], r["match_rate"])
        for r in out.collect()
    }
    pats = F.array(
        *[
            F.struct(F.lit(n).alias("pattern_name"), F.lit(p).alias("pattern"))
            for n, p in aq._SEQ_PATTERNS
        ]
    )
    m = ref_seqs.select("seq", F.explode(pats).alias("p")).select(
        F.col("p.pattern_name").alias("pattern_name"),
        F.regexp_count("seq", F.col("p.pattern")).cast("long").alias("k"),
    )
    ref = {
        (r["pattern_name"], r["n_users"], r["matched_users"],
         r["total_occurrences"], r["match_rate"])
        for r in m.groupBy("pattern_name").agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.when(F.col("k") > 0, 1).otherwise(0)).cast("long").alias("matched_users"),
            F.sum("k").cast("long").alias("total_occurrences"),
            F.round(
                F.sum(F.when(F.col("k") > 0, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)), 4,
            ).alias("match_rate"),
        ).collect()
    }
    assert got == ref
