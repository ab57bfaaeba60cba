"""Unit tests for the asymmetric incremental-LSH candidate generator
(ops/dedup.lsh_incremental_candidates) on hand-built signatures —
bucket membership is fully controlled, so every contract clause is
asserted directly rather than inferred from fixture behavior."""

from __future__ import annotations

from mqtt2clickhouse_spark.ops.dedup import lsh_incremental_candidates


def _sig(spark, rows):
    """rows: (doc_id, is_new, m0..m3) with k=4 → 2 bands of 2 rows."""
    return spark.createDataFrame(
        rows, "doc_id long, is_new boolean, m0 long, m1 long, m2 long, m3 long"
    )


def test_incremental_candidates_are_strictly_new_x_old(spark):
    # bucket A (band 0 sig '1_1'): new 10, old 20, old 21
    # bucket B (band 1 sig '9_9'): new 11, new 12 (no old -> no pairs)
    sig = _sig(
        spark,
        [
            (10, True, 1, 1, 5, 6),
            (20, False, 1, 1, 7, 8),
            (21, False, 1, 1, 3, 4),
            (11, True, 2, 2, 9, 9),
            (12, True, 3, 3, 9, 9),
        ],
    )
    got = {
        (r["new_id"], r["old_id"])
        for r in lsh_incremental_candidates(sig, "doc_id", "is_new", k=4, bands=2).collect()
    }
    # new 10 pairs with both olds sharing its band-0 bucket; the
    # new-only band-1 bucket of 11/12 emits NOTHING (no new x new)
    assert got == {(10, 20), (10, 21)}


def test_incremental_candidates_dedupe_multi_band_collisions(spark):
    # new 1 and old 2 collide in BOTH bands -> still one pair
    sig = _sig(spark, [(1, True, 1, 1, 2, 2), (2, False, 1, 1, 2, 2)])
    got = lsh_incremental_candidates(sig, "doc_id", "is_new", k=4, bands=2).collect()
    assert [(r["new_id"], r["old_id"]) for r in got] == [(1, 2)]


def test_incremental_candidates_honor_the_bucket_cap(spark):
    # a degenerate bucket with 1 new + 3 old members (size 4) is dropped
    # entirely at max_bucket=3 — the same whole-bucket rule as the
    # symmetric path
    rows = [(1, True, 1, 1, 10, 11)] + [
        (i, False, 1, 1, 20 + i, 30 + i) for i in (2, 3, 4)
    ]
    sig = _sig(spark, rows)
    capped = lsh_incremental_candidates(
        sig, "doc_id", "is_new", k=4, bands=2, max_bucket=3
    ).collect()
    assert capped == []
    uncapped = lsh_incremental_candidates(
        sig, "doc_id", "is_new", k=4, bands=2
    ).collect()
    assert {(r["new_id"], r["old_id"]) for r in uncapped} == {(1, 2), (1, 3), (1, 4)}
