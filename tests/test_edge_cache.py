"""The graph family's materialized edge view (graph_queries._trade_pairs).

Eight graph queries share the lineitem⋈orders distinct pair subtree;
round 8 materializes it write-once under /tmp keyed by (sf path,
construction version, fixture mtimes) — the warehouse materialized-VIEW
pattern.  These tests pin the cache contract: correct contents, true
write-once reuse, and mtime-keyed invalidation (a regenerated fixture
must MISS, or the cache serves a stale graph while the DuckDB oracle
reads the fresh originals)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.graph_queries import (
    _edge_cache_path,
    _trade_pairs,
)
from mqtt2clickhouse_spark.queries.base import t

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def sf_copy(tmp_path):
    """A private copy of the fixture so mtimes are ours to control."""
    for name in ("lineitem", "orders"):
        shutil.copyfile(
            os.path.join(SF_DIR, f"{name}.parquet"),
            tmp_path / f"{name}.parquet",
        )
    return str(tmp_path)


def _direct_pairs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        )
        .distinct()
    )


def test_cache_contents_match_direct_computation(spark, sf_copy):
    cached = {tuple(r) for r in _trade_pairs(spark, sf_copy).collect()}
    direct = {tuple(r) for r in _direct_pairs(spark, sf_copy).collect()}
    assert cached == direct and cached


def test_cache_is_write_once(spark, sf_copy):
    _trade_pairs(spark, sf_copy).count()
    marker = os.path.join(_edge_cache_path(sf_copy), "_SUCCESS")
    first_write = os.path.getmtime(marker)
    _trade_pairs(spark, sf_copy).count()
    assert os.path.getmtime(marker) == first_write, "cache was rewritten"


def test_cached_pivots_equal_direct_training(spark, tmp_path):
    """The trained-quantizer materialization (ops.similarity.
    kmeans_pivots_cached) must return the exact matrix a direct
    kmeans_pivots call computes — training is deterministic, so any
    divergence means the cache key or the write is wrong."""
    from mqtt2clickhouse_spark.ops.similarity import (
        kmeans_pivots,
        kmeans_pivots_cached,
    )

    shutil.copyfile(
        os.path.join(SF_DIR, "embeddings.parquet"),
        tmp_path / "embeddings.parquet",
    )
    sf = str(tmp_path)
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    direct = {
        r["pivot_id"]: tuple(r["pv"])
        for r in kmeans_pivots(emb, k=8, iters=2).collect()
    }
    cached = {
        r["pivot_id"]: tuple(r["pv"])
        for r in kmeans_pivots_cached(emb, sf, k=8, iters=2).collect()
    }
    assert cached == direct and len(cached) == 8
    # second call reuses the on-disk matrix (write-once)
    again = {
        r["pivot_id"]: tuple(r["pv"])
        for r in kmeans_pivots_cached(emb, sf, k=8, iters=2).collect()
    }
    assert again == direct


def _plan_of(spark, name: str) -> str:
    from mqtt2clickhouse_spark.queries import QUERIES

    df = QUERIES[name].spark_fn(spark, "/root/testdata/sf0.001")
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_graph_queries_scan_the_edge_store_not_the_join(spark):
    """Regression guard for the round-8 materializations: the shared
    pair table must be a plain parquet read of the edge store, and
    pagerank must NOT re-plan the lineitem⋈orders distinct join (the
    exact cost the store removes — its pinned edges show up as Scan
    ExistingRDD, so the absence of the base-table scans is the
    observable)."""
    from mqtt2clickhouse_spark.queries.graph_queries import _trade_pairs

    pairs = _trade_pairs(spark, "/root/testdata/sf0.001")
    pairs.count()  # ensure built
    pairs_plan = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    assert "sparkgraft_edges" in pairs_plan
    assert "lineitem" not in pairs_plan
    plan = _plan_of(spark, "pagerank")
    assert "lineitem" not in plan and "orders.parquet" not in plan


def test_dedup_queries_scan_the_signature_store_not_the_udf(spark):
    """dedup_minhash_pairs must read the signature store parquet — no
    shingling ArrowEvalPython and no documents scan at query time."""
    from mqtt2clickhouse_spark.ops.dedup import minhash_signature_store
    from mqtt2clickhouse_spark.queries.base import t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    minhash_signature_store(docs, "/root/testdata/sf0.001").count()
    plan = _plan_of(spark, "dedup_minhash_pairs")
    assert "sparkgraft_minhash" in plan
    assert "ArrowEvalPython" not in plan
    assert "documents.parquet" not in plan


def test_materialize_once_atomic_publish(spark, tmp_path):
    """ops.store.materialize_once: builds appear atomically (never a
    half-written destination), an existing complete store is never
    rebuilt, and garbage at the destination (no _SUCCESS) is replaced."""
    from mqtt2clickhouse_spark.ops.store import materialize_once

    path = str(tmp_path / "store")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    out1 = {tuple(r) for r in materialize_once(df, path).collect()}
    assert out1 == {(i, 2 * i) for i in range(10)}
    marker = os.path.join(path, "_SUCCESS")
    first = os.path.getmtime(marker)
    # complete store: second call must not rebuild
    materialize_once(spark.range(3).selectExpr("id", "id AS v"), path).collect()
    assert os.path.getmtime(marker) == first
    out2 = {tuple(r) for r in materialize_once(df, path).collect()}
    assert out2 == out1
    # garbage destination (crashed old layout, no _SUCCESS): replaced
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "junk"), "w") as f:
        f.write("x")
    out3 = {tuple(r) for r in materialize_once(df, bad).collect()}
    assert out3 == out1
    assert os.path.exists(os.path.join(bad, "_SUCCESS"))
    assert not os.path.exists(os.path.join(bad, "junk"))
    # no stray .build temp dirs left behind
    strays = [p for p in os.listdir(tmp_path) if ".build." in p]
    assert not strays, strays


def test_shingle_and_signature_stores_equal_direct(spark, tmp_path):
    """The documents-derived stores (ops.dedup.shingle_store /
    minhash_signature_store) must return exactly what the direct
    shingle_rows / minhash_signature calls compute."""
    from mqtt2clickhouse_spark.ops.dedup import (
        minhash_signature,
        minhash_signature_store,
        shingle_rows,
        shingle_store,
    )

    shutil.copyfile(
        os.path.join(SF_DIR, "documents.parquet"),
        tmp_path / "documents.parquet",
    )
    sf = str(tmp_path)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    direct_sh = {tuple(r) for r in shingle_rows(docs, "doc_id", "text", 3).collect()}
    stored_sh = {tuple(r) for r in shingle_store(docs, sf).collect()}
    assert stored_sh == direct_sh and stored_sh
    direct_sig = {
        tuple(r)
        for r in minhash_signature(docs, "doc_id", "text", k=8, shingle_n=3).collect()
    }
    stored_sig = {tuple(r) for r in minhash_signature_store(docs, sf).collect()}
    assert stored_sig == direct_sig and stored_sig


def test_regenerated_fixture_misses_the_cache(spark, sf_copy):
    _trade_pairs(spark, sf_copy).count()
    old_path = _edge_cache_path(sf_copy)
    # simulate a fixture regeneration: same bytes, newer mtime
    li = os.path.join(sf_copy, "lineitem.parquet")
    os.utime(li, (os.path.getmtime(li) + 100, os.path.getmtime(li) + 100))
    new_path = _edge_cache_path(sf_copy)
    assert new_path != old_path, "stale cache would be served"
    # and the new key transparently rebuilds
    assert _trade_pairs(spark, sf_copy).count() > 0
    assert os.path.exists(os.path.join(new_path, "_SUCCESS"))
