"""Advanced analytics surface: TF-IDF, exact percentiles, GROUPING
SETS, approximate distinct, grouped-agg pandas UDAF (vector centroids),
and correlated-subquery semantics.

These round out the SURVEY §2.2 "absent in reference, engine provides"
categories with oracle-checked implementations: the UDAF surface
(pandas grouped agg), SQL entry points (GROUPING SETS via spark.sql),
and the approximate/statistical aggregates a 100 TB pipeline leans on.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                          x -> x <> '')) AS token
        FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
        WHERE tf.doc_id < 20),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token) AS rank
        FROM scored)
    SELECT doc_id, token, rank, tfidf FROM ranked WHERE rank <= 5
    """,
    description="TF-IDF top-5 terms per document (smooth idf; doc-frequency join)",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF without pyspark.ml: the classic two-aggregation + join
    formulation.  Scale notes: tf and df are both partial-aggregable
    (map-side combine); the df join broadcasts (vocab << corpus); the
    final per-doc top-k is a bounded window."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf rows are unique per (doc, token), so doc-frequency is a plain
    # count over tf — no second tokenize/explode pass, no distinct
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 20)
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "token", "rank", "tfidf")
    )


@register(
    "percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           round(avg(l_extendedprice), 4) AS mean
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Exact interpolated percentiles (p50/p90/p99) per return flag",
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles WITHOUT buffering values in an
    aggregation buffer: rank rows per group with ``row_number`` (one
    per-group sort, shared by the n/s windows over the same
    partitioning), keep only the rows sitting at the floor/ceil ranks
    of each quantile target, and interpolate — identical arithmetic to
    Spark's ``percentile`` / DuckDB's ``quantile_cont``
    (v_lo + (v_hi - v_lo) * frac over the 0-based rank (n-1)*p).

    TPC-H prices are near-unique, so pre-compressing to (group, value)
    counts (the previous shape here) pays a full extra shuffle+agg for
    ~1% row reduction; ranking directly skips it.  Scale honesty: an
    exact percentile of a high-cardinality double column requires the
    per-group sort wherever it runs; the 100 TB path is
    ``approx_percentile`` (t-digest, partial-aggregable), with this
    exact form reserved for bounded domains or final verification."""
    li = t(spark, sf_dir, "lineitem")
    wg = W.partitionBy("l_returnflag")
    wo = wg.orderBy(F.col("val"))
    ranked = (
        li.select("l_returnflag", F.col("l_extendedprice").alias("val"))
        .withColumn("r", F.row_number().over(wo) - 1)  # 0-based rank
        .withColumn("n", F.count(F.lit(1)).over(wg))
        .withColumn("s", F.sum("val").over(wg))
    )
    quantiles = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    targets = {k: (F.col("n") - 1) * F.lit(p) for k, p in quantiles.items()}
    # keep only rows AT a needed rank (floor or ceil of any target)
    covers = None
    for tgt in targets.values():
        hit = (F.col("r") == F.floor(tgt)) | (F.col("r") == F.ceil(tgt))
        covers = hit if covers is None else (covers | hit)
    aggs = []
    for k in quantiles:
        tgt = targets[k]
        v_lo = F.max(F.when(F.col("r") == F.floor(tgt), F.col("val")))
        v_hi = F.max(F.when(F.col("r") == F.ceil(tgt), F.col("val")))
        frac = F.max(tgt - F.floor(tgt))
        aggs.append(F.round(v_lo + (v_hi - v_lo) * frac, 4).alias(k))
    return (
        ranked.filter(covers)
        .groupBy("l_returnflag")
        .agg(*aggs, F.round(F.max(F.col("s") / F.col("n")), 4).alias("mean"))
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           GROUPING(event_type) AS g_et,
           GROUPING(date_trunc('day', ts)) AS g_day,
           count(*) AS n,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
    """,
    description="GROUPING SETS (by-type / by-day / grand total) with GROUPING markers",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point: Spark's GROUPING SETS via spark.sql over a temp
    view (same expand-based physical plan as cube/rollup)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('DAY', ts) AS day,
               CAST(grouping(event_type) AS INT) AS g_et,
               CAST(grouping(date_trunc('DAY', ts)) AS INT) AS g_day,
               count(1) AS n,
               round(sum(value), 4) AS total
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (date_trunc('DAY', ts)), ())
        """
    )


@register(
    "embedding_centroid",
    oracle="""
    SELECT label, pos, round(avg(v), 4) AS c
    FROM (SELECT label,
                 unnest(CAST(embedding AS DOUBLE[])) AS v,
                 unnest(range(1, len(embedding) + 1)) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
    description="Per-label embedding centroid via a grouped-agg pandas UDAF "
    "(Arrow batches, numpy mean), exploded to (label, pos, c) for comparison",
)
def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF surface (SURVEY §2.2): PandasUDFType.GROUPED_AGG.  The
    vector mean happens in numpy per label group; posexplode flattens to
    a schema both engines can hash identically."""
    import numpy as np

    @F.pandas_udf("array<double>")
    def mean_vec(vecs: pd.Series) -> list:
        return np.mean(np.stack(vecs.to_numpy()), axis=0).tolist()

    emb = t(spark, sf_dir, "embeddings")
    cent = emb.select("label", F.col("embedding").cast("array<double>").alias("v"))
    cent = cent.groupBy("label").agg(mean_vec("v").alias("centroid"))
    return cent.select(
        "label", F.posexplode("centroid").alias("pos0", "c")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.round("c", 4).alias("c"),
    )


@register(
    "datetime_math",
    oracle="""
    SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
           CAST(dayofweek(ts) AS INT) AS dow_sun0,
           CAST(hour(ts) AS INT) AS h,
           count(*) AS n,
           CAST(sum(CAST(floor(sqrt(abs(value)) * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_sqrt_micro,
           CAST(sum(CAST(floor(value * value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_sq_micro,
           CAST(sum(CAST(ceil(value) AS BIGINT)) AS BIGINT) AS sum_ceil,
           CAST(sum(CAST(floor(value * 100) AS BIGINT) % 7) AS BIGINT) AS sum_mod
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
    description="Date/time + math sampler: calendar extraction (dow aligned to "
    "DuckDB's Sunday=0) with sqrt/ln/ceil/mod aggregates",
)
def datetime_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function conventions differ across engines — Spark's
    dayofweek is Sunday=1, DuckDB's Sunday=0 — so the query normalizes
    explicitly.  Float aggregates sum MICRO-UNIT INTEGERS (order-
    independent) and divide at the end: double summation order differs
    between engines (Spark partial aggregation vs sequential) and can
    flip a rounding boundary."""
    events = t(spark, sf_dir, "events")
    v = F.col("value")
    return (
        events.select(
            F.year("ts").cast("int").alias("y"),
            F.month("ts").cast("int").alias("m"),
            (F.dayofweek("ts") - 1).cast("int").alias("dow_sun0"),
            F.hour("ts").cast("int").alias("h"),
            F.floor(F.sqrt(F.abs(v)) * 1_000_000).cast("long").alias("sq"),
            F.floor(v * v * 1_000_000).cast("long").alias("l"),
            F.ceil(v).cast("long").alias("c"),
            (F.floor(v * 100).cast("long") % 7).alias("md"),
        )
        .groupBy("y", "m", "dow_sun0", "h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sq").alias("sum_sqrt_micro"),
            F.sum("l").alias("sum_sq_micro"),
            F.sum("c").alias("sum_ceil"),
            F.sum("md").alias("sum_mod"),
        )
    )


@register(
    "map_ops",
    oracle="""
    SELECT user_id, event_type AS k, count(*) AS v
    FROM events
    GROUP BY user_id, event_type
    """,
    description="Map-column ops: per-user map<event_type, count> built with "
    "map_from_entries, then exploded back — map construction/explode round-trip",
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference has no array/map column types (SURVEY §2.2); this
    exercises Spark's map construction, access, and explosion.  The map
    lives inside the plan; the flattened output is what both engines can
    hash."""
    events = t(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return with_map.select(
        "user_id", F.explode("type_counts").alias("k", "v")
    )


@register(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(substring(lower(c_name), 1, 1)) || substring(lower(c_name), 2)
               AS titled,
           lpad(regexp_extract(c_name, '[0-9]+'), 12, '0') AS padded_id,
           reverse(translate(c_name, '#', '-')) AS scrambled,
           length(c_name)::BIGINT AS name_len
    FROM customer
    """,
    description="String-function sampler: Title-casing (the reference's "
    "strings.Title), regexp_extract, lpad, translate, reverse",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strings.Title (P3's type-name casing, message/message.go:121) and
    friends, expressed identically in both engines (initcap is absent in
    DuckDB, so titling is spelled out)."""
    cust = t(spark, sf_dir, "customer")
    lowered = F.lower("c_name")
    return cust.select(
        "c_custkey",
        F.concat(
            F.upper(F.substring(lowered, 1, 1)), F.expr("substring(lower(c_name), 2)")
        ).alias("titled"),
        F.lpad(F.regexp_extract("c_name", "[0-9]+", 0), 12, "0").alias("padded_id"),
        F.reverse(F.translate("c_name", "#", "-")).alias("scrambled"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@register(
    "variant_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_str,
           json_type(json(props)) AS root_type,
           count(*) AS n
    FROM events
    WHERE json_valid(props)
    GROUP BY 1, 2, 3
    """,
    description="Spark 4 VARIANT: parse_json once, multiple typed variant_get "
    "extractions + schema_of_variant (schema-on-read JSON)",
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carrier type for runtime-typed JSON (the same mechanism the parse
    pipeline uses for value typing): one parse, many typed extractions —
    versus get_json_object's one string-parse per path."""
    events = t(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    root_type = F.when(
        F.schema_of_variant(v).startswith("OBJECT"), F.lit("OBJECT")
    ).otherwise(F.schema_of_variant(v))
    return (
        events.select(
            F.try_variant_get(v, "$.k", "long").alias("k"),
            F.try_variant_get(v, "$.k", "string").alias("k_str"),
            root_type.alias("root_type"),
        )
        .filter(F.col("root_type").isNotNull())
        .groupBy("k", "k_str", "root_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 4) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT avg(i.o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    description="Correlated scalar subquery: orders 1.5x above their customer's average "
    "(decorrelated to an aggregate join)",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst decorrelates the subquery into exactly this aggregate +
    join — written directly in the DataFrame API so the intent (one scan
    reused, partial agg, shuffle on o_custkey) is visible."""
    orders = t(spark, sf_dir, "orders")
    avg_by_cust = orders.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(avg_by_cust, "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice")
        )
    )


# NOT decorated: registered by queries/__init__ (kept there since r1 so
# the registration-order history stays stable).  Through r8 this was the
# one rows-only entry (`err: no_oracle` on every driver row) because the
# HLL++ register VALUES are engine-specific.  The r8 verdict's recipe
# makes it fully driver-checkable without faking: emit the exact count
# plus a deterministic within-5% CALIBRATION flag — Spark's
# approx_count_distinct is a pure function of the data (register merges
# are commutative max; partitioning-independent), so the flag is stable
# — and let the DuckDB oracle produce the exact count with a literal 1.
# The row then attests the sketch's calibration, not its private value.
# Measured on the fixtures: worst rel_err 0.000 at sf0.01, 0.004 at
# sf0.1 (rsd=0.02 → the 5% bound is 2.5σ, and small groups sit in the
# sketch's exact sparse mode anyway).
def distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no fan_out: the distinct expand shuffles on (group, value) anyway,
    # so an upstream repartition only adds a pass (measured slower)
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                / F.col("exact_users")
                < F.lit(0.05)
            )
            .cast("long")
            .alias("approx_within_5pct"),
        )
    )


#: skyline_pareto: price-bucket width for the two-phase running max
_SKY_BUCKET = 100.0


@register(
    "skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT round(p_retailprice, 2) AS price, p_size AS size,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1, 2),
    d AS (
        SELECT price, size, n_parts,
               max(size) OVER (ORDER BY price ASC, size DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS runmax
        FROM pts)
    SELECT price, size, n_parts
    FROM d WHERE runmax IS NULL OR size > runmax
    """,
    description="Pareto skyline of parts (minimize price, maximize size): "
    "a distinct (price, size) point survives iff no cheaper-or-equal "
    "point has equal-or-larger size; computed as a running max over the "
    "price order — two-phase (bucketed) on the Spark side.",
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-D skyline reduces to a sorted scan: order distinct points
    by (price asc, size desc) — a point is dominated iff some strictly
    earlier point reaches its size.  The oracle states that directly
    with one global window; the Spark plan refuses the single-partition
    sort and computes the same running max TWO-PHASE (the
    global_shuffle/weighted_sample pattern): bucket by price range
    (buckets are monotone in price, so every earlier bucket is strictly
    cheaper), per-bucket max → tiny prefix-max table (broadcast), then
    per-bucket parallel windows add the in-bucket prefix — the point
    set never collapses onto one partition.  Dedup to distinct (price,
    size) first keeps the scan vocab-sized and carries part counts
    along."""
    pts = (
        t(spark, sf_dir, "part")
        .groupBy(
            F.round("p_retailprice", 2).alias("price"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .withColumn("b", F.floor(F.col("price") / _SKY_BUCKET).cast("long"))
    )
    bucket_max = pts.groupBy("b").agg(F.max("size").alias("mx"))
    prefix = bucket_max.withColumn(
        "pmax",
        F.max("mx").over(W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)),
    ).select("b", "pmax")
    runmax = F.max("size").over(
        W.partitionBy("b")
        .orderBy(F.asc("price"), F.desc("size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    dom = F.greatest(
        F.coalesce(F.col("pmax"), F.lit(-1)), F.coalesce(runmax, F.lit(-1))
    )
    return (
        pts.join(F.broadcast(prefix), "b")
        .withColumn("dom", dom)
        .filter(F.col("size") > F.col("dom"))
        .select("price", "size", "n_parts")
    )


@register(
    "window_funcs",
    oracle="""
    WITH s AS (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               round(percent_rank() OVER w, 4) AS pct_rank,
               round(cume_dist() OVER w, 4) AS cume,
               ntile(4) OVER w AS quartile,
               round(nth_value(l_extendedprice, 2) OVER
                     (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING), 2) AS second_lowest
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber))
    SELECT l_returnflag,
           CAST(quartile AS BIGINT) AS quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(pct_rank), 4) AS min_pr,
           round(max(pct_rank), 4) AS max_pr,
           round(max(cume), 4) AS max_cume,
           round(max(second_lowest), 2) AS second_lowest
    FROM s GROUP BY 1, 2
    """,
    description="Ranking-window API sampler: percent_rank, cume_dist, "
    "ntile(4), and nth_value over one fully deterministic per-group "
    "order, folded to per-quartile summaries — completes the window-"
    "function surface (row_number/rank/lag/lead/running frames are "
    "exercised elsewhere).",
)
def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four ranking functions share ONE window definition, so the
    plan pays one shuffle on the group key and one per-group sort for
    the lot (the nth_value full-frame variant reuses the same sort).
    The order key carries (price, orderkey, linenumber) so ties cannot
    reorder across engines; outputs fold to a bounded per-quartile
    table."""
    li = t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    s = li.select(
        "l_returnflag",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.nth_value("l_extendedprice", 2).over(wf), 2).alias(
            "second_lowest"
        ),
    )
    return s.groupBy(
        "l_returnflag", F.col("quartile").cast("long").alias("quartile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("pct_rank"), 4).alias("min_pr"),
        F.round(F.max("pct_rank"), 4).alias("max_pr"),
        F.round(F.max("cume"), 4).alias("max_cume"),
        F.round(F.max("second_lowest"), 2).alias("second_lowest"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH a AS (
        -- l_linenumber is NOT unique in the fixture; the full
        -- (ln, price, qty) key pins ONE permutation for both lists,
        -- matching the Spark side's struct array_sort
        SELECT l_orderkey,
               list(round(l_extendedprice, 2)
                    ORDER BY l_linenumber, round(l_extendedprice, 2),
                             round(l_quantity, 2)) AS prices,
               list(round(l_quantity, 2)
                    ORDER BY l_linenumber, round(l_extendedprice, 2),
                             round(l_quantity, 2)) AS qtys
        FROM lineitem WHERE l_orderkey % 7 = 0
        GROUP BY 1)
    SELECT l_orderkey,
           CAST(len(prices) AS BIGINT) AS n_lines,
           round(list_reduce(list_transform(prices, x -> x),
                             (acc, x) -> acc + x), 2) AS total,
           round(list_reduce(
                     list_transform(range(1, len(prices) + 1),
                                    i -> prices[i] * qtys[i]),
                     (acc, x) -> acc + x), 2) AS dot_pq,
           CAST(len(list_filter(prices, x -> x > 1000)) AS BIGINT)
               AS n_over_1k,
           -- list_max, not list_reduce((a,b) -> CASE WHEN b > a ...):
           -- the reduce-with-comparison-lambda form miscomputes for 3
           -- of 2107 groups in DuckDB 1.x under the full parallel
           -- aggregation (deterministically != list_max) — engine
           -- quirk, not semantics
           list_max(prices) AS max_price,
           (len(list_filter(prices, x -> x <= 0)) = 0) AS all_positive
    FROM a
    """,
    description="Higher-order-function API sampler over per-order price "
    "vectors: transform, zip_with (element-wise product fold = dot "
    "product), filter, aggregate/reduce, and forall on one "
    "deterministically ordered collect_list — the declarative array "
    "calculus the embedding kernels build on, attested directly.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle builds the per-order vectors (collect_list over
    structs + array_sort gives a deterministic element order without a
    window sort); every readout after that is a map-side HOF chain —
    transform/zip_with/filter/aggregate/forall all run per-row with no
    further exchange.  Scale note: Catalyst interprets HOF lambdas
    (NOTES), which is fine here because each array is order-lines
    small; corpus-sized per-token loops use the Arrow UDF path
    instead."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    a = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.round("l_extendedprice", 2).alias("p"),
                    F.round("l_quantity", 2).alias("q"),
                )
            )
        ).alias("lines")
    ).select(
        "l_orderkey",
        F.transform(F.col("lines"), lambda s: s.p).alias("prices"),
        F.transform(F.col("lines"), lambda s: s.q).alias("qtys"),
    )
    total = F.aggregate(
        F.transform(F.col("prices"), lambda x: x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dot = F.aggregate(
        F.zip_with(F.col("prices"), F.col("qtys"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return a.select(
        "l_orderkey",
        F.size("prices").cast("long").alias("n_lines"),
        F.round(total, 2).alias("total"),
        F.round(dot, 2).alias("dot_pq"),
        F.size(F.filter(F.col("prices"), lambda x: x > 1000))
        .cast("long")
        .alias("n_over_1k"),
        F.array_max("prices").alias("max_price"),
        F.forall(F.col("prices"), lambda x: x > 0).alias("all_positive"),
    )


@register(
    "null_semantics",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN value < 50 THEN NULL ELSE round(value, 2) END AS v,
               CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END AS k
        FROM events),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(v) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT k) AS BIGINT) AS nd_k,
               round(avg(v), 4) AS avg_v,
               CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               CAST(sum(CASE WHEN v IS NOT DISTINCT FROM NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
               CAST(sum(CASE WHEN coalesce(v, 0) = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_coalesced
        FROM base GROUP BY 1),
    nullgrp AS (
        SELECT CAST(count(*) AS BIGINT) AS null_key_rows
        FROM (SELECT k, count(*) AS c FROM base GROUP BY 1) g,
             (SELECT k AS k2, count(*) AS c2 FROM base GROUP BY 1) h
        WHERE g.k IS NULL AND h.k2 IS NULL AND g.c = h.c2)
    SELECT a.event_type, a.n_rows, a.n_nonnull, a.nd_k, a.avg_v,
           a.n_null, a.n_nullsafe, a.n_coalesced, ng.null_key_rows
    FROM agg a CROSS JOIN nullgrp ng
    """,
    description="Three-valued-logic conformance sampler: count(*) vs "
    "count(col) vs count(DISTINCT) under NULLs, NULL-ignoring avg, "
    "IS NULL vs the null-safe comparator (IS NOT DISTINCT FROM / <=>), "
    "coalesce folding, and the NULL-groups-as-one-key rule cross-checked "
    "through a null-safe self-join — the semantics corner every "
    "engine-migration audit has to sign off on.",
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLs are synthesized deterministically from value/event_id so
    both engines derive the identical null pattern, then every
    null-sensitive primitive is exercised in ONE aggregate pass:
    count(col) skips nulls, count(*) doesn't, count(DISTINCT) drops the
    null key, avg ignores nulls, and the null-safe comparator treats
    NULL = NULL as true where ordinary equality yields unknown.  The
    null-key cross-check groups by the nullable key in two derivations
    and joins them NULL-SAFELY — proving both engines put all NULL keys
    in one group with equal counts (an ordinary equi-join would drop
    that row).  Everything partial-aggregates; the self-join runs on
    two group-count-sized tables."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.col("value") < 50, F.lit(None)).otherwise(
            F.round("value", 2)
        ).alias("v"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(
            F.col("user_id")
        ).alias("k"),
    )
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("v").cast("long").alias("n_nonnull"),
        F.count_distinct("k").cast("long").alias("nd_k"),
        F.round(F.avg("v"), 4).alias("avg_v"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.sum(F.when(F.col("v").eqNullSafe(F.lit(None)), 1).otherwise(0))
        .cast("long")
        .alias("n_nullsafe"),
        F.sum(F.when(F.coalesce(F.col("v"), F.lit(0.0)) == 0.0, 1).otherwise(0))
        .cast("long")
        .alias("n_coalesced"),
    )
    g = base.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    h = base.groupBy(F.col("k").alias("k2")).agg(F.count(F.lit(1)).alias("c2"))
    nullgrp = (
        g.join(h, g.k.eqNullSafe(h.k2) & (g.c == h.c2))
        .filter(F.col("k").isNull())
        .agg(F.count(F.lit(1)).cast("long").alias("null_key_rows"))
    )
    return agg.crossJoin(F.broadcast(nullgrp)).select(
        "event_type",
        "n_rows",
        "n_nonnull",
        "nd_k",
        "avg_v",
        "n_null",
        "n_nullsafe",
        "n_coalesced",
        "null_key_rows",
    )


@register(
    "nested_json_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(max(l_linenumber) AS BIGINT) AS max_ln
    FROM lineitem
    GROUP BY 1
    """,
    description="Nested semi-structured round-trip: order lines are "
    "packed into one JSON document per order (array of line structs), "
    "then parsed back with an explicit nested schema, exploded, and "
    "re-aggregated — the oracle computes the same aggregates from the "
    "flat originals, so the hash match proves to_json / from_json / "
    "explode preserved every value and no line was lost or duplicated "
    "in the nesting.",
)
def nested_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document-database interchange shape, attested end to end:
    nesting is one shuffle on the order key (collect_list of structs —
    the same shape a JSON export or a Kafka message body would carry),
    serialization and re-parse are map-side (to_json / from_json with
    an explicit schema — no schema inference pass), the explode is a
    map-side Generate, and the closing aggregate partial-combines.
    Integer-scaled sums keep the check order-independent across the
    re-shard the round-trip causes."""
    li = t(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_returnflag").alias("flag"),
                F.col("l_extendedprice").alias("price"),
            )
        ).alias("lines")
    )
    jdoc = nested.select(
        F.to_json(
            F.struct(F.col("l_orderkey").alias("okey"), F.col("lines"))
        ).alias("doc")
    )
    schema = (
        "okey long, lines array<struct<ln: long, flag: string, "
        "price: double>>"
    )
    parsed = jdoc.select(F.from_json("doc", schema).alias("d")).select(
        F.col("d.okey").alias("okey"), F.explode("d.lines").alias("line")
    )
    return parsed.groupBy(F.col("line.flag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count_distinct("okey").cast("long").alias("n_orders"),
        F.sum(F.round(F.col("line.price") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.max("line.ln").cast("long").alias("max_ln"),
    )


#: chi2_independence: fixed value-bucket edges (no quantile pass), the
#: alpha=0.05 critical value for dof = (5 types - 1)(4 buckets - 1) = 12,
#: and the injected-association shift shared with ks_drift's philosophy
_CHI2_EDGES = (10.0, 50.0, 150.0)
_CHI2_CRIT_12 = 21.026
_CHI2_SHIFT = 1.25
_CHI2_CELL_SCALE = 10**6


@register(
    "chi2_independence",
    oracle=f"""
    WITH base AS (
        SELECT event_type, value AS v,
               CASE WHEN event_type IN ('click', 'view')
                    THEN value * {_CHI2_SHIFT} ELSE value END AS vs
        FROM events),
    both_labels AS (
        SELECT 'natural' AS label, event_type,
               CASE WHEN v < {_CHI2_EDGES[0]} THEN 0
                    WHEN v < {_CHI2_EDGES[1]} THEN 1
                    WHEN v < {_CHI2_EDGES[2]} THEN 2 ELSE 3 END AS bucket
        FROM base
        UNION ALL
        SELECT 'injected', event_type,
               CASE WHEN vs < {_CHI2_EDGES[0]} THEN 0
                    WHEN vs < {_CHI2_EDGES[1]} THEN 1
                    WHEN vs < {_CHI2_EDGES[2]} THEN 2 ELSE 3 END
        FROM base),
    o AS (
        SELECT label, event_type, bucket, CAST(count(*) AS BIGINT) AS n
        FROM both_labels GROUP BY 1, 2, 3),
    dom AS (
        SELECT l.label, t.event_type, b.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bucket) b
        CROSS JOIN (SELECT unnest(['natural', 'injected']) AS label) l),
    o_dense AS (
        SELECT d.label, d.event_type, d.bucket, COALESCE(o.n, 0) AS n
        FROM dom d
        LEFT JOIN o ON o.label = d.label AND o.event_type = d.event_type
                   AND o.bucket = d.bucket),
    tot AS (
        SELECT label, event_type, bucket, n,
               sum(n) OVER (PARTITION BY label, event_type) AS rt,
               sum(n) OVER (PARTITION BY label, bucket) AS ct,
               sum(n) OVER (PARTITION BY label) AS nn
        FROM o_dense),
    cells AS (
        SELECT label,
               CASE WHEN rt = 0 OR ct = 0 THEN 0
                    ELSE CAST(round({_CHI2_CELL_SCALE} *
                         (n - CAST(rt AS DOUBLE) * ct / nn)
                         * (n - CAST(rt AS DOUBLE) * ct / nn)
                         / (CAST(rt AS DOUBLE) * ct / nn)) AS BIGINT)
               END AS cq
        FROM tot)
    SELECT label,
           round(CAST(CAST(sum(cq) AS BIGINT) AS DOUBLE)
                 / {_CHI2_CELL_SCALE}, 4) AS chi2,
           CAST(12 AS BIGINT) AS dof,
           {_CHI2_CRIT_12} AS crit,
           CAST(CASE WHEN CAST(CAST(sum(cq) AS BIGINT) AS DOUBLE)
                          / {_CHI2_CELL_SCALE} > {_CHI2_CRIT_12}
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_independence
    FROM cells GROUP BY 1
    """,
    description="Chi-square independence test of event_type x value-"
    "bucket (fixed edges, dof=12, alpha=0.05): the 'natural' "
    "contingency accepts independence (the fixture's value "
    "distribution is type-invariant), while an injected x1.25 shift "
    "on click/view flips the same machinery to reject — the detector "
    "verified against known ground truth, like ks_drift.  The "
    "categorical-association gate for training-data audits "
    "(is a quality signal confounded with the source?).",
)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactness: each cell's (O-E)^2/E is quantized to an integer
    (x1e6) BEFORE summation, so the statistic is independent of the
    40-cell summation order (double addition is not associative; "
    "integer addition is).  E = rowtot*coltot/N is the same IEEE
    expression in both engines.  The contingency is DENSIFIED to the
    full type x bucket grid before scoring (ADVICE r6): an observed-
    rows-only table silently drops the E contribution of every empty
    cell ((0-E)^2/E = E) while dof stays pinned at 12 for the full
    table, understating the textbook statistic whenever a cell is
    empty.  A cell whose whole row or column marginal is zero is
    scored 0 by convention (the textbook drops such a line and shrinks
    dof; keeping dof=12 with a 0 contribution is the conservative
    cross-engine-stable choice, and cannot occur at the tested scale).
    Plan: one hash aggregate to the 40-cell contingency, a broadcast
    left join onto the 40-row literal domain grid, window totals over
    it (cells-sized, bounded), one final aggregate — the corpus is
    touched once for both labels via the unioned projection."""
    ev = t(spark, sf_dir, "events")
    shifted = F.col("event_type").isin("click", "view")
    vs = F.when(shifted, F.col("value") * _CHI2_SHIFT).otherwise(
        F.col("value")
    )

    def bucket(c):
        return (
            F.when(c < _CHI2_EDGES[0], 0)
            .when(c < _CHI2_EDGES[1], 1)
            .when(c < _CHI2_EDGES[2], 2)
            .otherwise(3)
        )

    lab = ev.select(
        F.lit("natural").alias("label"),
        "event_type",
        bucket(F.col("value")).alias("bucket"),
    ).unionAll(
        ev.select(
            F.lit("injected").alias("label"),
            "event_type",
            bucket(vs).alias("bucket"),
        )
    )
    o = lab.groupBy("label", "event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # densify to the full label x type x bucket grid: empty cells must
    # contribute E = rt*ct/nn to the statistic, not vanish (ADVICE r6).
    # 40 literal-domain rows; exploded arrays, no cartesian operator.
    dom = (
        lab.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("bucket"),
        )
        .select(
            "event_type",
            "bucket",
            F.explode(F.array(F.lit("natural"), F.lit("injected"))).alias(
                "label"
            ),
        )
    )
    o = dom.join(o, ["label", "event_type", "bucket"], "left").select(
        "label",
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
    )
    tot = o.select(
        "label",
        "n",
        F.sum("n").over(W.partitionBy("label", "event_type")).alias("rt"),
        F.sum("n").over(W.partitionBy("label", "bucket")).alias("ct"),
        F.sum("n").over(W.partitionBy("label")).alias("nn"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("nn")
    cq = F.when((F.col("rt") == 0) | (F.col("ct") == 0), F.lit(0)).otherwise(
        F.round(
            F.lit(_CHI2_CELL_SCALE) * (F.col("n") - e) * (F.col("n") - e) / e
        )
    ).cast("long")
    s = tot.select("label", cq.alias("cq")).groupBy("label").agg(
        F.sum("cq").cast("long").alias("sq")
    )
    chi2 = F.col("sq").cast("double") / _CHI2_CELL_SCALE
    return s.select(
        "label",
        F.round(chi2, 4).alias("chi2"),
        F.lit(12).cast("long").alias("dof"),
        F.lit(_CHI2_CRIT_12).alias("crit"),
        F.when(chi2 > _CHI2_CRIT_12, 1)
        .otherwise(0)
        .cast("long")
        .alias("reject_independence"),
    )


# -- Benford first-digit audit --------------------------------------------
#: expected first-significant-digit frequencies log10(1 + 1/d) as
#: shared literals (no runtime libm), chi2 critical value at dof=8,
#: alpha=0.05.  Digit extraction is an integer CASE ladder over exact
#: cents (c <= 49_003 at the fixture's value range; extend the ladder
#: before raising the domain) — a float log10 could differ in the last
#: ulp between engines at exact powers of ten.
_BENFORD_P = (
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
)
_BENFORD_CRIT_8 = 15.507
_BENFORD_SCALE = 10**6


@register(
    "benford_audit",
    oracle=f"""
    WITH c AS (
        SELECT CAST(round(100 * value) AS BIGINT) AS cents FROM events
        WHERE value > 0),
    d AS (
        SELECT CASE WHEN cents >= 10000000 THEN NULL
                    WHEN cents >= 1000000 THEN cents // 1000000
                    WHEN cents >= 100000 THEN cents // 100000
                    WHEN cents >= 10000 THEN cents // 10000
                    WHEN cents >= 1000 THEN cents // 1000
                    WHEN cents >= 100 THEN cents // 100
                    WHEN cents >= 10 THEN cents // 10
                    ELSE cents END AS digit
        FROM c),
    o AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
        WHERE digit IS NOT NULL GROUP BY 1),
    dom AS (
        SELECT unnest(range(1, 10)) AS digit,
               unnest(CAST([{", ".join(str(p) for p in _BENFORD_P)}]
                      AS DOUBLE[])) AS exp_p),
    j AS (
        SELECT dom.digit, COALESCE(o.n, 0) AS n, dom.exp_p,
               (SELECT sum(n) FROM o) AS tot
        FROM dom LEFT JOIN o ON o.digit = dom.digit),
    cells AS (
        SELECT digit, n, exp_p, tot,
               CAST(round({_BENFORD_SCALE}
                    * (n - exp_p * tot) * (n - exp_p * tot)
                    / (exp_p * tot)) AS BIGINT) AS cq
        FROM j),
    s AS (SELECT CAST(sum(cq) AS BIGINT) AS sq FROM cells)
    SELECT c.digit,
           c.n,
           round(CAST(c.n AS DOUBLE) / c.tot, 4) AS obs_freq,
           round(c.exp_p, 4) AS benford_freq,
           round(CAST(s.sq AS DOUBLE) / {_BENFORD_SCALE}, 4) AS chi2,
           CAST(CASE WHEN CAST(s.sq AS DOUBLE) / {_BENFORD_SCALE}
                          > {_BENFORD_CRIT_8} THEN 1 ELSE 0 END AS BIGINT)
               AS reject_benford
    FROM cells c, s ORDER BY 1
    """,
    description="Benford first-significant-digit audit of the value "
    "column: observed vs log10(1+1/d) frequencies with a chi-square "
    "verdict (dof=8) — the classic fabricated-data screen.  Honest "
    "fixture finding: the synthetic value generator lands "
    "surprisingly CLOSE to Benford (obs 0.282/0.160/0.125... vs "
    "0.301/0.176/0.125...), but chi2 = 61.8 >> 15.5 still rejects at "
    "n = 10k — the deviations are small yet systematic, and a "
    "goodness-of-fit test at this sample size has the power to see "
    "them.  Exactly the verdict a generated-not-natural column "
    "deserves.",
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side digit extraction (integer CASE ladder — exact in
    both engines, no libm log10 at runtime) + one 9-cell aggregate;
    the chi-square is the integer-quantized-cell idiom from
    chi2_independence, so summation order cannot move it.  Everything
    after the first aggregate is constant-size."""
    ev = t(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = F.round(100 * F.col("value")).cast("long")
    digit = (
        F.when(cents >= 10_000_000, F.lit(None))
        .when(cents >= 1_000_000, (cents / 1_000_000).cast("long"))
        .when(cents >= 100_000, (cents / 100_000).cast("long"))
        .when(cents >= 10_000, (cents / 10_000).cast("long"))
        .when(cents >= 1_000, (cents / 1_000).cast("long"))
        .when(cents >= 100, (cents / 100).cast("long"))
        .when(cents >= 10, (cents / 10).cast("long"))
        .otherwise(cents)
    )
    o = (
        ev.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
        # ^ r15: ≤9-row output over a corpus-sized scan, and THREE
        # downstream consumers (tot broadcast, the cell join, and the
        # chi2 sum broadcast) — un-pinned, each broadcast job re-ran
        # the full events scan + digit aggregate (guide §2.4 / the
        # NOTES cheap-output pin rule)
    )
    dom = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_P)], "digit long, exp_p double"
    )
    tot = o.agg(F.sum("n").cast("long").alias("tot"))
    j = (
        dom.join(o, "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
            "exp_p",
        )
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("exp_p") * F.col("tot")
    cq = F.round(
        F.lit(_BENFORD_SCALE) * (F.col("n") - e) * (F.col("n") - e) / e
    ).cast("long")
    cells = j.withColumn("cq", cq)
    s = cells.agg(F.sum("cq").cast("long").alias("sq"))
    chi2 = F.col("sq").cast("double") / _BENFORD_SCALE
    return (
        cells.crossJoin(F.broadcast(s))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 4).alias(
                "obs_freq"
            ),
            F.round("exp_p", 4).alias("benford_freq"),
            F.round(chi2, 4).alias("chi2"),
            F.when(chi2 > _BENFORD_CRIT_8, 1)
            .otherwise(0)
            .cast("long")
            .alias("reject_benford"),
        )
        .orderBy("digit")
    )


@register(
    "rank_correlation",
    oracle="""
    WITH pp AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(100 * l_extendedprice
                                   * (1 - l_discount)) AS BIGINT))
                    AS BIGINT) AS rev_cents,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS qty
        FROM lineitem GROUP BY 1),
    j AS (
        SELECT p.p_brand AS brand, pp.l_partkey, pp.rev_cents, pp.qty
        FROM pp JOIN part p ON pp.l_partkey = p.p_partkey),
    ranked AS (
        SELECT brand,
               row_number() OVER (PARTITION BY brand
                                  ORDER BY rev_cents DESC, l_partkey)
                   AS r_rev,
               row_number() OVER (PARTITION BY brand
                                  ORDER BY qty DESC, l_partkey) AS r_qty
        FROM j),
    d AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum((r_rev - r_qty) * (r_rev - r_qty)) AS BIGINT)
                   AS sum_d2
        FROM ranked GROUP BY 1)
    SELECT brand, n_parts, sum_d2,
           round(1.0 - CAST(6 * sum_d2 AS DOUBLE)
                 / (n_parts * (n_parts * n_parts - 1)), 4) AS spearman_rho
    FROM d WHERE n_parts > 1 ORDER BY brand
    """,
    description="Spearman rank correlation per part brand between two "
    "business metrics — revenue rank vs unit-quantity rank of the "
    "brand's parts (deterministic partkey tiebreaks in both rankings, "
    "the exact-arithmetic variant of tied-rank averaging) — rho = "
    "1 - 6*sum(d^2)/(n(n^2-1)) from exact integer rank differences, "
    "one IEEE division per brand.  The metric-agreement screen that "
    "tells you whether 'top sellers by revenue' and 'top sellers by "
    "volume' are the same list.",
)
def rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact collapses to per-part integer totals first (one
    partial-aggregable shuffle on partkey); rankings are windows over
    the PART-dimension table partitioned by brand — each window sorts
    one brand's ~dimension-sized slice, never the fact.  Both rank
    columns ride separate orderings of the same 25-way-partitioned
    table; the rho rollup is exact BIGINT algebra with a single
    division.  Deterministic tiebreaks make the rankings — and hence
    rho — reproducible across engines and partitionings."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    pp = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                100 * F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).cast("long")
        )
        .cast("long")
        .alias("rev_cents"),
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("qty"),
    )
    j = pp.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        pp["l_partkey"] == F.col("p_partkey"),
    ).select(F.col("p_brand").alias("brand"), "l_partkey", "rev_cents", "qty")
    from pyspark.sql import Window as W

    r_rev = F.row_number().over(
        W.partitionBy("brand").orderBy(F.desc("rev_cents"), "l_partkey")
    )
    r_qty = F.row_number().over(
        W.partitionBy("brand").orderBy(F.desc("qty"), "l_partkey")
    )
    ranked = j.select(
        "brand", r_rev.alias("r_rev"), r_qty.alias("r_qty")
    )
    dd = F.col("r_rev") - F.col("r_qty")
    d = ranked.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(dd * dd).cast("long").alias("sum_d2"),
    )
    return (
        d.filter(F.col("n_parts") > 1)
        .select(
            "brand",
            "n_parts",
            "sum_d2",
            F.round(
                1.0
                - (6 * F.col("sum_d2")).cast("double")
                / (
                    F.col("n_parts")
                    * (F.col("n_parts") * F.col("n_parts") - 1)
                ),
                4,
            ).alias("spearman_rho"),
        )
        .orderBy("brand")
    )


#: runtime-bloom-filter demo: the selective slice of orders
_RBF_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # the injection rule declines when the creation side is
    # broadcastable (a broadcast join would already prune); disabling
    # auto-broadcast FOR THIS QUERY makes the shuffle-join + runtime-
    # filter path the one under test
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _rbf_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    cents = F.round(
        100 * F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("long")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(F.month("o_orderdate").alias("mon"), cents.alias("cents"))
        .groupBy("mon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("revenue"),
        )
        .orderBy("mon")
    )


@register(
    "runtime_filter_join",
    oracle="""
    SELECT CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(CAST(round(100 * l_extendedprice
                                     * (1 - l_discount)) AS BIGINT))
                      AS DOUBLE) / 100, 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY 1 ORDER BY 1
    """,
    description="Runtime bloom-filter join pruning: a selective filter "
    "on the orders side is compiled by Catalyst into a bloom filter "
    "that is BUILT AT RUNTIME and pushed into the lineitem scan "
    "(might_contain on the join key), so the big side discards "
    "non-matching rows before the shuffle — the engine-native version "
    "of the manual broadcast-Bloom prefilter in decontaminate_bloom.  "
    "Values are those of the plain join; the plan, not the answer, is "
    "what the technique changes (tests pin might_contain + "
    "SortMergeJoin under the scoped confs).",
)
def runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The injection confs are SCOPED: set, the join executed eagerly
    (localCheckpoint(eager=True) — the result is a 3-row aggregate),
    then restored in a finally block, so no other query in a shared
    session plans under the demo's disabled auto-broadcast.  At real
    scale the defaults already apply (the 10 GB application-side
    threshold exists precisely because the technique pays off on big
    scans); this query pins the MECHANISM at fixture scale."""
    old = {}
    for k, v in _RBF_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        return _rbf_frame(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
