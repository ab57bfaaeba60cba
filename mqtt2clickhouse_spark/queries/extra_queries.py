"""As-of join and multimodal-column queries.

``asof_join`` is checked against DuckDB's native ASOF JOIN; the engine
implements it with the union-and-carry-forward window pattern
(ops.asof) — one shuffle on the key, no range explosion.

``multimodal_meta`` oracle-checks the binary-column metadata plumbing;
``multimodal_features`` exercises the Arrow-batched mapInPandas
feature-extraction path (deterministic stub decoder — real media libs
are not in the container); its oracle re-derives the stub featurizer
(byte histogram) in SQL, so even the Arrow path is value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops.asof import asof_join
from mqtt2clickhouse_spark.ops.multimodal import extract_features, with_media_columns
from mqtt2clickhouse_spark.ops.rangejoin import range_join
from mqtt2clickhouse_spark.queries.base import register, t


@register(
    "asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.value, r.value AS last_purchase
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    description="As-of join: each click sees the user's most recent purchase value "
    "(union + carry-forward window, one shuffle)",
)
def asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        value_cols=["value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id", "user_id", "value", F.col("value_asof").alias("last_purchase")
    )


@register(
    "range_join",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS purchase_id, l.user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND l.ts >= r.ts AND l.ts < r.ts + INTERVAL 30 MINUTE
    """,
    description="Interval join via bucketed equi-join + refine (clicks within "
    "30 min after a purchase) — no nested-loop cross product",
)
def range_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    joined = range_join(
        clicks,
        purchases,
        point_ts="click_ts",
        start_ts="win_start",
        end_ts="win_end",
        by=["user_id"],
        bucket_seconds=1800,  # = max interval length → <= 2 copies per interval
    )
    return joined.select("click_id", "purchase_id", "user_id")


@register(
    "skew_salted_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, round(o.o_totalprice, 4) AS o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
    description="Salted equi-join (deterministic hash salt × replicated right side) — "
    "result-identical to the plain join, hot keys spread over 8 partitions",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ops.skew import salted_join

    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", F.col("o_custkey").alias("k"), "o_totalprice")
    )
    customer = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    joined = salted_join(orders, customer, on="k", n_salts=8)
    return joined.select(
        "o_orderkey", "c_name", F.round("o_totalprice", 4).alias("o_totalprice")
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           CASE octet_length(encode(text)) % 3
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime
    FROM documents
    """,
    description="Binary media column + typed metadata (mime, byte length)",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    return media.select("doc_id", "n_bytes", "mime")


@register(
    "multimodal_features",
    # oracle re-derives the stub featurizer (byte histogram, 8 bins of 32)
    # in pure SQL: hex-decode the blob byte-by-byte, bin by b // 32, and
    # left-join onto a dense (doc, bin) grid so empty bins appear as 0
    oracle="""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS L
        FROM documents),
    bytes AS (
        SELECT doc_id,
               ((strpos('0123456789ABCDEF', substring(hx, 2 * i + 1, 1)) - 1) * 16
                + strpos('0123456789ABCDEF', substring(hx, 2 * i + 2, 1)) - 1)
                   // 32 AS pos
        FROM (SELECT doc_id, hx, unnest(range(0, L)) AS i FROM b)),
    hist AS (SELECT doc_id, pos, count(*) AS cnt FROM bytes GROUP BY 1, 2),
    grid AS (SELECT doc_id, L, unnest(range(0, 8)) AS pos FROM b)
    SELECT g.doc_id, CAST(g.L AS BIGINT) AS n_bytes,
           CAST(g.pos AS BIGINT) AS pos,
           CAST(coalesce(h.cnt, 0) AS BIGINT) AS feature
    FROM grid g LEFT JOIN hist h ON g.doc_id = h.doc_id AND g.pos = h.pos
    """,
    description="Arrow-batched media feature extraction (stub decoder): "
    "byte-histogram vector per document, flattened to (doc_id, pos, feature)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas featurizer runs as-is; the array<double> output is
    posexploded to one row per (doc, bin) so the result is hashable and
    DuckDB-checkable (driver canonicalization can't sort array columns)."""
    docs = t(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    feats = extract_features(media, media_col="media", id_col="doc_id", feature_dim=8)
    return feats.select(
        F.col("id").alias("doc_id"),
        "n_bytes",
        F.posexplode("features").alias("pos", "feature"),
    ).select(
        "doc_id",
        "n_bytes",
        F.col("pos").cast("long").alias("pos"),
        F.col("feature").cast("long").alias("feature"),
    )


@register(
    "multimodal_frames",
    oracle="""
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS L,
               greatest(octet_length(encode(text)) // 4, 1) AS step
        FROM documents)
    SELECT doc_id,
           least(4, CAST(ceil(L / step) AS INT)) AS n_frames,
           least(4 * step, L)::BIGINT AS frame_bytes
    FROM b
    WHERE L >= 1
    """,
    description="Row-expanding frame sampling (video → n frame rows, stub decoder); "
    "oracle checks per-doc frame count and sampled byte budget",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ops.multimodal import sample_frames

    docs = t(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    frames = sample_frames(media, media_col="media", id_col="doc_id", n_frames=4)
    return (
        frames.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_frames"),
            F.sum(F.octet_length("frame")).alias("frame_bytes"),
        )
    )
