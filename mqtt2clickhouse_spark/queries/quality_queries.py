"""Quality / ordering / attribution additions to the pipeline surface:
Gopher-style repetition filters, deterministic global training-order
shuffle, per-source mixture weights, and the event-attribution interval
join (the batch twin of the stream-stream join in
``streaming/pipeline.py``).

All four are oracle-checked; every aggregate is aliased identically on
both sides and BIGINT sums are cast (DuckDB HUGEINT → float64 breaks
the driver's dtype-sensitive hash).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import curation as cu
from mqtt2clickhouse_spark.ops import text as tx
from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.queries.dedup_queries import _DUCK_HASH32, _DUCK_SHINGLES
from mqtt2clickhouse_spark.tables import fan_out

#: DuckDB twin of ops.text.tokens
_DUCK_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


@register(
    "quality_repetition",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)), l -> l <> '') AS ls,
               {_DUCK_TOKS} AS tk
        FROM documents),
    lines AS (
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               round(coalesce((len(ls) - len(list_distinct(ls)))
                              / nullif(len(ls), 0), 0.0), 4) AS dup_line_frac,
               round(coalesce((coalesce(list_sum(list_transform(ls, l -> len(l))), 0)
                               - coalesce(list_sum(list_transform(list_distinct(ls),
                                                                  l -> len(l))), 0))
                              / nullif(coalesce(list_sum(list_transform(ls, l -> len(l))), 0), 0),
                              0.0), 4) AS dup_char_frac,
               tk
        FROM base),
    big AS (
        SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                             i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM base WHERE len(tk) >= 2),
    cnt AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
    top AS (SELECT doc_id, round(max(c) / sum(c), 4) AS top_bigram_frac
            FROM cnt GROUP BY 1)
    SELECT l.doc_id, l.n_lines, l.dup_line_frac, l.dup_char_frac,
           coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac,
           (l.dup_line_frac <= 0.3 AND coalesce(t.top_bigram_frac, 0.0) <= 0.2)
               AS keep
    FROM lines l LEFT JOIN top t ON l.doc_id = t.doc_id
    """,
    description="Gopher-style repetition quality filter: duplicate-line and "
    "duplicate-char fractions (map-only) + top-bigram fraction (one per-doc agg), "
    "keep flag at the Rae et al. thresholds (0.3 / 0.2)",
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line metrics are pure Column work (no shuffle); the top-bigram
    fraction is an explode + two partial-aggregable groupBys — at 100 TB
    the explode is map-local and both aggs combine map-side, so the
    only data crossing the wire is (doc, bigram) partial counts."""
    # fan_out: the per-doc HOF aggregates and the bigram explode are the
    # CPU; a single-row-group fixture scan would serialize them
    docs = fan_out(t(spark, sf_dir, "documents"))
    rep = tx.repetition_features(F.col("text"))
    base = docs.select(
        "doc_id",
        rep["n_lines"].alias("n_lines"),
        rep["dup_line_frac"].alias("dup_line_frac"),
        rep["dup_char_frac"].alias("dup_char_frac"),
    )
    big = docs.select(
        "doc_id", F.explode(tx.word_bigrams(F.col("text"))).alias("bg")
    )
    top = (
        big.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"))
    )
    tbf = F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        "dup_char_frac",
        tbf.alias("top_bigram_frac"),
        ((F.col("dup_line_frac") <= 0.3) & (tbf <= 0.2)).alias("keep"),
    )


_SHUFFLE_SEED = "shuffle42"


@register(
    "global_shuffle",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               {_DUCK_HASH32.format(x=f"'{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")}
                   AS skey
        FROM documents)
    SELECT CAST(row_number() OVER (ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos,
           doc_id, skey
    FROM keyed
    """,
    description="Deterministic global training-order shuffle: contiguous 0-based "
    "positions in md5-key order, assigned two-phase (bucket counts + offsets, "
    "per-bucket parallel rank) — no single-partition global sort",
)
def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(t(spark, sf_dir, "documents"))  # md5 keying is the map CPU
    return cu.global_shuffle_positions(docs, "doc_id", seed=_SHUFFLE_SEED).select(
        "pos", "doc_id", "skey"
    )


@register(
    "source_mix",
    oracle=f"""
    WITH s AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    sh AS (SELECT *, n_tokens / sum(n_tokens) OVER () AS share FROM s),
    w AS (SELECT *, sqrt(share) AS sw FROM sh)
    SELECT source, n_docs, n_tokens,
           round(share, 4) AS token_share,
           round(sw / sum(sw) OVER (), 4) AS sample_weight
    FROM w
    """,
    description="Per-source mixture weights: token share + temperature-scaled "
    "(alpha=0.5) renormalized sampling weight — the domain-mixing table a "
    "training run consumes",
)
def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partial-aggregable groupBy over the corpus; the share /
    renormalization windows run over the AGGREGATED frame (#sources
    rows — driver-sized however big the corpus is)."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count(F.col("text"))).alias("n_tokens"),
    )
    everything = W.partitionBy()  # frame = one row per source: tiny
    share = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    sw = F.sqrt(share)
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 4).alias("token_share"),
        F.round(sw / F.sum(sw).over(everything), 4).alias("sample_weight"),
    )


@register(
    "interval_join",
    oracle="""
    SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
           date_diff('second', v.ts, c.ts) AS gap_s
    FROM events c JOIN events v
      ON c.user_id = v.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND v.ts BETWEEN c.ts - INTERVAL 1 DAY AND c.ts
    """,
    description="Event attribution: views within 24h before each click by the "
    "same user — the batch twin of the watermarked stream-stream interval join "
    "(streaming/pipeline.py)",
)
def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on user + time-range predicate: Catalyst plans the
    equi-key shuffle (or broadcast under AQE when one side is small) and
    evaluates the range as a post-join filter — never a cartesian.  The
    streaming twin bounds state with watermarks instead of the static
    time predicate."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("vts"),
    )
    return (
        clicks.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 DAY"))
            & (F.col("vts") <= F.col("cts")),
        )
        .select(
            "click_id",
            "view_id",
            "user_id",
            # timestampdiff works on both TIMESTAMP and TIMESTAMP_NTZ
            # (Spark 4.1 reads parquet TIMESTAMP(NANOS) as NTZ, which
            # cannot cast to BIGINT).  Truncate both ends to the second
            # first: DuckDB's date_diff counts BOUNDARY CROSSINGS, while
            # timestampdiff floors the elapsed interval.
            F.expr(
                "timestampdiff(SECOND, date_trunc('SECOND', vts),"
                " date_trunc('SECOND', cts))"
            ).alias("gap_s"),
        )
    )


@register(
    "decontaminate_bloom",
    # IDENTICAL oracle to `decontaminate`: the Bloom sketch is a pure
    # pre-filter, so the oracle needs no sketch arithmetic at all
    oracle=f"""
    WITH shingles AS ({_DUCK_SHINGLES}),
    bench AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 20 = 0),
    train AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 20 <> 0)
    SELECT train.doc_id, count(DISTINCT train.shingle)::BIGINT AS n_shared
    FROM train JOIN bench USING (shingle)
    GROUP BY train.doc_id
    """,
    description="decontaminate through a Bloom pre-filter (m=2^20, k=2 md5 "
    "hashes): probes kill non-matching shingles map-side before any string "
    "join; exact verify last, so the result — and the oracle — are identical "
    "to the exact path",
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ops.dedup import shingle_store

    docs = t(spark, sf_dir, "documents")
    shingled = shingle_store(docs, sf_dir)
    bench = shingled.filter(F.col("id") % 20 == 0)
    train = shingled.filter(F.col("id") % 20 != 0)
    return cu.bloom_contaminated_docs(train, bench).select(
        F.col("id").alias("doc_id"), F.col("n_shared")
    )


@register(
    "embedding_quantize",
    oracle="""
    WITH flat AS (
        SELECT vec_id,
               list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127
                   AS scale,
               unnest(CAST(embedding AS DOUBLE[])) AS x,
               unnest(range(1, len(embedding) + 1)) AS pos
        FROM embeddings),
    qq AS (
        SELECT vec_id, pos, scale, x,
               CASE WHEN scale = 0 THEN 0.0 ELSE floor(x / scale + 0.5) END AS q
        FROM flat)
    SELECT vec_id, CAST(pos AS BIGINT) AS pos, CAST(q AS BIGINT) AS q,
           -- DuckDB round preserves -0.0; fold to +0.0 (Spark side too)
           CASE WHEN round(q * scale - x, 6) = 0 THEN 0.0
                ELSE round(q * scale - x, 6) END AS err,
           round(scale, 6) AS scale
    FROM qq
    """,
    description="Symmetric per-vector int8 quantization with reconstruction "
    "error — the storage format of a production vector corpus; map-only, "
    "floor-based round-half-up so both engines agree bit-for-bit",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ops.similarity import quantize_int8

    return quantize_int8(fan_out(t(spark, sf_dir, "embeddings")))


@register(
    "bigram_lm",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    bg AS (
        SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                             i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM toks WHERE len(tk) >= 2),
    cbg AS (SELECT bg, count(*) AS c_bg FROM bg GROUP BY 1),
    cw AS (SELECT string_split(bg, ' ')[1] AS w1, count(*) AS c_w1
           FROM bg GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS vocab
          FROM (SELECT unnest(tk) AS tok FROM toks))
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c.c_bg + 1.0) / (w.c_w1 + v.vocab))), 4) AS avg_logp
    FROM bg b
    JOIN cbg c ON b.bg = c.bg
    JOIN cw w ON string_split(b.bg, ' ')[1] = w.w1
    CROSS JOIN v
    GROUP BY 1
    """,
    description="Corpus-trained add-one-smoothed bigram LM score per doc "
    "(mean log P(w2|w1)) — the CCNet/Gopher-style model-based quality "
    "filter, self-trained so no external LM is needed.",
)
def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-score in one plan: the bigram count is the ONE
    corpus-level groupBy (map-side combined); prefix counts are a
    vocabulary-sized rollup of it (c(w1·) = Σ c_bg over w1-prefixed
    bigrams — exact, r16); the per-bigram log-probability is computed
    once per DISTINCT bigram and joined back onto the bigram stream in
    the single corpus-sized shuffle join on the bigram key — the LM
    table is corpus-sized, so it is NOT broadcast (at 100 TB it
    partitions like any fact table).  The bigram expansion is one Arrow
    UDF evaluated once (localCheckpoint pins the diamond — the table
    feeds the bigram counts and the scoring join).

    P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + |V|); score = mean ln P over
    the doc's bigrams, rounded before output so cross-engine float
    summation order cannot flip the driver's hash.
    """
    import re

    ws = re.compile(r"[ \t\n\r\f\v]+")

    @F.pandas_udf("array<string>")
    def bigrams(texts: pd.Series) -> pd.Series:
        def bg(t):
            toks = [w for w in ws.split(t.lower()) if w]
            return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

        return texts.map(bg)

    docs = fan_out(t(spark, sf_dir, "documents"))
    bg = (
        docs.select("doc_id", F.explode(bigrams(F.col("text"))).alias("bg"))
        .localCheckpoint(eager=False)
    )
    cbg = bg.groupBy("bg").agg(
        F.count(F.lit(1)).alias("c_bg")
    ).localCheckpoint(eager=False)
    # ^ r16: two consumers (the prefix rollup and the scoring join)
    # r16 (guide §2.3/§2.4): the prefix counts are DERIVABLE from the
    # bigram counts — c(w1 ·) = sum of c_bg over bigrams starting with
    # w1, exactly — so cw is now a bigram-vocabulary-sized rollup of
    # cbg instead of a second corpus-wide aggregate over bg.  And the
    # per-bigram log-probability is a function of (c_bg, c_w1, |V|)
    # alone, so it is computed ONCE per distinct bigram on the
    # vocab-sized table; the corpus-sized bg stream then needs exactly
    # one join (on bg) instead of two (bg, then w1) — one corpus
    # aggregate and one corpus-wide shuffle removed, same doubles
    # (identical float expression per bigram, same multiset averaged).
    cw = (
        cbg.select(F.split("bg", " ").getItem(0).alias("w1"), "c_bg")
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    vocab = (
        docs.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .agg(F.count_distinct("tok").alias("vocab"))
    )
    scored = (
        cbg.withColumn("w1", F.split("bg", " ").getItem(0))
        .join(cw, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.log(
                (F.col("c_bg") + F.lit(1.0))
                / (F.col("c_w1") + F.col("vocab"))
            ).alias("logp"),
        )
    )
    return (
        bg.join(scored, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("logp"), 4).alias("avg_logp"),
        )
    )


#: filter_funnel gate thresholds (C4/Gopher-style corpus hygiene)
_FF_MIN_CHARS = 200
_FF_MIN_TOKS, _FF_MAX_TOKS = 50, 5000
_FF_MIN_ALPHA = 0.6
_FF_MIN_MTL, _FF_MAX_MTL = 3.0, 10.0


@register(
    "filter_funnel",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               len(text) >= {_FF_MIN_CHARS} AS g1,
               len({_DUCK_TOKS}) BETWEEN {_FF_MIN_TOKS} AND {_FF_MAX_TOKS} AS g2,
               len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / nullif(len(text), 0) >= {_FF_MIN_ALPHA} AS g3,
               len(regexp_replace(text, '\\s', '', 'g'))
                   / nullif(len({_DUCK_TOKS}), 0)
                   BETWEEN {_FF_MIN_MTL} AND {_FF_MAX_MTL} AS g4
        FROM documents),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n4
        FROM g)
    SELECT 1 AS stage, 'min_chars' AS gate, n0 AS n_in, n0 - n1 AS n_dropped,
           n1 AS n_out FROM agg
    UNION ALL
    SELECT 2, 'token_range', n1, n1 - n2, n2 FROM agg
    UNION ALL
    SELECT 3, 'alpha_ratio', n2, n2 - n3, n3 FROM agg
    UNION ALL
    SELECT 4, 'mean_token_len', n3, n3 - n4, n4 FROM agg
    """,
    description="Corpus-hygiene filter funnel: four chained quality gates "
    "(min length, token-count range, alphabetic ratio, mean token length — "
    "the C4/Gopher-style pre-filters) with per-stage in/dropped/out counts "
    "— the observability table every training-data curation run starts "
    "from.",
)
def filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four gates evaluate in ONE map-only pass (pure Column
    expressions — no UDFs, no shuffle of the documents), and the funnel
    closes with a single global conditional aggregate: stage k's intake
    is the count passing gates 1..k-1, so one row of partial counts per
    partition is everything that crosses the wire.  The per-stage rows
    are then a 4-way stack of that one aggregate row — constant-size
    regardless of corpus scale.  Token definition matches the engine's
    shared tokenizer (lower + whitespace split, empties dropped =
    ops.text.tokens / _DUCK_TOKS)."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = tx.tokens(F.col("text"))
    n_chars = F.length("text")
    n_toks = F.size(toks)
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")) / F.nullif(
        n_chars, F.lit(0)
    )
    mtl = F.length(F.regexp_replace("text", "\\s", "")) / F.nullif(
        n_toks, F.lit(0)
    )
    g = docs.select(
        (n_chars >= _FF_MIN_CHARS).alias("g1"),
        n_toks.between(_FF_MIN_TOKS, _FF_MAX_TOKS).alias("g2"),
        (alpha >= _FF_MIN_ALPHA).alias("g3"),
        mtl.between(_FF_MIN_MTL, _FF_MAX_MTL).alias("g4"),
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("g1") & F.col("g2"), 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("g1") & F.col("g2") & F.col("g3"), 1).otherwise(0))
        .cast("long")
        .alias("n3"),
        F.sum(
            F.when(F.col("g1") & F.col("g2") & F.col("g3") & F.col("g4"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "1, 'min_chars',      n0, n0 - n1, n1, "
            "2, 'token_range',    n1, n1 - n2, n2, "
            "3, 'alpha_ratio',    n2, n2 - n3, n3, "
            "4, 'mean_token_len', n3, n3 - n4, n4) "
            "AS (stage, gate, n_in, n_dropped, n_out)"
        )
    )


#: weighted_sample: grid size (target sample draws)
_WSAMPLE_K = 100
_WSAMPLE_SEED = "wsample"


@register(
    "weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               {_DUCK_HASH32.format(x=f"'{_WSAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)")}
                   AS skey
        FROM documents),
    cum AS (
        SELECT doc_id, w,
               CAST(coalesce(sum(w) OVER (ORDER BY skey, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS pos
        FROM keyed),
    tot AS (SELECT greatest(CAST(sum(w) AS BIGINT) // {_WSAMPLE_K}, 1) AS step
            FROM keyed),
    g AS (SELECT c.doc_id, c.w, c.pos,
                 CAST(least((c.pos + c.w + t.step - 1) // t.step, {_WSAMPLE_K})
                      - (c.pos + t.step - 1) // t.step AS BIGINT) AS n_hits
          FROM cum c CROSS JOIN tot t)
    SELECT doc_id, w, pos, n_hits FROM g WHERE n_hits > 0
    """,
    description=f"Deterministic PPS systematic sample of documents "
    f"(weight = n_chars, {_WSAMPLE_K} grid points over the md5-shuffled "
    "weight axis): selection probability proportional to length, pure "
    "integer arithmetic, two-phase cumulative weights (no global sort).",
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return cu.pps_systematic_sample(
        docs, "doc_id", "n_chars", k=_WSAMPLE_K, seed=_WSAMPLE_SEED
    )


#: perplexity_filter: md5 split — train = buckets 0-7, held-out = 8-9
_PPL_TRAIN_BUCKETS = 8


@register(
    "perplexity_filter",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, text,
               {_DUCK_HASH32.format(x="CAST(doc_id AS VARCHAR)")} % 10
                   < {_PPL_TRAIN_BUCKETS} AS is_train
        FROM documents),
    toks AS (SELECT doc_id, is_train, {_DUCK_TOKS} AS tk FROM split),
    bg AS (
        SELECT doc_id, is_train,
               unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM toks WHERE len(tk) >= 2),
    cbg AS (SELECT bg, count(*) AS c_bg FROM bg WHERE is_train GROUP BY 1),
    cw AS (SELECT string_split(bg, ' ')[1] AS w1, count(*) AS c_w1
           FROM bg WHERE is_train GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS vocab
          FROM (SELECT unnest(tk) AS tok FROM toks WHERE is_train))
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(CASE WHEN c.c_bg IS NULL THEN 1.0 ELSE 0.0 END), 4)
               AS oov_rate,
           round(exp(-avg(ln((coalesce(c.c_bg, 0) + 1.0)
                             / (coalesce(w.c_w1, 0) + v.vocab)))), 2)
               AS ppl
    FROM bg b
    LEFT JOIN cbg c ON b.bg = c.bg
    LEFT JOIN cw w ON string_split(b.bg, ' ')[1] = w.w1
    CROSS JOIN v
    WHERE NOT b.is_train
    GROUP BY 1
    """,
    description="Held-out perplexity quality filter: an add-one-smoothed "
    "bigram LM trained on the md5-hash train split (80%) scores the "
    "held-out 20% — per-doc perplexity and out-of-vocabulary bigram "
    "rate, the model-based quality signal scored the way a real filter "
    "is (on text the model never saw), unlike bigram_lm's in-corpus "
    "score.",
)
def perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-A score-B in one plan: the bigram expansion runs ONCE
    over the whole corpus (Arrow UDF, pinned — it feeds the two count
    tables and the scoring join), the split is the repartition-stable
    md5 bucket of hash_split, and the held-out side LEFT-joins the
    train counts so unseen bigrams land on the smoothing floor
    (c=0 → P = 1/(c_w1 + |V|)) instead of disappearing.  Both count
    tables are corpus-sized and shuffle-join on their keys (never
    broadcast); the vocab scalar is a 1-row broadcast.  Perplexity =
    exp(-mean ln P), rounded after the fold so cross-engine summation
    order cannot flip the hash; the OOV rate is an exact rational.
    """
    import re

    from mqtt2clickhouse_spark.ops.dedup import hash32

    ws = re.compile(r"[ \t\n\r\f\v]+")

    @F.pandas_udf("array<string>")
    def bigrams(texts: pd.Series) -> pd.Series:
        def bg(t):
            toks = [w for w in ws.split(t.lower()) if w]
            return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

        return texts.map(bg)

    docs = fan_out(t(spark, sf_dir, "documents")).withColumn(
        "is_train",
        hash32(F.col("doc_id").cast("string")) % 10 < _PPL_TRAIN_BUCKETS,
    )
    bg = (
        docs.select(
            "doc_id", "is_train", F.explode(bigrams(F.col("text"))).alias("bg")
        )
        .localCheckpoint(eager=False)
    )
    train_bg = bg.filter("is_train")
    cbg = train_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    cw = (
        train_bg.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_w1"))
    )
    vocab = (
        docs.filter("is_train")
        .select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .agg(F.count_distinct("tok").alias("vocab"))
    )
    return (
        bg.filter(~F.col("is_train"))
        .join(cbg, "bg", "left")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(cw, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.avg(F.when(F.col("c_bg").isNull(), 1.0).otherwise(0.0)), 4
            ).alias("oov_rate"),
            F.round(
                F.exp(
                    -F.avg(
                        F.log(
                            (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(1.0))
                            / (
                                F.coalesce(F.col("c_w1"), F.lit(0))
                                + F.col("vocab")
                            )
                        )
                    )
                ),
                2,
            ).alias("ppl"),
        )
    )


@register(
    "quality_signal_agreement",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id,
               round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     / nullif(len(text), 0), 6) AS s1,
               round(1.0 - len(list_distinct({_DUCK_TOKS}))
                     / nullif(len({_DUCK_TOKS}), 0), 6) AS s2,
               round(len(regexp_replace(text, '\\s', '', 'g'))
                     / nullif(len({_DUCK_TOKS}), 0), 6) AS s3
        FROM documents),
    pairs AS (
        SELECT 'alpha_ratio' AS signal_a, 'dup_token_frac' AS signal_b,
               s1 AS x, s2 AS y FROM sig
        UNION ALL
        SELECT 'alpha_ratio', 'mean_token_len', s1, s3 FROM sig
        UNION ALL
        SELECT 'dup_token_frac', 'mean_token_len', s2, s3 FROM sig),
    agg AS (
        SELECT signal_a, signal_b,
               CAST(count(*) AS BIGINT) AS n_docs,
               sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
               sum(y * y) AS syy, sum(x * y) AS sxy
        FROM pairs GROUP BY 1, 2)
    SELECT signal_a, signal_b, n_docs,
           round((n_docs * sxy - sx * sy)
                 / sqrt((n_docs * sxx - sx * sx)
                        * (n_docs * syy - sy * sy)), 4) AS pearson_r
    FROM agg
    WHERE (n_docs * sxx - sx * sx) > 1e-9
      AND (n_docs * syy - sy * sy) > 1e-9
    """,
    description="Curation-filter governance: pairwise Pearson "
    "correlation between three per-document quality signals (alphabetic "
    "ratio, duplicate-token fraction, mean token length) — the audit "
    "that tells you whether stacked quality gates are measuring the "
    "same thing (redundant) or different failure modes (complementary).",
)
def quality_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation WITHOUT ranks or windows: every pairwise Pearson
    comes from one conditional-aggregate pass over (sum, sumsq,
    cross-product) partials — fully partial-aggregable, so the
    agreement matrix costs one map pass + a 3-group shuffle at any
    corpus size (Spearman's ranks would need a global sort per signal;
    Pearson on the raw signals is the scale-correct estimator here).
    Signals are rounded to 6dp BEFORE aggregation so both engines sum
    identical doubles; the zero-variance guard mirrors
    timeseries_corr's epsilon rule."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = tx.tokens(F.col("text"))
    s1 = F.round(
        F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
        / F.nullif(F.length("text"), F.lit(0)),
        6,
    )
    s2 = F.round(
        1.0
        - F.size(F.array_distinct(toks))
        / F.nullif(F.size(toks), F.lit(0)).cast("double"),
        6,
    )
    s3 = F.round(
        F.length(F.regexp_replace("text", "\\s", ""))
        / F.nullif(F.size(toks), F.lit(0)),
        6,
    )
    sig = docs.select(s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))
    pairs = sig.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("alpha_ratio").alias("signal_a"),
                    F.lit("dup_token_frac").alias("signal_b"),
                    F.col("s1").alias("x"),
                    F.col("s2").alias("y"),
                ),
                F.struct(
                    F.lit("alpha_ratio").alias("signal_a"),
                    F.lit("mean_token_len").alias("signal_b"),
                    F.col("s1").alias("x"),
                    F.col("s3").alias("y"),
                ),
                F.struct(
                    F.lit("dup_token_frac").alias("signal_a"),
                    F.lit("mean_token_len").alias("signal_b"),
                    F.col("s2").alias("x"),
                    F.col("s3").alias("y"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    agg = pairs.groupBy("signal_a", "signal_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_docs") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        agg.filter((vx > 1e-9) & (vy > 1e-9))
        .select(
            "signal_a",
            "signal_b",
            "n_docs",
            F.round(
                (F.col("n_docs") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(vx * vy),
                4,
            ).alias("pearson_r"),
        )
    )


#: Kneser-Ney absolute discount and the micro-nat term quantizer
_KN_D = 0.75
_KN_Q = 10**6


@register(
    "kneser_ney_lm",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, source, text,
               {_DUCK_HASH32.format(x="CAST(doc_id AS VARCHAR)")} % 10
                   < {_PPL_TRAIN_BUCKETS} AS is_train
        FROM documents),
    toks AS (SELECT doc_id, source, is_train, {_DUCK_TOKS} AS tk
             FROM split),
    bg AS (
        SELECT source, is_train,
               unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i])) AS w1,
               unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i + 1])) AS w2
        FROM toks WHERE len(tk) >= 2),
    cbg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
            FROM bg WHERE is_train GROUP BY 1, 2),
    cw1 AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_w1,
                   CAST(count(*) AS BIGINT) AS n1p_fwd
            FROM cbg GROUP BY 1),
    bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd
            FROM cbg GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n1p_all FROM cbg),
    v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
          FROM (SELECT unnest(tk) AS tok FROM toks WHERE is_train)),
    scored AS (
        SELECT b.source,
               (coalesce(c.c_bg, 0) + 1.0)
               / (coalesce(w.c_w1, 0) + v.vocab) AS p_add1,
               CASE WHEN coalesce(w.c_w1, 0) > 0
                    THEN greatest(coalesce(c.c_bg, 0) - {_KN_D}, 0.0)
                         / w.c_w1
                         + {_KN_D} * w.n1p_fwd / w.c_w1
                           * ((coalesce(d.n1p_bwd, 0) + 1.0)
                              / (t.n1p_all + v.vocab))
                    ELSE (coalesce(d.n1p_bwd, 0) + 1.0)
                         / (t.n1p_all + v.vocab) END AS p_kn
        FROM bg b
        LEFT JOIN cbg c ON c.w1 = b.w1 AND c.w2 = b.w2
        LEFT JOIN cw1 w ON w.w1 = b.w1
        LEFT JOIN bwd d ON d.w2 = b.w2
        CROSS JOIN tot t CROSS JOIN v
        WHERE NOT b.is_train),
    terms AS (
        SELECT source, 'add1' AS model,
               CAST(round({_KN_Q} * ln(p_add1)) AS BIGINT) AS tq
        FROM scored
        UNION ALL
        SELECT source, 'kneser_ney',
               CAST(round({_KN_Q} * ln(p_kn)) AS BIGINT)
        FROM scored)
    SELECT source, model, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(exp(-CAST(sum(tq) AS DOUBLE) / ({_KN_Q}.0 * count(*))),
                 2) AS ppl
    FROM terms GROUP BY 1, 2 ORDER BY 1, 2
    """,
    description=f"Kneser-Ney bigram language model (absolute discount "
    f"D = {_KN_D}, add-1-smoothed continuation distribution) scored on "
    "the held-out split per source, next to the add-one baseline — "
    "the standard LM smoothing comparison: KN backs off to HOW MANY "
    "contexts a word completes, not how often it occurs.  Log terms "
    "are quantized to integer micro-nats before summation (the chi2 "
    "idiom) so perplexity is summation-order-exact; unseen histories "
    "fall back to the continuation distribution.  Honest fixture "
    "finding: both models read ppl ~30.5 = |V| — the template corpus "
    "draws words near-independently, and over a dense 31-word "
    "vocabulary the continuation distribution is itself near-uniform, "
    "so KN's advantage (rare-context words) has nothing to bite on; "
    "the math, not a modeling win, is what a green row attests.",
)
def kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One bigram expansion (pinned — feeds counts and scoring), four
    partial-aggregable train-count tables (bigram, history-with-
    distinct-continuations, reversed continuations, totals), one
    scoring join chain on the held-out side, and the quantized-term
    perplexity rollup per (source, model).  At corpus scale the count
    tables shuffle-join on token keys exactly like perplexity_filter;
    KN adds two more bounded vocabulary-sized tables, not another
    corpus pass."""
    import re

    from mqtt2clickhouse_spark.ops.dedup import hash32

    ws = re.compile(r"[ \t\n\r\f\v]+")

    @F.pandas_udf("array<struct<w1:string,w2:string>>")
    def bigrams2(texts: pd.Series) -> pd.Series:
        def bg(t):
            toks = [w for w in ws.split(t.lower()) if w]
            return [{"w1": a, "w2": b} for a, b in zip(toks, toks[1:])]

        return texts.map(bg)

    docs = fan_out(t(spark, sf_dir, "documents")).withColumn(
        "is_train",
        hash32(F.col("doc_id").cast("string")) % 10 < _PPL_TRAIN_BUCKETS,
    )
    bg = (
        docs.select(
            "source",
            "is_train",
            F.explode(bigrams2(F.col("text"))).alias("z"),
        )
        .select("source", "is_train", "z.w1", "z.w2")
        .localCheckpoint(eager=False)
    )
    cbg = (
        bg.filter("is_train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_bg"))
        .localCheckpoint(eager=False)  # feeds cw1, bwd, tot, scoring
    )
    cw1 = cbg.groupBy("w1").agg(
        F.sum("c_bg").cast("long").alias("c_w1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    bwd = cbg.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_bwd")
    )
    tot = cbg.agg(F.count(F.lit(1)).cast("long").alias("n1p_all"))
    vocab = (
        docs.filter("is_train")
        .select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .agg(F.count_distinct("tok").cast("long").alias("vocab"))
    )
    held = bg.filter(~F.col("is_train"))
    j = (
        held.join(cbg, ["w1", "w2"], "left")
        .join(cw1, "w1", "left")
        .join(bwd, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
    )
    p_add1 = (F.coalesce("c_bg", F.lit(0)) + 1.0) / (
        F.coalesce("c_w1", F.lit(0)) + F.col("vocab")
    )
    pcont = (F.coalesce("n1p_bwd", F.lit(0)) + 1.0) / (
        F.col("n1p_all") + F.col("vocab")
    )
    p_kn = F.when(
        F.coalesce("c_w1", F.lit(0)) > 0,
        F.greatest(
            F.coalesce("c_bg", F.lit(0)) - _KN_D, F.lit(0.0)
        )
        / F.col("c_w1")
        + _KN_D * F.col("n1p_fwd") / F.col("c_w1") * pcont,
    ).otherwise(pcont)
    scored = j.select("source", p_add1.alias("p_add1"), p_kn.alias("p_kn"))
    terms = scored.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("add1").alias("model"),
                    F.round(_KN_Q * F.log("p_add1")).cast("long").alias("tq"),
                ),
                F.struct(
                    F.lit("kneser_ney").alias("model"),
                    F.round(_KN_Q * F.log("p_kn")).cast("long").alias("tq"),
                ),
            )
        ).alias("z"),
    ).select("source", "z.model", "z.tq")
    return (
        terms.groupBy("source", "model")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(
                    -F.sum("tq").cast("double")
                    / (float(_KN_Q) * F.count(F.lit(1)))
                ),
                2,
            ).alias("ppl"),
        )
        .orderBy("source", "model")
    )
