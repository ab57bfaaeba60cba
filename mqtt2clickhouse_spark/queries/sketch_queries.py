"""Sketch / bucketing additions: a Count-Min frequency sketch with a
heavy-hitter readout, and deterministic decile bucketing.

CMS is the canonical fixed-memory frequency structure for 100 TB streams:
the sketch build is an explode(d) + groupBy whose map-side combine caps
each partition's shuffle contribution at d×w cells, so sketch shuffle
volume scales with partition COUNT, not row count.  The readout compares
the estimate against exact counts for the top keys, making the
overcount bias (always ≥ 0) visible and oracle-checkable — the md5-based
``hash32`` is engine-independent, so DuckDB builds the identical sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out

#: Count-Min geometry: d hash rows × w columns (4 KiB of counters).
_CMS_D = 4
_CMS_W = 512
#: heavy-hitter readout size
_CMS_TOPK = 20

#: cell for hash row r: 32-bit slice r of ONE md5(key) digest, mod w.
#: One digest yields all d rows (md5's 128 bits = 4 independent 32-bit
#: slices) — half the hash CPU of d separate salted digests.
def _duck_cell(key_expr: str, r_expr: str) -> str:
    return (
        "CAST(list_sum(list_transform(range(1, 9), i -> "
        f"(strpos('0123456789abcdef', substring(md5({key_expr}), "
        f"CAST({r_expr} * 8 + i AS INTEGER), 1)) - 1) "
        f"* (16 ** (8 - i)))) AS BIGINT) % {_CMS_W}"
    )


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH keys AS (
        SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
    cells AS (
        SELECT r, {_duck_cell("key", "r")} AS c, count(*) AS cnt
        FROM keys, range(0, {_CMS_D}) t(r)
        GROUP BY 1, 2),
    exact AS (
        SELECT key, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM keys GROUP BY 1
        ORDER BY exact_cnt DESC, key LIMIT {_CMS_TOPK}),
    probes AS (
        SELECT e.key, e.exact_cnt, t.r, {_duck_cell("e.key", "t.r")} AS c
        FROM exact e, range(0, {_CMS_D}) t(r)),
    est AS (
        SELECT p.key, p.exact_cnt, CAST(min(s.cnt) AS BIGINT) AS cms_cnt
        FROM probes p JOIN cells s ON s.r = p.r AND s.c = p.c
        GROUP BY 1, 2)
    SELECT key, exact_cnt, cms_cnt,
           cms_cnt - exact_cnt AS overcount
    FROM est
    """,
    description=f"Count-Min sketch ({_CMS_D}x{_CMS_W}) of part-key "
    "frequencies; top-20 heavy hitters with exact vs estimated counts.",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the sketch with explode(d) + groupBy(r, c): partial
    aggregation bounds each partition's shuffle output at d×w cells, so
    the sketch costs one bounded shuffle regardless of input size.  The
    readout broadcasts the tiny top-k list against the ≤ d×w-row sketch.

    CMS guarantees est ≥ exact, est ≤ exact + εN with ε = e/w — the
    ``overcount`` column exposes the realized bias.
    """
    # fan_out: the fixture scan is one row group → one task; the 4×md5
    # hashing below is the query's CPU and must spread across cores
    keys = fan_out(
        t(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("string").alias("key")
        )
    ).localCheckpoint(eager=False)

    def cells(key_col):
        # one md5 per key; row r reads hex chars [8r+1, 8r+8] of the digest
        digest = F.md5(key_col)
        return F.array(
            *[
                F.conv(F.substring(digest, 1 + 8 * r, 8), 16, 10).cast("long")
                % _CMS_W
                for r in range(_CMS_D)
            ]
        )

    sketch = (
        keys.select(F.posexplode(cells(F.col("key"))).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )

    exact = (
        keys.groupBy("key")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "key")
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "key", "exact_cnt", F.posexplode(cells(F.col("key"))).alias("r", "c")
    )

    return (
        F.broadcast(probes)
        .join(sketch, ["r", "c"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cms_cnt"))
        .select(
            "key",
            "exact_cnt",
            "cms_cnt",
            (F.col("cms_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


@register(
    "quantile_bucket",
    oracle="""
    WITH b AS (
        SELECT event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS decile
        FROM events)
    SELECT event_type, decile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM b GROUP BY 1, 2
    """,
    description="Deterministic decile bucketing of event values per type "
    "(ntile), with per-bucket count and bounds.",
)
def q_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) with a fully deterministic sort key (value, event_id) so
    tie placement matches across engines.  At scale the per-type windows
    sort within hash partitions of ``event_type``; for a single giant
    group the scale path is range-partitioned `width_bucket` over
    approx quantile boundaries (see ``percentiles``'s docstring).
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


#: explicit-HLL geometry: m = 2^P registers
_HLL_P = 8
_HLL_M = 1 << _HLL_P

# the one canonical DuckDB twin of ops.dedup.hash32 — import, don't copy
from mqtt2clickhouse_spark.queries.dedup_queries import _DUCK_HASH32 as _HASH32  # noqa: E402


@register(
    "hll_explicit",
    oracle=f"""
    WITH ks AS (
        SELECT event_type, {_HASH32.format(x="CAST(user_id AS VARCHAR)")} AS h
        FROM events),
    rh AS (
        SELECT event_type, h % {_HLL_M} AS reg,
               CASE WHEN h // {_HLL_M} = 0 THEN {32 - _HLL_P + 1}
                    ELSE CAST(1 + log2((h // {_HLL_M}) & (-(h // {_HLL_M})))
                         AS BIGINT) END AS rho
        FROM ks),
    mr AS (SELECT event_type, reg, max(rho) AS mrho FROM rh GROUP BY 1, 2),
    grid AS (
        SELECT t.event_type, g.reg, coalesce(m.mrho, 0) AS mrho
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(range(0, {_HLL_M})) AS reg) g
        LEFT JOIN mr m ON m.event_type = t.event_type AND m.reg = g.reg),
    est AS (
        SELECT event_type,
               (0.7213 / (1 + 1.079 / {_HLL_M}))
                   * {_HLL_M} * {_HLL_M} / sum(pow(2.0, -mrho)) AS raw,
               sum(CASE WHEN mrho = 0 THEN 1 ELSE 0 END) AS v
        FROM grid GROUP BY 1),
    ex AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_nd
        FROM events GROUP BY 1)
    SELECT e.event_type, x.exact_nd,
           round(CASE WHEN e.raw <= 2.5 * {_HLL_M} AND e.v > 0
                      THEN {_HLL_M} * ln({_HLL_M} / v)
                      ELSE e.raw END, 2) AS hll_est,
           round(abs(CASE WHEN e.raw <= 2.5 * {_HLL_M} AND e.v > 0
                          THEN {_HLL_M} * ln({_HLL_M} / v)
                          ELSE e.raw END - x.exact_nd) / x.exact_nd, 4)
               AS rel_err
    FROM est e JOIN ex x USING (event_type)
    """,
    description=f"Explicit HyperLogLog ({_HLL_M} registers, md5-hash32, "
    "linear-counting small-range correction) vs exact distinct users per "
    "event type — unlike the engine-native sketch (distinct_approx, "
    "oracle-checked only on its calibration flag), every register here is "
    "integer arithmetic both engines replay bit-for-bit, so the sketch "
    "itself is hash-checked.",
)
def hll_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL algorithm spelled out as a DataFrame plan — register =
    low P bits of the 32-bit hash, rho = trailing-zero rank of the
    rest (computed as log2(x & -x), exact for powers of two), per-
    register max via ONE partial-aggregable groupBy (register table
    bounded at types × m rows regardless of input), then the harmonic-
    mean estimate with the standard linear-counting branch.  The
    register sums are exact in IEEE double (256 terms, each a binary
    fraction 2^-k), so cross-engine float order cannot flip the hash;
    ln/division round-trip through the same 2-decimal rounding as
    every other float output.  This is the oracle-checkable twin that
    attests the sketch MATH; distinct_approx stays as the engine-native
    (HLL++, partial-aggregable) production path."""
    from mqtt2clickhouse_spark.ops.dedup import hash32

    ev = t(spark, sf_dir, "events")
    h = hash32(F.col("user_id").cast("string"))
    rest = F.expr(f"h div {_HLL_M}")
    rho = F.when(rest == 0, F.lit(32 - _HLL_P + 1)).otherwise(
        (F.log2(rest.bitwiseAND(-rest)) + 1).cast("long")
    )
    rh = ev.select("event_type", h.alias("h")).select(
        "event_type", (F.col("h") % _HLL_M).alias("reg"), rho.alias("rho")
    )
    mr = rh.groupBy("event_type", "reg").agg(F.max("rho").alias("mrho"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(
        spark.range(_HLL_M).select(F.col("id").alias("reg"))
    )
    regs = grid.join(mr, ["event_type", "reg"], "left").select(
        "event_type", F.coalesce("mrho", F.lit(0)).alias("mrho")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_HLL_M)))
    est = regs.groupBy("event_type").agg(
        (alpha * _HLL_M * _HLL_M / F.sum(F.pow(F.lit(2.0), -F.col("mrho")))).alias(
            "raw"
        ),
        F.sum(F.when(F.col("mrho") == 0, 1).otherwise(0)).alias("v"),
    )
    corrected = F.when(
        (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v")),
    ).otherwise(F.col("raw"))
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_nd")
    )
    return (
        est.join(ex, "event_type")
        .select(
            "event_type",
            "exact_nd",
            F.round(corrected, 2).alias("hll_est"),
            F.round(F.abs(corrected - F.col("exact_nd")) / F.col("exact_nd"), 4).alias(
                "rel_err"
            ),
        )
    )


#: histogram_quantile geometry: 256 equal-width bins; probed quantiles
_HQ_BINS = 256
_HQ_PS = [0.5, 0.9, 0.99]


@register(
    "histogram_quantile",
    oracle=f"""
    WITH bounds AS (
        SELECT min(value) AS mn, max(value) AS mx,
               CAST(count(*) AS BIGINT) AS n
        FROM events),
    hist AS (
        SELECT least(CAST(floor((value - mn) / (mx - mn) * {_HQ_BINS})
                          AS BIGINT), {_HQ_BINS - 1}) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events CROSS JOIN bounds
        GROUP BY 1),
    cum AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
        FROM hist),
    probes AS ({" UNION ALL ".join(f"SELECT {p} AS p" for p in _HQ_PS)}),
    est AS (
        SELECT pr.p,
               b.mn + (c.bin + (pr.p * b.n - (c.cum - c.cnt)) / c.cnt)
                    * (b.mx - b.mn) / {_HQ_BINS} AS est
        FROM cum c CROSS JOIN bounds b CROSS JOIN probes pr
        WHERE c.cum >= pr.p * b.n AND (c.cum - c.cnt) < pr.p * b.n),
    exact AS ({" UNION ALL ".join(
        f"SELECT {p} AS p, quantile_cont(value, {p}) AS exact FROM events"
        for p in _HQ_PS)})
    SELECT e.p, round(e.est, 4) AS est, round(x.exact, 4) AS exact,
           round(abs(e.est - x.exact), 4) AS abs_err
    FROM est e JOIN exact x ON e.p = x.p
    """,
    description=f"Mergeable equi-width histogram quantile sketch "
    f"({_HQ_BINS} bins): p50/p90/p99 estimated by within-bin linear "
    "interpolation over the bounded histogram, with the exact "
    "interpolated quantile and absolute error alongside — completes "
    "the sketch family (CMS = frequency, HLL = distinct, histogram = "
    "quantiles) with the error audit that tells you when 256 bins are "
    "enough.",
)
def histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for quantiles over 100 TB: the histogram is a
    256-cell partial-aggregable groupBy (each partition contributes at
    most 256 rows to the shuffle — like the CMS, volume scales with
    partition count, not row count), and every readout after it runs on
    the bounded 256-row table.  The bin index is the identical float
    expression on both engines (IEEE doubles evaluate bit-equal in the
    same op order), so the sketch itself is hash-replayed, not just the
    estimates.  The exact audit column is the deliberate anti-pattern
    — a global rank interpolation whose sort cannot partial-aggregate
    — included (as in cms_heavy_hitters/hll_explicit) to make the
    sketch error measurable; production keeps only the histogram side.
    """
    ev = t(spark, sf_dir, "events").select("value")
    bounds = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).localCheckpoint(eager=False)
    # ^ r16: three broadcast consumers (binned, est, ranked) each
    # rebuilt this 1-row aggregate from its own full events scan — the
    # before-plan read events 5x (2 fundamental passes + 3 bounds
    # rebuilds).  Pinned, the suite is the 2 fundamental passes.
    binned = fan_out(ev).crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * _HQ_BINS
            ).cast("long"),
            F.lit(_HQ_BINS - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    probes = spark.createDataFrame([(p,) for p in _HQ_PS], "p double")
    est = (
        cum.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(probes))
        .filter(
            (F.col("cum") >= F.col("p") * F.col("n"))
            & ((F.col("cum") - F.col("cnt")) < F.col("p") * F.col("n"))
        )
        .select(
            "p",
            (
                F.col("mn")
                + (
                    F.col("bin")
                    + (F.col("p") * F.col("n") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt")
                )
                * (F.col("mx") - F.col("mn"))
                / _HQ_BINS
            ).alias("est"),
        )
    )
    # exact audit: rank interpolation (same arithmetic as quantile_cont)
    ranked = (
        ev.withColumn("r", F.row_number().over(W.orderBy("value")) - 1)
        .crossJoin(F.broadcast(bounds.select("n")))
        .crossJoin(F.broadcast(probes))
    )
    tgt = (F.col("n") - 1) * F.col("p")
    exact = (
        ranked.filter((F.col("r") == F.floor(tgt)) | (F.col("r") == F.ceil(tgt)))
        .groupBy("p")
        .agg(
            (
                F.max(F.when(F.col("r") == F.floor(tgt), F.col("value")))
                + (
                    F.max(F.when(F.col("r") == F.ceil(tgt), F.col("value")))
                    - F.max(F.when(F.col("r") == F.floor(tgt), F.col("value")))
                )
                * F.max(tgt - F.floor(tgt))
            ).alias("exact")
        )
    )
    return est.join(exact, "p").select(
        "p",
        F.round("est", 4).alias("est"),
        F.round("exact", 4).alias("exact"),
        F.round(F.abs(F.col("est") - F.col("exact")), 4).alias("abs_err"),
    )


#: rollup_merge: shard count for the partial-state merge attestation
_RM_SHARDS = 4


@register(
    "rollup_merge",
    oracle=f"""
    WITH ks AS (
        SELECT event_type, value,
               {_HASH32.format(x="CAST(user_id AS VARCHAR)")} AS h
        FROM events),
    rh AS (
        SELECT event_type, h % {_HLL_M} AS reg,
               CASE WHEN h // {_HLL_M} = 0 THEN {32 - _HLL_P + 1}
                    ELSE CAST(1 + log2((h // {_HLL_M}) & (-(h // {_HLL_M})))
                         AS BIGINT) END AS rho
        FROM ks),
    mr AS (SELECT event_type, reg, max(rho) AS mrho FROM rh GROUP BY 1, 2),
    grid AS (
        SELECT t.event_type, g.reg, coalesce(m.mrho, 0) AS mrho
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(range(0, {_HLL_M})) AS reg) g
        LEFT JOIN mr m ON m.event_type = t.event_type AND m.reg = g.reg),
    est AS (
        SELECT event_type,
               (0.7213 / (1 + 1.079 / {_HLL_M}))
                   * {_HLL_M} * {_HLL_M} / sum(pow(2.0, -mrho)) AS raw,
               sum(CASE WHEN mrho = 0 THEN 1 ELSE 0 END) AS v
        FROM grid GROUP BY 1),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
                   AS sum_scaled,
               round(min(value), 4) AS vmin,
               round(max(value), 4) AS vmax
        FROM ks GROUP BY 1)
    SELECT a.event_type, CAST({_RM_SHARDS} AS BIGINT) AS n_shards,
           a.n_rows, a.sum_scaled, a.vmin, a.vmax,
           round(CASE WHEN e.raw <= 2.5 * {_HLL_M} AND e.v > 0
                      THEN {_HLL_M} * ln({_HLL_M} / v)
                      ELSE e.raw END, 2) AS hll_est,
           TRUE AS merge_exact
    FROM agg a JOIN est e USING (event_type)
    """,
    description=f"Partial-aggregate mergeability attestation (the law "
    "incremental rollups and RollupSink live on): events are split into "
    f"{_RM_SHARDS} hash shards, per-shard aggregate STATES (count, "
    "integer-scaled sum, min, max, HLL register maxima) are computed "
    "independently and MERGED — the query outputs the merged values "
    "plus a merge_exact flag comparing them against a direct "
    "computation; the oracle computes ONLY the direct path, so the "
    "driver's hash check proves the merge reproduced it bit-for-bit.",
)
def rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every state here is what a streaming rollup checkpoint persists
    per micro-batch, and every merge is the associative operator a
    late-arriving shard applies: counts and integer sums add, min/max
    fold, HLL registers take the element-wise max (which is why HLL is
    mergeable and exact distinct is not — the one aggregate NOT in this
    list).  The shard split is the repartition-stable md5 hash, so the
    'shards' are exactly what micro-batches or daily partitions would
    be.  Plan shape: the shard-state aggregate is one partial-agged
    shuffle keyed (shard, type); the merge is a second aggregate over
    shards x types rows — bounded, trivially small; the direct path
    (computed only for the merge_exact comparison) shares the scan.
    Floats: the scaled sum is integer, min/max are order-free, register
    sums are binary fractions — nothing here depends on float addition
    order, which is WHY the merged path can promise bit-equality.
    """
    from mqtt2clickhouse_spark.ops.dedup import hash32

    ev = t(spark, sf_dir, "events")
    h = hash32(F.col("user_id").cast("string"))
    base = ev.select(
        "event_type",
        "value",
        (hash32(F.col("event_id").cast("string")) % _RM_SHARDS).alias("shard"),
        h.alias("h"),
    )
    scaled = F.round(F.col("value") * 10000).cast("long")
    # -- merged path: per-shard states, then the associative merge -----
    sstate = base.groupBy("shard", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(scaled).cast("long").alias("ssum"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    merged = sstate.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum("ssum").cast("long").alias("sum_scaled"),
        F.min("mn").alias("vmin"),
        F.max("mx").alias("vmax"),
    )
    # -- direct path (comparison only) ---------------------------------
    direct = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d_n"),
        F.sum(scaled).cast("long").alias("d_sum"),
        F.min("value").alias("d_mn"),
        F.max("value").alias("d_mx"),
    )
    # -- HLL registers: shard maxima merged by max vs direct maxima ----
    rest = F.expr(f"h div {_HLL_M}")
    rho = F.when(rest == 0, F.lit(32 - _HLL_P + 1)).otherwise(
        (F.log2(rest.bitwiseAND(-rest)) + 1).cast("long")
    )
    rh = base.select(
        "event_type", "shard", (F.col("h") % _HLL_M).alias("reg"), rho.alias("rho")
    ).localCheckpoint(eager=False)  # two consumers: shard path + direct path
    sreg = rh.groupBy("shard", "event_type", "reg").agg(
        F.max("rho").alias("srho")
    )
    mreg = sreg.groupBy("event_type", "reg").agg(F.max("srho").alias("mrho"))
    dreg = rh.groupBy("event_type", "reg").agg(F.max("rho").alias("mrho"))

    # type list from the PINNED register table, computed once — not a
    # per-call distinct over the raw events scan
    types = rh.select("event_type").distinct()

    def estimate(regs: DataFrame, out: str) -> DataFrame:
        grid = types.crossJoin(
            spark.range(_HLL_M).select(F.col("id").alias("reg"))
        )
        filled = grid.join(regs, ["event_type", "reg"], "left").select(
            "event_type", F.coalesce("mrho", F.lit(0)).alias("mrho")
        )
        alpha = F.lit(0.7213) / (
            F.lit(1.0) + F.lit(1.079) / F.lit(float(_HLL_M))
        )
        e = filled.groupBy("event_type").agg(
            (
                alpha * _HLL_M * _HLL_M
                / F.sum(F.pow(F.lit(2.0), -F.col("mrho")))
            ).alias("raw"),
            F.sum(F.when(F.col("mrho") == 0, 1).otherwise(0)).alias("v"),
        )
        corrected = F.when(
            (F.col("raw") <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v")),
        ).otherwise(F.col("raw"))
        return e.select("event_type", F.round(corrected, 2).alias(out))

    hm = estimate(mreg, "hll_est")
    hd = estimate(dreg, "d_hll")
    return (
        merged.join(direct, "event_type")
        .join(hm, "event_type")
        .join(hd, "event_type")
        .select(
            "event_type",
            F.lit(_RM_SHARDS).cast("long").alias("n_shards"),
            "n_rows",
            "sum_scaled",
            F.round("vmin", 4).alias("vmin"),
            F.round("vmax", 4).alias("vmax"),
            "hll_est",
            (
                (F.col("n_rows") == F.col("d_n"))
                & (F.col("sum_scaled") == F.col("d_sum"))
                & (F.col("vmin") == F.col("d_mn"))
                & (F.col("vmax") == F.col("d_mx"))
                & (F.col("hll_est") == F.col("d_hll"))
            ).alias("merge_exact"),
        )
    )


#: DuckDB twin of hash32('s' || key) — the per-key sign-bit source
_DUCK_SIGN = _HASH32.format(x="'s' || key")


@register(
    "selfjoin_size_estimate",
    oracle=f"""
    WITH keys AS (
        SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
    signed AS (
        SELECT key,
               1 - 2 * (({_DUCK_SIGN} // CAST(pow(2, r) AS BIGINT)) % 2)
                   AS sgn,
               r, {_duck_cell("key", "r")} AS c
        FROM keys, range(0, {_CMS_D}) t(r)),
    cells AS (
        SELECT r, c,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(sgn) AS BIGINT) AS scnt
        FROM signed GROUP BY 1, 2),
    rowests AS (
        SELECT r, sum(cnt * cnt) AS up, sum(scnt * scnt) AS ams
        FROM cells GROUP BY 1),
    est AS (
        SELECT min(up) AS cms_upper,
               (min(CASE WHEN rnk = 2 THEN ams END)
                + min(CASE WHEN rnk = 3 THEN ams END)) / 2.0 AS ams_est
        FROM (SELECT r, up, ams,
                     row_number() OVER (ORDER BY ams, r) AS rnk
              FROM rowests)),
    exact AS (
        SELECT CAST(sum(cnt * cnt) AS BIGINT) AS exact_f2,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM (SELECT key, CAST(count(*) AS BIGINT) AS cnt
              FROM keys GROUP BY 1))
    SELECT x.exact_f2, x.n_keys,
           CAST(e.cms_upper AS BIGINT) AS cms_upper,
           round(e.ams_est, 1) AS ams_est,
           round(CAST(e.cms_upper - x.exact_f2 AS DOUBLE) / x.exact_f2, 4)
               AS upper_rel_err,
           round((e.ams_est - x.exact_f2) / x.exact_f2, 4) AS ams_rel_err
    FROM exact x CROSS JOIN est e
    """,
    description="Self-join size (second frequency moment F2) estimated "
    "two ways from 4x512-cell sketches next to the exact value: the "
    "Count-Min upper bound (always overshoots — the collision bias is "
    "+F1^2/w, visible in upper_rel_err) and the SIGNED AMS/Count-Sketch "
    "estimator (median of per-row sums of squared signed counters — "
    "unbiased, which is why optimizers price joins with signs).  All "
    "counters are integers, so both estimates are hash-checked.",
)
def selfjoin_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation is what a cost-based optimizer does with
    sketches: |A self-join on k| = sum cnt(k)^2 = F2.  Two estimators
    share ONE partial-aggregable d x w cell table (each partition
    contributes at most d x w cells to the shuffle, so pricing the
    join never costs a fraction of running it): the CMS upper bound
    (unsigned counts — collisions only ever add, min over rows
    tightens), and the AMS/Count-Sketch estimate (each key contributes
    +-1 by a deterministic md5 sign bit per row; collision cross-terms
    cancel in expectation, so the median of per-row sums of squared
    SIGNED counters is unbiased — the fixture shows ~4x overshoot for
    the former and percent-level error for the latter at w=512).  The
    exact side is one hash aggregate over the key frequencies; every
    counter is an integer."""
    from mqtt2clickhouse_spark.ops.dedup import hash32

    li = fan_out(t(spark, sf_dir, "lineitem")).select(
        F.col("l_partkey").cast("string").alias("key")
    )
    # ^ examined r16: two consumers, but a pin measured ~5% SLOWER at
    # sf0.1 (the materialization barrier serializes two otherwise
    # parallel subtrees), and at production scale fan_out inserts no
    # shuffle, so the duplicated work is just a single-column scan —
    # cheaper than materializing the column.  Left un-pinned.
    digest = F.md5(F.col("key"))
    sign_h = hash32(F.concat(F.lit("s"), F.col("key")))
    rows = li.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            F.conv(
                                F.substring(digest, r * 8 + 1, 8), 16, 10
                            ).cast("long")
                            % _CMS_W
                        ).alias("c"),
                        (
                            1
                            - 2
                            * ((sign_h / (1 << r)).cast("long") % 2)
                        ).alias("sgn"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rc"),
    ).select("rc.r", "rc.c", "rc.sgn")
    cells = rows.groupBy("r", "c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("sgn").cast("long").alias("scnt"),
    )
    rowests = cells.groupBy("r").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("up"),
        F.sum(F.col("scnt") * F.col("scnt")).alias("ams"),
    )
    rw = W.orderBy("ams", "r")
    est = (
        rowests.withColumn("rnk", F.row_number().over(rw))
        .agg(
            F.min("up").cast("long").alias("cms_upper"),
            (
                (
                    F.min(F.when(F.col("rnk") == 2, F.col("ams")))
                    + F.min(F.when(F.col("rnk") == 3, F.col("ams")))
                )
                / 2.0
            ).alias("ams_est"),
        )
    )
    exact = (
        li.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .agg(
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("exact_f2"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_f2",
        "n_keys",
        "cms_upper",
        F.round("ams_est", 1).alias("ams_est"),
        F.round(
            (F.col("cms_upper") - F.col("exact_f2")).cast("double")
            / F.col("exact_f2"),
            4,
        ).alias("upper_rel_err"),
        F.round(
            (F.col("ams_est") - F.col("exact_f2")) / F.col("exact_f2"), 4
        ).alias("ams_rel_err"),
    )


from mqtt2clickhouse_spark.queries.dedup_queries import (  # noqa: E402
    _DUCK_SHINGLES,
)

#: bloom_fpr_calibration geometry: bit-space size, hash count, and the
#: 1-in-N benchmark slice.  m = 2^16 deliberately small so the measured
#: false-positive rate is non-degenerate at fixture scale.
_BF_M = 1 << 16
_BF_K = 2
_BF_BENCH_MOD = 37

#: the k=2 affine coefficients from ops.dedup.minhash_coeffs
_BF_COEFFS = [(17, 7), (30, 108)]


@register(
    "bloom_fpr_calibration",
    oracle=f"""
    WITH sh AS ({{shingles}}),
    bench AS (SELECT DISTINCT shingle FROM sh
              WHERE doc_id % {_BF_BENCH_MOD} = 0),
    neg AS (SELECT DISTINCT s.shingle FROM sh s
            WHERE s.doc_id % {_BF_BENCH_MOD} <> 0
              AND NOT EXISTS (SELECT 1 FROM bench b
                              WHERE b.shingle = s.shingle)),
    bh AS (SELECT {{h}} AS h FROM bench),
    bits AS (
        SELECT DISTINCT pos FROM (
            SELECT (({_BF_COEFFS[0][0]} * h + {_BF_COEFFS[0][1]})
                    % {{p}}) % {_BF_M} AS pos FROM bh
            UNION ALL
            SELECT (({_BF_COEFFS[1][0]} * h + {_BF_COEFFS[1][1]})
                    % {{p}}) % {_BF_M} FROM bh) t),
    probe AS (
        SELECT (({_BF_COEFFS[0][0]} * h + {_BF_COEFFS[0][1]})
                % {{p}}) % {_BF_M} AS p0,
               (({_BF_COEFFS[1][0]} * h + {_BF_COEFFS[1][1]})
                % {{p}}) % {_BF_M} AS p1
        FROM (SELECT {{h}} AS h FROM neg) s),
    c AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM bench) AS n_bench,
               (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits,
               (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probes,
               (SELECT CAST(count(*) AS BIGINT) FROM probe
                WHERE p0 IN (SELECT pos FROM bits)
                  AND p1 IN (SELECT pos FROM bits)) AS n_fp)
    SELECT n_bench AS n_bench_shingles, n_bits AS n_bits_set,
           n_probes, n_fp AS n_false_pos,
           round(CAST(n_bits AS DOUBLE) / {_BF_M}, 6) AS density,
           round(CAST(n_fp AS DOUBLE) / n_probes, 6) AS measured_fpr,
           round((CAST(n_bits AS DOUBLE) / {_BF_M})
                 * (CAST(n_bits AS DOUBLE) / {_BF_M}), 6) AS predicted_fpr
    FROM c
    """.format(
        shingles=_DUCK_SHINGLES,
        h=_HASH32.format(x="shingle"),
        p=2147483647,
    ),
    description=f"Bloom-filter calibration for the decontamination "
    f"pre-filter (ops/curation.bloom_contaminated_docs): a {_BF_M}-bit/"
    f"k={_BF_K} Bloom of the 1-in-{_BF_BENCH_MOD} benchmark shingle set "
    "probed with every TRUE-NEGATIVE corpus shingle — measured "
    "false-positive rate next to the density^k prediction, the "
    "calibration that sizes m/k before trusting the sketch at scale "
    "(completes the sketch-audit family: minhash_jaccard_est, "
    "srp_recall, hll_explicit, histogram_quantile, ann_tuning_curve).  "
    "Measured at sf0.01: 6.4e-4 vs predicted 3.4e-4 — the ~2x gap is "
    "REAL and instructive: both bit positions derive affinely from ONE "
    "32-bit hash, so they are correlated and the independent-hash "
    "formula undercounts; the production pre-filter shares this "
    "construction (its exact verify absorbs the difference).",
)
def bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom arithmetic is md5-affine integers (the production
    pre-filter's exact construction, ops/curation.py:152-209), so the
    oracle replays the WHOLE sketch bit-for-bit — no tolerance bands.
    Plan: one shingle pass feeds bench and probe sides (shared Arrow-
    batched UDF), the bit set is a distinct over 2x bench-shingle
    integers (broadcast twice as a (pos, hit) map — LEFT joins so one
    aggregate counts probes AND false positives in a single pass), and
    the result is four 1-row aggregates cross-joined — nothing scales
    past the distinct-shingle combine."""
    from mqtt2clickhouse_spark.ops import dedup as dd
    from mqtt2clickhouse_spark.ops.dedup import MINHASH_PRIME, hash32

    docs = t(spark, sf_dir, "documents")
    sh = dd.shingle_store(docs, sf_dir).select(
        "id", "shingle"
    )
    sh = sh.localCheckpoint(eager=False)  # feeds bench + probe sides
    bench = (
        sh.filter(F.col("id") % _BF_BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )
    neg = (
        sh.filter(F.col("id") % _BF_BENCH_MOD != 0)
        .select("shingle")
        .distinct()
        .join(bench, "shingle", "left_anti")
    )

    def pos(i: int, h):
        a, b = _BF_COEFFS[i]
        return ((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)) % F.lit(
            _BF_M
        )

    bh = bench.select(hash32(F.col("shingle")).alias("h"))
    bits = (
        bh.select(pos(0, F.col("h")).alias("pos"))
        .unionAll(bh.select(pos(1, F.col("h")).alias("pos")))
        .distinct()
        .localCheckpoint(eager=False)  # broadcast twice + counted
    )
    ph = neg.select(hash32(F.col("shingle")).alias("h")).select(
        pos(0, F.col("h")).alias("p0"), pos(1, F.col("h")).alias("p1")
    )
    probed = ph.join(
        F.broadcast(bits.select(F.col("pos").alias("p0"), F.lit(1).alias("hit0"))),
        "p0",
        "left",
    ).join(
        F.broadcast(bits.select(F.col("pos").alias("p1"), F.lit(1).alias("hit1"))),
        "p1",
        "left",
    )
    pr = probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(
            F.when(F.col("hit0").isNotNull() & F.col("hit1").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
    )
    nb = bench.agg(F.count(F.lit(1)).cast("long").alias("n_bench_shingles"))
    nbits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    density = F.col("n_bits_set").cast("double") / _BF_M
    return (
        nb.crossJoin(nbits)
        .crossJoin(pr)
        .select(
            "n_bench_shingles",
            "n_bits_set",
            "n_probes",
            "n_false_pos",
            F.round(density, 6).alias("density"),
            F.round(
                F.col("n_false_pos").cast("double") / F.col("n_probes"), 6
            ).alias("measured_fpr"),
            F.round(density * density, 6).alias("predicted_fpr"),
        )
    )


#: KMV (k-minimum-values / bottom-k theta) sketch geometry
_KMV_K = 256
#: phase-1 salt fan: per-(type, h mod SALT) partial bottom-k bounds the
#: final per-type rank input to SALT*K rows — the distributed bottom-k
#: construction (raise the fan for more map-side parallelism at scale)
_KMV_SALT = 16
_KMV_HASH = (
    "CAST(list_sum(list_transform(range(1, 9), i -> "
    "(strpos('0123456789abcdef', substring(md5({x}), i, 1)) - 1) "
    "* (16 ** (8 - i)))) AS BIGINT)"
)


@register(
    "kmv_intersection",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT event_type,
               {_KMV_HASH.format(x=
                 "CAST(user_id AS VARCHAR) || ':' || "
                 "strftime(CAST(ts AS DATE), '%Y-%m-%d')")} AS h
        FROM events),
    sk AS (
        SELECT event_type, h
        FROM (SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY h) AS r
              FROM ud) z
        WHERE r <= {_KMV_K}),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM ud) a
        JOIN (SELECT DISTINCT event_type FROM ud) b
          ON a.event_type < b.event_type),
    pu AS (
        SELECT p.type_a, p.type_b, s.h,
               max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
                   AS in_a,
               max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
                   AS in_b
        FROM pairs p
        JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
        GROUP BY 1, 2, 3),
    kept AS (
        SELECT type_a, type_b, h, in_a, in_b
        FROM (SELECT *, row_number() OVER (PARTITION BY type_a, type_b
                                           ORDER BY h) AS r
              FROM pu) z
        WHERE r <= {_KMV_K}),
    est AS (
        SELECT type_a, type_b,
               CAST(count(*) AS BIGINT) AS c,
               CAST(max(h) AS BIGINT) AS hk,
               CAST(sum(in_a * in_b) AS BIGINT) AS m
        FROM kept GROUP BY 1, 2),
    ex AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM ud a JOIN ud b
          ON a.h = b.h AND a.event_type < b.event_type
        GROUP BY 1, 2),
    sizes AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS nd
        FROM ud GROUP BY 1),
    raw AS (
        SELECT e.type_a, e.type_b,
               sa.nd + sb.nd - x.exact_inter AS exact_union,
               x.exact_inter,
               CASE WHEN e.c < {_KMV_K} THEN CAST(e.c AS DOUBLE)
                    ELSE (({_KMV_K} - 1) * 4294967296.0)
                         / CAST(e.hk + 1 AS DOUBLE) END AS ru,
               CASE WHEN e.c < {_KMV_K} THEN CAST(e.m AS DOUBLE)
                    ELSE (CAST(e.m AS DOUBLE) * ({_KMV_K} - 1)
                          * 4294967296.0)
                         / ({_KMV_K}.0 * CAST(e.hk + 1 AS DOUBLE)) END
                   AS ri
        FROM est e
        JOIN ex x ON e.type_a = x.type_a AND e.type_b = x.type_b
        JOIN sizes sa ON sa.event_type = e.type_a
        JOIN sizes sb ON sb.event_type = e.type_b)
    SELECT type_a, type_b,
           CAST(exact_union AS BIGINT) AS exact_union, exact_inter,
           round(ru, 2) AS kmv_union, round(ri, 2) AS kmv_inter,
           round(abs(ru - exact_union) / exact_union, 4) AS union_err,
           CASE WHEN exact_inter = 0 THEN NULL
                ELSE round(abs(ri - exact_inter) / exact_inter, 4) END
               AS inter_err
    FROM raw ORDER BY type_a, type_b
    """,
    description=f"KMV (bottom-{_KMV_K}) theta-sketch set operations: "
    "per event-type pair, the distinct active user-DAY overlap "
    "estimated from the k smallest md5-hash values — union size from "
    "the kth minimum ((k-1)/U(k)), intersection via the Jaccard share "
    "of the union sketch — next to the exact answers and relative "
    "errors.  The mergeable-sketch construction behind cross-segment "
    "audience-overlap dashboards: sketches are tiny, compose under "
    "union, and never rescan the fact.",
)
def kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k per type runs as the DISTRIBUTED two-phase rank: a
    partial bottom-k per (type, h mod 16) salt bucket (each window
    partition holds only its bucket's hashes; the union of per-bucket
    bottom-k provably contains the global bottom-k), then the final
    rank over the <= 16k survivors per type — no full-type sort ever
    materializes on one task, which is what makes the sketch build
    scale to a 100 TB fact while the ORACLE can use the plain global
    rank (identical result by the superset property).  Pair math runs
    entirely on the 5 x k sketch table (localCheckpoint-pinned — it
    feeds the union, membership, and readout subtrees); the only
    fact-sized stages are the initial distinct and the exact-answer
    audit join (which a production deployment would simply drop).
    Every estimate is exact-integer arithmetic plus ONE IEEE division,
    so both engines agree bit-for-bit."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.col("ts").cast("date").cast("string"),
    )
    h = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    ud = fan_out(ev, 8).select("event_type", h).distinct()
    ud = ud.localCheckpoint(eager=False)

    # distributed bottom-k: salt-bucket partial, then bounded final rank
    cand = (
        ud.withColumn("salt", F.pmod("h", F.lit(_KMV_SALT)))
        .withColumn(
            "r",
            F.row_number().over(
                W.partitionBy("event_type", "salt").orderBy("h")
            ),
        )
        .filter(F.col("r") <= _KMV_K)
        .drop("salt", "r")
    )
    # sk is consumed once (the pair-union join), so no checkpoint: the
    # salted two-phase bottom-k plans inline and WindowGroupLimit pushes
    # the rank<=k cut below each sort
    sk = (
        cand.withColumn(
            "r", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("r") <= _KMV_K)
        .drop("r")
    )

    types = ud.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    pu = (
        F.broadcast(pairs)
        .join(
            sk,
            (sk["event_type"] == F.col("type_a"))
            | (sk["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    kept = (
        pu.withColumn(
            "r",
            F.row_number().over(W.partitionBy("type_a", "type_b").orderBy("h")),
        )
        .filter(F.col("r") <= _KMV_K)
    )
    est = kept.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.max("h").cast("long").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
    )

    ex = (
        ud.alias("a")
        .join(
            ud.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    sizes = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("nd").alias("nd_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("nd").alias("nd_b")
    )

    full = F.col("c") >= _KMV_K
    ru = F.when(
        ~full, F.col("c").cast("double")
    ).otherwise(
        F.lit(float((_KMV_K - 1) * 4294967296.0))
        / (F.col("hk") + 1).cast("double")
    )
    ri = F.when(
        ~full, F.col("m").cast("double")
    ).otherwise(
        (F.col("m").cast("double") * (_KMV_K - 1) * F.lit(4294967296.0))
        / (F.lit(float(_KMV_K)) * (F.col("hk") + 1).cast("double"))
    )
    raw = (
        est.join(ex, ["type_a", "type_b"])
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            (F.col("nd_a") + F.col("nd_b") - F.col("exact_inter"))
            .cast("long")
            .alias("exact_union"),
            "exact_inter",
            ru.alias("ru"),
            ri.alias("ri"),
        )
    )
    return raw.select(
        "type_a",
        "type_b",
        "exact_union",
        "exact_inter",
        F.round("ru", 2).alias("kmv_union"),
        F.round("ri", 2).alias("kmv_inter"),
        F.round(
            F.abs(F.col("ru") - F.col("exact_union")) / F.col("exact_union"),
            4,
        ).alias("union_err"),
        F.when(F.col("exact_inter") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.abs(F.col("ri") - F.col("exact_inter"))
                / F.col("exact_inter"),
                4,
            )
        )
        .alias("inter_err"),
    ).orderBy("type_a", "type_b")
