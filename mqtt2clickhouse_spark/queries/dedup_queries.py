"""Deduplication query surface: exact, MinHash signatures + LSH candidate
pairs, SimHash signatures, n-gram Jaccard, embedding-cosine near-dup.

Every hash is md5-derived integer arithmetic so the DuckDB oracle can
reproduce it bit-for-bit (see ops.dedup).  The hex→int trick for DuckDB:
md5 hex chars folded positionally, matching Spark's
``conv(substring(md5(x),1,8),16,10)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import dedup as dd
from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out

# DuckDB expression templates -------------------------------------------------

#: 32-bit md5-based hash of {x} (mirrors ops.dedup.hash32)
_DUCK_HASH32 = (
    "CAST(list_sum(list_transform(range(1, 9), i -> "
    "(strpos('0123456789abcdef', substring(md5({x}), i, 1)) - 1) "
    "* (16 ** (8 - i)))) AS BIGINT)"
)

#: distinct word-3gram shingles of lowered text (mirrors ops.dedup.word_shingles)
_DUCK_SHINGLES = """
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents) s
    WHERE len(toks) >= 3
"""


def _duck_minhash_sig(k: int) -> str:
    h = _DUCK_HASH32.format(x="shingle")
    mins = ",\n           ".join(
        f"min(({a} * {h} + {b}) % {dd.MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(dd.minhash_coeffs(k))
    )
    return f"""
    WITH shingles AS ({_DUCK_SHINGLES})
    SELECT doc_id, {mins}
    FROM shingles
    GROUP BY doc_id
    """


@register(
    "dedup_exact",
    oracle="""
    WITH dup AS (
        SELECT * FROM events
        UNION ALL
        SELECT * FROM events WHERE event_id % 5 = 0),
    d AS (SELECT DISTINCT * FROM dup)
    SELECT event_type, count(*) AS n FROM d GROUP BY event_type
    """,
    description="Exact dedup: dropDuplicates over a deliberately duplicated slice",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    dup = events.unionAll(events.filter(F.col("event_id") % 5 == 0))
    return dup.dropDuplicates().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "dedup_minhash_sig",
    oracle=_duck_minhash_sig(8),
    description="MinHash signatures (k=8) over word-3gram shingles, md5-hash family",
)
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return dd.minhash_signature_store(docs, sf_dir)


def _duck_minhash_pairs(
    k: int = 8, bands: int = 4, max_bucket: int | None = None
) -> str:
    sig = _duck_minhash_sig(k)
    rows = k // bands
    band_exprs = []
    for b in range(bands):
        cols = " || '_' || ".join(
            f"m{b * rows + r}" for r in range(rows)
        )
        band_exprs.append(f"SELECT doc_id, {b} AS band_id, {cols} AS band_sig FROM sig")
    banded = " UNION ALL ".join(band_exprs)
    side = "banded"
    cap = ""
    if max_bucket is not None:
        # mirror lsh_candidate_pairs' hot-bucket cap
        cap = f""",
    bsize AS (SELECT band_id, band_sig, count(*) AS n
              FROM banded GROUP BY 1, 2),
    kept AS (SELECT banded.doc_id, banded.band_id, banded.band_sig
             FROM banded JOIN bsize USING (band_id, band_sig)
             WHERE bsize.n <= {max_bucket})"""
        side = "kept"
    return f"""
    WITH sig AS ({sig}),
    banded AS ({banded}){cap}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM {side} a JOIN {side} b
      ON a.band_id = b.band_id AND a.band_sig = b.band_sig
     AND a.doc_id < b.doc_id
    """


@register(
    "dedup_minhash_pairs",
    oracle=_duck_minhash_pairs(8, 4, max_bucket=64),
    description="LSH candidate pairs: 4 bands × 2 rows over the MinHash signature, "
    "hot buckets (>64 members, degenerate band signatures) capped",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    return dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)


_DUCK_SIMHASH = f"""
    WITH toks AS (
        SELECT doc_id,
               list_transform(
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> ''),
                   tk -> {_DUCK_HASH32.format(x="tk")}) AS hashes
        FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 16), j ->
               CASE WHEN list_sum(list_transform(hashes, h ->
                        CASE WHEN CAST(floor(h / (2 ** j)) AS BIGINT) % 2 = 1
                             THEN 1 ELSE -1 END)) > 0
                    THEN CAST(2 ** j AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
    FROM toks
"""


@register(
    "dedup_simhash",
    oracle=_DUCK_SIMHASH,
    description="16-bit SimHash signature per document (token-hash bit voting)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.tables import fan_out

    docs = fan_out(t(spark, sf_dir, "documents"))
    return docs.select("doc_id", dd.simhash16_udf()(F.col("text")).alias("simhash"))


@register(
    "dedup_jaccard",
    oracle=f"""
    WITH shingles AS ({_DUCK_SHINGLES}),
    kept AS (
        SELECT doc_id, shingle
        FROM (SELECT doc_id, shingle,
                     count(*) OVER (PARTITION BY shingle) AS df
              FROM shingles) s
        WHERE df <= 50),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM kept GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM kept a JOIN kept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(n_inter / (sa.n_shingles + sb.n_shingles - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter / (sa.n_shingles + sb.n_shingles - n_inter) >= 0.5
    """,
    description="Exact word-3gram Jaccard similarity pairs (threshold 0.5) over the "
    "DF-filtered shingle space (shingles in >50 docs dropped — the quadratic term)",
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # shingles come from the materialized store (schema-compatible with
    # shingle_rows after the id rename); the DF filter + self-join run
    # on cheap columnar re-scans instead of per-query UDF passes
    return dd.jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5, max_df=50,
        shingled=dd.shingle_store(docs, sf_dir),
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_pairs(8, 4, max_bucket=64)}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id)
    SELECT id, min(r) AS component FROM reach GROUP BY id
    """,
    description="Near-dup clustering: connected components (large-star/small-star "
    "iterations) over the LSH candidate pairs — dedup groups, min-id canonical",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ops.components import connected_components

    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    # distinct=False: connected_components distincts its edge set up
    # front, so the banding's own dedup shuffle was a duplicate pass
    # (r15 optimization — the checkpoint boundary between them hid the
    # first distinct's partitioning, so both paid a full exchange)
    pairs = dd.lsh_candidate_pairs(
        sig, "doc_id", k=8, bands=4, max_bucket=64, distinct=False
    )
    return connected_components(pairs)


@register(
    "dedup_embedding",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.45
    """,
    description="Embedding-cosine near-duplicate pairs (threshold 0.45)",
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ops.similarity import cosine_pairs_blocked

    emb = t(spark, sf_dir, "embeddings")
    # small block size so the fixtures exercise the multi-block pair
    # groups (the code path a real corpus runs); production default 4096
    return cosine_pairs_blocked(emb, threshold=0.45, rows_per_block=256)


def _duck_minhash_est(k: int, bands: int, max_bucket: int) -> str:
    eq = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return f"""
    WITH pairs AS ({_duck_minhash_pairs(k, bands, max_bucket=max_bucket)}),
    sig AS ({_duck_minhash_sig(k)}),
    est AS (
        SELECT p.id_a, p.id_b, ({eq}) / {k}.0 AS est
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.id_a
        JOIN sig sb ON sb.doc_id = p.id_b),
    shingles AS ({_DUCK_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
    inter AS (
        SELECT e.id_a, e.id_b, count(*) AS n_inter
        FROM est e
        JOIN shingles sa ON sa.doc_id = e.id_a
        JOIN shingles sb ON sb.doc_id = e.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2)
    SELECT e.id_a, e.id_b,
           round(e.est, 4) AS est_jaccard,
           round(coalesce(i.n_inter, 0)
                 / (za.n + zb.n - coalesce(i.n_inter, 0)), 4) AS exact_jaccard,
           round(abs(e.est - coalesce(i.n_inter, 0)
                 / (za.n + zb.n - coalesce(i.n_inter, 0))), 4) AS abs_err
    FROM est e
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes za ON za.doc_id = e.id_a
    JOIN sizes zb ON zb.doc_id = e.id_b
    """


@register(
    "minhash_jaccard_est",
    oracle=_duck_minhash_est(8, 4, 64),
    description="Sketch calibration: MinHash-estimated Jaccard (fraction of "
    "agreeing signature components, k=8) vs EXACT shingle Jaccard on every "
    "LSH candidate pair, with the absolute error — the audit that tells you "
    "whether to trust the sketch at a given threshold.",
)
def minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature table is pinned once and feeds three consumers
    (banding, and both sides of the estimate join); the exact side rides
    the same collect_set-as-array shape as dedup_lsh_verify.  At 100 TB
    the estimate is nearly free (k integers per doc already computed for
    LSH); only the audited pair set pays for exact shingle intersection
    — which is the point: run this on a sample, calibrate, then trust
    est_jaccard corpus-wide."""
    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    sig = sig.localCheckpoint(eager=False)  # feeds banding + both est sides
    pairs = dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)
    sa = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(8)]
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    est = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (agree / F.lit(8.0)).alias("est"))
    )
    sh = dd.shingle_store(docs, sf_dir)
    # NOT pinned despite the two-consumer diamond: sets is collect_set
    # output (doc-sized shingle arrays — as fat as its input), and a
    # localCheckpoint of it measured ~0.25s SLOWER than re-running the
    # shingle subtree twice (materializing fat rows costs more than the
    # extra UDF pass; see NOTES.md "pin cheap-output subtrees only")
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    aa = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    bb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        est.join(aa, "id_a")
        .join(bb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("est", 4).alias("est_jaccard"),
            F.round(jac, 4).alias("exact_jaccard"),
            F.round(F.abs(F.col("est") - jac), 4).alias("abs_err"),
        )
    )


def _duck_lsh_histogram(k: int, bands: int) -> str:
    sig = _duck_minhash_sig(k)
    rows = k // bands
    band_exprs = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {cols} AS band_sig FROM sig".format(
            b=b,
            cols=" || '_' || ".join(f"m{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH sig AS ({sig}),
    banded AS ({band_exprs}),
    sizes AS (SELECT band_id, band_sig, count(*) AS bucket_size
              FROM banded GROUP BY 1, 2)
    SELECT CAST(bucket_size AS BIGINT) AS bucket_size,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM sizes GROUP BY bucket_size
    """


@register(
    "lsh_bucket_histogram",
    oracle=_duck_lsh_histogram(8, 4),
    description="LSH bucket-size distribution (4 bands x 2 rows): how many "
    "buckets of each size the banding produces — the monitoring query you "
    "run BEFORE choosing max_bucket, since a fat tail here is exactly the "
    "quadratic pair blow-up the cap exists to stop.",
)
def q_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two partial-aggregable shuffles (bucket key, then size), both on
    bounded keys; output is at most max-bucket-size rows.  At 100 TB
    this is the cheap pre-flight that sizes the cap for the expensive
    pair join."""
    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    return (
        dd.lsh_bucket_histogram(sig, "doc_id", k=8, bands=4)
        .select(
            F.col("bucket_size").cast("long").alias("bucket_size"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
        )
    )


_SIMHASH_BANDS = 4
_SIMHASH_HAM = 2
_SIMHASH_MAX_BUCKET = 16


def _duck_simhash_pairs(bands: int, max_ham: int, max_bucket: int) -> str:
    band_rows = " UNION ALL ".join(f"SELECT {b} AS band_id" for b in range(bands))
    return f"""
    WITH sig AS ({_DUCK_SIMHASH}),
    bands AS ({band_rows}),
    banded AS (
        SELECT doc_id, simhash, band_id,
               CAST(floor(simhash / (2 ** (4 * band_id))) AS BIGINT) % 16
                   AS band_val
        FROM sig CROSS JOIN bands),
    bsize AS (SELECT band_id, band_val, count(*) AS n
              FROM banded GROUP BY 1, 2),
    kept AS (SELECT banded.* FROM banded
             JOIN bsize USING (band_id, band_val)
             WHERE bsize.n <= {max_bucket}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.simhash AS sa, b.simhash AS sb
        FROM kept a JOIN kept b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
    FROM pairs
    WHERE bit_count(xor(sa, sb)) <= {max_ham}
    """


@register(
    "dedup_simhash_pairs",
    oracle=_duck_simhash_pairs(_SIMHASH_BANDS, _SIMHASH_HAM, _SIMHASH_MAX_BUCKET),
    description=f"SimHash near-dup pairs: pigeonhole banding ({_SIMHASH_BANDS} "
    f"x 4-bit bands; Hamming <= {_SIMHASH_HAM} guarantees a shared band) "
    f"with hot buckets (> {_SIMHASH_MAX_BUCKET}) capped, then exact "
    "Hamming verify on the candidates — completes the SimHash op from "
    "signature to pairs.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Manku et al. (2007) near-dup recipe shape: banding makes the
    candidate join an equi-join on (band_id, band_val) — Hamming <= k
    over b > k bands pigeonholes into >= 1 identical band, so banding
    loses nothing the verify wouldn't reject — and the bucket cap bounds
    the per-bucket quadratic exactly like LSH max_bucket (dropped
    buckets are degenerate near-constant signatures; the recall
    tradeoff is deliberate and mirrored in the oracle).  The verify is
    two integer ops (xor + bit_count), entirely codegen'd."""
    docs = t(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id", dd.simhash16_udf()(F.col("text")).alias("sh")
    ).localCheckpoint(eager=False)  # one UDF eval feeds all band projections
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright("sh", 4 * b).bitwiseAND(F.lit(15)).alias("band_val"),
            )
            for b in range(_SIMHASH_BANDS)
        ]
    )
    banded = sig.select(
        "doc_id", "sh", F.explode(band_structs).alias("band")
    ).select("doc_id", "sh", "band.band_id", "band.band_val")
    bsize = banded.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).alias("n")
    )
    kept = banded.join(
        bsize.filter(F.col("n") <= _SIMHASH_MAX_BUCKET).select("band_id", "band_val"),
        ["band_id", "band_val"],
    )
    a = kept.select(
        "band_id", "band_val", F.col("doc_id").alias("id_a"), F.col("sh").alias("sa")
    )
    b = kept.select(
        "band_id", "band_val", F.col("doc_id").alias("id_b"), F.col("sh").alias("sb")
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
        .filter(ham <= _SIMHASH_HAM)
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
    )


#: minhash_band_recall: ground-truth Jaccard floor and the banding shape
#: (k=8 → 4 bands × 2 rows) it calibrates
_MBR_MIN_J = 0.1
_MBR_BAND_CASE = """CASE WHEN j >= 0.7 THEN '0.7+'
                    WHEN j >= 0.5 THEN '0.5-0.7'
                    WHEN j >= 0.3 THEN '0.3-0.5'
                    ELSE '0.1-0.3' END"""


@register(
    "minhash_band_recall",
    oracle=f"""
    WITH sh_all AS ({_DUCK_SHINGLES}),
    jkept AS (
        SELECT doc_id, shingle
        FROM (SELECT doc_id, shingle,
                     count(*) OVER (PARTITION BY shingle) AS df
              FROM sh_all) s
        WHERE df <= 50),
    jsizes AS (SELECT doc_id, count(*) AS n_shingles FROM jkept GROUP BY doc_id),
    jinter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM jkept a JOIN jkept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    tru AS (
        SELECT id_a, id_b,
               round(n_inter / (sa.n_shingles + sb.n_shingles - n_inter), 4) AS j
        FROM jinter
        JOIN jsizes sa ON sa.doc_id = id_a
        JOIN jsizes sb ON sb.doc_id = id_b
        WHERE n_inter / (sa.n_shingles + sb.n_shingles - n_inter)
                  >= {_MBR_MIN_J}),
    cand AS ({_duck_minhash_pairs(8, 4, max_bucket=64)}),
    h AS (
        SELECT {_MBR_BAND_CASE} AS band,
               1 - pow(1 - pow(t.j, 2), 4) AS pred,
               CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM tru t LEFT JOIN cand c USING (id_a, id_b))
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_true,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           round(sum(hit) / count(*), 4) AS recall,
           round(avg(pred), 4) AS pred_recall
    FROM h GROUP BY band
    """,
    description="MinHash-LSH banding recall calibration: per Jaccard band, "
    "measured recall of the 4-band×2-row candidates against exact "
    "(DF-filtered) shingle Jaccard ground truth NEXT TO the banding "
    "theory's predicted 1-(1-j^r)^b — the text-side twin of srp_recall.",
)
def minhash_band_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground truth is ``jaccard_pairs`` at a low floor (0.1, max_df 50 —
    the same DF-filtered shingle space every Jaccard op here uses);
    candidates are the production ``lsh_candidate_pairs`` banding.  One
    left join marks hits, one tiny per-band aggregate closes measured
    recall against the banding formula evaluated per pair (r=2 rows per
    band, b=4 bands).  Like srp_recall, at 100 TB the exact side is the
    quadratic cost this calibration exists to justify escaping — run it
    on a sample there."""
    docs = t(spark, sf_dir, "documents")
    tru = dd.jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=_MBR_MIN_J, max_df=50,
        shingled=dd.shingle_store(docs, sf_dir),
    )
    sig = dd.minhash_signature_store(docs, sf_dir)
    cand = dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)
    j = F.col("jaccard")
    pred = 1 - F.pow(1 - F.pow(j, F.lit(2)), F.lit(4))
    band = (
        F.when(j >= 0.7, "0.7+")
        .when(j >= 0.5, "0.5-0.7")
        .when(j >= 0.3, "0.3-0.5")
        .otherwise("0.1-0.3")
    )
    return (
        tru.join(cand.withColumn("hit", F.lit(1)), ["id_a", "id_b"], "left")
        .select(
            band.alias("band"),
            pred.alias("pred"),
            F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.sum("hit").cast("long").alias("n_hit"),
            F.round(F.sum("hit") / F.count(F.lit(1)), 4).alias("recall"),
            F.round(F.avg("pred"), 4).alias("pred_recall"),
        )
    )


@register(
    "fuzzy_join_levenshtein",
    oracle="""
    WITH names AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
               split_part(p_name, ' ', 2) AS noun
        FROM part GROUP BY 1, 3)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    description="Fuzzy self-join of part names at edit distance <= 2: "
    "dedup runs on the DISTINCT-name table (vocab-sized, with per-name "
    "part counts carried), candidates blocked on the shared last token, "
    "then exact codegen'd levenshtein verify.",
)
def fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate short strings the scalable way: (1) collapse the
    corpus to its distinct-value table first — fuzzy matching cost then
    scales with VOCABULARY, not row count, and the per-name part counts
    ride along so match weight needs no second corpus pass; (2) block
    candidates on a cheap equality key (the trailing token) so the
    self-join is an equijoin Catalyst hash-partitions — never an
    all-pairs product; (3) verify survivors with the built-in
    ``levenshtein`` (integer Wagner-Fischer, identical in every engine,
    whole-stage codegen'd).  At 100 TB the blocking key generalizes to
    q-gram buckets with a hot-bucket cap — the same guard family as LSH
    ``max_bucket``."""
    names = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        # coalesce matches DuckDB split_part's '' on single-token names
        # (Spark's getItem would yield NULL and silently drop the row)
        .withColumn(
            "noun", F.coalesce(F.split("p_name", " ").getItem(1), F.lit(""))
        )
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= 2)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("dist"),
            F.col("a.n_parts").alias("n_a"),
            F.col("b.n_parts").alias("n_b"),
        )
    )


#: winnow_fingerprint: k-gram size, winnow window, print-DF cap, output
_WIN_K = 3
_WIN_W = 4
_WIN_MAX_DF = 50
_WIN_MIN_SHARED = 2
_WIN_TOPK = 25

#: winnowed print lists per doc (shared by the oracle's CTE chain):
#: positional word k-grams → hash32 → min of each w-window → distinct
_DUCK_WINNOW = f"""
    toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents),
    hs AS (
        SELECT doc_id,
               list_transform(
                   list_transform(range(1, greatest(len(tk) - {_WIN_K - 1}, 0) + 1),
                                  i -> array_to_string(tk[i:i+{_WIN_K - 1}], ' ')),
                   g -> {_DUCK_HASH32.format(x="g")}) AS h
        FROM toks),
    pr AS (
        SELECT doc_id,
               CASE WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
                    WHEN len(h) < {_WIN_W} THEN [list_min(h)]
                    ELSE list_transform(range(1, len(h) - {_WIN_W - 2}),
                                        i -> list_min(h[i:i+{_WIN_W - 1}]))
               END AS prints
        FROM hs),
    pp AS (SELECT doc_id, unnest(list_distinct(prints)) AS p FROM pr),
    keep AS (SELECT p FROM (SELECT p, count(*) AS c FROM pp GROUP BY 1)
             WHERE c <= {_WIN_MAX_DF}),
    kp AS (SELECT pp.doc_id, pp.p FROM pp JOIN keep USING (p))"""


@register(
    "winnow_fingerprint",
    oracle=f"""
    WITH {_DUCK_WINNOW}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS shared
    FROM kp a JOIN kp b ON a.p = b.p AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {_WIN_MIN_SHARED}
    ORDER BY shared DESC, id_a, id_b LIMIT {_WIN_TOPK}
    """,
    description=f"Winnowing document fingerprints (MOSS): hash32 of word "
    f"{_WIN_K}-grams, minimum of each {_WIN_W}-window kept as a print, "
    f"hot prints capped at df {_WIN_MAX_DF}; top-{_WIN_TOPK} doc pairs "
    f"by shared prints (>= {_WIN_MIN_SHARED}).",
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting, winnowing form (Schleimer,
    Wilkerson & Aiken, SIGMOD'03): the positional k-gram hash sequence
    is reduced to its per-window minima, guaranteeing any shared
    substring of >= w+k-1 tokens yields a shared print while storing
    only ~2/(w+1) of the hashes — the storage/recall tradeoff MOSS
    runs on.  All map-side HOF Column work per doc (no UDF: md5/conv
    inside the lambdas stay JVM-side); the print table then follows the
    exact hot-key playbook of the shingle ops — df-capped (max_df
    analogue, the mega-common phrase guard), one shuffle on the print
    for the pair join, one aggregation, TakeOrderedAndProject top-k.
    Complements ``text_fingerprint`` (whole-doc exact md5): winnowed
    prints localize COPIED PASSAGES between near-duplicates.
    Reference parity: fingerprinting is driver-mandated
    (BASELINE.json); the reference engine has no text ops."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit(""))
    n = F.size(toks)
    gcount = F.greatest(n - (_WIN_K - 1), F.lit(0))
    grams = F.when(
        gcount > 0,
        F.transform(
            F.sequence(F.lit(1), gcount),
            lambda i: F.concat_ws(" ", F.slice(toks, i, _WIN_K)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # flatten to (doc_id, pos, gram) ROWS so the md5 hashing and the
    # sliding-window minimum run in whole-stage codegen — the array-HOF
    # formulation (min of slice per position) is interpreted and
    # measured ~5x slower on the same data
    g = docs.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id", "pos", dd.hash32(F.col("gram")).alias("h")
    )
    fwd = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, _WIN_W - 1)
    )
    full = W.partitionBy("doc_id")
    wm = g.select(
        "doc_id",
        "pos",
        F.min("h").over(fwd).alias("wmin"),
        F.count(F.lit(1)).over(full).alias("total"),
    )
    pp = (
        wm.filter(
            ((F.col("total") >= _WIN_W) & (F.col("pos") <= F.col("total") - _WIN_W))
            | ((F.col("total") < _WIN_W) & (F.col("pos") == 0))
        )
        .select("doc_id", F.col("wmin").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds the df-count AND the pair join
    )
    keep = (
        pp.groupBy("p")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= _WIN_MAX_DF)
        .select("p")
    )
    kp = pp.join(keep, "p")  # exchange on p is reused by the self-join
    a, b = kp.alias("a"), kp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= _WIN_MIN_SHARED)
        .orderBy(F.desc("shared"), "id_a", "id_b")
        .limit(_WIN_TOPK)
    )


@register(
    "dedup_cluster_stats",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_pairs(8, 4, max_bucket=64)}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    sizes AS (
        SELECT component, CAST(count(*) AS BIGINT) AS sz
        FROM comp GROUP BY 1),
    hist AS (
        SELECT sz AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(sz) AS BIGINT) AS n_docs,
               CAST(sum(sz - 1) AS BIGINT) AS n_removable
        FROM sizes GROUP BY 1),
    singletons AS (
        SELECT CAST(1 AS BIGINT) AS cluster_size,
               CAST((SELECT count(*) FROM documents)
                    - (SELECT count(*) FROM comp) AS BIGINT) AS n_clusters,
               CAST((SELECT count(*) FROM documents)
                    - (SELECT count(*) FROM comp) AS BIGINT) AS n_docs,
               CAST(0 AS BIGINT) AS n_removable)
    SELECT * FROM hist UNION ALL SELECT * FROM singletons
    """,
    description="Dedup-run monitoring readout: the cluster-size "
    "histogram of the near-dup components (LSH candidates -> connected "
    "components), with docs-per-size and removable-duplicate counts, "
    "plus the singleton row (docs in no candidate pair) so the "
    "histogram partitions the corpus — the report every production "
    "dedup run ships before anyone deletes anything.",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rides the same LSH -> components pipeline as dedup_components
    (bounded star rounds + capped driver union-find), then collapses to
    the component-size table — sizes-many rows — and a histogram over
    THAT, so both readout aggregates cost nothing at corpus scale.
    Singletons are derived by subtraction (corpus count minus clustered
    count), not by materializing a row per unclustered doc."""
    from mqtt2clickhouse_spark.ops.components import connected_components

    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    # distinct=False: same rationale as dedup_components — the
    # components operator distincts the edges itself
    pairs = dd.lsh_candidate_pairs(
        sig, "doc_id", k=8, bands=4, max_bucket=64, distinct=False
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.sum(F.col("sz") - 1).cast("long").alias("n_removable"),
    )
    n_total = docs.agg(F.count(F.lit(1)).alias("nt"))
    n_clustered = comp.agg(F.count(F.lit(1)).alias("nc"))
    singletons = (
        n_total.crossJoin(n_clustered)
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("nt") - F.col("nc")).cast("long").alias("n_clusters"),
            (F.col("nt") - F.col("nc")).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_removable"),
        )
    )
    return hist.unionAll(singletons)


#: dedup_incremental: the 1-in-4 "incoming batch" slice, the verify
#: threshold (on the UNROUNDED Jaccard — the ADVICE-r2 idiom), and the
#: shared hot-bucket cap
_DI_MOD = 4
_DI_THRESHOLD = 0.5
_DI_MAX_BUCKET = 64


@register(
    "dedup_incremental",
    oracle=f"""
    WITH sig AS ({{sig}}),
    banded AS ({{banded}}),
    bs AS (SELECT band_id, band_sig, count(*) AS n
           FROM banded GROUP BY 1, 2),
    kept AS (SELECT banded.doc_id, banded.band_id, banded.band_sig
             FROM banded JOIN bs USING (band_id, band_sig)
             WHERE bs.n <= {_DI_MAX_BUCKET}),
    cand AS (
        SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
        FROM kept a JOIN kept b
          ON a.band_id = b.band_id AND a.band_sig = b.band_sig
        WHERE a.doc_id % {_DI_MOD} = 0 AND b.doc_id % {_DI_MOD} <> 0),
    shingles AS ({{shingles}}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
    jac AS (
        SELECT i.new_id, i.old_id,
               i.n_inter / (za.n + zb.n - i.n_inter) AS j
        FROM (
            SELECT c.new_id, c.old_id, count(*) AS n_inter
            FROM cand c
            JOIN shingles sa ON sa.doc_id = c.new_id
            JOIN shingles sb ON sb.doc_id = c.old_id
                            AND sb.shingle = sa.shingle
            GROUP BY 1, 2) i
        JOIN sizes za ON za.doc_id = i.new_id
        JOIN sizes zb ON zb.doc_id = i.old_id
        WHERE i.n_inter / (za.n + zb.n - i.n_inter) >= {_DI_THRESHOLD}),
    best AS (
        SELECT new_id, old_id, j,
               row_number() OVER (PARTITION BY new_id
                                  ORDER BY j DESC, old_id) AS rk
        FROM jac)
    SELECT new_id AS incoming_id, old_id AS matched_id,
           round(j, 4) AS jaccard
    FROM best WHERE rk = 1
    """.format(
        sig=_duck_minhash_sig(8),
        banded=" UNION ALL ".join(
            "SELECT doc_id, {b} AS band_id, {cols} AS band_sig FROM sig".format(
                b=b,
                cols=" || '_' || ".join(f"m{b * 2 + r}" for r in range(2)),
            )
            for b in range(4)
        ),
        shingles=_DUCK_SHINGLES,
    ),
    description=f"INCREMENTAL near-dup detection — the streaming-"
    f"ingestion shape: a 1-in-{_DI_MOD} 'incoming batch' probes the "
    "standing corpus's LSH band index asymmetrically (new x old "
    "candidates only — the corpus is never re-paired against itself), "
    f"exact-Jaccard-verified at {_DI_THRESHOLD}, best existing match "
    "per incoming doc.  dedup_pipeline_e2e recomputes the world; this "
    "is what each ingest increment actually runs.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric LSH (ops/dedup.lsh_incremental_candidates): one
    signature pass over old + new together, one band shuffle, map-side
    new x old expansion with the shared hot-bucket cap — candidate
    volume scales with the INCREMENT, not the corpus.  The verify is
    the dedup_threshold_sweep machinery (collect_set shingles,
    array_intersect), thresholded on the unrounded Jaccard, and the
    best-match pick is a per-new-doc window over candidate-sized data.
    At 100 TB the old side's banded signatures are a standing bucketed
    table; the increment joins into it without touching document
    text until the exact verify."""
    from mqtt2clickhouse_spark.ops import dedup as dd
    from mqtt2clickhouse_spark.tables import fan_out
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    sig = sig.withColumn("is_new", F.col("doc_id") % _DI_MOD == 0)
    cand = dd.lsh_incremental_candidates(
        sig, "doc_id", "is_new", k=8, bands=4, max_bucket=_DI_MAX_BUCKET
    )
    sh = dd.shingle_store(docs, sf_dir)
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    a = sets.select(F.col("id").alias("new_id"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("old_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    verified = (
        cand.join(a, "new_id")
        .join(b, "old_id")
        .select("new_id", "old_id", jac.alias("j"))
        .filter(F.col("j") >= _DI_THRESHOLD)
    )
    w = W.partitionBy("new_id").orderBy(F.col("j").desc(), F.col("old_id"))
    return (
        verified.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("new_id").alias("incoming_id"),
            F.col("old_id").alias("matched_id"),
            F.round("j", 4).alias("jaccard"),
        )
    )


#: prefix-filtered exact set-similarity join threshold (Jaccard)
_PF_T_NUM, _PF_T_DEN = 1, 2  # t = 0.5, kept rational for exact math


@register(
    "setjoin_prefix_filter",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    sz AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
        FROM sh GROUP BY 1),
    freq AS (
        SELECT shingle, CAST(count(*) AS BIGINT) AS df
        FROM sh GROUP BY 1),
    ordered AS (
        SELECT s.doc_id, s.shingle, z.n_sh,
               row_number() OVER (PARTITION BY s.doc_id
                                  ORDER BY f.df, s.shingle) AS pos
        FROM sh s JOIN freq f ON f.shingle = s.shingle
        JOIN sz z ON z.doc_id = s.doc_id),
    prefix AS (
        SELECT * FROM ordered
        WHERE pos <= n_sh - (n_sh + 1) // 2 + 1),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.n_sh AS sza, b.n_sh AS szb
        FROM prefix a JOIN prefix b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         AND 2 * b.n_sh >= a.n_sh AND 2 * a.n_sh >= b.n_sh
         AND 3 * (1 + least(a.n_sh - a.pos, b.n_sh - b.pos))
             >= a.n_sh + b.n_sh),
    inter AS (
        SELECT c.doc_a, c.doc_b, c.sza, c.szb,
               CAST(count(*) AS BIGINT) AS i
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
        GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, sza, szb, i AS inter,
           round(CAST(i AS DOUBLE) / (sza + szb - i), 4) AS jaccard
    FROM inter WHERE 3 * i >= sza + szb
    ORDER BY doc_a, doc_b
    """,
    description="Prefix-filtered EXACT set-similarity join (the "
    "AllPairs/PPJoin family): shingle sets ordered rarest-global-"
    "token-first, each doc indexed only by its prefix (the |s| - "
    "ceil(t|s|) + 1 rarest shingles — any pair with Jaccard >= 0.5 "
    "MUST share a prefix token, the pigeonhole guarantee), candidates "
    "verified with exact integer intersection counts (3*inter >= "
    "|A|+|B| is J >= 1/2 exactly: 2i >= |A|+|B|-i).  The exact-threshold complement of "
    "the MinHash/LSH path: no hashing, no recall loss — and the two "
    "algorithms cross-validate each other (test).",
)
def setjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shingle pass (Arrow-batched UDF, pinned — three consumers:
    frequency table, prefix ordering, verification joins); the prefix
    self-join keys on the RAREST tokens so its fan-out is bounded by
    rare-token document frequencies (the algorithm's entire point —
    contrast a naive shingle self-join, which explodes on stopword
    shingles); verification joins only candidate pairs.  The standard
    length filter (t|A| <= |B| <= |A|/t) AND the PPJoin positional
    upper bound both ride inside the candidate join."""
    from mqtt2clickhouse_spark.ops.dedup import shingle_store
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    # materialized shingle store feeds freq/prefix/verify via cheap
    # columnar re-scans (no pin, no per-query shingle UDF)
    sh = shingle_store(docs, sf_dir).withColumnRenamed("id", "doc_id")
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    ordered = sh.join(freq, "shingle").select(
        "doc_id",
        "shingle",
        "n_sh",
        F.row_number()
        .over(W.partitionBy("doc_id").orderBy("df", "shingle"))
        .alias("pos"),
    )
    prefix = ordered.filter(
        F.col("pos")
        <= F.col("n_sh") - F.expr("(n_sh + 1) div 2") + 1
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "shingle",
        F.col("n_sh").cast("long").alias("sza"),
        F.col("pos").alias("pos_a"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "shingle",
        F.col("n_sh").cast("long").alias("szb"),
        F.col("pos").alias("pos_b"),
    )
    # length filter (J >= 1/2 forces |A|/2 <= |B| <= 2|A|) and the
    # PPJoin POSITIONAL filter: a prefix token matched at positions
    # (i, j) can contribute at most 1 + min(|A|-i, |B|-j) overlap, and
    # J >= 1/2 needs overlap >= (|A|+|B|)/3 — both prune inside the
    # join, which matters here because the fixture's 31-word vocabulary
    # makes even "rare" shingles common (the adversarial case for
    # plain prefix filtering)
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (2 * F.col("szb") >= F.col("sza"))
            & (2 * F.col("sza") >= F.col("szb"))
            & (
                3
                * (
                    1
                    + F.least(
                        F.col("sza") - F.col("pos_a"),
                        F.col("szb") - F.col("pos_b"),
                    )
                )
                >= F.col("sza") + F.col("szb")
            )
        )
        .select("doc_a", "doc_b", "sza", "szb")
        .distinct()
    )
    # r15 optimization (guide §2.3): verification used to EXPAND each
    # candidate pair by all of doc_a's shingles (cand ⋈ sh on doc_a),
    # re-join on (doc_b, shingle), and shuffle the expansion into a
    # per-pair count — two joins + one aggregate over |cand| × doc_len
    # rows.  The standard PPJoin verify is per-pair set intersection:
    # join the (small) candidate table against per-doc shingle SETS
    # (collect_set bounded by doc length — the dedup_incremental
    # idiom) and count with array_intersect map-side.  Same integer
    # intersection counts, one aggregate and one join fewer, and the
    # shuffled volume drops from the expansion to the candidate rows.
    # A/B at sf0.1: 2.58/2.92 s → 2.06/1.98 s, rows collect-identical.
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("shingle")).alias("shs")
    )
    inter_n = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    inter = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sh_b")),
            "doc_b",
        )
        .select("doc_a", "doc_b", "sza", "szb", inter_n.alias("inter"))
    )
    return (
        inter.filter(3 * F.col("inter") >= F.col("sza") + F.col("szb"))
        .select(
            "doc_a",
            "doc_b",
            "sza",
            "szb",
            "inter",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
