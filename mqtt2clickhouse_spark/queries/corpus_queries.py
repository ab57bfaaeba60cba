"""Corpus-preparation additions: sliding-window document chunking,
shingle novelty scoring, PMI collocation mining, and the end-to-end
LSH-then-verify near-dup pipeline (candidates from MinHash banding,
exact Jaccard only on the candidates).

All four are oracle-checked.  Hashing is md5-derived (ops.dedup.hash32)
so DuckDB reproduces every signature bit-for-bit; floats are rounded
before any ordering or threshold compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import dedup as dd
from mqtt2clickhouse_spark.ops import text as tx
from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.queries.dedup_queries import (
    _DUCK_HASH32,
    _DUCK_SHINGLES,
    _duck_minhash_pairs,
)
from mqtt2clickhouse_spark.queries.quality_queries import _DUCK_TOKS
from mqtt2clickhouse_spark.tables import fan_out

#: chunk size / stride (tokens) for the sliding-window chunker
_CHUNK = 64
_STRIDE = 48


@register(
    "document_chunk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    st AS (
        SELECT doc_id, tk, unnest(range(1, len(tk) + 1, {_STRIDE})) AS start
        FROM toks WHERE len(tk) > 0)
    SELECT doc_id,
           CAST((start - 1) // {_STRIDE} AS BIGINT) AS chunk_id,
           CAST(start AS BIGINT) AS start_tok,
           CAST(len(tk[start:start + {_CHUNK - 1}]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(tk[start:start + {_CHUNK - 1}], ' ')) AS chunk_md5
    FROM st
    """,
    description=f"Sliding-window chunking: {_CHUNK}-token chunks at stride "
    f"{_STRIDE} ({_CHUNK - _STRIDE}-token overlap) — the context-window "
    "splitter feeding sequence packing; chunk content pinned by md5.",
)
def document_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only: tokenize, generate chunk starts (1, 1+S, … ≤ n_tokens),
    posexplode, slice.  No shuffle at all — chunking distributes with the
    scan, which is why a 100 TB corpus chunks at read bandwidth.  The
    trailing chunk may be short (a doc is never dropped); empty docs
    produce no chunks.  ``slice`` truncates at the array end exactly like
    the oracle's inclusive list slice."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tx.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    starts = F.sequence(F.lit(1), F.size("tk"), F.lit(_STRIDE))
    chunked = toks.select(
        "doc_id", "tk", F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.slice(F.col("tk"), F.col("start"), _CHUNK)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register(
    "ngram_novelty",
    oracle=f"""
    WITH shingles AS ({_DUCK_SHINGLES}),
    first AS (SELECT shingle, min(doc_id) AS first_id FROM shingles GROUP BY 1)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           round(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END)
                 / count(*), 4) AS novel_frac
    FROM shingles s JOIN first f USING (shingle)
    GROUP BY s.doc_id
    """,
    description="Shingle novelty: fraction of a doc's distinct word-3grams "
    "not seen in any earlier doc (min-doc-id ownership) — the cross-doc "
    "repetition signal used to down-weight boilerplate.",
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two partial-aggregable shuffles on the shingle key (the min() and
    the join reuse one hash partitioning) plus the per-doc rollup.
    "First" is min(doc_id) — deterministic, engine-independent, and at
    100 TB it is exactly the attribution a dedup pass computes anyway.
    Docs with <3 tokens have no shingles and are absent, matching the
    oracle."""
    docs = t(spark, sf_dir, "documents")
    # materialized shingle store: both consumers (min() agg + join)
    # re-scan cheap columnar parquet instead of pinning fat rows
    sh = dd.shingle_store(docs, sf_dir).select("id", "shingle")
    first = sh.groupBy("shingle").agg(F.min("id").alias("first_id"))
    return (
        sh.join(first, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("first_id") == F.col("id"), 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("novel_frac"),
        )
        .withColumnRenamed("id", "doc_id")
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


@register(
    "bigram_pmi",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    bg AS (
        SELECT unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i] || ' ' || tk[i + 1])) AS bg
        FROM toks WHERE len(tk) >= 2),
    cbg AS (SELECT bg, count(*) AS c_bg FROM bg GROUP BY 1),
    uni AS (SELECT unnest(tk) AS w FROM toks),
    cw AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
    tot AS (SELECT (SELECT CAST(sum(c_bg) AS BIGINT) FROM cbg) AS n_bg,
                   (SELECT CAST(sum(c_w) AS BIGINT) FROM cw) AS n_uni)
    SELECT b.bg, CAST(b.c_bg AS BIGINT) AS c_bg,
           round(ln((b.c_bg * CAST(t.n_uni AS DOUBLE) * t.n_uni)
                    / (CAST(t.n_bg AS DOUBLE) * w1.c_w * w2.c_w)), 4) AS pmi
    FROM cbg b
    JOIN cw w1 ON w1.w = string_split(b.bg, ' ')[1]
    JOIN cw w2 ON w2.w = string_split(b.bg, ' ')[2]
    CROSS JOIN tot t
    WHERE b.c_bg >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, bg LIMIT {_PMI_TOPK}
    """,
    description=f"Collocation mining: top-{_PMI_TOPK} word bigrams by "
    f"pointwise mutual information (count ≥ {_PMI_MIN_COUNT}) — the "
    "phrase-detection pass of a tokenizer-training pipeline.",
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level groupBys (map-side combined) + two equi-joins of the
    bigram table against the unigram counts on the word key.  The count
    tables partition like any fact table (NOT broadcast — vocabulary is
    corpus-sized at 100 TB); only the two scalar totals broadcast.  PMI
    is rounded before the top-k, which plans as TakeOrderedAndProject.

    word_bigrams is an interpreted Catalyst higher-order-function
    expression (no codegen, no Arrow round-trip — see NOTES); the bigram
    count table is localCheckpoint-pinned because it feeds both the
    scalar total and the join, and re-expanding it would re-run the
    token explode."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    bg = docs.select(F.explode(tx.word_bigrams(F.col("text"))).alias("bg"))
    cbg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    cbg = cbg.localCheckpoint(eager=False)  # feeds totals AND the joins
    cw = (
        docs.select(F.explode(tx.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    cw = cw.localCheckpoint(eager=False)
    tot = cbg.agg(F.sum("c_bg").cast("long").alias("n_bg")).crossJoin(
        cw.agg(F.sum("c_w").cast("long").alias("n_uni"))
    )
    w1 = cw.select(F.col("w").alias("w1"), F.col("c_w").alias("c_w1"))
    w2 = cw.select(F.col("w").alias("w2"), F.col("c_w").alias("c_w2"))
    return (
        cbg.filter(F.col("c_bg") >= _PMI_MIN_COUNT)
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .withColumn("w2", F.split("bg", " ").getItem(1))
        .join(w1, "w1")
        .join(w2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.col("c_bg").cast("long").alias("c_bg"),
            F.round(
                F.log(
                    (F.col("c_bg") * F.col("n_uni").cast("double") * F.col("n_uni"))
                    / (F.col("n_bg").cast("double") * F.col("c_w1") * F.col("c_w2"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "bg")
        .limit(_PMI_TOPK)
    )


@register(
    "dedup_lsh_verify",
    oracle=f"""
    WITH pairs AS ({_duck_minhash_pairs(8, 4, max_bucket=64)}),
    shingles AS ({_DUCK_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
    inter AS (
        SELECT p.id_a, p.id_b, count(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON sa.doc_id = p.id_a
        JOIN shingles sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           round(i.n_inter / (za.n + zb.n - i.n_inter), 4) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
    WHERE i.n_inter / (za.n + zb.n - i.n_inter) >= 0.5
    """,
    description="End-to-end near-dup pipeline: MinHash-LSH candidates "
    "(4 bands × 2 rows, hot buckets capped) verified with EXACT shingle "
    "Jaccard — the production shape that replaces both the all-pairs "
    "jaccard join and trust-the-sketch dedup.",
)
def dedup_lsh_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-correct composition (VERDICT r1 named it as the
    alternative to the quadratic shingle self-join): candidate pairs are
    bounded by LSH bucket size, and the exact verify touches only those
    pairs — per-doc shingle SETS ride along as arrays (collect_set is one
    combiner-enabled shuffle on the doc id; a document's shingle set is
    bounded by its length, not the corpus), so the verify is two hash
    joins on the pair ids + a map-side array_intersect.  False-positive
    candidates are killed by the exact jaccard; false negatives are the
    (tunable) LSH recall tradeoff."""
    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    pairs = dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)
    sh = dd.shingle_store(docs, sf_dir)
    # NOT pinned despite the two-consumer diamond: sets is collect_set
    # output (doc-sized shingle arrays — as fat as its input), and a
    # localCheckpoint of it measured ~0.25s SLOWER than re-running the
    # shingle subtree twice (materializing fat rows costs more than the
    # extra UDF pass; see NOTES.md "pin cheap-output subtrees only")
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(jac >= 0.5)  # threshold the exact ratio, like the oracle
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "chunk_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    st AS (
        SELECT doc_id, tk, unnest(range(1, len(tk) + 1, {_STRIDE})) AS start
        FROM toks WHERE len(tk) > 0),
    chunks AS (
        SELECT doc_id,
               md5(array_to_string(tk[start:start + {_CHUNK - 1}], ' ')) AS chunk_md5
        FROM st)
    SELECT chunk_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occur,
           min(doc_id) AS first_doc
    FROM chunks
    GROUP BY chunk_md5
    HAVING count(DISTINCT doc_id) >= 2
    """,
    description=f"Repeated-chunk detection: {_CHUNK}-token chunks (stride "
    f"{_STRIDE}) whose md5 recurs across >= 2 documents — substring-level "
    "exact dedup at chunk granularity (the scalable stand-in for "
    "suffix-array substring dedup), attributing each dup to min(doc_id).",
)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only chunking (same shape as ``document_chunk``) followed by
    ONE partial-aggregable shuffle on the chunk hash: count(distinct
    doc_id) over a (chunk_md5, doc_id)-deduplicated pre-aggregate plus
    the occurrence count.  At 100 TB the chunk-hash key space is huge
    but uniformly distributed (md5), so the shuffle is skew-free; the
    HAVING prunes the (vast) unique majority before any further join.
    This is the chunk-granular exact-substring dedup pass (cf. the
    suffix-array method of Lee et al., "Deduplicating Training Data
    Makes Language Models Better") re-expressed as hash aggregation."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tx.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    starts = F.sequence(F.lit(1), F.size("tk"), F.lit(_STRIDE))
    chunks = toks.select(
        "doc_id",
        F.explode(starts).alias("start"),
        "tk",
    ).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.col("tk"), F.col("start"), _CHUNK))).alias(
            "chunk_md5"
        ),
    )
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occur"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


#: contamination n-gram length and the deterministic eval-set predicate
_CONTAM_N = 8
_CONTAM_MOD = 5


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    ng AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(tk) - {_CONTAM_N - 2}),
                   i -> array_to_string(tk[i:i + {_CONTAM_N - 1}], ' ')))) AS g
        FROM toks WHERE len(tk) >= {_CONTAM_N}),
    eval AS (SELECT DISTINCT g FROM ng WHERE doc_id % {_CONTAM_MOD} = 0)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
    FROM ng t JOIN eval e USING (g)
    WHERE t.doc_id % {_CONTAM_MOD} <> 0
    GROUP BY t.doc_id
    """,
    description=f"N-gram decontamination ({_CONTAM_N}-gram overlap): "
    "training docs sharing any 8-gram with the held-out eval slice "
    f"(doc_id % {_CONTAM_MOD} = 0) and how many — the published "
    "benchmark-contamination method (GPT-3 13-gram / PaLM 8-gram style), "
    "as opposed to the exact/Bloom whole-doc matching of decontaminate*.",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distinct-ngram explode feeding both sides (localCheckpoint —
    diamond), then an equi-join on the n-gram string and a per-doc
    count.  Scale: the eval side of the join is the *benchmark* corpus —
    millions of n-grams, not billions — so at 100 TB it broadcasts (the
    published implementations ship exactly that: a hashed eval-ngram set
    to every worker); here it stays a shuffle join because the fixture
    eval slice is 20% of the corpus, and AQE converts it to broadcast
    when it fits.  Distinct-per-doc n-grams bound the per-doc output by
    doc length."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tx.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") >= _CONTAM_N
    )
    idx = F.sequence(F.lit(1), F.size("tk") - (_CONTAM_N - 1))
    ng = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, _CONTAM_N)),
                )
            )
        ).alias("g"),
    )
    ng = ng.localCheckpoint(eager=False)  # feeds eval set AND train side
    eval_ng = (
        ng.filter(F.col("doc_id") % _CONTAM_MOD == 0).select("g").distinct()
    )
    return (
        ng.filter(F.col("doc_id") % _CONTAM_MOD != 0)
        .join(eval_ng, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_ngrams"))
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH pairs AS ({{pairs}}),
    shingles AS ({_DUCK_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
    inter AS (
        SELECT p.id_a, p.id_b, count(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON sa.doc_id = p.id_a
        JOIN shingles sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           round(i.n_inter / least(za.n, zb.n), 4) AS containment
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
    WHERE i.n_inter / least(za.n, zb.n) >= 0.5
    """.format(pairs=_duck_minhash_pairs(8, 4, max_bucket=64)),
    description="Containment dedup: |A∩B| / min(|A|,|B|) over LSH candidate "
    "pairs — catches document-inside-document duplication that symmetric "
    "Jaccard misses (a long doc embedding a short one scores low Jaccard "
    "but containment 1.0).",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-hash-join verify shape as ``dedup_lsh_verify`` (candidates
    bounded by LSH buckets, per-doc shingle sets ride as arrays), but the
    score is max-containment: intersection over the SMALLER set.  The
    published broadness/subset-dup metric (Broder's containment);
    thresholded on the exact unrounded ratio like every dedup query."""
    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    pairs = dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)
    sh = dd.shingle_store(docs, sf_dir)
    # NOT pinned despite the two-consumer diamond: sets is collect_set
    # output (doc-sized shingle arrays — as fat as its input), and a
    # localCheckpoint of it measured ~0.25s SLOWER than re-running the
    # shingle subtree twice (materializing fat rows costs more than the
    # extra UDF pass; see NOTES.md "pin cheap-output subtrees only")
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    containment = inter / F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(containment >= 0.5)
        .select("id_a", "id_b", F.round(containment, 4).alias("containment"))
    )


@register(
    "dedup_pipeline_e2e",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_pairs(8, 4, max_bucket=64)}),
    shingles AS ({_DUCK_SHINGLES}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
    inter AS (
        SELECT p.id_a, p.id_b, count(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON sa.doc_id = p.id_a
        JOIN shingles sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2),
    ver AS (
        SELECT i.id_a, i.id_b
        FROM inter i
        JOIN sizes za ON za.doc_id = i.id_a
        JOIN sizes zb ON zb.doc_id = i.id_b
        WHERE i.n_inter / (za.n + zb.n - i.n_inter) >= 0.5),
    edges AS (SELECT id_a AS u, id_b AS v FROM ver
              UNION SELECT id_b, id_a FROM ver),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    dropped AS (SELECT id FROM comp WHERE id <> component)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(dr.id) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(dr.id) AS BIGINT) AS n_survivors
    FROM documents d LEFT JOIN dropped dr ON dr.id = d.doc_id
    GROUP BY 1
    """,
    description="The COMPLETE near-dup dedup pipeline as one query: "
    "MinHash-LSH candidates (capped buckets) -> exact Jaccard verify "
    "(>= 0.5) -> connected components -> keep the min-id canonical per "
    "cluster -> per-source survivor accounting.",
)
def dedup_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every stage is the production-scale operator already attested
    individually — sketch candidates (``dedup_minhash_pairs``), exact
    verify (``dedup_lsh_verify``), alternating-star components with the
    bounded driver finish (``dedup_components``), canonical keep rule
    (``dedup_canonical``) — composed end-to-end the way a 100 TB corpus
    actually gets deduplicated, with the per-source survivor report a
    curation run logs.  Only near-dup CLUSTER MEMBERS can be dropped
    (component roots and untouched docs survive), so the verify
    threshold, not the sketch recall, decides every drop.  The whole
    pipeline — including the component fixpoint — replays in the oracle
    via a recursive CTE."""
    from mqtt2clickhouse_spark.ops.components import connected_components

    docs = t(spark, sf_dir, "documents")
    ver = dedup_lsh_verify(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(ver)
    dropped = comp.filter(F.col("id") != F.col("component")).select("id")
    return (
        docs.join(dropped, docs["doc_id"] == dropped["id"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("id").cast("long").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("id")).cast("long").alias("n_survivors"),
        )
    )


#: span_corruption: mask rate in percent (T5 uses 15%)
_SC_MASK_PCT = 15


@register(
    "span_corruption",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    flat AS (
        SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
               unnest(tk) AS tok
        FROM toks),
    masked AS (
        SELECT doc_id, pos, tok
        FROM flat
        WHERE {_DUCK_HASH32.format(
            x="CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")}
              % 100 < {_SC_MASK_PCT}),
    grp AS (
        SELECT doc_id, pos, tok,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM masked),
    spans AS (
        SELECT doc_id, island,
               CAST(min(pos) AS BIGINT) AS start_pos,
               CAST(count(*) AS BIGINT) AS span_len,
               string_agg(tok, ' ' ORDER BY pos) AS masked_text
        FROM grp GROUP BY 1, 2)
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos)
                AS BIGINT) AS span_id,
           start_pos, span_len, masked_text
    FROM spans
    """,
    description=f"T5-style span-corruption prep: {_SC_MASK_PCT}% of each "
    "document's tokens are masked by a deterministic per-position hash, "
    "consecutive masked positions merge into spans (gaps-and-islands), "
    "and each span is emitted with its ordinal sentinel id, start "
    "position, length, and masked text — the denoising-objective "
    "target extraction every T5/UL2 data pipeline runs.",
)
def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything after the tokenize rides ONE shuffle: the mask
    decision is a map-side hash filter (repartition-stable, so the
    sample is reproducible under any layout — same property as
    hash_split), and the island grouping, span aggregate, and sentinel
    numbering are three window/aggregate steps over the SAME doc_id
    partitioning, which Spark plans without re-exchanging.  Span text
    is collected as (pos, tok) structs and array_sort'ed before
    joining — deterministic within-group order without relying on
    collect_list's arrival order (the oracle's ORDER BY inside
    string_agg is the SQL twin).
    """
    docs = fan_out(t(spark, sf_dir, "documents"))
    flat = docs.select(
        "doc_id", F.posexplode(tx.tokens(F.col("text"))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    h = dd.hash32(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("pos").cast("string")
        )
    )
    masked = flat.filter(h % 100 < _SC_MASK_PCT)
    from pyspark.sql import Window as W

    iw = W.partitionBy("doc_id").orderBy("pos")
    grp = masked.withColumn(
        "island", F.col("pos") - F.row_number().over(iw)
    )
    spans = grp.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("start_pos"),
        F.count(F.lit(1)).cast("long").alias("span_len"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
            " ",
        ).alias("masked_text"),
    )
    sw = W.partitionBy("doc_id").orderBy("start_pos")
    return spans.select(
        "doc_id",
        F.row_number().over(sw).cast("long").alias("span_id"),
        "start_pos",
        "span_len",
        "masked_text",
    )


#: dedup_threshold_sweep: candidate thresholds (applied to the
#: unrounded exact Jaccard, the ADVICE-r2 idiom)
_DTS_THRESHOLDS = [0.2, 0.3, 0.5, 0.7, 0.9]


@register(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH pairs AS ({{pairs}}),
    shingles AS ({{shingles}}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
    jac AS (
        SELECT i.id_a, i.id_b,
               i.n_inter / (za.n + zb.n - i.n_inter) AS j
        FROM (
            SELECT p.id_a, p.id_b, count(*) AS n_inter
            FROM pairs p
            JOIN shingles sa ON sa.doc_id = p.id_a
            JOIN shingles sb ON sb.doc_id = p.id_b
                            AND sb.shingle = sa.shingle
            GROUP BY 1, 2) i
        JOIN sizes za ON za.doc_id = i.id_a
        JOIN sizes zb ON zb.doc_id = i.id_b),
    th AS ({{ths}})
    SELECT t.threshold,
           -- the unnest doubles every pair (one row per endpoint)
           CAST(count(*) / 2 AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT u.id) AS BIGINT) AS n_docs
    FROM th t
    JOIN jac ON jac.j >= t.threshold
    CROSS JOIN (SELECT unnest([jac.id_a, jac.id_b]) AS id) u
    GROUP BY 1
    """.format(
        pairs=_duck_minhash_pairs(8, 4, max_bucket=64),
        shingles=_DUCK_SHINGLES,
        ths=" UNION ALL ".join(
            f"SELECT {t} AS threshold" for t in _DTS_THRESHOLDS
        ),
    ),
    description="Dedup threshold tuning table: for each candidate "
    f"Jaccard threshold in {_DTS_THRESHOLDS}, how many verified LSH "
    "pairs survive and how many documents they touch — the sweep that "
    "picks the near-dup cutoff BEFORE committing to a deletion pass "
    "(ann_tuning_curve's text-dedup counterpart).",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One verified-pair table serves the whole sweep: the expensive
    LSH + exact-Jaccard machinery runs ONCE because the five threshold
    levels arrive as ONE broadcast cross join (a single scan of the
    pair table — no pin needed; the plan has exactly one consumer),
    and the affected-doc count is a distinct over the exploded
    endpoints — tuning resolution costs rows in a tiny table, never
    another pass over the corpus."""
    docs = t(spark, sf_dir, "documents")
    sig = dd.minhash_signature_store(docs, sf_dir)
    pairs = dd.lsh_candidate_pairs(sig, "doc_id", k=8, bands=4, max_bucket=64)
    sh = dd.shingle_store(docs, sf_dir)
    sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh"))
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    verified = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("j"))
    )
    ths = spark.createDataFrame(
        [(t,) for t in _DTS_THRESHOLDS], "threshold double"
    )
    matched = verified.crossJoin(F.broadcast(ths)).filter(
        F.col("j") >= F.col("threshold")
    )
    return matched.select(
        "threshold",
        F.explode(F.array("id_a", "id_b")).alias("id"),
    ).groupBy("threshold").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
        F.count_distinct("id").cast("long").alias("n_docs"),
    )


# -- shared verbatim substring runs ---------------------------------------
#: exact-substring leak detection (the verbatim cousin of the shingle
#: near-dup family, after Lee et al.'s "Deduplicating Training Data
#: Makes Language Models Better" exact-substring pass): W-token
#: windows that match exactly across docs, merged into maximal
#: consecutive RUNS along each pair's alignment diagonal — the length
#: of the longest shared verbatim span, not just "some overlap".
#: Hot boilerplate windows are capped by document frequency before any
#: pair is generated (the max_df discipline).
_RUN_W = 8
_RUN_MAX_DF = 16
_RUN_TOPK = 20


@register(
    "shared_substring_runs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '') AS tk
        FROM documents),
    grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(tk[i:i + {_RUN_W} - 1], ' ') AS gram
        FROM toks,
             unnest(range(1, greatest(len(tk) - {_RUN_W} + 2, 1))) AS t(i)),
    kept AS (
        SELECT gram FROM grams
        GROUP BY 1
        HAVING count(DISTINCT doc_id) BETWEEN 2 AND {_RUN_MAX_DF}),
    g AS (SELECT gr.doc_id, gr.pos, gr.gram
          FROM grams gr JOIN kept k ON k.gram = gr.gram),
    m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos AS pa, a.pos - b.pos AS diag
        FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
    runs AS (
        SELECT doc_a, doc_b,
               CAST(count(*) + {_RUN_W} - 1 AS BIGINT) AS run_tokens
        FROM (SELECT doc_a, doc_b, diag, pa,
                     pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                             ORDER BY pa) AS grp
              FROM m) s
        GROUP BY doc_a, doc_b, diag, grp)
    SELECT doc_a, doc_b,
           CAST(max(run_tokens) AS BIGINT) AS max_run_tokens,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY 1, 2
    ORDER BY max_run_tokens DESC, doc_a, doc_b LIMIT {_RUN_TOPK}
    """,
    description=f"Longest shared VERBATIM token runs per doc pair: "
    f"{_RUN_W}-token windows matched exactly across docs (df-capped at "
    f"{_RUN_MAX_DF} to bound boilerplate blowup), merged into maximal "
    "consecutive runs along each pair's alignment diagonal — the "
    "exact-substring training-data leak detector (near-dup sketches "
    "say HOW similar; this says how LONG the copied span is).",
)
def shared_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window generation is per-row bounded array work (no self-join on
    tokens); the only pair-generating join keys on the gram STRING
    after the df cap, so common boilerplate can never go quadratic —
    the dedup max_df discipline.  Run merging is the gaps-and-islands
    trick on the pair's alignment diagonal (pos_a - pos_b): consecutive
    matches share a diagonal and advance pos_a by 1, so pa - row_number
    is constant per maximal run; the window partitions by (pair, diag)
    — never global.  Matching-position rows per pair, not O(len²)."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
        ).alias("tk"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("tk") >= _RUN_W,
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - _RUN_W + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(F.slice(F.col("tk"), i, _RUN_W), " ").alias(
                            "gram"
                        ),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.gram").alias("gram"))
    kept = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("dfc"))
        .filter((F.col("dfc") >= 2) & (F.col("dfc") <= _RUN_MAX_DF))
        .select("gram")
    )
    g = grams.join(kept, "gram").localCheckpoint(eager=False)  # both pair sides
    a = g.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "gram"
    )
    b = g.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "gram"
    )
    m = a.join(b, "gram").filter(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag")
    )
    grp = F.col("pa") - F.row_number().over(
        W.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    )
    runs = (
        m.withColumn("grp", grp)
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg((F.count(F.lit(1)) + _RUN_W - 1).cast("long").alias("run_tokens"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("run_tokens").cast("long").alias("max_run_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
        )
        .orderBy(F.desc("max_run_tokens"), "doc_a", "doc_b")
        .limit(_RUN_TOPK)
    )
