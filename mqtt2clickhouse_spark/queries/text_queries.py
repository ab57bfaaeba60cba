"""Text-analysis query surface over the ``documents`` fixture.

Spark side uses ops.text (pure Column expressions); oracles mirror the
exact arithmetic in DuckDB SQL (length-differencing instead of regex
where engines could disagree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import text as tx
from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out


@register(
    "text_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    x -> x <> '')) AS token
          FROM documents) s
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
    description="Token frequency top-50 (tokenize → explode → count)",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(50)
    )


@register(
    "text_quality",
    oracle="""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))::BIGINT
               AS n_tokens,
           round(length(replace(lower(text), ' ', ''))
                 / nullif(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                          x -> x <> '')), 0), 4) AS avg_token_len,
           round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                 / nullif(length(text), 0), 4) AS alpha_ratio,
           round(least(1.0, len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                            x -> x <> '')) / 100.0)
                 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                    / nullif(length(text), 0)), 4) AS quality_score
    FROM documents
    """,
    description="Per-document quality features: length, token stats, alpha ratio, score",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    feats = tx.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["quality_score"].alias("quality_score"),
    )


_DUCK_SCORE = """(length(' ' || lower(text) || ' ')
    - length(replace(' ' || lower(text) || ' ', ' {w} ', ''))) / {wl}"""


def _duck_lang_score(lang_words: list[str]) -> str:
    parts = [
        _DUCK_SCORE.format(w=w, wl=len(w) + 2) for w in lang_words
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


_EN = _duck_lang_score(tx._LANG_MARKERS["en"])
_DE = _duck_lang_score(tx._LANG_MARKERS["de"])
_FR = _duck_lang_score(tx._LANG_MARKERS["fr"])
_ES = _duck_lang_score(tx._LANG_MARKERS["es"])


@register(
    "lang_id",
    oracle=f"""
    WITH s AS (
        SELECT lang,
               {_EN} AS en_s, {_DE} AS de_s, {_FR} AS fr_s, {_ES} AS es_s
        FROM documents),
    p AS (
        SELECT lang,
               CASE WHEN en_s >= de_s AND en_s >= fr_s AND en_s >= es_s AND en_s > 0 THEN 'en'
                    WHEN de_s >= fr_s AND de_s >= es_s AND de_s > 0 THEN 'de'
                    WHEN fr_s >= es_s AND fr_s > 0 THEN 'fr'
                    WHEN es_s > 0 THEN 'es'
                    ELSE 'other' END AS lang_pred
        FROM s)
    SELECT lang, lang_pred, count(*) AS n
    FROM p GROUP BY lang, lang_pred
    """,
    description="Marker-word language ID heuristic vs the labeled lang column",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(t(spark, sf_dir, "documents"))
    scores = tx.lang_scores(F.col("text"))
    en, de, fr, es = scores["en"], scores["de"], scores["fr"], scores["es"]
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("other"))
    )
    return (
        docs.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents)
    SELECT doc_id, fingerprint,
           count(*) OVER (PARTITION BY fingerprint) > 1 AS is_dup
    FROM f
    """,
    description="md5 fingerprint of normalized text + exact-dup flag",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    fp = docs.select("doc_id", tx.fingerprint(F.col("text")).alias("fingerprint"))
    return fp.withColumn(
        "is_dup", F.count(F.lit(1)).over(W.partitionBy("fingerprint")) > 1
    )


_DUCK_QUALITY = """
    SELECT doc_id, lang, text,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
           len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))::BIGINT
               AS n_tokens,
           round(least(1.0, len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                            x -> x <> '')) / 100.0)
                 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                    / nullif(length(text), 0)), 4) AS quality_score
    FROM documents
"""


@register(
    "corpus_prep",
    oracle=f"""
    WITH feats AS ({_DUCK_QUALITY}),
    keep AS (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM feats
        WHERE n_tokens BETWEEN 40 AND 400 AND quality_score >= 0.2),
    deduped AS (SELECT * FROM keep WHERE rn = 1)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(quality_score), 4) AS avg_quality
    FROM deduped GROUP BY lang
    """,
    description="Flagship corpus curation: quality+length gate → exact-dedup "
    "keep-first-by-fingerprint → per-language token budget",
)
def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep pipeline this engine exists
    for, as ONE declarative plan: per-doc features (map-only), a gate
    (filter), exact dedup (one shuffle on the fingerprint), and the
    corpus accounting rollup (partial-aggregated).  At 100 TB: no stage
    holds more than (fingerprint, doc) per row, and the near-dup variant
    swaps the fingerprint window for dedup_components' cluster ids."""
    from pyspark.sql import Window as W

    docs = fan_out(t(spark, sf_dir, "documents"))
    feats = tx.quality_features(F.col("text"))
    annotated = docs.select(
        "doc_id",
        "lang",
        tx.fingerprint(F.col("text")).alias("fp"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality_score"].alias("quality_score"),
    )
    gated = annotated.filter(
        F.col("n_tokens").between(40, 400) & (F.col("quality_score") >= 0.2)
    )
    keep_first = (
        gated.withColumn(
            "rn", F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    return keep_first.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


@register(
    "hash_split",
    oracle="""
    WITH h AS (
        SELECT doc_id, lang,
               len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))::BIGINT
                   AS n_tokens,
               CAST(list_sum(list_transform(range(1, 9), i ->
                   (strpos('0123456789abcdef',
                           substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                   * (16 ** (8 - i)))) AS BIGINT) % 100 AS bucket
        FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM h GROUP BY 1, 2
    """,
    description="Reproducible train/val/test split: md5-hash bucket per doc id "
    "(engine-independent, stable under repartitioning — unlike rand())",
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus splitting: a content-independent hash of the
    stable id decides the split, so the assignment survives re-runs,
    repartitioning, and engine changes — the property rand(seed) lacks
    (seeded rand is per-partition in Spark, so any repartition reshuffles
    the split)."""
    from mqtt2clickhouse_spark.ops.dedup import hash32

    docs = t(spark, sf_dir, "documents")
    bucket = hash32(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            tx.token_count(F.col("text")).alias("n_tokens"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "token_count_bpe",
    oracle="""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))::BIGINT
               AS ws_tokens,
           (len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> ''))
            + length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')))::BIGINT
               AS bpe_ish_tokens
    FROM documents
    """,
    description="Whitespace vs BPE-ish regex token counts per document",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("ws_tokens"),
        tx.bpe_ish_token_count(F.col("text")).alias("bpe_ish_tokens"),
    )


#: bpe_train: unrolled merge rounds and the final top-k pair report
_BPE_ROUNDS = 2
_BPE_TOPK = 10


def _duck_bpe_pairs(src: str, i: int) -> str:
    """Weighted adjacent-pair counts of the symbolized vocab ``src``."""
    return f"""
    p{i} AS (
        SELECT arr[i] AS l, arr[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
        FROM (SELECT list_filter(string_split(trim(s), '  '), x -> x <> '') AS arr,
                     freq
              FROM {src}) t,
             unnest(range(1, len(arr))) u(i)
        GROUP BY 1, 2)"""


def _duck_bpe_round(i: int) -> str:
    """Choose the best pair of round ``i`` and apply the merge."""
    return f"""{_duck_bpe_pairs(f"s{i - 1}", i)},
    b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
    s{i} AS (
        SELECT regexp_replace(s0.s, ' ' || b.l || '  ' || b.r || ' ',
                              ' ' || b.l || b.r || ' ', 'g') AS s, freq
        FROM s{i - 1} s0 CROSS JOIN b{i} b)"""


#: shared CTE prefix: the (word, freq) vocab, its symbolization, and the
#: unrolled merge-learning rounds (b1..bN are the learned merges) — the
#: training chain both bpe_train and bpe_encode replay.
_DUCK_BPE_PREFIX = """
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(list_filter(
                       string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                       x -> x <> '')) AS w
            FROM documents) t
        GROUP BY 1),
    s0 AS (
        SELECT ' ' || array_to_string(
                   list_transform(range(1, len(w) + 1), i -> w[i]), '  ')
               || ' ' AS s,
               freq
        FROM words),""" + ",".join(
    _duck_bpe_round(i) for i in range(1, _BPE_ROUNDS + 1)
)

_DUCK_BPE = (
    _DUCK_BPE_PREFIX
    + f""",{_duck_bpe_pairs(f"s{_BPE_ROUNDS}", _BPE_ROUNDS + 1)},
    top AS (SELECT l, r, cnt FROM p{_BPE_ROUNDS + 1}
            ORDER BY cnt DESC, l, r LIMIT {_BPE_TOPK})
    """
    + " UNION ALL ".join(
        f"SELECT {i} AS step, l AS left_sym, r AS right_sym, cnt FROM b{i}"
        for i in range(1, _BPE_ROUNDS + 1)
    )
    + f""" UNION ALL
    SELECT {_BPE_ROUNDS + 1} AS step, l, r, cnt FROM top
    """
)


def _bpe_symbolize(col):
    """'hey' → ' h  e  y ' (double-space-delimited symbol sequence)."""
    return F.concat(F.lit(" "), F.array_join(F.split(col, ""), "  "), F.lit(" "))


def _bpe_pair_counts(sdf: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-symbol-pair counts of a (s, freq) table."""
    arr = F.split(F.trim(F.col("s")), "  ")
    pairs = sdf.select(
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.size(arr) - 1).alias("l"),
                F.slice(arr, 2, F.size(arr) - 1).alias("r"),
            )
        ).alias("p"),
        "freq",
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("freq").cast("long").alias("cnt")
    )


def _bpe_apply_merge(sdf: DataFrame, best: DataFrame, *carry: str) -> DataFrame:
    """Apply one learned merge (1-row ``best`` with l, r) to the ``s``
    column, carrying ``carry`` columns through."""
    return sdf.crossJoin(F.broadcast(best)).select(
        F.regexp_replace(
            "s",
            F.concat(F.lit(" "), F.col("l"), F.lit("  "), F.col("r"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("l"), F.col("r"), F.lit(" ")),
        ).alias("s"),
        *carry,
    )


def _bpe_learn(spark: SparkSession, sf_dir: str):
    """The BPE training chain: (word, freq) vocab → symbolized corpus →
    ``_BPE_ROUNDS`` merge rounds.  Returns (words, [best per round],
    final symbol table); every ``best`` is a pinned 1-row DataFrame."""
    docs = fan_out(t(spark, sf_dir, "documents"))
    words = (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z ]", ""), " ")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # the word key rides along so encode-side callers can reuse the
    # fully-merged table directly instead of replaying the merge chain
    syms = words.select(
        "w", _bpe_symbolize(F.col("w")).alias("s"), "freq"
    ).localCheckpoint(eager=False)  # feeds pair count + merge apply
    bests = []
    for _step in range(1, _BPE_ROUNDS + 1):
        best = (
            _bpe_pair_counts(syms)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .localCheckpoint(eager=False)  # two consumers: output + apply
        )
        bests.append(best)
        syms = _bpe_apply_merge(syms, best, "w", "freq").localCheckpoint(
            eager=False
        )
    return words, bests, syms


@register(
    "bpe_train",
    oracle=_DUCK_BPE,
    description=f"Distributed BPE tokenizer training ({_BPE_ROUNDS} unrolled "
    "merge rounds over the word-frequency table): each round counts "
    "weighted adjacent symbol pairs, picks the most frequent (ties to the "
    "lexicographically smallest), and applies the merge left-to-right "
    f"non-overlapping; outputs the learned merges plus the top-{_BPE_TOPK} "
    "pairs of the resulting symbol corpus — fully oracle-replayed.",
)
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE the way production trainers do it (SentencePiece/HF): the
    corpus collapses FIRST to a (word, freq) table — one shuffle over
    the corpus, vocabulary-sized result — and every merge round then
    runs on that table, so iteration cost is independent of corpus
    size.  Symbol sequences are delimited strings (' h  e  y ') and a
    merge is one regexp_replace: Java and RE2 global replace both scan
    left-to-right non-overlapping, which IS the BPE merge rule — the
    delimiter encoding keeps adjacent matches from sharing separators
    (verified: ' l  l  l ' + (l,l) → ' ll  l ' in both engines).
    Symbols stay in [a-z]+ by construction, so patterns never need
    regex escaping.  Per round: pair counts are a partial-aggregable
    explode + groupBy; the argmax merge is a 1-row TakeOrderedAndProject
    broadcast back via crossJoin; the vocab is pinned per round because
    it feeds both the pair count and the merge apply (diamond,
    NOTES.md).  Output: the learned merge per round plus the top pairs
    after all merges."""
    words, bests, syms = _bpe_learn(spark, sf_dir)
    merges = [
        best.select(
            F.lit(step).alias("step"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            "cnt",
        )
        for step, best in enumerate(bests, start=1)
    ]
    top = (
        _bpe_pair_counts(syms)
        .orderBy(F.desc("cnt"), "l", "r")
        .limit(_BPE_TOPK)
        .select(
            F.lit(_BPE_ROUNDS + 1).alias("step"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            "cnt",
        )
    )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out.unionAll(top)


def _duck_bpe_vround(i: int) -> str:
    """Apply learned merge b{i} to the per-word encode table v{i-1}."""
    return f"""v{i} AS (
        SELECT v.w, regexp_replace(v.s, ' ' || b.l || '  ' || b.r || ' ',
                                   ' ' || b.l || b.r || ' ', 'g') AS s
        FROM v{i - 1} v CROSS JOIN b{i} b)"""


_DUCK_BPE_ENCODE = (
    _DUCK_BPE_PREFIX
    + """,
    v0 AS (
        SELECT w, ' ' || array_to_string(
                   list_transform(range(1, len(w) + 1), i -> w[i]), '  ')
               || ' ' AS s
        FROM words),"""
    + ",".join(_duck_bpe_vround(i) for i in range(1, _BPE_ROUNDS + 1))
    + f""",
    enc AS (
        SELECT w, len(list_filter(string_split(trim(s), '  '), x -> x <> ''))
                  AS ntok
        FROM v{_BPE_ROUNDS}),
    docw AS (
        SELECT doc_id, w, count(*) AS cnt FROM (
            SELECT doc_id, unnest(list_filter(
                       string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                       x -> x <> '')) AS w
            FROM documents) t
        GROUP BY 1, 2)
    SELECT d.doc_id,
           CAST(sum(d.cnt) AS BIGINT) AS n_words,
           CAST(sum(d.cnt * e.ntok) AS BIGINT) AS n_tokens,
           round(1.0 * sum(d.cnt * e.ntok) / sum(d.cnt), 4) AS tokens_per_word
    FROM docw d JOIN enc e USING (w)
    GROUP BY 1
    """
)


@register(
    "bpe_encode",
    oracle=_DUCK_BPE_ENCODE,
    description=f"Apply the {_BPE_ROUNDS} learned BPE merges to encode every "
    "document: per-doc word and token counts plus tokens-per-word — the "
    "encode half of the tokenizer story (bpe_train learns, this applies), "
    "fully oracle-replayed.",
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ENCODE the production way: the merge list is learned
    once (same chain as ``bpe_train``), then applied to the DISTINCT
    word table — encode cost scales with vocabulary, not corpus — and
    per-doc token counts come from joining doc word-counts against the
    encoded vocab (one shuffle join on the word key; at 100 TB the
    encoded vocab is the natural broadcast side once it fits).  Merges
    apply in learned order, each a single regexp_replace over the
    delimiter-encoded symbols — the same left-to-right non-overlapping
    rule both engines share (see ``bpe_train``)."""
    _words, _bests, syms = _bpe_learn(spark, sf_dir)
    # the learner already carries the word key through every merge, so
    # the fully-merged symbol table IS the encoded vocab — no second
    # merge-application chain
    arr = F.split(F.trim(F.col("s")), "  ")
    enc = syms.select("w", F.size(F.filter(arr, lambda x: x != "")).alias("ntok"))

    docs = fan_out(t(spark, sf_dir, "documents"))
    docw = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z ]", ""), " ")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        docw.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("ntok")).cast("long").alias("n_tokens"),
            F.round(
                F.lit(1.0)
                * F.sum(F.col("cnt") * F.col("ntok"))
                / F.sum("cnt"),
                4,
            ).alias("tokens_per_word"),
        )
    )


_DUCK_BPE_FERTILITY = (
    _DUCK_BPE_PREFIX
    + """,
    v0 AS (
        SELECT w, ' ' || array_to_string(
                   list_transform(range(1, len(w) + 1), i -> w[i]), '  ')
               || ' ' AS s
        FROM words),"""
    + ",".join(_duck_bpe_vround(i) for i in range(1, _BPE_ROUNDS + 1))
    + f""",
    enc AS (
        SELECT w, len(w) AS nchar,
               len(list_filter(string_split(trim(s), '  '), x -> x <> ''))
                   AS ntok
        FROM v{_BPE_ROUNDS}),
    docw AS (
        SELECT lang, doc_id, w, count(*) AS cnt FROM (
            SELECT lang, doc_id, unnest(list_filter(
                       string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                       x -> x <> '')) AS w
            FROM documents) t
        GROUP BY 1, 2, 3)
    SELECT d.lang,
           CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
           CAST(sum(d.cnt) AS BIGINT) AS n_words,
           CAST(sum(d.cnt * e.ntok) AS BIGINT) AS n_tokens,
           round(1.0 * sum(d.cnt * e.ntok) / sum(d.cnt), 4)
               AS tokens_per_word,
           round(1.0 * sum(d.cnt * e.nchar) / sum(d.cnt * e.ntok), 4)
               AS chars_per_token
    FROM docw d JOIN enc e USING (w)
    GROUP BY 1
    """
)


@register(
    "tokenizer_fertility",
    oracle=_DUCK_BPE_FERTILITY,
    description="Tokenizer fertility by language: the corpus-trained BPE "
    "merges applied to every language's words — tokens per word and "
    "chars per token per lang.  THE multilingual-equity metric for a "
    "tokenizer: a merge table learned on a mixed corpus compresses its "
    "dominant language best, and this table quantifies exactly how "
    "much worse every other language tokenizes (fertility drives both "
    "training cost and context-window usage per language).  On this "
    "synthetic fixture the languages share one generator vocabulary, "
    "so fertilities are honestly near-uniform (4.23-4.26 at sf0.01 "
    "with 12 learned merges) — the machinery, not a dramatic gap, is "
    "what the oracle attests.",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same scale shape as bpe_encode (the merge chain runs on the
    vocabulary, never the corpus; the encoded vocab joins back onto
    per-doc word counts), with the language dimension carried through
    the word explode and one per-language rollup at the end — the
    whole fertility report costs one extra tiny aggregate over the
    encode join."""
    _words, _bests, syms = _bpe_learn(spark, sf_dir)
    arr = F.split(F.trim(F.col("s")), "  ")
    enc = syms.select(
        "w",
        F.length("w").alias("nchar"),
        F.size(F.filter(arr, lambda x: x != "")).alias("ntok"),
    )
    docs = fan_out(t(spark, sf_dir, "documents"))
    docw = (
        docs.select(
            "lang",
            "doc_id",
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z ]", ""), " ")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("lang", "doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        docw.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("ntok")).cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.col("ntok"))
                / F.sum("cnt").cast("double"),
                4,
            ).alias("tokens_per_word"),
            F.round(
                F.sum(F.col("cnt") * F.col("nchar"))
                / F.sum(F.col("cnt") * F.col("ntok")).cast("double"),
                4,
            ).alias("chars_per_token"),
        )
    )
