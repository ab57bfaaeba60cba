"""Invariant tests for the curation operators (ops/curation.py):
packing respects the token budget, sampling is repartition-stable,
redaction is idempotent and count-consistent, decontamination never
flags a clean doc.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ops import curation as cu

SF = "/root/testdata/sf0.001"


def test_pack_greedy_respects_budget(spark):
    """Concat-and-chunk invariant: every bin starts before the budget
    line (total minus its last doc < budget), so a bin overflows by at
    most its one straddling doc; bin ids are token offsets div budget
    (an oversized doc advances the offset by multiple budgets)."""
    docs = spark.createDataFrame(
        [(i, "s", 10 + (i * 37) % 500) for i in range(200)]
        + [(1000, "s", 5000)],  # oversized doc: bigger than the budget
        "doc_id long, shard string, n_tokens long",
    )
    packed = cu.pack_greedy(docs, "shard", "doc_id", "n_tokens", budget=1024)
    bins = (
        packed.groupBy("shard", "bin")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max_by("n_tokens", "doc_id").alias("last_tok"),
        )
        .collect()
    )
    for r in bins:
        assert r.tot - r.last_tok < 1024, (r.bin, r.tot, r.last_tok)
    # total tokens conserved across bins
    assert sum(r.tot for r in bins) == 200 * 10 + sum((i * 37) % 500 for i in range(200)) + 5000


def test_pack_greedy_is_order_deterministic(spark):
    """Packing must depend only on (shard, order), not on the physical
    partitioning of the input."""
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", 50 + i % 97) for i in range(300)],
        "doc_id long, shard string, n_tokens long",
    )
    a = cu.pack_greedy(docs, "shard", "doc_id", "n_tokens", 512)
    b = cu.pack_greedy(docs.repartition(17), "shard", "doc_id", "n_tokens", 512)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_stratified_sample_is_repartition_stable(spark):
    """The sampled id set must be identical under any repartitioning —
    the property rand(seed) lacks."""
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(500)], "doc_id long, lang string"
    )
    pick = lambda df: sorted(
        r.doc_id
        for r in cu.stratified_sample(df, "doc_id", "lang", {"en": 100}, 500).collect()
    )
    base = pick(docs)
    assert pick(docs.repartition(13)) == base
    assert pick(docs.coalesce(1)) == base
    assert 0 < len(base) < 500


def test_stratified_sample_rates_approximate(spark):
    """Per-stratum keep fraction must be near the requested rate (md5
    buckets are uniform; 3x tolerance on 1000 rows)."""
    docs = spark.createDataFrame(
        [(i, "en") for i in range(1000)], "doc_id long, lang string"
    )
    kept = cu.stratified_sample(docs, "doc_id", "lang", {"en": 100}, 0).count()
    assert 50 <= kept <= 200  # 10% nominal


def test_redact_pii_idempotent_and_counted(spark):
    rows = spark.createDataFrame(
        [
            (0, "contact a.b-c_d@ex-ample.org or +1-555-0199 now"),
            (1, "no pii here"),
            (2, "x@y.io y@z.net 555-1234"),
        ],
        "id long, text string",
    )
    red = cu.redact_pii(F.col("text"))
    out = rows.select(
        "id",
        red["redacted"].alias("redacted"),
        red["n_emails"].alias("n_emails"),
        red["n_phones"].alias("n_phones"),
    )
    got = {r.id: r for r in out.collect()}
    assert got[0].redacted == "contact [EMAIL] or [PHONE] now"
    assert (got[0].n_emails, got[0].n_phones) == (1, 1)
    assert (got[1].n_emails, got[1].n_phones) == (0, 0)
    assert got[2].redacted == "[EMAIL] [EMAIL] [PHONE]"
    # idempotence: redacting redacted text changes nothing
    red2 = cu.redact_pii(F.col("redacted"))
    again = out.select(red2["redacted"].alias("r2"), "redacted").collect()
    assert all(r.r2 == r.redacted for r in again)


def test_contaminated_docs_only_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "aa"), (1, "bb"), (2, "cc"), (3, "aa"), (3, "dd")],
        "id long, shingle string",
    )
    bench = spark.createDataFrame([("aa",), ("dd",)], "shingle string")
    got = {r.id: r.n_shared for r in cu.contaminated_docs(corpus, bench).collect()}
    assert got == {1: 1, 3: 2}  # doc 2 is clean and absent


def test_repetition_features_crafted_docs(spark):
    """Pin the Gopher repetition metrics on documents with KNOWN line
    structure (the parquet fixtures are single-line, so this is where
    the line metrics earn their keep)."""
    from mqtt2clickhouse_spark.ops.text import repetition_features

    docs = spark.createDataFrame(
        [
            (1, "aa bb\naa bb\ncc dd"),      # 3 lines, 1 dup
            (2, "x\n  \nx\nx"),              # blanks dropped; 3 lines, 2 dup
            (3, "unique one\nunique two"),    # no repetition
            (4, ""),                          # empty doc -> all zeros
        ],
        "doc_id long, text string",
    )
    rep = repetition_features(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            rep["n_lines"].alias("nl"),
            rep["dup_line_frac"].alias("dlf"),
            rep["dup_char_frac"].alias("dcf"),
        ).collect()
    }
    assert (out[1]["nl"], out[1]["dlf"]) == (3, round(1 / 3, 4))
    # doc 1: chars 5+5+5=15, distinct lines 5+5=10 -> dup chars 5/15
    assert out[1]["dcf"] == round(5 / 15, 4)
    assert (out[2]["nl"], out[2]["dlf"], out[2]["dcf"]) == (3, round(2 / 3, 4), round(2 / 3, 4))
    assert (out[3]["dlf"], out[3]["dcf"]) == (0.0, 0.0)
    assert (out[4]["nl"], out[4]["dlf"], out[4]["dcf"]) == (0, 0.0, 0.0)


def test_global_shuffle_positions_match_naive_window(spark):
    """The two-phase (bucket offsets + per-bucket rank) position
    assignment must equal the naive single-partition row_number over
    (skey, id) — and positions must be a contiguous 0-based range."""
    from pyspark.sql import Window as W

    from mqtt2clickhouse_spark.ops.curation import global_shuffle_positions
    from mqtt2clickhouse_spark.ops.dedup import hash32

    df = spark.createDataFrame([(i,) for i in range(777)], "id long")
    got = {
        r["id"]: r["pos"]
        for r in global_shuffle_positions(df, "id", seed="t", n_buckets=8).collect()
    }
    naive = df.withColumn(
        "skey", hash32(F.concat(F.lit("t:"), F.col("id").cast("string")))
    ).withColumn(
        "pos", F.row_number().over(W.orderBy("skey", "id")) - 1
    )
    want = {r["id"]: r["pos"] for r in naive.collect()}
    assert got == want
    assert sorted(got.values()) == list(range(777))


def test_bloom_decontaminate_equals_exact(spark):
    """The Bloom pre-filter must be invisible in the result: identical
    rows to the exact broadcast-join path (false positives are killed by
    the final verify; a false NEGATIVE would be a real bug)."""
    from mqtt2clickhouse_spark.ops.dedup import shingle_rows
    from mqtt2clickhouse_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    sh = shingle_rows(docs, "doc_id", "text", 3).localCheckpoint(eager=False)
    bench = sh.filter(F.col("id") % 20 == 0)
    train = sh.filter(F.col("id") % 20 != 0)
    exact = sorted(map(tuple, cu.contaminated_docs(train, bench).collect()))
    assert exact  # fixture must exercise the operator
    # tiny m forces real Bloom collisions -> the verify stage must earn
    # its keep (with m=2^20 the candidate set is nearly exact already)
    for m in (1 << 20, 1 << 10):
        bloom = sorted(
            map(tuple, cu.bloom_contaminated_docs(train, bench, m=m).collect())
        )
        assert bloom == exact


def test_export_jsonl_round_trip_and_determinism(spark, tmp_path):
    """Sharded JSONL export: every record survives a round-trip, the
    shard count is exactly n_shards (all four hash buckets are non-empty
    on this fixture — an empty bucket would legitimately produce fewer
    files, see the op's docstring), and the record→shard assignment is
    stable across re-exports from differently-partitioned inputs."""
    import glob
    import json as jsonlib

    from mqtt2clickhouse_spark.ops.curation import export_jsonl
    from mqtt2clickhouse_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "source"
    )
    out1 = str(tmp_path / "export1")
    n = export_jsonl(docs, out1, n_shards=4, shard_col="doc_id")
    assert n == docs.count()

    files1 = sorted(glob.glob(f"{out1}/part-*"))
    assert len(files1) == 4

    back = spark.read.json(out1)
    assert back.count() == n
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # JSON-Lines shape: every line parses independently
    with open(files1[0]) as fh:
        for line in fh:
            assert isinstance(jsonlib.loads(line), dict)

    # determinism: a shuffled input yields the identical shard membership
    out2 = str(tmp_path / "export2")
    export_jsonl(docs.repartition(7), out2, n_shards=4, shard_col="doc_id")
    files2 = sorted(glob.glob(f"{out2}/part-*"))

    def shard_sets(files):
        return [
            frozenset(
                jsonlib.loads(line)["doc_id"] for line in open(f) if line.strip()
            )
            for f in files
        ]

    assert sorted(shard_sets(files1), key=sorted) == sorted(
        shard_sets(files2), key=sorted
    )


def test_pps_sample_invariants_and_partition_stability(spark):
    """Weighted systematic sampling: the k grid points are fully
    absorbed, every heavy row (weight >= 2*step) is certainty-included,
    and the selection is invariant to input partitioning."""
    from mqtt2clickhouse_spark.ops.curation import pps_systematic_sample

    rows = [(i, (i * 37) % 97 + 1) for i in range(500)]
    rows += [(1000 + j, 1500) for j in range(5)]  # heavy certainty rows
    df = spark.createDataFrame(rows, "id long, w long")
    k = 50
    out = pps_systematic_sample(df, "id", "w", k=k).collect()
    assert sum(r.n_hits for r in out) == k
    total = sum(w for _, w in rows)
    step = total // k
    heavy = {i for i, w in rows if w >= 2 * step}
    assert heavy and heavy <= {r.id for r in out}
    out2 = pps_systematic_sample(df.repartition(13), "id", "w", k=k).collect()
    assert sorted((r.id, r.n_hits, r.pos) for r in out2) == sorted(
        (r.id, r.n_hits, r.pos) for r in out
    )


def test_winnowing_guarantee_on_planted_overlap(spark):
    """The winnowing theorem (Schleimer et al. 2003): two documents
    sharing a token run of length >= w + k - 1 share at least one
    fingerprint.  Plant a 6-token run (w=4, k=3) inside otherwise
    disjoint documents and assert the pair surfaces."""
    import duckdb

    # two separated >= w+k-1 = 6-token runs: each guarantees >= 1 shared
    # print, together clearing the query's min-shared floor of 2
    run1 = "alpha beta gamma delta epsilon zeta"
    run2 = "omicron sigma tau upsilon phi chi"
    rows = [
        (1, f"one unique opening here {run1} middle words then {run2} end", "en", "a", 1),
        (2, f"different preamble text {run1} other interlude {run2} close", "en", "a", 1),
        (3, "nothing shared with the others at all in this one", "en", "a", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    from mqtt2clickhouse_spark.queries import QUERIES

    out = QUERIES["winnow_fingerprint"].spark_fn(spark, d).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
