#!/usr/bin/env python
"""Benchmark harness: run the declared query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect overhead).  Stderr carries progress; stdout is
exactly the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from mqtt2clickhouse_spark.queries import QUERIES
from mqtt2clickhouse_spark.session import get_spark

#: The 51 query names BENCH_r01.json recorded, frozen so
#: ``subtotal_r01_surface`` always sums the same set (the round-2 bench
#: derived it from a stale exclusion list and silently folded 16 new
#: queries into the "round-1" subtotal).
_R01_SURFACE = frozenset({
    "asof_join", "corpus_prep", "cube_rollup", "datetime_math",
    "dedup_components", "dedup_embedding", "dedup_exact", "dedup_jaccard",
    "dedup_minhash_pairs", "dedup_minhash_sig", "dedup_simhash",
    "distinct_agg", "distinct_approx", "embedding_centroid",
    "filter_project", "grouping_sets", "hash_split", "join_anti",
    "join_inner", "join_left", "join_semi", "json_extract", "lang_id",
    "map_ops", "mqtt_pipeline", "multimodal_features", "multimodal_frames",
    "multimodal_meta", "percentiles", "pivot_table", "q1_pricing_summary",
    "range_join", "scalar_subquery", "sessionize", "set_ops",
    "similarity_ann_ivf", "similarity_topk", "skew_salted_join",
    "sliding_window", "sort_limit", "string_funcs", "text_fingerprint",
    "text_quality", "text_tokens", "tfidf_top_terms", "time_window",
    "token_count_bpe", "topic_parse", "variant_extract", "window_rank",
    "window_running",
})


def _plan_digest() -> str:
    """One hash over every registered query's plan fingerprint — the
    SAME fingerprints the attestation ledger stamps (reused from
    plan_window.current_hashes so the two can never drift): bench
    artifacts with equal digests measured the SAME set of plans, so
    folding their per-query times compares like with like."""
    import hashlib

    # path side effect confined to the one caller that needs it (r12
    # review: a module-level insert made scripts/*.py shadow top-level
    # names for every importer of bench)
    scripts_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"
    )
    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    from plan_window import current_hashes

    h = hashlib.sha256()
    for name, ph in sorted(current_hashes().items()):
        h.update(name.encode())
        h.update(ph.encode())
    return h.hexdigest()[:16]


def _clean_reference(
    artifact_dir: str,
    sf: float,
    this_run: dict[str, float] | None = None,
    digest: str | None = None,
) -> dict | None:
    """Per-query MIN over the repo's committed CLEAN-BOX bench artifacts
    (VERDICT r11 ask #2): the driver's committed reading has been taken
    warm/loaded three rounds running, so round-over-round per-query
    deltas off it compare incompatible regimes.  This folds the round's
    clean-box runs (`bench_artifacts/BENCH_r*cleanbox*.json`,
    ``loaded_box: false``, same sf) into a sibling table the committed
    artifact always carries.  Selection: artifacts whose ``plan_digest``
    matches the live tree's are preferred (same plans by construction —
    a faster OLD plan can never shadow the shipped one, even for
    mid-round rewrites); when none match, fall back to the HIGHEST
    round tag found and say so (``digest_match: false``).  ``this_run``
    is folded in as source "this_run" when the live run is itself
    clean."""
    import glob
    import re

    pat = os.path.join(artifact_dir, "BENCH_r*cleanbox*.json")
    by_round: dict[int, list[tuple[str, dict]]] = {}
    matching: list[tuple[str, dict]] = []
    for path in sorted(glob.glob(pat)):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            data = json.loads(open(path).read())
        except (OSError, json.JSONDecodeError):
            continue
        if data.get("loaded_box") or data.get("sf") != sf:
            continue
        if not isinstance(data.get("queries"), dict):
            continue
        entry = (os.path.basename(path), data)
        if digest is not None and data.get("plan_digest") == digest:
            matching.append(entry)
        by_round.setdefault(int(m.group(1)), []).append(entry)
    if matching:
        picked = matching
    elif by_round:
        picked = by_round[max(by_round)]
    else:
        picked = []
    sources: list[tuple[str, dict[str, float]]] = [
        (n, d["queries"]) for n, d in picked
    ]
    if this_run is not None:
        sources.append(("this_run", this_run))
    if not sources:
        return None
    # three-state (r12 review): None = no digest check was requested;
    # True = every folded source measured the live plans; False = the
    # fallback folded sources that may predate a rewrite
    digest_match: bool | None = None
    if digest is not None:
        digest_match = bool(matching) or (
            not picked and this_run is not None
        )
    mins: dict[str, float] = {}
    for _, qs in sources:
        for k, v in qs.items():
            if isinstance(v, (int, float)):
                mins[k] = min(mins.get(k, float("inf")), v)
    return {
        "queries": {k: round(v, 3) for k, v in sorted(mins.items())},
        "subtotal_r01_surface": round(
            sum(v for k, v in mins.items() if k in _R01_SURFACE), 3
        ),
        "sources": [n for n, _ in sources],
        "n_runs": len(sources),
        "digest_match": digest_match,
    }


def _release_session_state(spark) -> None:
    """Drop blocks the previous query pinned so 80 queries in ONE session
    time like 80 fresh sessions.

    ``localCheckpoint(eager=False)`` persists its RDD (deserialized
    memory-and-disk); those blocks outlive the query and are reclaimed
    only when the async ContextCleaner notices the RDD is unreachable —
    which across 80 queries x 2 passes lets hundreds of MB of dead
    blocks crowd the block manager (the round-2 cross-round regression:
    queries untouched since round 1 ran ~2x slower mid-session).
    ``getPersistentRDDs`` + explicit unpersist is deterministic; the
    Python gc releases the Py4J handles so the cleaner can also reap
    broadcast variables.
    """
    import gc

    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
    except Exception:  # pragma: no cover - diagnostic path only
        pass
    spark.catalog.clearCache()
    gc.collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")

    def _loadavg():
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:  # pragma: no cover
            return None

    # Machine state at measurement START — with the end reading below,
    # the committed artifact carries its own noise classification
    # instead of leaving forensics to a NOTES postmortem.
    load_avg_start = _loadavg()

    # Warm the JVM/codegen once with a trivial job so the first measured
    # query doesn't pay session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    # Machine-speed calibration (r14: the round's three clean-box runs
    # read 280/238/216s on the SAME tree, same flags, minutes apart —
    # a uniform host-speed drift that load averages cannot see and that
    # r13 could only attribute by hand).  Two fixed-work probes, timed
    # min-of-3 each, stamp the box's speed INTO the artifact so a
    # cross-round uniform drift is divided out instead of adjudicated:
    # a single-thread CPython loop (interpreter+core speed) and a fixed
    # 32-partition Spark aggregate (JVM + scheduler fixed overhead, the
    # term small queries feel as a constant).  Compare per-query deltas
    # only after checking these two read comparably.
    def _calibrate() -> dict:
        def _mo3(fn) -> float:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return round(best, 4)

        def _cpu():
            s = 0
            for i in range(5_000_000):
                s += i * i
            return s

        def _spark_fixed():
            spark.range(0, 50_000_000, 1, 32).selectExpr(
                "sum(id * 3 % 7)"
            ).collect()

        return {
            "cpu_single_thread_sec": _mo3(_cpu),
            "spark_fixed_job_sec": _mo3(_spark_fixed),
        }

    calibration = _calibrate()
    print(f"calibration: {calibration}", file=sys.stderr)

    # Two passes per query, report the min: pass 1 pays one-time codegen /
    # shuffle-file warmup and absorbs transient machine load; the min is
    # the reproducible steady-state cost of the plan.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        best = float("inf")
        for _ in range(passes):
            start = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]:.3f}s", file=sys.stderr)
        _release_session_state(spark)

    # Ingest throughput (BASELINE.md "engine-side metrics"): rows/sec
    # through the full parse → route → demux-write path, versus the
    # reference's one-INSERT-per-message design.
    import shutil
    import tempfile

    from mqtt2clickhouse_spark.ingest.sink import DemuxSink
    from mqtt2clickhouse_spark.queries.ingest_queries import _messages
    from mqtt2clickhouse_spark.tables import fan_out, load_table

    wh = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        # synthesize before fanning out: the repartition moves (topic,
        # payload) only, not the whole events row (see mqtt_pipeline)
        msgs = fan_out(
            _messages(
                load_table(spark, sf_dir, "events").select(
                    "event_id", "user_id", "event_type", "value", "ts"
                )
            )
        )
        n_msgs = msgs.count()
        # Steady-state throughput: batch 0 additionally pays Python
        # worker spin-up, sink table creation, and committer warm-up —
        # one-time costs a long-running ingest daemon amortizes to
        # nothing.  Warm with batch 0, report the best of batches 1-2
        # (same min-of-N treatment the queries get).
        sink = DemuxSink(spark, wh)
        sink.foreach_batch(msgs, 0)
        ingest_sec = float("inf")
        for epoch in (1, 2):
            start = time.perf_counter()
            sink.foreach_batch(msgs, epoch)
            ingest_sec = min(ingest_sec, time.perf_counter() - start)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    ingest_rps = round(n_msgs / ingest_sec, 1)
    print(f"ingest: {n_msgs} msgs in {ingest_sec:.2f}s = {ingest_rps}/s", file=sys.stderr)

    # Self-classifying artifact (VERDICT r8 ask #6): re-measure the N
    # slowest queries min-of-3 in the now-quiet end-of-run session.  A
    # mid-suite reading far above its isolated re-measure is scheduling
    # noise, not plan cost — previously that forensic lived only in
    # NOTES; now the committed BENCH_rN.json carries it.
    n_recheck = int(os.environ.get("SPARK_GRAFT_BENCH_RECHECK", "8"))
    # The measurement-regime label (VERDICT r9) lives in the sibling
    # top-level field "recheck_session", so recheck_slowest's values
    # are uniformly per-query dicts (ADVICE r10): these re-measures run
    # in the warmed end-of-suite session, so store-consumer readings
    # embed warm-cache advantage — suite_over_isolated classifies
    # scheduling noise, it is NOT a cold-start cost model.
    recheck: dict[str, dict[str, float]] = {}
    for name in sorted(timings, key=timings.get, reverse=True)[:n_recheck]:
        spec = QUERIES[name]
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        _release_session_state(spark)
        recheck[name] = {
            "suite": timings[name],
            "isolated_min3": round(best, 3),
            "suite_over_isolated": round(timings[name] / best, 2) if best else 0.0,
        }
        print(
            f"recheck {name}: suite {timings[name]:.3f}s vs isolated "
            f"{best:.3f}s",
            file=sys.stderr,
        )

    # Load gate (VERDICT r9 ask #3): a reading taken on a busy box is
    # classified IN the artifact, not left to forensics.  The round
    # ritual retries once when this fires; the 2x-of-baseline bar
    # should never need the recheck fields to defend it.
    load_gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "2.0"))
    loaded = bool(load_avg_start) and load_avg_start[0] > load_gate
    if loaded:
        print(
            f"WARNING: load_avg_start {load_avg_start[0]} > gate "
            f"{load_gate} — reading taken on a loaded box, retry on a "
            f"quieter window",
            file=sys.stderr,
        )

    # Clean-regime sibling table (VERDICT r11 ask #2): fold the round's
    # committed clean-box artifacts (plus this run when it is itself
    # clean) into per-query MINs, so the committed artifact carries
    # comparable-regime numbers even when the live reading is warm/
    # loaded.  Cross-round per-query deltas should read clean_reference,
    # not "queries", whenever loaded_box is true.
    plan_digest = _plan_digest()
    clean_ref = _clean_reference(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_artifacts"),
        sf,
        this_run=None if loaded else timings,
        digest=plan_digest,
    )

    total = round(sum(timings.values()), 3)
    # The round-1 bench covered 51 queries; later rounds add more, which
    # grows the total even when every query got faster.  Emit the
    # subtotal over EXACTLY the round-1 surface (frozen name list ==
    # BENCH_r01.json's keys) so cross-round totals compare
    # apples-to-apples.
    subtotal_r01 = round(
        sum(v for k, v in timings.items() if k in _R01_SURFACE), 3
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                "subtotal_r01_surface": subtotal_r01,
                "ingest_rows_per_sec": ingest_rps,
                "load_avg_start": load_avg_start,
                "load_avg": _loadavg(),
                "load_gate": load_gate,
                "loaded_box": loaded,
                "recheck_session": "warm-end-of-suite",
                "recheck_slowest": recheck,
                "calibration": calibration,
                "clean_reference": clean_ref,
                "plan_digest": plan_digest,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
