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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench")

    # Warm the JVM/codegen once with a trivial job so the first measured
    # query doesn't pay session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

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
        msgs = _messages(fan_out(load_table(spark, sf_dir, "events")))
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

    total = round(sum(timings.values()), 3)
    # The round-1 bench covered 51 queries; later rounds add more, which
    # grows the total even when every query got faster.  Emit the
    # subtotal over the round-1 surface so cross-round totals compare
    # apples-to-apples.
    r2_additions = {
        "pii_redact", "stratified_sample", "pack_sequences", "decontaminate",
        "dedup_canonical", "unpivot_wide", "exists_subquery",
        "dedup_embedding_srp", "similarity_ann_kmeans",
    }
    subtotal_r01 = round(
        sum(v for k, v in timings.items() if k not in r2_additions), 3
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
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
