#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> <query> [<query> ...]

Plans only — no jobs are executed: EAGER queries (streaming twins and
other queries that run real jobs while BUILDING their DataFrame) are
skipped with a note unless SPARK_GRAFT_DUMP_EAGER=1.
"""

from __future__ import annotations

import os
import sys

TAG = os.environ.get("PLAN_TAG", "r15")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries whose spark_fn runs real Spark jobs / side effects while
# BUILDING the frame (streaming twins, collect-based ML loops): explain
# output is still meaningful but producing it is expensive; dump only
# when explicitly named.
EAGER = {
    "stateful_stats_twin", "sink_routing_twin", "rollup_incremental_twin",
    "config_reload_twin", "stream_session_watermark", "stream_dedup_watermark",
    "stream_join_watermark", "late_data_watermark", "mqtt_pipeline",
}


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from mqtt2clickhouse_spark.queries import QUERIES
    from mqtt2clickhouse_spark.session import get_spark

    spark = get_spark("dump_plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name in EAGER and not os.environ.get("SPARK_GRAFT_DUMP_EAGER"):
            print(
                f"skipped {name}: building its DataFrame runs real jobs "
                "(set SPARK_GRAFT_DUMP_EAGER=1 to dump anyway)"
            )
            continue
        spec = QUERIES[name]
        df = spec.spark_fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
