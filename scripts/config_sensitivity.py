#!/usr/bin/env python
"""Partitioning-independence attestation: run EVERY oracled query's
Spark side under a given (cores, shuffle partitions) config and dump a
sign-bit-sensitive canonical form of its output; diff two dumps to
prove no query's VALUES depend on parallelism.

Why this matters (the r9 heaps_law lesson, applied to the Spark side):
the driver's Spark config is not ours to control, and a float sum whose
result depends on partition count/order is a latent driver-red that
same-config tests can never see.  Usage:

    python scripts/config_sensitivity.py 32 32 /tmp/canons_a.pkl
    python scripts/config_sensitivity.py 5 7 /tmp/canons_b.pkl
    python scripts/config_sensitivity.py --diff /tmp/canons_a.pkl /tmp/canons_b.pkl

r9 result: all 236 queries bit-identical between local[32]/32 shuffle
partitions and local[5]/7 — the surface is partitioning-independent
(integer-moment arithmetic + round-before-output by design).
"""

from __future__ import annotations

import math
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def canon_df(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def c(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return ("f", float(v), math.copysign(1.0, float(v)))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v if isinstance(v, (int, str, bool)) else str(v)

    rows = [tuple(c(v) for v in r) for r in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def diff(path_a: str, path_b: str) -> int:
    a = pickle.load(open(path_a, "rb"))
    b = pickle.load(open(path_b, "rb"))
    bad = sorted(set(a) ^ set(b)) + [n for n in a if n in b and a[n] != b[n]]
    if bad:
        print(f"CONFIG-SENSITIVE queries: {bad}")
        return 1
    print(f"{len(a)} queries bit-identical across configs")
    return 0


def dump(cpus: str, parts: str, out: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("config_sensitivity")
        .getOrCreate()
    )
    from mqtt2clickhouse_spark.queries import QUERIES

    # SPARK_GRAFT_CS_ONLY=name1,name2 restricts the sweep — the round
    # ritual re-attests CHANGED queries without paying the full surface
    only = {
        n for n in os.environ.get("SPARK_GRAFT_CS_ONLY", "").split(",") if n
    }
    unknown = only - set(QUERIES)
    if unknown:
        # fail LOUDLY: a typo here otherwise attests nothing while the
        # diff step happily reports "N queries bit-identical"
        sys.exit(f"SPARK_GRAFT_CS_ONLY names not registered: {sorted(unknown)}")
    canons = {}
    for name, spec in sorted(QUERIES.items()):
        if not spec.oracle or (only and name not in only):
            continue
        try:
            canons[name] = canon_df(spec.spark_fn(spark, SF_DIR).toPandas())
        except Exception as exc:  # pragma: no cover - diagnostic path
            canons[name] = f"ERR: {exc}"
    pickle.dump(canons, open(out, "wb"))
    print(f"dumped {len(canons)} canons to {out}")
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        sys.exit(diff(sys.argv[2], sys.argv[3]))
    dump(sys.argv[1], sys.argv[2], sys.argv[3])
