"""Standing sweep: no registered DuckDB oracle may emit -0.0 at sf0.01.

The driver's value hash is sign-bit-sensitive, and DuckDB ``round()``
preserves -0.0 (a tiny negative value that rounds to zero at N dp keeps
its sign) while Spark ``F.round`` returns +0.0 — the exact class that
produced the graph_modularity red row in CORRECTNESS_r07.  Any oracle
that can emit a signed zero must fold it explicitly
(``CASE WHEN x = 0 THEN 0.0 ELSE x END``; note ``x + 0.0`` is constant-
folded with the sign intact).

DuckDB-only — no Spark session, so the whole 200+-oracle sweep runs in
about a minute and catches the class before a red driver row can.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mqtt2clickhouse_spark.queries import QUERIES
from mqtt2clickhouse_spark.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _hash_hazard(v) -> str | None:
    """Float values whose cross-engine hash behavior is treacherous:
    -0.0 (DuckDB round() preserves it, Spark does not), NaN (pandas
    conflates it with NULL, so the local parity canon cannot see a
    NaN-vs-NULL divergence the driver's hash may distinguish), and
    ±inf (overflow artifacts; never a designed output here)."""
    if not isinstance(v, float):
        return None
    if math.isnan(v):
        return "nan"
    if math.isinf(v):
        return "inf"
    if v == 0.0 and math.copysign(1.0, v) < 0:
        return "-0.0"
    return None


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)


def test_no_spark_nan_where_oracle_has_nulls(duck, spark):
    """Close the NaN-vs-NULL blind spot from the Spark side: the oracle
    sweep proves no oracle emits NaN, so the only way a NaN/NULL
    conflation could slip through the pandas-based parity canon is a
    SPARK-side NaN in a query whose oracle emits NULLs.  Find those
    queries via a cheap DuckDB pass (14 of 236 at sf0.01), then
    .collect() them on Spark — Row preserves the None/NaN distinction
    toPandas() destroys — and assert no genuine NaN appears."""
    nullable = [
        name
        for name in ORACLE_QUERIES
        if any(
            v is None
            for row in duck.execute(QUERIES[name].oracle).fetchall()
            for v in row
        )
    ]
    assert nullable, "expected some NULL-emitting oracles (fixture sanity)"
    bad: list[tuple[str, int, int]] = []
    for name in nullable:
        rows = QUERIES[name].spark_fn(spark, SF_DIR).collect()
        bad += [
            (name, i, j)
            for i, row in enumerate(rows)
            for j, v in enumerate(row)
            if isinstance(v, float) and math.isnan(v)
        ]
    assert not bad, (
        f"Spark emits genuine NaN at {bad[:5]} — the parity canon folds "
        "it into NULL, so the driver's value hash is the first place "
        "the divergence would surface; guard the producing division"
    )


def test_zero_emitting_oracles_have_stable_sign(duck):
    """The r9 heaps_law lesson: a rounded float whose TRUE value is a
    ~1e-17 residue emits -0.0 NONDETERMINISTICALLY — DuckDB's parallel
    summation order decides the sign, so the single-run sweep below
    catches it only ~7% of the time (it fired once in a chunked suite
    run, then refused to reproduce).  Standing two-phase hunt: one pass
    finds every oracle with a float cell that is exactly 0.0 (the only
    cells whose sign can flip), then 20 re-runs of just those must never
    produce a negative zero.  Fix at the source, both engines: wrap the
    rounded expression in CASE WHEN round(e, n) = 0 THEN 0.0 ELSE
    round(e, n) END (SQL) / F.when(rb == 0, 0.0).otherwise(rb) (Spark)."""
    zero_emitters = [
        name
        for name in ORACLE_QUERIES
        if any(
            isinstance(v, float) and v == 0.0
            for row in duck.execute(QUERIES[name].oracle).fetchall()
            for v in row
        )
    ]
    assert zero_emitters, "expected some zero-emitting oracles (fixture sanity)"
    bad: list[tuple[str, int]] = []
    for name in zero_emitters:
        neg = sum(
            1
            for _ in range(20)
            if any(
                isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0
                for row in duck.execute(QUERIES[name].oracle).fetchall()
                for v in row
            )
        )
        if neg:
            bad.append((name, neg))
    assert not bad, (
        f"sign-unstable zero cells (runs-with--0.0 of 20): {bad} — a "
        "rounded expression's true value is a tiny ± residue; fold the "
        "zero at the source on BOTH sides"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_emits_no_hash_hazard_floats(duck, name):
    rows = duck.execute(QUERIES[name].oracle).fetchall()
    bad = [
        (i, j, _hash_hazard(col))
        for i, row in enumerate(rows)
        for j, col in enumerate(row)
        if _hash_hazard(col)
    ]
    assert not bad, (
        f"{name}: oracle emits hash-hazard float(s) at {bad[:5]} — "
        "fold signed zeros (CASE WHEN x = 0 THEN 0.0 ELSE x END), and "
        "design NaN/inf out of the output (guard the division); the "
        "driver's value hash distinguishes what the pandas-based "
        "parity canon cannot"
    )
