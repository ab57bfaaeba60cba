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


def _is_neg_zero(v) -> bool:
    return (
        isinstance(v, float)
        and v == 0.0
        and math.copysign(1.0, v) < 0
        and not math.isnan(v)
    )


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_emits_no_negative_zero(duck, name):
    rows = duck.execute(QUERIES[name].oracle).fetchall()
    bad = [
        (i, j, col)
        for i, row in enumerate(rows)
        for j, col in enumerate(row)
        if _is_neg_zero(col)
    ]
    assert not bad, (
        f"{name}: oracle emits -0.0 at {bad[:5]} — fold signed zeros "
        "with CASE WHEN x = 0 THEN 0.0 ELSE x END (the driver's value "
        "hash distinguishes -0.0 from +0.0)"
    )
