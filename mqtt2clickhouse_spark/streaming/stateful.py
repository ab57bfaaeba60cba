"""Custom stateful streaming operator: per-sensor running statistics
maintained across micro-batches with ``applyInPandasWithState``.

The reference's only state is its schema cache (SURVEY.md §2.2
"Streaming: stateful ops" — /root/reference/db/db.go:15-22); it has no
per-sensor accumulation at all.  This operator is the engine-side
upgrade a monitoring pipeline needs: for every sensor table it keeps
(count, sum, min, max) across the lifetime of the stream — checkpointed
with the query, so restarts resume, not reset.

Scale design: state is keyed by ``table_name`` (one small fixed-width
row per sensor — cardinality = #sensors, not #messages), lives in the
executor state store, and each micro-batch touches only the keys present
in that batch.  The pandas function receives Arrow batches per key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output of running_stats: one row per (key, micro-batch)
OUTPUT_SCHEMA = (
    "table_name string, batch_rows long, total_rows long, "
    "total_sum double, running_min double, running_max double"
)
STATE_SCHEMA = "n long, s double, mn double, mx double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (table_name,) = key
    if state.exists:
        n, s, mn, mx = state.get
    else:
        n, s, mn, mx = 0, 0.0, None, None
    batch_rows = 0
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        batch_rows += len(pdf)
        if len(vals):
            n += int(len(vals))
            s += float(vals.sum())
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
    state.update((n, s, mn, mx))
    yield pd.DataFrame(
        {
            "table_name": [table_name],
            "batch_rows": [batch_rows],
            "total_rows": [n],
            "total_sum": [s],
            "running_min": [mn],
            "running_max": [mx],
        }
    )


def running_stats(
    parsed: DataFrame,
    key_col: str = "table_name",
    value_col: str = "value_num",
) -> DataFrame:
    """Per-key running (count, sum, min, max) over a stream of parsed
    messages; one output row per key per micro-batch.

    ``parsed`` is the output of ``parse_messages_single`` (or any frame
    with ``key_col`` and a numeric ``value_col``)."""
    from pyspark.sql import functions as F

    keyed = parsed.select(
        F.col(key_col).alias("table_name"), F.col(value_col).alias("value")
    )
    return keyed.groupBy("table_name").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithState variant of the same operator.
# ---------------------------------------------------------------------------


def running_stats_tws(
    parsed: DataFrame,
    key_col: str = "table_name",
    value_col: str = "value_num",
) -> DataFrame:
    """``running_stats`` on the Spark 4 ``transformWithStateInPandas``
    API (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState: explicit state variables, per-key handles,
    and room for timers/TTL.  Same semantics and output schema as
    ``running_stats``; kept as a twin so both state APIs stay covered.

    Requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and a working
    ``google.protobuf`` for the TWS state server — the test container's
    protobuf is broken, so the twin is exercised only where available
    (see test_stateful_running_stats_tws' import gate).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", DoubleType()),
            StructField("mn", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            (table_name,) = key
            if self._state.exists():
                n, s, mn, mx = self._state.get()
            else:
                n, s, mn, mx = 0, 0.0, None, None
            batch_rows = 0
            for pdf in rows:
                vals = pdf["value"].dropna()
                batch_rows += len(pdf)
                if len(vals):
                    n += int(len(vals))
                    s += float(vals.sum())
                    bmn, bmx = float(vals.min()), float(vals.max())
                    mn = bmn if mn is None else min(mn, bmn)
                    mx = bmx if mx is None else max(mx, bmx)
            self._state.update((n, s, mn, mx))
            yield pd.DataFrame(
                {
                    "table_name": [table_name],
                    "batch_rows": [batch_rows],
                    "total_rows": [n],
                    "total_sum": [s],
                    "running_min": [mn],
                    "running_max": [mx],
                }
            )

        def close(self) -> None:
            pass

    keyed = parsed.select(
        F.col(key_col).alias("table_name"), F.col(value_col).alias("value")
    )
    return keyed.groupBy("table_name").transformWithStateInPandas(
        RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
