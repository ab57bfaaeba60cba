"""Streaming observability: a StreamingQueryListener that appends one
JSON line per completed micro-batch (batch id, input rows, processing
rate, durations, state-store rows) to a metrics file.

The reference's only observability is log lines on the hot path
(/root/reference/main.go:22-30); an engine needs machine-readable
per-batch metrics — this is what feeds dashboards/alerts at scale, and
locally it is how the tests assert progress without polling internals.

The listener runs on the driver and receives events asynchronously;
writes append a full line at a time, so a concurrent tail sees whole
records.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    """Append one JSON object per completed micro-batch to ``path``."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "stateRows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
        }
        self._write(rec)

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    # ------------------------------------------------------------------
    def _write(self, rec: dict) -> None:
        line = json.dumps(rec) + "\n"
        with self._lock, open(self.path, "a") as f:
            f.write(line)


def attach_metrics(spark, path: str) -> JsonlMetricsListener:
    """Register a metrics listener on the session; returns it so the
    caller can ``spark.streams.removeListener(listener)`` when done."""
    listener = JsonlMetricsListener(path)
    spark.streams.addListener(listener)
    return listener
