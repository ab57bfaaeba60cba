"""mqtt2clickhouse_spark — a PySpark-native analytics engine with the
capabilities of BalalaykaJazz/mqtt2clickhouse, re-expressed Spark-first.

The reference (/root/reference) is a Go daemon: MQTT subscribe → validate /
parse / infer schema per message → auto-create a ClickHouse table per sensor
→ one-row INSERTs.  This package restates those capabilities as:

- ``ingest.parse``      — the validate/parse/infer pipeline as pure
                          DataFrame transforms (reference semantics from
                          message/message.go preserved exactly).
- ``ingest.sink``       — dynamic table routing (demux) with
                          create-on-first-write + positional schema checks
                          (db/db.go semantics) + dead-letter, batched and
                          columnar instead of row-at-a-time.
- ``ingest.mqtt_source``— Python DataSource API stream source wrapping
                          paho-mqtt (gated: stub without the lib).
- ``streaming``         — Structured Streaming wrappers: watermarks,
                          tumbling/sliding/session windows, effectively-once.
- ``queries``           — the batch query surface (joins/aggs/windows/
                          set-ops/JSON/...) declared with DuckDB oracles.
- ``ops``               — large-scale pipeline extensions: dedup (exact,
                          MinHash-LSH, SimHash, n-gram Jaccard), vector
                          similarity search, text analysis, multimodal
                          column plumbing.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and whole-stage codegen; Python UDFs appear only where the
built-ins genuinely cannot express the semantics (Arrow-batched pandas UDFs,
never row-at-a-time).
"""

from mqtt2clickhouse_spark.session import get_spark
from mqtt2clickhouse_spark.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
