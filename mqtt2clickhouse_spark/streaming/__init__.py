from mqtt2clickhouse_spark.streaming.pipeline import (
    MESSAGE_SCHEMA,
    dedup_effectively_once,
    run_ingest_stream,
    session_window_agg,
    sliding_window_agg,
    stream_messages_from_dir,
    tumbling_window_agg,
)
from mqtt2clickhouse_spark.streaming.rollup import RollupSink
from mqtt2clickhouse_spark.streaming.stateful import running_stats

__all__ = [
    "MESSAGE_SCHEMA",
    "RollupSink",
    "dedup_effectively_once",
    "run_ingest_stream",
    "running_stats",
    "session_window_agg",
    "sliding_window_agg",
    "stream_messages_from_dir",
    "tumbling_window_agg",
]
