from mqtt2clickhouse_spark.ingest.parse import parse_messages, PARSED_COLUMNS
from mqtt2clickhouse_spark.ingest.sink import DemuxSink, SchemaRegistry

__all__ = ["parse_messages", "PARSED_COLUMNS", "DemuxSink", "SchemaRegistry"]
