"""Python UDTFs (Spark 4 user-defined table functions) — the
table-function third of the UDF/UDAF/UDTF surface (SURVEY.md §2.2).

``TopicSegments`` expands an MQTT topic path into (position, segment)
rows — the table-valued twin of the P1 projection
(/root/reference/message/message.go:50-61), useful for ad-hoc topic
hierarchy analysis in SQL:

    spark.udtf.register("topic_segments", TopicSegments)
    spark.sql("SELECT t.* FROM topic_segments('/c/d/out/sensors/x') t")

UDTFs run row-at-a-time in Python — fine for control-plane/exploration
queries; hot-path parsing stays in the JVM expressions of ingest.parse.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, segment string, is_table_name boolean")
class TopicSegments:
    """Yield one row per non-empty topic segment; the last segment is
    flagged as the routing table name (P1 semantics)."""

    def eval(self, topic: str):  # noqa: D102
        if topic is None:
            return
        parts = [p for p in topic.split("/") if p != ""]
        for i, seg in enumerate(parts):
            yield i, seg, i == len(parts) - 1


def register_udtfs(spark) -> None:
    spark.udtf.register("topic_segments", TopicSegments)
