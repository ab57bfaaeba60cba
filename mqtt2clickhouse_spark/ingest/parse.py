"""The message parse/validate/infer pipeline — the reference's hot path as
one pure DataFrame transform.

Reference semantics reproduced exactly (conformance vectors in
FIXTURES.md §A; golden expectations from
/root/reference/message/message_test.go:149-200):

- **F1 topic validation** (/root/reference/message/message.go:38-47):
  topic must start with ``/`` and contain >= 4 ``/`` — i.e. the split
  yields >= 5 segments (leading empty segment included).
- **P1 topic projection** (/root/reference/message/message.go:50-61):
  ``client`` = segment 1, ``device`` = segment 2, ``table_name`` = last
  segment; everything between is dropped.
- **F2/P2 JSON extraction** (/root/reference/message/message.go:64-94):
  the payload is parsed as JSON; only the ``value`` key is kept; the
  payload ``timestamp`` (and every other key) is dropped.  Missing
  ``value`` key → reject.  Invalid JSON → reject.
- **F3/P3 type inference** (/root/reference/message/message.go:97-125):
  JSON number (of any shape — all Go JSON numbers are float64) →
  ``Float64``; JSON string → ``String``; bool / null / object / array →
  reject.  The inferred per-row schema is always
  ``(client String, device String, value Float64|String)``.

Spark-first design: the runtime-value-dependent typing is carried by
Spark 4's VARIANT (``try_parse_json`` / ``schema_of_variant``), entirely
JVM-side — no Python UDF anywhere on the hot path, so the transform stays
inside whole-stage codegen and scales linearly with executors.  Rejected
rows are not errors (the reference killed its consumer goroutine on the
first bad message — a quirk we deliberately do not carry forward,
/root/reference/main.go:21-31): they flow to a dead-letter DataFrame with
a reason column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output schema of the valid branch, in reference column order
#: (client, device, value) plus engine-added routing/typing columns.
PARSED_COLUMNS = [
    "table_name",
    "client",
    "device",
    "value_num",
    "value_str",
    "value_type",
]

#: Dead-letter reasons (stable API; tests assert on these).
REASON_INVALID_TOPIC = "invalid_topic"
REASON_INVALID_JSON = "invalid_json"
REASON_MISSING_VALUE = "missing_value"
REASON_UNSUPPORTED_TYPE = "unsupported_type"


def topic_is_valid(topic: Column) -> Column:
    """F1: leading '/' and >= 4 slashes (>= 5 split segments)."""
    return topic.startswith("/") & (F.size(F.split(topic, "/")) >= 5)


def _classify(df: DataFrame) -> DataFrame:
    """Annotate (topic, payload) with parse fields and a reject reason."""
    parts = F.split(F.col("topic"), "/")
    variant = F.try_parse_json(F.col("payload"))
    vvalue = F.try_variant_get(variant, "$.value", "variant")
    vtype = F.schema_of_variant(vvalue)
    is_number = vtype.isin("DOUBLE", "BIGINT") | vtype.startswith("DECIMAL")
    is_string = vtype == F.lit("STRING")

    reason = (
        F.when(~topic_is_valid(F.col("topic")), F.lit(REASON_INVALID_TOPIC))
        .when(variant.isNull(), F.lit(REASON_INVALID_JSON))
        .when(vvalue.isNull(), F.lit(REASON_MISSING_VALUE))
        .when(~(is_number | is_string), F.lit(REASON_UNSUPPORTED_TYPE))
    )
    ok = reason.isNull()  # rejected records produce no parsed fields
    return df.select(
        "*",  # keep passthrough columns (e.g. seq, ingest_ts) for the sink
        reason.alias("reject_reason"),
        # try_element_at: under ANSI, element_at on a short array THROWS,
        # so one malformed topic (< 3 segments) would kill the whole
        # micro-batch — the reference's poison-pill failure mode
        # (/root/reference/main.go:21-31) resurrected via SQL semantics.
        # Invalid topics are rejected by `reason` anyway; their parse
        # columns must be null, not fatal.
        F.try_element_at(parts, F.lit(-1)).alias("table_name"),
        F.try_element_at(parts, F.lit(2)).alias("client"),
        F.try_element_at(parts, F.lit(3)).alias("device"),
        F.when(ok & is_number, F.try_variant_get(vvalue, "$", "double")).alias(
            "value_num"
        ),
        F.when(ok & is_string, F.try_variant_get(vvalue, "$", "string")).alias(
            "value_str"
        ),
        F.when(ok & is_number, F.lit("Float64"))
        .when(ok & is_string, F.lit("String"))
        .alias("value_type"),
    )


def parse_messages(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(topic, payload) → (valid, dead_letter).

    ``valid``:  table_name, client, device, value_num, value_str,
                value_type ('Float64' | 'String') — exactly one of
                value_num/value_str is non-null.
    ``dead_letter``: topic, payload, reject_reason.

    Pure transform — composes into batch or streaming plans unchanged.
    """
    classified = _classify(df)
    valid = classified.filter(F.col("reject_reason").isNull()).select(*PARSED_COLUMNS)
    dead = classified.filter(F.col("reject_reason").isNotNull()).select(
        "topic", "payload", "reject_reason"
    )
    return valid, dead


def parse_messages_single(df: DataFrame) -> DataFrame:
    """One-DataFrame variant: all rows annotated with ``reject_reason``
    (null = valid).  Useful in streaming where forking a source into two
    sinks would double the scan."""
    return _classify(df)
