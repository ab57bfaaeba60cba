"""Ingest-semantics queries: the reference's parse pipeline (F1-F3, P1-P3,
/root/reference/message/message.go) exercised as oracle-checkable batch
queries over synthetic MQTT messages built from the ``events`` fixture
(construction rule from FIXTURES.md §B: topic
``/client0/device{user_id}/out/sensors/s{event_type}``, payload
``{"value": <value>}``).

The Spark side runs the REAL engine pipeline (parse_messages_single); the
DuckDB oracle derives the expected outcome from the deterministic
construction rules — so a hash match proves the engine's validate/parse/
infer semantics, not just SQL parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ingest.parse import parse_messages_single
from mqtt2clickhouse_spark.queries.base import register, t
from mqtt2clickhouse_spark.tables import fan_out


def _messages(events: DataFrame) -> DataFrame:
    """Deterministically synthesize MQTT (topic, payload) rows from events.

    event_id % 10 == 0 → topic missing the leading '/'   (invalid_topic)
    event_id % 17 == 0 → payload not JSON                (invalid_json)
    event_id % 13 == 0 → payload without a "value" key   (missing_value)
    event_id % 11 == 0 → "value": null                   (unsupported_type)
    event_id %  7 == 0 → "value": "e<event_type>"        (String)
    otherwise          → "value": <value>                (Float64)
    """
    eid = F.col("event_id")
    topic_ok = F.concat(
        F.lit("/client0/device"),
        F.col("user_id").cast("string"),
        F.lit("/out/sensors/s"),
        F.col("event_type"),
    )
    topic = F.when(eid % 10 == 0, F.expr("substring(topic_ok, 2)")).otherwise(
        F.col("topic_ok")
    )
    payload = (
        F.when(eid % 17 == 0, F.lit("not json"))
        .when(
            eid % 13 == 0,
            F.concat(
                F.lit('{"timestamp": "'),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                F.lit('"}'),
            ),
        )
        .when(eid % 11 == 0, F.lit('{"value": null}'))
        .when(
            eid % 7 == 0,
            F.concat(F.lit('{"value": "e'), F.col("event_type"), F.lit('"}')),
        )
        .otherwise(
            F.concat(F.lit('{"value": '), F.col("value").cast("string"), F.lit("}"))
        )
    )
    return (
        events.withColumn("topic_ok", topic_ok)
        .withColumn("topic", topic)
        .withColumn("payload", payload)
        .select("event_id", "topic", "payload")
    )


@register(
    "mqtt_pipeline",
    oracle="""
    WITH c AS (
        SELECT CASE WHEN event_id % 10 = 0 THEN 'invalid_topic'
                    WHEN event_id % 17 = 0 THEN 'invalid_json'
                    WHEN event_id % 13 = 0 THEN 'missing_value'
                    WHEN event_id % 11 = 0 THEN 'unsupported_type'
                    WHEN event_id %  7 = 0 THEN 'String'
                    ELSE 'Float64' END AS status,
               CASE WHEN event_id % 10 <> 0 AND event_id % 17 <> 0
                     AND event_id % 13 <> 0 AND event_id % 11 <> 0
                     AND event_id %  7 <> 0 THEN value END AS v
        FROM events)
    SELECT status, count(*) AS n, round(sum(v), 4) AS sum_num
    FROM c GROUP BY status
    """,
    description="Flagship: full MQTT validate/parse/infer pipeline; oracle derives "
    "expected outcomes from the synthetic construction rules",
)
def mqtt_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: variant parsing is per-row CPU; a single-row-group scan
    # would otherwise serialize it on one core (no-op on real multi-split
    # inputs).  Synthesize BEFORE fanning out, from only the columns the
    # synthesis needs: the repartition then moves two short strings per
    # row instead of the whole events row (props is the wide column) —
    # measured 1.02s → 0.84s at sf0.1.
    events = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    classified = parse_messages_single(fan_out(_messages(events)))
    return (
        classified.withColumn(
            "status", F.coalesce(F.col("reject_reason"), F.col("value_type"))
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value_num"), 4).alias("sum_num"),
        )
    )


@register(
    "topic_parse",
    oracle="""
    WITH m AS (
        SELECT CASE WHEN event_id % 10 = 0 THEN substring(topic, 2) ELSE topic END AS topic
        FROM (SELECT event_id,
                     '/client0/device' || user_id || '/out/sensors/s' || event_type AS topic
              FROM events) x),
    p AS (
        SELECT string_split(topic, '/') AS parts
        FROM m
        WHERE topic LIKE '/%' AND len(string_split(topic, '/')) >= 5)
    SELECT parts[2] AS client, parts[3] AS device, parts[-1] AS table_name,
           count(*) AS n
    FROM p
    GROUP BY 1, 2, 3
    """,
    description="P1/F1: topic validation + projection (client/device/table from path segments)",
)
def topic_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2clickhouse_spark.ingest.parse import topic_is_valid

    events = t(spark, sf_dir, "events")
    msgs = _messages(events)
    parts = F.split(F.col("topic"), "/")
    return (
        msgs.filter(topic_is_valid(F.col("topic")))
        .select(
            F.element_at(parts, 2).alias("client"),
            F.element_at(parts, 3).alias("device"),
            F.element_at(parts, -1).alias("table_name"),
        )
        .groupBy("client", "device", "table_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           count(*)             AS n,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    description="P2: JSON scalar extraction from the props payload column",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "topic_segments_udtf",
    oracle="""
    WITH topics AS (
        SELECT event_id,
               '/client0/device' || CAST(user_id AS VARCHAR)
                   || '/out/sensors/s' || event_type AS topic
        FROM events WHERE event_id < 500),
    seg AS (
        SELECT event_id,
               CAST(u.i - 1 AS INTEGER) AS pos,
               parts[CAST(u.i AS INTEGER)] AS segment,
               u.i = len(parts) AS is_table_name
        FROM (SELECT event_id,
                     list_filter(string_split(topic, '/'), x -> x <> '') AS parts
              FROM topics) t,
             unnest(range(1, len(parts) + 1)) u(i))
    SELECT event_id, pos, segment, is_table_name FROM seg
    """,
    description="Python UDTF attestation: topic_segments (one row per "
    "topic-path segment, last flagged as the routing table name — the "
    "table-valued twin of the P1 projection) applied via LATERAL join "
    "over synthesized topics; completes the UDF/UDAF/UDTF surface in the "
    "driver gate.",
)
def topic_segments_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTFs run row-at-a-time in Python — the right tool for control-
    plane/exploration surfaces (here: topic-hierarchy expansion), never
    the hot path (ingest parsing stays in JVM Column expressions —
    ingest/parse.py).  The LATERAL join is how SQL users consume it:
    each topic row expands to one row per segment.  Bounded input (500
    topics) keeps the Python cost trivial; the point is the driver-
    checked end-to-end UDTF machinery, mirrored exactly by the oracle's
    unnest."""
    from mqtt2clickhouse_spark.ops.udtfs import register_udtfs

    register_udtfs(spark)
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    topics = ev.select(
        "event_id",
        F.concat(
            F.lit("/client0/device"),
            F.col("user_id").cast("string"),
            F.lit("/out/sensors/s"),
            F.col("event_type"),
        ).alias("topic"),
    )
    topics.createOrReplaceTempView("_udtf_topics")
    return spark.sql(
        "SELECT t.event_id, s.pos, s.segment, s.is_table_name "
        "FROM _udtf_topics t, LATERAL topic_segments(t.topic) s"
    )


#: sink_routing_twin: the md5-hash32 DuckDB expression shared with the
#: dedup oracles (ops/dedup.py:hash32).
from mqtt2clickhouse_spark.queries.dedup_queries import _DUCK_HASH32

_SRT_HASH = _DUCK_HASH32.format(x="CAST(event_id AS VARCHAR)")


@register(
    "sink_routing_twin",
    oracle=f"""
    WITH msg AS (
        SELECT 't_' || event_type || '_'
                   || CAST(user_id % 10 AS VARCHAR) AS table_name,
               'c' || CAST(user_id % 5 AS VARCHAR) AS client,
               event_id AS seq,
               CASE WHEN {_SRT_HASH} % 5 = 0
                    THEN 'String' ELSE 'Float64' END AS vt,
               CAST(round(value * 10000) AS BIGINT) AS vnum
        FROM events WHERE event_id % 4 = 0),
    sch AS (
        -- C4 create-on-first-write + batch-order rule: the schema of a
        -- brand-new table is fixed by the row with the lowest seq
        SELECT table_name, arg_min(vt, seq) AS vtype FROM msg GROUP BY 1),
    acc AS (
        SELECT m.table_name, s.vtype, m.client, m.vnum
        FROM msg m JOIN sch s USING (table_name) WHERE m.vt = s.vtype)
    SELECT table_name,
           any_value(vtype) AS vtype,
           CAST(count(*) AS BIGINT) AS n,
           CASE WHEN any_value(vtype) = 'Float64'
                THEN CAST(sum(vnum) AS BIGINT) END AS sum_num,
           CAST(count(DISTINCT client) AS BIGINT) AS n_clients
    FROM acc GROUP BY 1
    UNION ALL
    SELECT '_dead_letter/schema_mismatch' AS table_name, '_' AS vtype,
           CAST(count(*) AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS sum_num,
           CAST(NULL AS BIGINT) AS n_clients
    FROM msg m JOIN sch s USING (table_name)
    WHERE m.vt <> s.vtype
    HAVING count(*) > 0
    """,
    description="Write-path batch twin (VERDICT r5 stretch #8): a "
    "synthetic per-sensor message batch routed through the REAL "
    "DemuxSink — W2 demux routing, C4 create-on-first-write with the "
    "lowest-seq schema-fix rule, C5 positional type enforcement with "
    "schema-mismatch dead-lettering — then the WAREHOUSE read back and "
    "profiled per table; the oracle derives the same routing outcome "
    "from the construction rules, so a green row attests what the sink "
    "actually wrote, not just SQL parity.",
)
def sink_routing_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gives the reference's write path (ingest/sink.py — W2 routing
    /root/reference/db/db.go:147-205, C4 create-on-first-write
    db.go:226-243, C5 positional check db.go:208-223) a driver-oracled
    row; previously pytest-only.  Construction: ~60 sensor tables
    (event_type x user_id%10), hash32(event_id)%5==0 rows send a String
    value, the rest the integer-scaled numeric reading — so nearly
    every table sees BOTH value types in one batch, the first-by-seq
    rule fixes each table's schema, and the minority rows dead-letter.
    Values are x10^4 integers so per-table double sums are exact in any
    order.  The result aggregates the WAREHOUSE (partitioned layout,
    partition-pruned per-table scan shape), not the in-flight frame.
    The warehouse lives in a per-sf temp dir wiped at call start and
    removed at interpreter exit (the rollup_incremental_twin idiom)."""
    import atexit
    import os
    import shutil
    import tempfile

    from mqtt2clickhouse_spark.ingest.sink import DemuxSink
    from mqtt2clickhouse_spark.ops.dedup import hash32

    # deterministic 1-in-4 slice (mirrored in the oracle): the twin's
    # point is the routing/schema machinery, not write volume — ~60
    # tables still see both value types at sf0.01
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    h = hash32(F.col("event_id").cast("string"))
    client = F.concat(F.lit("c"), (F.col("user_id") % 5).cast("string"))
    device = F.concat(F.lit("d"), (F.col("event_id") % 7).cast("string"))
    table = F.concat(
        F.lit("t_"),
        F.col("event_type"),
        F.lit("_"),
        (F.col("user_id") % 10).cast("string"),
    )
    vnum = F.round(F.col("value") * 10000).cast("long")
    payload = F.when(
        h % 5 == 0,
        F.concat(
            F.lit('{"value": "s'), (h % 100).cast("string"), F.lit('"}')
        ),
    ).otherwise(
        F.concat(F.lit('{"value": '), vnum.cast("string"), F.lit("}"))
    )
    msgs = ev.select(
        F.concat(
            F.lit("/"), client, F.lit("/"), device, F.lit("/s/"), table
        ).alias("topic"),
        payload.alias("payload"),
        F.col("event_id").alias("seq"),
    )

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    wh = os.path.join(tempfile.gettempdir(), f"sink_twin_{tag}")
    shutil.rmtree(wh, ignore_errors=True)
    atexit.register(shutil.rmtree, wh, ignore_errors=True)
    sink = DemuxSink(spark, wh, layout="partitioned")
    sink.foreach_batch(msgs, 0)

    readings = spark.read.parquet(os.path.join(wh, "readings"))
    per_table = (
        readings.groupBy("table_name", "value_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            # all-null for String tables -> NULL, matching the oracle
            F.sum("value_num").cast("long").alias("sum_num"),
            F.count_distinct("client").cast("long").alias("n_clients"),
        )
        .withColumnRenamed("value_type", "vtype")
        .select("table_name", "vtype", "n", "sum_num", "n_clients")
    )
    from mqtt2clickhouse_spark.ingest.sink import DEAD_LETTER_TABLE

    dl_path = os.path.join(wh, DEAD_LETTER_TABLE)
    if not os.path.exists(dl_path):
        # no mismatches (oracle's HAVING emits no row either)
        return per_table
    dead = spark.read.parquet(dl_path)
    dead_row = dead.groupBy("reject_reason").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(
        F.concat(F.lit(DEAD_LETTER_TABLE + "/"), "reject_reason").alias(
            "table_name"
        ),
        F.lit("_").alias("vtype"),
        "n",
        F.lit(None).cast("long").alias("sum_num"),
        F.lit(None).cast("long").alias("n_clients"),
    )
    return per_table.unionByName(dead_row)


# -- Consul hot-reload protocol twin --------------------------------------
#: the L2 control path (config/config.go:72-96) as a driver-attested
#: query: a scripted in-process HTTP server speaks the Consul KV
#: blocking-query shape (base64 Value, ModifyIndex), ConsulTopicSource
#: polls it through a fixed scenario, and the observed protocol
#: outcomes (change detected / suppressed, decoded map, index
#: tracking) are returned as rows against a literal-VALUES oracle —
#: the same attest-the-real-code-path construction as
#: sink_routing_twin and stateful_stats_twin.
_RELOAD_SCRIPT = (
    # (server index, server topic map) per poll step
    (7, {"a": "/alpha/#"}),          # first poll: 0 -> 7, change
    (7, {"a": "/alpha/#"}),          # same index: suppressed (go:90-93)
    (9, {"b": "/beta/#"}),           # bumped: change to B
    (9, {"b": "/beta/#"}),          # same again: suppressed
    (12, {"b": "/beta/#", "c": "/gamma/+/x"}),  # bumped: two filters
)


@register(
    "config_reload_twin",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(1 AS BIGINT),
         '{"a": "/alpha/#"}', CAST(7 AS BIGINT)),
        (CAST(2 AS BIGINT), CAST(0 AS BIGINT), NULL, CAST(7 AS BIGINT)),
        (CAST(3 AS BIGINT), CAST(1 AS BIGINT),
         '{"b": "/beta/#"}', CAST(9 AS BIGINT)),
        (CAST(4 AS BIGINT), CAST(0 AS BIGINT), NULL, CAST(9 AS BIGINT)),
        (CAST(5 AS BIGINT), CAST(1 AS BIGINT),
         '{"b": "/beta/#", "c": "/gamma/+/x"}', CAST(12 AS BIGINT))
    ) AS t(step, changed, topics, last_index)
    """,
    description="Consul blocking-query hot-reload protocol, driver-"
    "attested: ConsulTopicSource polls a scripted in-process KV stub "
    "through change / suppressed-by-ModifyIndex / change / suppressed "
    "/ multi-filter-change, and the observed decode + index-tracking "
    "sequence must equal the protocol's literal expectation — the L2 "
    "control path (config/config.go:72-96) at the correctness gate, "
    "not just in pytest.",
)
def config_reload_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure control-path twin: no fixture data is involved (sf_dir is
    unused), the work is one localhost HTTP exchange per step, and the
    result is a 5-row literal-shaped DataFrame — the cost is protocol
    correctness, not data volume.  The stub serves exactly the KV
    blocking-query JSON shape; the REAL ConsulTopicSource (stdlib
    urllib long-poll client) does all the decoding."""
    import base64 as _b64
    import json as _json
    import threading as _threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from mqtt2clickhouse_spark.streaming.config_watcher import (
        ConsulTopicSource,
    )

    state = {"i": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - http.server API
            idx, val = _RELOAD_SCRIPT[min(state["i"], len(_RELOAD_SCRIPT) - 1)]
            body = _json.dumps(
                [
                    {
                        "Key": "mqttClient/topics",
                        "Value": _b64.b64encode(
                            _json.dumps(val, sort_keys=True).encode()
                        ).decode(),
                        "ModifyIndex": idx,
                    }
                ]
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Consul-Index", str(idx))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence the test server
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    _threading.Thread(target=srv.serve_forever, daemon=True).start()
    rows = []
    try:
        src = ConsulTopicSource(f"http://127.0.0.1:{srv.server_port}")
        for step in range(len(_RELOAD_SCRIPT)):
            got = src.poll(timeout=5)
            state["i"] += 1
            rows.append(
                (
                    step + 1,
                    1 if got is not None else 0,
                    None if got is None else _json.dumps(got, sort_keys=True),
                    src.last_index,
                )
            )
    finally:
        srv.shutdown()
        srv.server_close()
    return spark.createDataFrame(
        rows, "step long, changed long, topics string, last_index long"
    )
