"""Conformance tests for the parse pipeline.

Vectors come verbatim from the reference's tests (FIXTURES.md §A;
/root/reference/message/message_test.go).
"""

import pytest
from pyspark.sql import functions as F

from mqtt2clickhouse_spark.ingest.parse import (
    REASON_INVALID_JSON,
    REASON_INVALID_TOPIC,
    REASON_MISSING_VALUE,
    REASON_UNSUPPORTED_TYPE,
    parse_messages,
)

GOLDEN_TOPIC = "/balalaykajazz/plants1/out/sensors/temp_out"
GOLDEN_PAYLOAD = '{"timestamp":"2021-11-24T20:27:23Z","value":27.8}'


def _parse(spark, rows):
    df = spark.createDataFrame(rows, "topic string, payload string")
    valid, dead = parse_messages(df)
    return valid, dead


def test_golden_record(spark):
    """message_test.go:149-200 — the canonical record."""
    valid, dead = _parse(spark, [(GOLDEN_TOPIC, GOLDEN_PAYLOAD)])
    rows = valid.collect()
    assert dead.count() == 0
    assert len(rows) == 1
    r = rows[0]
    assert r["table_name"] == "temp_out"
    assert r["client"] == "balalaykajazz"
    assert r["device"] == "plants1"
    assert r["value_num"] == pytest.approx(27.8)
    assert r["value_str"] is None
    assert r["value_type"] == "Float64"  # payload timestamp dropped


@pytest.mark.parametrize(
    "topic,ok",
    [
        (GOLDEN_TOPIC, True),
        ("balalaykajazz/plants1/out/sensors/temp_out", False),  # no leading /
        ("/balalaykajazz/plants1/temp_out", False),  # < 4 slashes
        ("", False),
        ("/a/b/c/d", True),  # exactly 4 slashes is valid
    ],
)
def test_topic_validation(spark, topic, ok):
    """message_test.go:15-20 / message.go:38-47."""
    valid, dead = _parse(spark, [(topic, '{"value": 1}')])
    if ok:
        assert valid.count() == 1
    else:
        assert valid.count() == 0
        assert dead.collect()[0]["reject_reason"] == REASON_INVALID_TOPIC


@pytest.mark.parametrize(
    "payload,value_type,value_num,value_str,reason",
    [
        ('{"timestamp":"x","value":27.8}', "Float64", 27.8, None, None),
        ('{"value": 27}', "Float64", 27.0, None, None),  # all JSON numbers → Float64
        ('{"value": "on"}', "String", None, "on", None),
        ('{"other": 1}', None, None, None, REASON_MISSING_VALUE),
        ('{"value": true}', None, None, None, REASON_UNSUPPORTED_TYPE),
        ('{"value": null}', None, None, None, REASON_UNSUPPORTED_TYPE),
        ('{"value": {"a":1}}', None, None, None, REASON_UNSUPPORTED_TYPE),
        ('{"value": [1]}', None, None, None, REASON_UNSUPPORTED_TYPE),
        ("not json", None, None, None, REASON_INVALID_JSON),
        ('{"value": 2.5e3}', "Float64", 2500.0, None, None),
    ],
)
def test_value_inference(spark, payload, value_type, value_num, value_str, reason):
    """FIXTURES.md §A.3 / message.go:64-125."""
    valid, dead = _parse(spark, [(GOLDEN_TOPIC, payload)])
    if reason is None:
        r = valid.collect()[0]
        assert r["value_type"] == value_type
        if value_num is not None:
            assert r["value_num"] == pytest.approx(value_num)
        else:
            assert r["value_num"] is None
        assert r["value_str"] == value_str
    else:
        assert valid.count() == 0
        assert dead.collect()[0]["reject_reason"] == reason


def test_middle_segments_dropped(spark):
    """message.go:50-61 — only segments 1, 2 and last are kept."""
    valid, _ = _parse(spark, [("/c1/d1/x/y/z/w/sensor9", '{"value": 5}')])
    r = valid.collect()[0]
    assert (r["client"], r["device"], r["table_name"]) == ("c1", "d1", "sensor9")


def test_no_python_udf_in_plan(spark):
    """The hot path must stay JVM-side (no BatchEvalPython/ArrowEvalPython)."""
    df = spark.createDataFrame([(GOLDEN_TOPIC, GOLDEN_PAYLOAD)], "topic string, payload string")
    valid, _ = parse_messages(df)
    plan = valid._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_topic_segments_udtf(spark):
    """Python UDTF surface: topic path → (pos, segment, is_table_name) rows."""
    from mqtt2clickhouse_spark.ops.udtfs import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT t.* FROM topic_segments('/balalaykajazz/plants1/out/sensors/temp_out') t"
    ).collect()
    assert [(r["pos"], r["segment"]) for r in rows] == [
        (0, "balalaykajazz"),
        (1, "plants1"),
        (2, "out"),
        (3, "sensors"),
        (4, "temp_out"),
    ]
    assert [r["segment"] for r in rows if r["is_table_name"]] == ["temp_out"]
    # lateral join over a table of topics
    n = spark.sql(
        "SELECT count(*) AS n FROM (SELECT explode(array("
        "'/c/d/out/sensors/a', '/c/d/out/sensors/b')) AS topic) "
        "JOIN LATERAL topic_segments(topic) t"
    ).collect()[0]["n"]
    assert n == 10
