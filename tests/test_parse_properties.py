"""Property-based conformance: for ANY (topic, payload), the parse
pipeline must agree with a direct Python re-implementation of the
reference's rules (/root/reference/message/message.go) — and must never
drop or duplicate rows (valid + dead_letter partitions the input).

The reference has no property tests (SURVEY §5.1); this closes that gap
with hypothesis-generated adversarial inputs (weird unicode topics,
nested JSON, numeric edge cases).
"""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mqtt2clickhouse_spark.ingest.parse import parse_messages

segment = st.text(
    alphabet=st.characters(blacklist_characters="/\x00", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=8,
)
topics = st.one_of(
    st.builds(lambda parts: "/" + "/".join(parts), st.lists(segment, min_size=1, max_size=7)),
    st.builds(lambda parts: "/".join(parts), st.lists(segment, min_size=1, max_size=7)),
    segment,
)
json_values = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-(2**53) + 1, max_value=2**53 - 1),
    st.text(max_size=12),
    st.booleans(),
    st.none(),
    st.lists(st.integers(), max_size=3),
    st.dictionaries(st.text(max_size=4), st.integers(), max_size=3),
)
payloads = st.one_of(
    st.builds(lambda v: json.dumps({"value": v}), json_values),
    st.builds(lambda v: json.dumps({"other": v}), json_values),
    st.text(max_size=16),  # mostly invalid JSON
)


def expected_outcome(topic: str, payload: str) -> str:
    """The reference's decision procedure, re-derived from message.go."""
    if not (topic.startswith("/") and topic.count("/") >= 4):
        return "invalid_topic"
    try:
        body = json.loads(payload)
    except ValueError:
        return "invalid_json"
    if not isinstance(body, dict):
        # non-object JSON has no "value" key to extract (message.go:70-75
        # unmarshals into a map; non-objects fail there → reject)
        return "invalid_json"
    if "value" not in body or body["value"] is None:
        # json.Unmarshal drops nothing, but the engine models JSON null
        # as "no usable value"; the reference rejects null via the type
        # switch (unsupported) — the engine uses missing_value when the
        # key is absent and unsupported_type when the value is null.
        return "missing_value" if "value" not in body else "unsupported_type"
    v = body["value"]
    if isinstance(v, bool):  # bool before int: bool is an int subclass
        return "unsupported_type"
    if isinstance(v, (int, float)):
        return "Float64"
    if isinstance(v, str):
        return "String"
    return "unsupported_type"


@pytest.mark.slow
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(msgs=st.lists(st.tuples(topics, payloads), min_size=1, max_size=12))
def test_parse_agrees_with_reference_rules(spark, msgs):
    df = spark.createDataFrame(msgs, "topic string, payload string")
    valid, dead = parse_messages(df)
    n_valid, n_dead = valid.count(), dead.count()
    # partition: nothing lost, nothing duplicated
    assert n_valid + n_dead == len(msgs)

    expected_valid = []
    for topic, payload in msgs:
        outcome = expected_outcome(topic, payload)
        if outcome in ("Float64", "String"):
            expected_valid.append((topic, payload, outcome))
    assert n_valid == len(expected_valid)

    got_types = sorted(r["value_type"] for r in valid.collect())
    assert got_types == sorted(t for _, _, t in expected_valid)

    # numeric values survive exactly (float64 round-trip)
    for r in valid.filter("value_type = 'Float64'").collect():
        assert r["value_num"] is not None and math.isfinite(r["value_num"])


# -- Morton interleave properties (zorder_pruning's generated kernel) --------


@settings(deadline=None)
@given(
    qu=st.integers(min_value=0, max_value=255),
    qd=st.integers(min_value=0, max_value=255),
)
def test_morton_interleave_roundtrip(qu, qd):
    """The generated div/mod interleave expression must agree with the
    reference bit-interleave, be invertible, and preserve the quadtree
    prefix property (equal high bits of both dims => equal z-prefix)."""
    from mqtt2clickhouse_spark.queries.layout_queries import (
        _Z_BITS,
        _morton_expr,
    )

    expr = _morton_expr("qu", "qd", "//")
    z = eval(expr, {}, {"qu": qu, "qd": qd})
    # reference interleave: bit i of qu -> bit 2i+1, bit i of qd -> 2i
    zref = 0
    for i in range(_Z_BITS):
        zref |= ((qu >> i) & 1) << (2 * i + 1)
        zref |= ((qd >> i) & 1) << (2 * i)
    assert z == zref
    # invertible: deinterleave recovers both dims
    ru = sum(((z >> (2 * i + 1)) & 1) << i for i in range(_Z_BITS))
    rd = sum(((z >> (2 * i)) & 1) << i for i in range(_Z_BITS))
    assert (ru, rd) == (qu, qd)


@settings(deadline=None)
@given(
    qu=st.integers(min_value=0, max_value=255),
    qd=st.integers(min_value=0, max_value=255),
)
def test_morton_bucket_is_quadtree_cell(qu, qd):
    """Bucketing by the z-code's top 6 bits must equal bucketing by the
    top 3 bits of each dimension — the axis-aligned cell property the
    pruning argument rests on."""
    from mqtt2clickhouse_spark.queries.layout_queries import (
        _Z_BUCKET_DIV,
        _morton_expr,
    )

    z = eval(_morton_expr("qu", "qd", "//"), {}, {"qu": qu, "qd": qd})
    hi_u, hi_d = qu >> 5, qd >> 5
    expect = 0
    for i in range(3):
        expect |= ((hi_u >> i) & 1) << (2 * i + 1)
        expect |= ((hi_d >> i) & 1) << (2 * i)
    assert z // _Z_BUCKET_DIV == expect
