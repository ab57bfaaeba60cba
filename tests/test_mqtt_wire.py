"""Property tests for the built-in MQTT 3.1.1 wire codec
(mqtt2clickhouse_spark/streaming/mqtt_wire.py) — the encode/decode pair
must round-trip arbitrary inputs, because a codec bug here silently
corrupts the live ingest path.

The OASIS spec's remaining-length encoding caps packets at 268,435,455
bytes (4 varint bytes); hypothesis drives the full domain.
"""

from __future__ import annotations

import socket
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from mqtt2clickhouse_spark.streaming.mqtt_wire import (
    PUBLISH,
    encode_str,
    encode_varint,
    parse_str,
    read_packet,
    write_packet,
)
from mqtt_test_broker import topic_matches

MAX_REMAINING = 268_435_455  # 4-byte varint ceiling (MQTT 3.1.1 §2.2.3)


def _decode_varint(b: bytes) -> tuple[int, int]:
    n, mult = 0, 1
    for i, byte in enumerate(b):
        n += (byte & 0x7F) * mult
        if not (byte & 0x80):
            return n, i + 1
        mult *= 128
    raise ValueError("unterminated varint")


@given(st.integers(min_value=0, max_value=MAX_REMAINING))
def test_varint_roundtrip(n):
    enc = encode_varint(n)
    assert 1 <= len(enc) <= 4
    dec, used = _decode_varint(enc)
    assert dec == n and used == len(enc)
    # spec: minimal encoding — no gratuitous continuation bytes
    if n < 128:
        assert len(enc) == 1


@given(st.integers(min_value=0, max_value=MAX_REMAINING))
def test_varint_is_order_preserving_in_length(n):
    # 7 bits per byte: length is exactly ceil(bits/7)
    enc = encode_varint(n)
    expected_len = 1 if n == 0 else -(-n.bit_length() // 7)
    assert len(enc) == expected_len


@given(st.text(max_size=200))
def test_string_roundtrip(s):
    b = encode_str(s)
    (ln,) = struct.unpack_from(">H", b, 0)
    assert ln == len(s.encode("utf-8"))
    out, at = parse_str(b, 0)
    assert out == s and at == len(b)


@settings(max_examples=25, deadline=None)
@given(
    topic=st.text(
        alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0x2FF),
        min_size=1,
        max_size=60,
    ),
    payload=st.binary(max_size=500),
    qos=st.integers(min_value=0, max_value=1),
    mid=st.integers(min_value=1, max_value=0xFFFF),
)
def test_publish_packet_roundtrips_over_a_real_socket(topic, payload, qos, mid):
    """Full packet framing over an actual socketpair: header byte,
    varint length, topic string, optional packet id, raw payload."""
    a, b = socket.socketpair()
    try:
        body = encode_str(topic)
        if qos:
            body += struct.pack(">H", mid)
        body += payload
        write_packet(a, PUBLISH, qos << 1, body)
        ptype, flags, got = read_packet(b)
        assert ptype == PUBLISH and flags == qos << 1
        t, at = parse_str(got, 0)
        assert t == topic
        if qos:
            (m,) = struct.unpack_from(">H", got, at)
            assert m == mid
            at += 2
        assert got[at:] == payload
    finally:
        a.close()
        b.close()


@given(
    parts=st.lists(
        st.text(alphabet="abcz09", min_size=1, max_size=3), min_size=1, max_size=5
    )
)
def test_topic_matches_properties(parts):
    topic = "/".join(parts)
    # exact filter always matches itself
    assert topic_matches(topic, topic)
    # '#' at any prefix depth matches
    for i in range(len(parts)):
        assert topic_matches("/".join(parts[:i] + ["#"]), topic)
    # '+' substituted at any single level matches
    for i in range(len(parts)):
        f = parts.copy()
        f[i] = "+"
        assert topic_matches("/".join(f), topic)
    # a filter one level deeper never matches
    assert not topic_matches(topic + "/x", topic)
    # a mismatched literal level never matches
    f = parts.copy()
    f[0] = f[0] + "zz"
    assert not topic_matches("/".join(f), topic)


# ---------------------------------------------------------------------------
# network-loop robustness (ADVICE r6): a packet that arrives in several
# TCP segments slower than the idle poll interval must still parse — a
# per-recv timeout firing mid-packet used to discard the partial bytes
# and desynchronize the stream; and a loop-thread death must SURFACE
# via Client.loop_error instead of a silent break.
# ---------------------------------------------------------------------------

import threading
import time

from mqtt2clickhouse_spark.streaming.mqtt_wire import (
    CONNACK,
    Client,
    read_packet_idle,
)


def _serve_once(script):
    """Accept one client, answer the CONNECT handshake, run ``script``
    on the raw connection, return (host, port, done_event)."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    done = threading.Event()

    def run():
        try:
            conn, _ = srv.accept()
            read_packet(conn)  # CONNECT
            conn.sendall(bytes([CONNACK << 4, 2, 0, 0]))  # CONNACK rc=0
            script(conn)
        finally:
            done.set()
            srv.close()

    threading.Thread(target=run, daemon=True).start()
    return srv.getsockname(), done


def test_slow_multisegment_publish_does_not_desync():
    """A PUBLISH trickling in over >2x the 0.5s idle poll interval is
    parsed whole, and the NEXT packet on the stream still parses — the
    regression this guards against misread payload bytes as a fixed
    header after the partial read was discarded."""
    body1 = encode_str("t/slow") + b"x" * 40
    pkt1 = bytes([PUBLISH << 4]) + encode_varint(len(body1)) + body1
    body2 = encode_str("t/next") + b"y"

    def script(conn):
        conn.sendall(pkt1[:2])       # header byte + part of the varint/topic
        time.sleep(0.8)              # > idle timeout, mid-packet
        conn.sendall(pkt1[2:20])
        time.sleep(0.8)
        conn.sendall(pkt1[20:])
        write_packet(conn, PUBLISH, 0, body2)  # stream must still be in sync
        time.sleep(3)                # hold the socket open while we assert

    (host, port), _ = _serve_once(script)
    got = []
    c = Client("t-slow")
    c.on_message = lambda cl, ud, m: got.append((m.topic, m.payload))
    c.connect(host, port)
    c.loop_start()
    try:
        deadline = time.monotonic() + 8
        while len(got) < 2 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert got == [("t/slow", b"x" * 40), ("t/next", b"y")]
        assert c.loop_error is None
    finally:
        c.loop_stop()
        c.disconnect()


def test_loop_death_surfaces_as_loop_error():
    """Peer closing mid-packet kills the loop thread — the failure must
    land in Client.loop_error (checked by LiveMqttStreamReader.read()),
    not vanish in a bare break."""

    def script(conn):
        conn.sendall(bytes([PUBLISH << 4, 30]) + b"partial")  # 30-byte body, 7 sent
        conn.close()

    (host, port), _ = _serve_once(script)
    c = Client("t-dead")
    c.connect(host, port)
    c.loop_start()
    try:
        deadline = time.monotonic() + 5
        while c.loop_error is None and time.monotonic() < deadline:
            time.sleep(0.05)
        assert isinstance(c.loop_error, (ConnectionError, OSError))
    finally:
        c.loop_stop()


def test_read_packet_idle_returns_none_only_when_no_byte_arrived():
    a, b = socket.socketpair()
    try:
        assert read_packet_idle(b, idle_timeout=0.1) is None  # pure idle
        body = encode_str("t") + b"z"
        write_packet(a, PUBLISH, 0, body)
        assert read_packet_idle(b, idle_timeout=0.1) == (PUBLISH, 0, body)
    finally:
        a.close()
        b.close()
