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


def test_wire_dispatch_fuzz_never_dies_silently():
    """Randomized malformed-frame fuzz over the live dispatch (r14
    VERDICT stretch): a broker emitting garbage — bad-UTF-8 topics,
    truncated QoS-1 headers, oversized or malformed remaining lengths,
    reserved packet types, invalid QoS bits — must NEVER kill the loop
    thread silently.  Invariant per episode: either rows flow (the
    trailing valid sentinel PUBLISH is delivered) or ``loop_error`` is
    set; a dead thread with ``loop_error`` unset and nothing delivered
    is the one forbidden state.  A fresh client afterwards must connect
    and receive cleanly — reconnect recovers.  Deterministic seed;
    ≥100 injected frames across 60 episodes."""
    import random

    rng = random.Random(0xF022)

    def valid_publish(qos: int) -> bytes:
        topic = "/t/" + "".join(rng.choices("abc", k=3))
        body = encode_str(topic)
        if qos:
            body += struct.pack(">H", rng.randint(1, 0xFFFF))
        body += bytes(rng.choices(range(256), k=rng.randint(0, 20)))
        return bytes([(PUBLISH << 4) | (qos << 1)]) + encode_varint(len(body)) + body

    def bad_utf8_topic() -> bytes:
        body = b"\x00\x02\xff\xfe" + b"x"
        return bytes([PUBLISH << 4]) + encode_varint(len(body)) + body

    def truncated_qos1() -> bytes:
        # remaining length honestly describes a body that ends before
        # (or inside) the packet id -> struct.error in dispatch
        body = encode_str("t/q") + (b"\x01" if rng.random() < 0.5 else b"")
        return bytes([(PUBLISH << 4) | 0x02]) + encode_varint(len(body)) + body

    def oversize_length() -> bytes:
        # declares a huge body, delivers a sliver; the episode's close
        # then surfaces as ConnectionError mid-packet
        return bytes([PUBLISH << 4]) + encode_varint(rng.randint(500, 5000)) + b"abc"

    def malformed_varint() -> bytes:
        return bytes([PUBLISH << 4]) + b"\xff\xff\xff\xff\xff"

    def reserved_type() -> bytes:
        # type 0 and 15 are reserved; small valid-length body — the
        # dispatch ignores unknown types, benign garbage
        t = rng.choice([0, 15, 5, 6, 7])
        body = bytes(rng.choices(range(256), k=rng.randint(0, 8)))
        return bytes([t << 4]) + encode_varint(len(body)) + body

    def invalid_qos_bits() -> bytes:
        body = encode_str("t/bad") + struct.pack(">H", 7) + b"p"
        return bytes([(PUBLISH << 4) | 0x06]) + encode_varint(len(body)) + body

    shapes = [
        lambda: valid_publish(0),
        lambda: valid_publish(1),
        bad_utf8_topic,
        truncated_qos1,
        oversize_length,
        malformed_varint,
        reserved_type,
        invalid_qos_bits,
    ]

    frames_sent = 0
    delivered_episodes = 0
    error_episodes = 0
    for ep in range(60):
        frames = [shapes[rng.randrange(len(shapes))]() for _ in range(rng.randint(1, 3))]
        sentinel_payload = f"sentinel-{ep}".encode()
        sentinel = encode_str("t/sentinel") + sentinel_payload
        blob = b"".join(frames)
        blob += bytes([PUBLISH << 4]) + encode_varint(len(sentinel)) + sentinel
        frames_sent += len(frames) + 1

        def script(conn, blob=blob):
            conn.sendall(blob)
            conn.close()  # EOF terminates the episode deterministically

        got = []
        (host, port), _ = _serve_once(script)
        c = Client(f"fuzz-{ep}")
        c.on_message = lambda cl, ud, m: got.append(m.payload)
        c.connect(host, port)
        c.loop_start()
        try:
            deadline = time.monotonic() + 10
            while (
                sentinel_payload not in got
                and c.loop_error is None
                and time.monotonic() < deadline
            ):
                time.sleep(0.002)
            alive = c._thread.is_alive()
            assert sentinel_payload in got or c.loop_error is not None or alive, (
                f"episode {ep}: loop thread died SILENTLY after {frames!r} — "
                "no rows, no loop_error"
            )
            assert sentinel_payload in got or c.loop_error is not None, (
                f"episode {ep}: neither rows nor loop_error within deadline"
            )
            if sentinel_payload in got:
                delivered_episodes += 1
            if c.loop_error is not None:
                error_episodes += 1
        finally:
            c.disconnect()
            c.loop_stop()

    assert frames_sent >= 100, frames_sent
    # both regimes must actually have been exercised by the draw
    assert delivered_episodes > 0 and error_episodes > 0, (
        f"fuzz draw degenerate: delivered={delivered_episodes}, "
        f"errors={error_episodes}"
    )

    # reconnect recovers: a fresh client on a clean server delivers
    def clean_script(conn):
        body = encode_str("t/clean") + b"recovered"
        write_packet(conn, PUBLISH, 0, body)
        time.sleep(2)

    (host, port), _ = _serve_once(clean_script)
    got2 = []
    c2 = Client("fuzz-recover")
    c2.on_message = lambda cl, ud, m: got2.append(m.payload)
    c2.connect(host, port)
    c2.loop_start()
    try:
        deadline = time.monotonic() + 5
        while not got2 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert got2 == [b"recovered"] and c2.loop_error is None
    finally:
        c2.disconnect()
        c2.loop_stop()


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
