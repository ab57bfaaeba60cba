"""Minimal MQTT 3.1.1 client over raw sockets — a zero-dependency
fallback transport for ``LiveMqttStreamReader`` when ``paho-mqtt`` is
not installed.

Implements exactly the protocol surface the reference's client uses
(/root/reference/client/client.go:86-137): CONNECT with optional
username/password auth and optional TLS/mTLS, SUBSCRIBE at QoS 1,
inbound PUBLISH delivery (with PUBACK for QoS 1 — the at-least-once
receive path), PINGREQ keepalive, DISCONNECT.  The API mirrors the
``paho.mqtt.client`` subset the reader calls (``Client``,
``username_pw_set``, ``tls_set``, ``connect``, ``subscribe``,
``loop_start``, ``loop_stop``, ``disconnect``, ``on_message``), so the
reader works identically against either library.

Everything here is the public OASIS MQTT 3.1.1 wire format:
- fixed header: 1 control byte (type<<4 | flags) + varint remaining
  length (7 bits per byte, MSB = continuation);
- strings: 2-byte big-endian length + UTF-8 bytes.

Deliberately NOT implemented (out of the reference's scope): outbound
publish, QoS 2, retained messages, wills, session resumption, MQTT 5.
"""

from __future__ import annotations

import socket
import ssl
import struct
import threading
import time

# control packet types (MQTT 3.1.1 §2.2.1)
CONNECT = 1
CONNACK = 2
PUBLISH = 3
PUBACK = 4
SUBSCRIBE = 8
SUBACK = 9
PINGREQ = 12
PINGRESP = 13
DISCONNECT = 14


def encode_varint(n: int) -> bytes:
    """Remaining-length encoding (§2.2.3)."""
    out = bytearray()
    while True:
        byte = n % 128
        n //= 128
        out.append(byte | (0x80 if n else 0))
        if not n:
            return bytes(out)


def encode_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("MQTT peer closed the connection")
        buf += chunk
    return bytes(buf)


def _read_after_head(sock: socket.socket, head: int) -> tuple[int, int, bytes]:
    """Parse remaining length + body once the first header byte is in."""
    length, mult = 0, 1
    for _ in range(4):
        b = _recv_exact(sock, 1)[0]
        length += (b & 0x7F) * mult
        if not (b & 0x80):
            break
        mult *= 128
    else:
        raise ValueError("malformed remaining length")
    body = _recv_exact(sock, length) if length else b""
    return head >> 4, head & 0x0F, body


def read_packet(sock: socket.socket) -> tuple[int, int, bytes]:
    """Read one control packet → (type, flags, body)."""
    return _read_after_head(sock, _recv_exact(sock, 1)[0])


def read_packet_idle(
    sock: socket.socket, idle_timeout: float, io_timeout: float = 30.0
) -> tuple[int, int, bytes] | None:
    """Read one packet, or return None if no packet STARTS within
    ``idle_timeout``.

    The idle timeout applies only to the first fixed-header byte.  Once
    a packet has started, the remainder is read under the long
    ``io_timeout``: a short per-recv timeout firing mid-packet would
    discard the partially read bytes and desynchronize the stream (the
    next read would misparse payload bytes as a fixed header).  A
    timeout after the header byte therefore propagates as a hard
    protocol error rather than being swallowed as idleness.
    """
    sock.settimeout(idle_timeout)
    try:
        first = sock.recv(1)
    except (TimeoutError, socket.timeout):
        return None
    if not first:
        raise ConnectionError("MQTT peer closed the connection")
    sock.settimeout(io_timeout)
    return _read_after_head(sock, first[0])


def write_packet(sock: socket.socket, ptype: int, flags: int, body: bytes) -> None:
    sock.sendall(bytes([(ptype << 4) | flags]) + encode_varint(len(body)) + body)


def parse_str(body: bytes, at: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">H", body, at)
    return body[at + 2 : at + 2 + n].decode("utf-8"), at + 2 + n


class MQTTMessage:
    """The inbound-message shape ``on_message`` receives (paho-compatible
    attribute surface: topic str, payload bytes, qos, mid)."""

    __slots__ = ("topic", "payload", "qos", "mid", "retain")

    def __init__(self, topic: str, payload: bytes, qos: int, mid: int, retain: bool):
        self.topic = topic
        self.payload = payload
        self.qos = qos
        self.mid = mid
        self.retain = retain


class Client:
    """paho-API-compatible minimal MQTT 3.1.1 subscriber client."""

    def __init__(self, client_id: str = "") -> None:
        self._client_id = client_id or f"mqtt2ch-{id(self):x}"
        self._username: str | None = None
        self._password: str | None = None
        self._tls_kwargs: dict | None = None
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._running = False
        self._next_mid = 0
        self._keepalive = 60
        self._lock = threading.Lock()
        #: serializes ALL socket writes: the loop thread's PINGREQ/PUBACK
        #: and an application thread's subscribe()/disconnect() may
        #: otherwise interleave sendall calls (especially over TLS,
        #: where one logical write can span several TLS records) and
        #: corrupt the outbound framing
        self._write_lock = threading.Lock()
        #: set when the network loop thread dies abnormally; checked by
        #: LiveMqttStreamReader.read() so a dead reader surfaces instead
        #: of returning empty batches forever
        self.loop_error: Exception | None = None
        #: last exception raised by the USER's on_message callback —
        #: recorded, never fatal (ADVICE r14: paho logs callback
        #: exceptions and keeps the network loop alive; tearing the
        #: connection down instead would turn one callback bug into
        #: per-message reconnect churn).  The failed QoS-1 message is
        #: NOT PUBACKed, so the broker redelivers it — at-least-once.
        self.callback_error: Exception | None = None
        #: paho-style callback: on_message(client, userdata, MQTTMessage)
        self.on_message = None

    # -- configuration (pre-connect), paho signatures -------------------
    def username_pw_set(self, username: str, password: str | None = None) -> None:
        self._username, self._password = username, password

    def tls_set(
        self,
        ca_certs: str | None = None,
        certfile: str | None = None,
        keyfile: str | None = None,
    ) -> None:
        self._tls_kwargs = {
            "ca_certs": ca_certs,
            "certfile": certfile,
            "keyfile": keyfile,
        }

    # -- connection -----------------------------------------------------
    def connect(self, host: str, port: int = 1883, keepalive: int = 60) -> None:
        """TCP (+ optional TLS) connect, CONNECT/CONNACK handshake.

        Raises ConnectionError on a non-zero CONNACK return code — the
        reference treats a refused connection as fatal
        (client/client.go:115-123)."""
        self._keepalive = keepalive
        sock = socket.create_connection((host, port), timeout=10)
        if self._tls_kwargs is not None:
            ctx = ssl.create_default_context(ssl.Purpose.SERVER_AUTH)
            if self._tls_kwargs["ca_certs"]:
                ctx.load_verify_locations(self._tls_kwargs["ca_certs"])
            if self._tls_kwargs["certfile"]:
                ctx.load_cert_chain(
                    self._tls_kwargs["certfile"], self._tls_kwargs["keyfile"]
                )
            # real verification (hostname included) — the reference's
            # InsecureSkipVerify quirk is deliberately not carried
            sock = ctx.wrap_socket(sock, server_hostname=host)
        flags = 0x02  # clean session
        payload = encode_str(self._client_id)
        if self._username is not None:
            flags |= 0x80
            payload += encode_str(self._username)
            if self._password is not None:
                flags |= 0x40
                payload += encode_str(self._password)
        body = (
            encode_str("MQTT")
            + bytes([0x04, flags])  # protocol level 4 = MQTT 3.1.1
            + struct.pack(">H", keepalive)
            + payload
        )
        write_packet(sock, CONNECT, 0, body)
        ptype, _, ack = read_packet(sock)
        if ptype != CONNACK or len(ack) != 2:
            raise ConnectionError(f"expected CONNACK, got type {ptype}")
        if ack[1] != 0:
            raise ConnectionError(f"MQTT connection refused, return code {ack[1]}")
        self._sock = sock

    def subscribe(self, topic: str, qos: int = 0) -> tuple[int, int]:
        """Send SUBSCRIBE (async — SUBACK is consumed by the loop
        thread, paho's model).  Returns (rc, mid) like paho."""
        with self._lock:
            self._next_mid = (self._next_mid % 0xFFFF) + 1
            mid = self._next_mid
        body = struct.pack(">H", mid) + encode_str(topic) + bytes([qos])
        self._send(SUBSCRIBE, 0x02, body)
        return 0, mid

    def _send(self, ptype: int, flags: int, body: bytes) -> None:
        with self._write_lock:
            write_packet(self._sock, ptype, flags, body)

    # -- network loop ----------------------------------------------------
    def loop_start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        sock = self._sock
        last_ping = time.monotonic()
        while self._running:
            if time.monotonic() - last_ping > max(1, self._keepalive // 2):
                try:
                    self._send(PINGREQ, 0, b"")
                except OSError as exc:
                    self._loop_died(exc)
                    break
                last_ping = time.monotonic()
            try:
                # 0.5s idle timeout on the FIRST header byte only; a
                # started packet reads to completion under a long
                # timeout, so a slow multi-segment PUBLISH can never
                # desynchronize the stream (read_packet_idle docstring)
                pkt = read_packet_idle(sock, idle_timeout=0.5)
            except (OSError, ConnectionError, ValueError) as exc:
                self._loop_died(exc)
                break
            if pkt is None:
                continue
            # the dispatch below must NEVER die silently: a malformed
            # PUBLISH body (UnicodeDecodeError from the topic,
            # struct.error from a missing packet id — NOT a ValueError
            # subclass) previously escaped the read try above, killed
            # the thread without setting loop_error, and left the reader
            # returning empty batches forever — the exact state
            # loop_error exists to surface.  Catch-all here, route to
            # _loop_died, exit; the reader's reconnect-on-read path
            # takes over.  A raising USER callback is the one
            # non-fatal case — see the inner try.
            try:
                ptype, flags, body = pkt
                if ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    topic, at = parse_str(body, 0)
                    mid = 0
                    if qos:
                        (mid,) = struct.unpack_from(">H", body, at)
                        at += 2
                    msg = MQTTMessage(
                        topic, body[at:], qos, mid, bool(flags & 0x01)
                    )
                    delivered = True
                    if self.on_message is not None:
                        # callback first, then PUBACK: an unprocessed
                        # QoS-1 message is redelivered — at-least-once
                        try:
                            self.on_message(self, None, msg)
                        except Exception as exc:  # noqa: BLE001
                            # paho semantics (ADVICE r14): record and
                            # keep the loop alive — a callback bug must
                            # not become per-message reconnect churn
                            self.callback_error = exc
                            delivered = False
                    if qos == 1 and delivered:
                        self._send(PUBACK, 0, struct.pack(">H", mid))
                # SUBACK / PINGRESP need no action
            except Exception as exc:  # noqa: BLE001 - see comment above
                self._loop_died(exc)
                break

    def _loop_died(self, exc: Exception) -> None:
        # an error after loop_stop()/disconnect() began tearing the
        # socket down is expected shutdown noise, not a failure
        if self._running:
            self.loop_error = exc

    def loop_stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)

    def disconnect(self) -> None:
        self._running = False
        if self._sock is not None:
            try:
                self._send(DISCONNECT, 0, b"")
            except OSError:
                pass
            try:
                self._sock.close()
            finally:
                self._sock = None
