"""MQTT wire protocol, stdlib-only (r8, v5 added r9): a minimal client
plus an in-process broker speaking the PUBLIC MQTT packet format
(mqtt.org / OASIS 3.1.1 and 5.0 specs), so ConsumeMQTT/PublishMQTT
EXECUTE over real TCP in environments without paho-mqtt — the same
move as sources/kafka_wire.py for Kafka:

- CONNECT/CONNACK (with Last Will), SUBSCRIBE/SUBACK (wildcard filters
  ``+`` and ``#``, retained-message replay), PUBLISH (QoS 0/1/2 —
  PUBACK at 1, the PUBREC/PUBREL/PUBCOMP exactly-once handshake at 2 —
  and the retain flag), PINGREQ/PINGRESP, DISCONNECT; remaining-length
  varints and UTF-8 length-prefixed strings per the
  fixed/variable-header layout.
- Protocol level 4 (3.1.1) AND level 5: the broker detects the level
  from CONNECT and speaks it back per-connection (v5 adds the
  properties field to CONNECT/CONNACK/SUBSCRIBE/SUBACK/PUBLISH/PUBACK);
  the client takes ``protocol_level=4|5``, a v5 ``session_expiry``
  interval (property 0x11), and v5 PUBLISH user properties (0x26),
  which the broker passes through to v5 subscribers — parity target
  /root/reference/extensions/mqtt/processors/AbstractMQTTProcessor.cpp:257
  (the reference supports MQTT 3.x and 5 with session-expiry/properties).
- The broker routes live PUBLISHes to every matching subscription
  (delivery at QoS 0 — acknowledged-redelivery machinery is a real
  broker's job; the reference's subscription QoS is the MAXIMUM
  delivery level, so downgrade is spec-legal), holds a retained-message
  map (latest per topic, replayed with retain=1 on SUBSCRIBE, empty
  payload deletes), tracks QoS-2 inbound packet ids for exactly-once
  admission, and publishes a connection's Last Will on abnormal close.
  All writes to one connection's socket serialize under its
  per-connection lock (the handler thread and routing threads share it).
- The client is synchronous with a RESUMABLE buffered reader (r10):
  partial packets survive read timeouts in ``_rxbuf``, so keepalive
  pacing can never desynchronize the stream mid-packet. PUBLISHes that
  arrive while waiting for an ack queue up and drain via
  ``recv_message``. ``recv_message(timeout=None)`` BLOCKS — ``None``
  then means EOF, surfaced via ``client.eof``, never a silent idle-gap
  timeout. Publisher-only clients honor the keepalive contract too:
  ``publish()`` emits a PINGREQ when the write gap exceeds keepalive/2.

Spec conformance notes: a remaining-length varint whose 4th byte still
has the continuation bit set is a protocol error (connection closed,
``MqttProtocolError``), and a ``#`` wildcard is only honored as the
final filter segment (non-final ``#`` filters are rejected at
SUBSCRIBE with the 0x80 failure return code).

Interop against a real broker (mosquitto et al.) remains a
cluster-side action — this removes the "paho-gated, never executed"
caveat, not the interop one.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from collections import deque

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
PUBREC, PUBREL, PUBCOMP = 5, 6, 7
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14

PROP_SESSION_EXPIRY = 0x11
PROP_USER_PROPERTY = 0x26


class MqttProtocolError(ValueError):
    """Malformed packet on the wire (spec-mandated connection close)."""


def _encode_remaining(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _utf8(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([ptype << 4 | flags]) + _encode_remaining(len(body)) + body


def _read_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = bytearray()
    while len(buf) < n:
        c = sock.recv(n - len(buf))
        if not c:
            return None
        buf += c
    return bytes(buf)


def _read_packet(sock: socket.socket) -> tuple[int, int, bytes] | None:
    """-> (type, flags, body) or None on EOF; MqttProtocolError on a
    malformed remaining-length varint (>4 continuation bytes)."""
    h = _read_exact(sock, 1)
    if h is None:
        return None
    ptype, flags = h[0] >> 4, h[0] & 0x0F
    n = 0
    mult = 1
    for i in range(4):
        b = _read_exact(sock, 1)
        if b is None:
            return None
        n += (b[0] & 0x7F) * mult
        if not b[0] & 0x80:
            break
        if i == 3:
            # 4th byte still has the continuation bit: spec 2.2.3 says
            # this is a malformed packet -> protocol error, close.
            raise MqttProtocolError("remaining-length varint exceeds 4 bytes")
        mult *= 128
    body = _read_exact(sock, n) if n else b""
    if body is None:
        return None
    return ptype, flags, body


def _parse_buffered(buf: bytearray) -> tuple[int, int, bytes, int] | None:
    """Try to parse ONE complete packet from the front of ``buf`` ->
    (type, flags, body, bytes_consumed), or None if the buffer holds
    only a partial packet (caller recv()s more and retries — this is
    what makes the client reader RESUMABLE: a read timeout mid-packet
    leaves the partial bytes buffered instead of desynchronizing the
    stream). MqttProtocolError on a malformed remaining-length varint."""
    if not buf:
        return None
    ptype, flags = buf[0] >> 4, buf[0] & 0x0F
    n = 0
    mult = 1
    pos = 1
    for i in range(4):
        if pos >= len(buf):
            return None
        b = buf[pos]
        pos += 1
        n += (b & 0x7F) * mult
        if not b & 0x80:
            break
        if i == 3:
            raise MqttProtocolError("remaining-length varint exceeds 4 bytes")
        mult *= 128
    if len(buf) < pos + n:
        return None
    return ptype, flags, bytes(buf[pos : pos + n]), pos + n


def _read_varint(body: bytes, pos: int) -> tuple[int, int]:
    """Decode an in-body varint (v5 property length) -> (value, new_pos).
    Truncation raises MqttProtocolError, never IndexError — parse
    failures must stay inside the protocol-error handling paths."""
    n = 0
    mult = 1
    for i in range(4):
        if pos >= len(body):
            raise MqttProtocolError("truncated varint in packet body")
        b = body[pos]
        pos += 1
        n += (b & 0x7F) * mult
        if not b & 0x80:
            return n, pos
        if i == 3:
            raise MqttProtocolError("property-length varint exceeds 4 bytes")
        mult *= 128
    return n, pos


def _encode_user_props(props: dict[str, str] | None) -> bytes:
    """v5 property block bytes for a set of user properties (0x26)."""
    if not props:
        return b""
    out = bytearray()
    for k, v in props.items():
        out.append(PROP_USER_PROPERTY)
        out += _utf8(k) + _utf8(v)
    return bytes(out)


def _parse_props(raw: bytes) -> tuple[list[tuple[str, str]], int | None]:
    """Parse a v5 property block -> (user_properties, session_expiry).
    Unknown one/two/four-byte and string properties are skipped by id.
    Any truncated/malformed block raises MqttProtocolError (converted
    from struct/index errors) so it flows through the same
    connection-close handling as every other protocol error."""
    try:
        return _parse_props_inner(raw)
    except MqttProtocolError:
        raise
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise MqttProtocolError(f"malformed v5 property block: {e}") from e


def _parse_props_inner(raw: bytes) -> tuple[list[tuple[str, str]], int | None]:
    user: list[tuple[str, str]] = []
    expiry: int | None = None
    pos = 0
    while pos < len(raw):
        pid = raw[pos]
        pos += 1
        if pid == PROP_USER_PROPERTY:
            (ln,) = struct.unpack_from(">H", raw, pos)
            k = raw[pos + 2 : pos + 2 + ln].decode()
            pos += 2 + ln
            (ln,) = struct.unpack_from(">H", raw, pos)
            v = raw[pos + 2 : pos + 2 + ln].decode()
            pos += 2 + ln
            user.append((k, v))
        elif pid == PROP_SESSION_EXPIRY:
            (expiry,) = struct.unpack_from(">I", raw, pos)
            pos += 4
        elif pid in (0x01, 0x17, 0x19, 0x24, 0x25, 0x28, 0x29, 0x2A):  # byte
            pos += 1
        elif pid in (0x13, 0x21, 0x22, 0x23):  # two-byte int
            pos += 2
        elif pid in (0x02, 0x18, 0x27):  # four-byte int
            pos += 4
        elif pid in (0x08, 0x12, 0x15, 0x1A, 0x1C, 0x1F, 0x03):  # UTF-8 str
            (ln,) = struct.unpack_from(">H", raw, pos)
            pos += 2 + ln
        elif pid in (0x09, 0x16):  # binary data
            (ln,) = struct.unpack_from(">H", raw, pos)
            pos += 2 + ln
        elif pid == 0x0B:  # subscription identifier: varint
            _, pos = _read_varint(raw, pos)
        else:
            raise MqttProtocolError(f"unknown property id 0x{pid:02x}")
    return user, expiry


def filter_valid(filt: str) -> bool:
    """Spec 4.7.1: ``#`` must be the last segment and occupy a whole
    level; ``+`` must occupy a whole level."""
    if not filt:
        return False
    parts = filt.split("/")
    for i, p in enumerate(parts):
        if "#" in p and (p != "#" or i != len(parts) - 1):
            return False
        if "+" in p and p != "+":
            return False
    return True


def topic_matches(filt: str, topic: str) -> bool:
    """Wildcard matching: ``+`` one level, ``#`` the rest (final
    segment only — an illegal non-final ``#`` never matches)."""
    if not filter_valid(filt):
        return False
    fp, tp = filt.split("/"), topic.split("/")
    for i, f in enumerate(fp):
        if f == "#":
            return True
        if i >= len(tp):
            return False
        if f != "+" and f != tp[i]:
            return False
    return len(fp) == len(tp)


class _Conn:
    """Broker-side connection state: socket + filters + write lock +
    negotiated protocol level (4 or 5)."""

    def __init__(self, sock: socket.socket, level: int):
        self.sock = sock
        self.filters: list[str] = []
        self.lock = threading.Lock()
        self.level = level
        self.session_expiry: int | None = None
        # QoS-2 exactly-once receive state: packet ids PUBLISHed to us
        # that we have PUBRECed but not yet seen the PUBREL for. A DUP
        # redelivery of a pending pid is acked again but NOT re-routed.
        self.qos2_pending: set[int] = set()
        # Last Will: (topic, payload, retain) published on ABNORMAL
        # disconnect (EOF/protocol error), discarded on clean DISCONNECT.
        self.will: tuple[str, bytes, bool] | None = None

    def send(self, pkt: bytes) -> None:
        # ALL writes to this socket (acks from the handler thread AND
        # routed PUBLISHes from other handlers' threads) serialize here.
        with self.lock:
            self.sock.sendall(pkt)


class MiniMqttBroker:
    """In-process MQTT broker: CONNECT handshake (levels 4 and 5, with
    Last Will), wildcard subscriptions, QoS 0/1/2 publish (PUBACK /
    PUBREC-PUBREL-PUBCOMP to the publisher, QoS-0 fan-out to
    subscribers — downgrade to the granted QoS is spec-legal), retained
    messages (stored per topic, replayed on SUBSCRIBE with the retain
    flag set; an empty retained payload deletes), ping, disconnect. v5
    PUBLISH properties are passed through to v5 subscribers. Parity:
    /root/reference/PROCESSORS.md:338,343 (ConsumeMQTT/PublishMQTT
    expose QoS 0-2, Last Will and retain on both processors)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._subs_lock = threading.Lock()
        self._subs: dict[int, _Conn] = {}
        self._retained: dict[str, tuple[bytes, bytes]] = {}  # topic -> (payload, v5 props)
        self._next_id = 0
        self.published: list[tuple[str, bytes]] = []  # fixture visibility
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                try:
                    first = _read_packet(sock)
                except MqttProtocolError:
                    return
                if first is None or first[0] != CONNECT:
                    return
                body = first[2]
                # The CONNECT variable-header/payload parse sits inside
                # the same except-and-close net as every other packet: a
                # truncated CONNECT must follow the spec's silent-close
                # path, not raise into socketserver's per-connection
                # traceback printer.
                try:
                    # variable header: proto name (len-prefixed), level,
                    # flags, keepalive [, v5 properties]
                    (nlen,) = struct.unpack_from(">H", body, 0)
                    level = body[2 + nlen]
                    cflags = body[2 + nlen + 1]
                    pos = 2 + nlen + 1 + 1 + 2  # level + flags + keepalive
                    conn = _Conn(sock, level)
                    if level >= 5:
                        plen, pos = _read_varint(body, pos)
                        _, conn.session_expiry = _parse_props(body[pos : pos + plen])
                        connack = b"\x00\x00\x00"  # flags, reason, empty props
                    else:
                        connack = b"\x00\x00"
                    # payload: client id [, will props (v5), will topic,
                    # will payload] — flag bit 2 = Will, bits 3-4 = Will
                    # QoS, bit 5 = Will Retain (spec 3.1.2)
                    (ln,) = struct.unpack_from(">H", body, pos)
                    pos += 2 + ln  # client id (unused by this broker)
                    if cflags & 0x04:
                        if level >= 5:
                            plen, pos = _read_varint(body, pos)
                            pos += plen  # will properties: skipped
                        (ln,) = struct.unpack_from(">H", body, pos)
                        wtopic = body[pos + 2 : pos + 2 + ln].decode()
                        pos += 2 + ln
                        (ln,) = struct.unpack_from(">H", body, pos)
                        wpayload = body[pos + 2 : pos + 2 + ln]
                        pos += 2 + ln
                        conn.will = (wtopic, wpayload, bool(cflags & 0x20))
                except (MqttProtocolError, struct.error, IndexError, UnicodeDecodeError):
                    return  # spec: close on a malformed CONNECT
                with broker._subs_lock:
                    broker._next_id += 1
                    my_id = broker._next_id
                    broker._subs[my_id] = conn
                # CONNACK send sits INSIDE the try: a peer that RSTs
                # right after CONNECT must still hit the finally (conn
                # deregistered, Last Will published) instead of leaking
                # a dead _Conn in broker._subs (r10 review finding).
                try:
                    conn.send(_packet(CONNACK, 0, connack))
                    while True:
                        pkt = _read_packet(sock)
                        if pkt is None:
                            return
                        ptype, flags, body = pkt
                        if ptype == SUBSCRIBE:
                            (pid,) = struct.unpack_from(">H", body, 0)
                            pos = 2
                            if level >= 5:
                                plen, pos = _read_varint(body, pos)
                                pos += plen
                            granted = bytearray()
                            filters = []
                            while pos < len(body):
                                (ln,) = struct.unpack_from(">H", body, pos)
                                pos += 2
                                f = body[pos : pos + ln].decode()
                                pos += ln
                                qos = body[pos] & 0x03
                                pos += 1
                                if filter_valid(f):
                                    filters.append(f)
                                    granted.append(min(qos, 1))
                                else:
                                    granted.append(0x80)  # spec: failure code
                            with broker._subs_lock:
                                conn.filters.extend(filters)
                                retained = list(broker._retained.items())
                            suback = struct.pack(">H", pid)
                            if level >= 5:
                                suback += b"\x00"  # empty properties
                            conn.send(_packet(SUBACK, 0, suback + bytes(granted)))
                            # spec 3.3.1.3: retained messages matching a
                            # NEW subscription are sent with retain=1
                            for rtopic, (rpayload, rprops) in retained:
                                if any(topic_matches(f, rtopic) for f in filters):
                                    conn.send(
                                        _packet(PUBLISH, 0x01, broker._publish_body(conn, rtopic, rpayload, rprops))
                                    )
                        elif ptype == PUBLISH:
                            qos = (flags >> 1) & 0x03
                            retain = bool(flags & 0x01)
                            (ln,) = struct.unpack_from(">H", body, 0)
                            topic = body[2 : 2 + ln].decode()
                            pos = 2 + ln
                            if qos:
                                (pid,) = struct.unpack_from(">H", body, pos)
                                pos += 2
                            props = b""
                            if level >= 5:
                                plen, pos = _read_varint(body, pos)
                                props = body[pos : pos + plen]
                                pos += plen
                            payload = body[pos:]
                            if qos == 2:
                                # exactly-once receive: route only the
                                # FIRST delivery of this packet id; a DUP
                                # redelivery before PUBREL re-acks only.
                                first_seen = pid not in conn.qos2_pending
                                conn.qos2_pending.add(pid)
                                if first_seen:
                                    broker._accept(topic, payload, props, retain)
                                conn.send(_packet(PUBREC, 0, struct.pack(">H", pid)))
                            else:
                                # accept BEFORE acking: PUBACK confirms
                                # the broker has taken the message —
                                # ack-first let a client observe its
                                # acked publish as not-yet-delivered
                                # (raced the fixture's published list
                                # under load; real brokers persist
                                # before acking for the same reason)
                                broker._accept(topic, payload, props, retain)
                                if qos == 1:
                                    conn.send(_packet(PUBACK, 0, struct.pack(">H", pid)))
                        elif ptype == UNSUBSCRIBE:
                            (pid,) = struct.unpack_from(">H", body, 0)
                            pos = 2
                            if level >= 5:
                                plen, pos = _read_varint(body, pos)
                                pos += plen
                            removed = []
                            while pos < len(body):
                                (ln,) = struct.unpack_from(">H", body, pos)
                                pos += 2
                                removed.append(body[pos : pos + ln].decode())
                                pos += ln
                            with broker._subs_lock:
                                conn.filters = [f for f in conn.filters if f not in removed]
                            unsuback = struct.pack(">H", pid)
                            if level >= 5:
                                # v5: props byte + a 0x00 (success) reason
                                # per filter; v4 UNSUBACK has no payload
                                unsuback += b"\x00" + b"\x00" * len(removed)
                            conn.send(_packet(UNSUBACK, 0, unsuback))
                        elif ptype == PUBREL:
                            (pid,) = struct.unpack_from(">H", body, 0)
                            conn.qos2_pending.discard(pid)
                            conn.send(_packet(PUBCOMP, 0, struct.pack(">H", pid)))
                        elif ptype == PINGREQ:
                            conn.send(_packet(PINGRESP, 0, b""))
                        elif ptype == DISCONNECT:
                            conn.will = None  # clean close: will discarded
                            return
                except (MqttProtocolError, struct.error, IndexError, UnicodeDecodeError):
                    return  # spec: close the connection on malformed packets
                except OSError:
                    # peer vanished mid-handshake (CONNACK/SUBACK/ack
                    # send on a reset socket): abnormal close — the
                    # finally fires the will; no socketserver traceback
                    return
                finally:
                    with broker._subs_lock:
                        broker._subs.pop(my_id, None)
                    if conn.will is not None:
                        # abnormal disconnect (EOF / protocol error /
                        # keepalive-style drop): publish the Last Will
                        wtopic, wpayload, wretain = conn.will
                        broker._accept(wtopic, wpayload, b"", wretain)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @staticmethod
    def _publish_body(conn: _Conn, topic: str, payload: bytes, props: bytes) -> bytes:
        # QoS-0 delivery: no packet id; v5 subscribers get the
        # publisher's property block passed through verbatim.
        if conn.level >= 5:
            return _utf8(topic) + _encode_remaining(len(props)) + props + payload
        return _utf8(topic) + payload

    def _accept(self, topic: str, payload: bytes, props: bytes, retain: bool = False) -> None:
        """Admit one inbound message: record, update the retained map
        (spec 3.3.1.3: empty retained payload DELETES the retained
        message and is not stored), fan out to live subscribers."""
        self.published.append((topic, payload))
        if retain:
            with self._subs_lock:
                if payload:
                    self._retained[topic] = (payload, props)
                else:
                    self._retained.pop(topic, None)
        self._route(topic, payload, props)

    def _route(self, topic: str, payload: bytes, props: bytes = b"") -> None:
        with self._subs_lock:
            targets = [
                c
                for c in self._subs.values()
                if any(topic_matches(f, topic) for f in c.filters)
            ]
        for conn in targets:
            try:
                conn.send(_packet(PUBLISH, 0, self._publish_body(conn, topic, payload, props)))
            except OSError:
                pass  # subscriber went away; its handler cleans up

    @property
    def subscription_filters(self) -> list[str]:
        """Active filters across connections (lets fixtures wait for a
        subscriber before publishing — no retained-message machinery)."""
        with self._subs_lock:
            return [f for c in self._subs.values() for f in c.filters]

    @property
    def session_expiries(self) -> list[int]:
        """v5 session-expiry intervals across live connections."""
        with self._subs_lock:
            return [c.session_expiry for c in self._subs.values() if c.session_expiry is not None]

    def publish(self, topic: str, payload: bytes, retain: bool = False) -> None:
        """Broker-side injection (fixture path, no client needed)."""
        self._accept(topic, payload, b"", retain)

    def start(self) -> "MiniMqttBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        # Drop live connections too: clients blocked in a read get EOF
        # instead of hanging on a half-dead broker.
        with self._subs_lock:
            conns = list(self._subs.values())
        for c in conns:
            try:
                c.sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                c.sock.close()
            except OSError:
                pass

    @property
    def address(self) -> str:
        return f"tcp://{self.host}:{self.port}"


_READ_TIMEOUT = object()  # sentinel: buffered read hit its deadline


class MqttWireClient:
    """Synchronous client (levels 4 and 5): connect (optionally with a
    Last Will)/subscribe/publish(QoS 0|1|2, retain)/recv_message.
    PUBLISHes arriving while an ack is awaited are buffered. Not
    thread-safe.

    All reads go through a RESUMABLE buffered reader: a read timeout
    mid-packet (header byte arrived, body delayed past the keepalive
    pacing interval) leaves the partial bytes in ``self._rxbuf`` and the
    next read resumes where it left off — the stream can never
    desynchronize into bogus fixed headers.

    ``recv_message(timeout=None)`` blocks until a PUBLISH or EOF —
    ``None`` with ``self.eof`` set means the connection closed; ``None``
    with ``eof`` unset means the given finite timeout elapsed."""

    def __init__(
        self,
        broker: str,
        client_id: str = "nifi-minifi-cpp-spark",
        timeout: float = 10.0,
        protocol_level: int = 4,
        session_expiry: int | None = None,
        keepalive: int = 60,
        will_topic: str | None = None,
        will_payload: bytes = b"",
        will_qos: int = 0,
        will_retain: bool = False,
    ):
        addr = broker.removeprefix("tcp://")
        host, _, port = addr.partition(":")
        self._sock = socket.create_connection((host, int(port or 1883)), timeout=timeout)
        self._rxbuf = bytearray()
        self._inbox: deque[tuple[str, bytes, list[tuple[str, str]]]] = deque()
        self._pid = 0
        self._ack_timeout = timeout
        self.level = protocol_level
        self.keepalive = max(int(keepalive), 1)
        self.eof = False
        self.last_publish_properties: list[tuple[str, str]] = []
        import time as _time

        self._last_write = _time.monotonic()
        cflags = 0x02  # clean session
        will = b""
        if will_topic is not None:
            # spec 3.1.2: bit 2 = Will, bits 3-4 = Will QoS, bit 5 = retain
            cflags |= 0x04 | ((will_qos & 0x03) << 3) | (0x20 if will_retain else 0)
            if protocol_level >= 5:
                will += b"\x00"  # empty will properties
            will += _utf8(will_topic) + struct.pack(">H", len(will_payload)) + will_payload
        if protocol_level >= 5:
            props = bytearray()
            if session_expiry is not None:
                props.append(PROP_SESSION_EXPIRY)
                props += struct.pack(">I", session_expiry)
            body = (
                _utf8("MQTT")
                + b"\x05"
                + bytes([cflags])
                + struct.pack(">H", self.keepalive)
                + _encode_remaining(len(props))
                + bytes(props)
                + _utf8(client_id)
                + will
            )
        else:
            body = (
                _utf8("MQTT")
                + b"\x04"
                + bytes([cflags])
                + struct.pack(">H", self.keepalive)
                + _utf8(client_id)
                + will
            )
        self._send(_packet(CONNECT, 0, body))
        pkt = self._wait_for(CONNACK)
        if pkt is None or pkt[2][1] != 0:
            raise ConnectionError("MQTT CONNACK refused")

    def _send(self, pkt: bytes) -> None:
        import time as _time

        self._sock.sendall(pkt)
        self._last_write = _time.monotonic()

    def _keepalive_tick(self) -> None:
        """Publisher-side keepalive: a client that only WRITES (the
        PublishMQTT path) never enters recv_message's paced read loop,
        so a real broker would drop it after 1.5x keepalive of silence.
        Emit a PINGREQ before a write whenever the write gap exceeds
        keepalive/2 (the PINGRESP is skipped by _wait_for/recv_message)."""
        import time as _time

        if _time.monotonic() - self._last_write > self.keepalive / 2.0:
            self._send(_packet(PINGREQ, 0, b""))

    def _read_pkt(self, timeout: float | None):
        """One packet from the buffered stream. Returns (type, flags,
        body), None on EOF, or _READ_TIMEOUT when ``timeout`` elapses
        with no COMPLETE packet (partial bytes stay buffered)."""
        import time as _time

        deadline = None if timeout is None else _time.monotonic() + timeout
        while True:
            got = _parse_buffered(self._rxbuf)
            if got is not None:
                del self._rxbuf[: got[3]]
                return got[0], got[1], got[2]
            if deadline is None:
                self._sock.settimeout(None)
            else:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    return _READ_TIMEOUT
                self._sock.settimeout(remaining)
            try:
                chunk = self._sock.recv(65536)
            except (TimeoutError, socket.timeout):
                return _READ_TIMEOUT
            if not chunk:
                return None
            self._rxbuf += chunk

    def _parse_publish(self, flags: int, body: bytes) -> tuple[str, bytes, list[tuple[str, str]]]:
        try:
            (ln,) = struct.unpack_from(">H", body, 0)
            topic = body[2 : 2 + ln].decode()
            qos = (flags >> 1) & 0x03
            pos = 2 + ln + (2 if qos else 0)
            user: list[tuple[str, str]] = []
            if self.level >= 5:
                plen, pos = _read_varint(body, pos)
                user, _ = _parse_props(body[pos : pos + plen])
                pos += plen
            return topic, body[pos:], user
        except MqttProtocolError:
            raise
        except (struct.error, IndexError, UnicodeDecodeError) as e:
            raise MqttProtocolError(f"malformed PUBLISH body: {e}") from e

    def _wait_for(self, want_type: int):
        while True:
            pkt = self._read_pkt(self._ack_timeout)
            if pkt is _READ_TIMEOUT:
                raise TimeoutError(f"MQTT ack timeout waiting for packet type {want_type}")
            if pkt is None:
                self.eof = True
                return None
            ptype, flags, body = pkt
            if ptype == PUBLISH:
                self._inbox.append(self._parse_publish(flags, body))
                continue
            if ptype == want_type:
                return pkt
            if ptype == PINGRESP:
                continue
            return pkt  # unexpected — surface to caller

    def subscribe(self, topic_filter: str, qos: int = 0) -> None:
        self._pid += 1
        body = struct.pack(">H", self._pid)
        if self.level >= 5:
            body += b"\x00"  # empty properties
        body += _utf8(topic_filter) + bytes([qos])
        self._send(_packet(SUBSCRIBE, 0x02, body))
        pkt = self._wait_for(SUBACK)
        code_at = 3 if self.level >= 5 else 2  # v5 SUBACK has a props byte
        if pkt is None or pkt[2][code_at] > 2:
            raise ConnectionError(f"MQTT SUBACK failure for {topic_filter!r}")

    def unsubscribe(self, topic_filter: str) -> None:
        """Remove one subscription (spec 3.10): UNSUBSCRIBE (flags
        0x02, filters WITHOUT the QoS byte SUBSCRIBE carries) -> wait
        UNSUBACK. Messages already in flight may still arrive after."""
        self._pid += 1
        body = struct.pack(">H", self._pid)
        if self.level >= 5:
            body += b"\x00"  # empty properties
        body += _utf8(topic_filter)
        self._send(_packet(UNSUBSCRIBE, 0x02, body))
        if self._wait_for(UNSUBACK) is None:
            raise ConnectionError(f"MQTT UNSUBACK missing for {topic_filter!r}")

    def publish(
        self,
        topic: str,
        payload: bytes,
        qos: int = 1,
        user_properties: dict[str, str] | None = None,
        retain: bool = False,
    ) -> None:
        if qos not in (0, 1, 2):
            raise ValueError(f"MQTT QoS must be 0, 1 or 2, got {qos}")
        self._keepalive_tick()
        props = b""
        if self.level >= 5:
            raw = _encode_user_props(user_properties)
            props = _encode_remaining(len(raw)) + raw
        rflag = 0x01 if retain else 0
        if qos == 0:
            self._send(_packet(PUBLISH, rflag, _utf8(topic) + props + payload))
            return
        self._pid += 1
        pid = self._pid
        body = _utf8(topic) + struct.pack(">H", pid) + props + payload
        self._send(_packet(PUBLISH, (qos << 1) | rflag, body))
        if qos == 1:
            if self._wait_for(PUBACK) is None:
                raise ConnectionError("MQTT PUBACK missing")
            return
        # QoS 2 exactly-once handshake (spec 4.3.3):
        # PUBLISH -> PUBREC -> PUBREL -> PUBCOMP
        pkt = self._wait_for(PUBREC)
        if pkt is None or pkt[0] != PUBREC:
            raise ConnectionError("MQTT PUBREC missing")
        self._send(_packet(PUBREL, 0x02, struct.pack(">H", pid)))
        pkt = self._wait_for(PUBCOMP)
        if pkt is None or pkt[0] != PUBCOMP:
            raise ConnectionError("MQTT PUBCOMP missing")

    def recv_message(self, timeout: float | None = None) -> tuple[str, bytes] | None:
        """Next PUBLISH (buffered first). ``timeout=None`` blocks until
        a message or EOF (``self.eof``); a finite timeout returns None
        when it elapses. Non-PUBLISH packets (pings, stray acks) are
        skipped, never mistaken for end-of-stream."""
        if self._inbox:
            topic, payload, user = self._inbox.popleft()
            self.last_publish_properties = user
            return topic, payload
        import time as _time

        # timeout=None must mean BLOCK, not "inherit the connect
        # timeout": a 10s idle gap is normal broker behavior and must
        # not read as EOF (that was a silent consume-path data loss).
        # A FINITE timeout is a deadline on the whole call: skipped
        # non-PUBLISH packets (pings, late acks) shrink the remaining
        # budget instead of re-arming it, so a chatty connection can't
        # stretch recv_message(0.3) indefinitely.
        deadline = None if timeout is None else _time.monotonic() + timeout
        # keepalive discipline (spec 3.1.2.10): a real broker drops a
        # client that stays silent for 1.5x the CONNECT keepalive, and
        # a blocking subscriber SENDS nothing while idle — so the
        # "blocking" read is internally paced at keepalive/2 and each
        # pacing timeout emits a PINGREQ instead of surfacing to the
        # caller. A pacing timeout that fires MID-packet is safe: the
        # buffered reader keeps the partial bytes and resumes, so the
        # stream never desynchronizes.
        ping_interval = self.keepalive / 2.0
        try:
            while True:
                if deadline is None:
                    step = ping_interval
                else:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        return None
                    step = min(remaining, ping_interval)
                pkt = self._read_pkt(step)
                if pkt is _READ_TIMEOUT:
                    if deadline is not None and _time.monotonic() >= deadline:
                        return None
                    try:
                        self._send(_packet(PINGREQ, 0, b""))  # keep the session alive
                    except OSError:
                        self.eof = True  # connection died while idle
                        return None
                    continue
                if pkt is None:
                    self.eof = True
                    return None
                ptype, flags, body = pkt
                if ptype == PUBLISH:
                    topic, payload, user = self._parse_publish(flags, body)
                    self.last_publish_properties = user
                    return topic, payload
                # PINGRESP / late acks: keep waiting for a PUBLISH
        except MqttProtocolError:
            # spec 4.8: close the connection on a malformed packet; the
            # reader sees EOF and reconnects rather than dying mid-thread
            self.eof = True
            try:
                self._sock.close()
            except OSError:
                pass
            return None

    def disconnect(self) -> None:
        try:
            self._sock.sendall(_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        self._sock.close()


def mqtt_wire_client_factory(broker: str, client_id: str = "nifi-minifi-cpp-spark-pub"):
    """Paho-shaped client factory for publish_mqtt_handler: the wire
    client behind ``publish(topic, payload, qos, retain)``. QoS 0/1/2
    all pass through at their REQUESTED level (r10 — the old factory
    silently capped QoS 2 to 1, a weaker delivery guarantee with no
    signal); retain reaches the broker's retained-message map."""

    class _PahoShaped:
        def __init__(self):
            self._cli = MqttWireClient(broker, client_id)

        def publish(self, topic, payload, qos=0, retain=False):
            data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
            self._cli.publish(topic, bytes(data), qos=int(qos), retain=bool(retain))

        def disconnect(self):
            self._cli.disconnect()

    return _PahoShaped
