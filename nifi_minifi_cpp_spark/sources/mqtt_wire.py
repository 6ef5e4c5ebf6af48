"""MQTT 3.1.1 wire protocol, stdlib-only (r8): a minimal client + an
in-process broker speaking the PUBLIC MQTT v3.1.1 packet format
(mqtt.org / OASIS spec), so ConsumeMQTT/PublishMQTT EXECUTE over real
TCP in environments without paho-mqtt — the same move as
sources/kafka_wire.py for Kafka:

- CONNECT/CONNACK, SUBSCRIBE/SUBACK (wildcard filters ``+`` and
  ``#``), PUBLISH (QoS 0/1 with PUBACK), PINGREQ/PINGRESP, DISCONNECT;
  remaining-length varints and UTF-8 length-prefixed strings per the
  3.1.1 fixed/variable-header layout.
- The broker routes live PUBLISHes to every matching subscription
  (delivery at QoS 0 — acknowledged-redelivery machinery is a real
  broker's job; the reference's subscription QoS is the MAXIMUM
  delivery level, so downgrade is spec-legal).
- The client is synchronous with a buffered reader: PUBLISHes that
  arrive while waiting for an ack queue up and drain via
  ``recv_message``.

ConsumeMQTT's ``mqttlisten`` reader gains ``transport: wire`` next to
``paho``/``fake`` (AbstractMQTTProcessor.cpp:257 parity stays with
paho on clusters that have it); PublishMQTT gets a wire client
factory. Interop against a real broker (mosquitto et al.) remains a
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
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


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
    """-> (type, flags, body) or None on EOF."""
    h = _read_exact(sock, 1)
    if h is None:
        return None
    ptype, flags = h[0] >> 4, h[0] & 0x0F
    n = 0
    mult = 1
    for _ in range(4):
        b = _read_exact(sock, 1)
        if b is None:
            return None
        n += (b[0] & 0x7F) * mult
        if not b[0] & 0x80:
            break
        mult *= 128
    body = _read_exact(sock, n) if n else b""
    if body is None:
        return None
    return ptype, flags, body


def topic_matches(filt: str, topic: str) -> bool:
    """3.1.1 wildcard matching: ``+`` one level, ``#`` the rest."""
    fp, tp = filt.split("/"), topic.split("/")
    for i, f in enumerate(fp):
        if f == "#":
            return True
        if i >= len(tp):
            return False
        if f != "+" and f != tp[i]:
            return False
    return len(fp) == len(tp)


class MiniMqttBroker:
    """In-process MQTT 3.1.1 broker: CONNECT handshake, wildcard
    subscriptions, QoS 0/1 publish (PUBACK to the publisher, QoS-0
    fan-out to subscribers), ping, disconnect."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._subs_lock = threading.Lock()
        self._subs: dict[int, tuple[socket.socket, list[str], threading.Lock]] = {}
        self._next_id = 0
        self.published: list[tuple[str, bytes]] = []  # fixture visibility
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                first = _read_packet(sock)
                if first is None or first[0] != CONNECT:
                    return
                # body: proto name, level, flags, keepalive, client id
                sock.sendall(_packet(CONNACK, 0, b"\x00\x00"))
                with broker._subs_lock:
                    broker._next_id += 1
                    my_id = broker._next_id
                    broker._subs[my_id] = (sock, [], threading.Lock())
                try:
                    while True:
                        pkt = _read_packet(sock)
                        if pkt is None:
                            return
                        ptype, flags, body = pkt
                        if ptype == SUBSCRIBE:
                            (pid,) = struct.unpack_from(">H", body, 0)
                            pos = 2
                            granted = bytearray()
                            filters = []
                            while pos < len(body):
                                (ln,) = struct.unpack_from(">H", body, pos)
                                pos += 2
                                filters.append(body[pos : pos + ln].decode())
                                pos += ln
                                qos = body[pos]
                                pos += 1
                                granted.append(min(qos, 1))
                            with broker._subs_lock:
                                broker._subs[my_id][1].extend(filters)
                            sock.sendall(
                                _packet(SUBACK, 0, struct.pack(">H", pid) + bytes(granted))
                            )
                        elif ptype == PUBLISH:
                            qos = (flags >> 1) & 0x03
                            (ln,) = struct.unpack_from(">H", body, 0)
                            topic = body[2 : 2 + ln].decode()
                            pos = 2 + ln
                            if qos:
                                (pid,) = struct.unpack_from(">H", body, pos)
                                pos += 2
                            payload = body[pos:]
                            broker.published.append((topic, payload))
                            if qos:
                                sock.sendall(_packet(PUBACK, 0, struct.pack(">H", pid)))
                            broker._route(topic, payload)
                        elif ptype == PINGREQ:
                            sock.sendall(_packet(PINGRESP, 0, b""))
                        elif ptype == DISCONNECT:
                            return
                finally:
                    with broker._subs_lock:
                        broker._subs.pop(my_id, None)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def _route(self, topic: str, payload: bytes) -> None:
        body = _utf8(topic) + payload  # QoS-0 delivery: no packet id
        pkt = _packet(PUBLISH, 0, body)
        with self._subs_lock:
            targets = [
                (sock, lock)
                for sock, filters, lock in self._subs.values()
                if any(topic_matches(f, topic) for f in filters)
            ]
        for sock, lock in targets:
            try:
                with lock:
                    sock.sendall(pkt)
            except OSError:
                pass  # subscriber went away; its handler cleans up

    @property
    def subscription_filters(self) -> list[str]:
        """Active filters across connections (lets fixtures wait for a
        subscriber before publishing — no retained-message machinery)."""
        with self._subs_lock:
            return [f for _s, filters, _l in self._subs.values() for f in filters]

    def publish(self, topic: str, payload: bytes) -> None:
        """Broker-side injection (fixture path, no client needed)."""
        self.published.append((topic, payload))
        self._route(topic, payload)

    def start(self) -> "MiniMqttBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def address(self) -> str:
        return f"tcp://{self.host}:{self.port}"


class MqttWireClient:
    """Synchronous 3.1.1 client: connect/subscribe/publish(QoS 0|1)/
    recv_message. PUBLISHes arriving while an ack is awaited are
    buffered. Not thread-safe."""

    def __init__(self, broker: str, client_id: str = "nifi-minifi-cpp-spark", timeout: float = 10.0):
        addr = broker.removeprefix("tcp://")
        host, _, port = addr.partition(":")
        self._sock = socket.create_connection((host, int(port or 1883)), timeout=timeout)
        self._inbox: deque[tuple[str, bytes]] = deque()
        self._pid = 0
        body = _utf8("MQTT") + b"\x04" + b"\x02" + struct.pack(">H", 60) + _utf8(client_id)
        self._sock.sendall(_packet(CONNECT, 0, body))
        pkt = self._wait_for(CONNACK)
        if pkt is None or pkt[2][1] != 0:
            raise ConnectionError("MQTT CONNACK refused")

    def _wait_for(self, want_type: int):
        while True:
            pkt = _read_packet(self._sock)
            if pkt is None:
                return None
            ptype, flags, body = pkt
            if ptype == PUBLISH:
                (ln,) = struct.unpack_from(">H", body, 0)
                topic = body[2 : 2 + ln].decode()
                qos = (flags >> 1) & 0x03
                pos = 2 + ln + (2 if qos else 0)
                self._inbox.append((topic, body[pos:]))
                continue
            if ptype == want_type:
                return pkt
            if ptype == PINGRESP:
                continue
            return pkt  # unexpected — surface to caller

    def subscribe(self, topic_filter: str, qos: int = 0) -> None:
        self._pid += 1
        body = struct.pack(">H", self._pid) + _utf8(topic_filter) + bytes([qos])
        self._sock.sendall(_packet(SUBSCRIBE, 0x02, body))
        pkt = self._wait_for(SUBACK)
        if pkt is None or pkt[2][2] > 2:
            raise ConnectionError(f"MQTT SUBACK failure for {topic_filter!r}")

    def publish(self, topic: str, payload: bytes, qos: int = 1) -> None:
        if qos == 0:
            self._sock.sendall(_packet(PUBLISH, 0, _utf8(topic) + payload))
            return
        self._pid += 1
        body = _utf8(topic) + struct.pack(">H", self._pid) + payload
        self._sock.sendall(_packet(PUBLISH, 0x02, body))
        if self._wait_for(PUBACK) is None:
            raise ConnectionError("MQTT PUBACK missing")

    def recv_message(self, timeout: float | None = None) -> tuple[str, bytes] | None:
        """Next PUBLISH (buffered first); None on timeout/EOF."""
        if self._inbox:
            return self._inbox.popleft()
        old = self._sock.gettimeout()
        if timeout is not None:
            self._sock.settimeout(timeout)
        try:
            pkt = _read_packet(self._sock)
        except (TimeoutError, socket.timeout):
            return None
        finally:
            self._sock.settimeout(old)
        if pkt is None:
            return None
        ptype, flags, body = pkt
        if ptype != PUBLISH:
            return None
        (ln,) = struct.unpack_from(">H", body, 0)
        topic = body[2 : 2 + ln].decode()
        qos = (flags >> 1) & 0x03
        pos = 2 + ln + (2 if qos else 0)
        return topic, body[pos:]

    def disconnect(self) -> None:
        try:
            self._sock.sendall(_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        self._sock.close()


def mqtt_wire_client_factory(broker: str, client_id: str = "nifi-minifi-cpp-spark-pub"):
    """Paho-shaped client factory for publish_mqtt_handler: the wire
    client behind ``publish(topic, payload, qos, retain)`` (retain is
    accepted and ignored — the fixture broker holds no retained
    state)."""

    class _PahoShaped:
        def __init__(self):
            self._cli = MqttWireClient(broker, client_id)

        def publish(self, topic, payload, qos=0, retain=False):
            data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
            self._cli.publish(topic, bytes(data), qos=min(int(qos), 1))

        def disconnect(self):
            self._cli.disconnect()

    return _PahoShaped
