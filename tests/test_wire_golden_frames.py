"""Frame-level golden-byte conformance for the Kafka/MQTT wire clients
(VERDICT r12 #7).

The wire clients were previously tested only against in-process brokers
implementing the same public protocols — i.e. the codec agreed with
itself. These tests remove that circularity: every expected frame below
is HAND-ASSEMBLED in the test, field by field, straight from the public
spec layouts —

- Kafka record batch magic v2 + request framing: the Apache Kafka
  protocol guide (kafka.apache.org/protocol) — RecordBatch v2 layout,
  Fetch v4 and Produce v3 request schemas; CRC-32C (Castagnoli) per
  RFC 3720 §B.4 with the 0xE3069283 check value from the RFC's
  "123456789" test vector (reference ConsumeKafka.cpp:370 consumes the
  same wire format via librdkafka);
- MQTT 3.1.1 control packets: OASIS mqtt-v3.1.1 §3.1/3.3/3.6/3.8
  (CONNECT, PUBLISH, PUBREL, SUBSCRIBE fixed+variable header layouts;
  reference ConsumeMQTT.cpp:149 / PublishMQTT semantics), plus the
  MQTT 5.0 property-block layouts (OASIS mqtt-v5.0: CONNECT session
  expiry, SUBSCRIBE empty properties, PUBLISH user properties).

The client runs against a scripted fake socket, so the asserted bytes
are exactly what would reach a REAL broker. Real-broker interop stays
the dated cluster-side first action; these fixtures pin conformance of
everything up to the TCP boundary.
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nifi_minifi_cpp_spark.sources import kafka_wire as kw
from nifi_minifi_cpp_spark.sources import mqtt_wire as mw

# ---------------------------------------------------------------------------
# independent reference encoders (test-local, built from the specs —
# deliberately NOT imported from the production module)
# ---------------------------------------------------------------------------


def _ref_crc32c(data: bytes) -> int:
    """Bitwise CRC-32C, reflected polynomial 0x82F63B78 (RFC 3720)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _ref_zigzag_varint(n: int) -> bytes:
    """Kafka record-level integer: zigzag then LEB128 varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        if z < 0x80:
            out.append(z)
            return bytes(out)
        out.append((z & 0x7F) | 0x80)
        z >>= 7


def test_reference_crc32c_rfc_check_value():
    # RFC 3720 B.4: CRC-32C("123456789") = 0xE3069283 — validates the
    # test's own reference implementation before it judges the client.
    assert _ref_crc32c(b"123456789") == 0xE3069283
    # and the production table-driven implementation agrees on it
    assert kw.crc32c(b"123456789") == 0xE3069283


# ---------------------------------------------------------------------------
# Kafka RecordBatch v2
# ---------------------------------------------------------------------------

_BASE_TS = 1_700_000_000_000


def _hand_built_batch() -> bytes:
    """RecordBatch magic=2 with two records, assembled field-by-field
    per the protocol guide's layout (never via encode_record_batch)."""
    # record 0: key+value+1 header, tsDelta 0, offsetDelta 0
    r0 = b"\x00"  # record attributes
    r0 += _ref_zigzag_varint(0)  # timestampDelta
    r0 += _ref_zigzag_varint(0)  # offsetDelta
    r0 += _ref_zigzag_varint(2) + b"k0"
    r0 += _ref_zigzag_varint(5) + b"hello"
    r0 += _ref_zigzag_varint(1)  # header count
    r0 += _ref_zigzag_varint(4) + b"h1-k"
    r0 += _ref_zigzag_varint(3) + b"abc"
    # record 1: null key, null header value, tsDelta 7, offsetDelta 1
    r1 = b"\x00"
    r1 += _ref_zigzag_varint(7)
    r1 += _ref_zigzag_varint(1)
    r1 += _ref_zigzag_varint(-1)  # null key
    r1 += _ref_zigzag_varint(5) + b"world"
    r1 += _ref_zigzag_varint(1)
    r1 += _ref_zigzag_varint(2) + b"hn"
    r1 += _ref_zigzag_varint(-1)  # null header value
    records = (
        _ref_zigzag_varint(len(r0)) + r0 + _ref_zigzag_varint(len(r1)) + r1
    )
    after_crc = (
        struct.pack(">h", 0)  # attributes: no codec, CreateTime
        + struct.pack(">i", 1)  # lastOffsetDelta
        + struct.pack(">q", _BASE_TS)  # baseTimestamp
        + struct.pack(">q", _BASE_TS + 7)  # maxTimestamp
        + struct.pack(">q", -1)  # producerId
        + struct.pack(">h", -1)  # producerEpoch
        + struct.pack(">i", -1)  # baseSequence
        + struct.pack(">i", 2)  # record count
        + records
    )
    crc = _ref_crc32c(after_crc)
    tail = (
        struct.pack(">i", 0)  # partitionLeaderEpoch
        + b"\x02"  # magic
        + struct.pack(">I", crc)
        + after_crc
    )
    return struct.pack(">q", 0) + struct.pack(">i", len(tail)) + tail


_ITEMS = [
    (_BASE_TS, b"k0", b"hello", [("h1-k", b"abc")]),
    (_BASE_TS + 7, None, b"world", [("hn", None)]),
]


def test_record_batch_v2_encode_matches_hand_built_bytes():
    assert kw.encode_record_batch(0, _ITEMS) == _hand_built_batch()


def test_record_batch_v2_decode_of_hand_built_bytes():
    recs = kw.decode_record_batches(_hand_built_batch())
    assert [(r["offset"], r["timestamp"], r["key"], r["value"]) for r in recs] == [
        (0, _BASE_TS, b"k0", b"hello"),
        (1, _BASE_TS + 7, None, b"world"),
    ]
    assert recs[0]["headers"] == [("h1-k", b"abc")]
    assert recs[1]["headers"] == [("hn", None)]


# ---------------------------------------------------------------------------
# scripted fake socket
# ---------------------------------------------------------------------------


class _ScriptedSock:
    """Captures sendall() bytes; serves recv() from a canned byte queue."""

    def __init__(self, canned: bytes):
        self.sent = bytearray()
        self._rx = bytearray(canned)

    def sendall(self, data: bytes) -> None:
        self.sent += data

    def recv(self, n: int) -> bytes:
        out = bytes(self._rx[:n])
        del self._rx[:n]
        return out

    def settimeout(self, t) -> None:  # noqa: ANN001
        pass

    def close(self) -> None:
        pass


def _kstr(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _kafka_response(corr: int, body: bytes) -> bytes:
    payload = struct.pack(">i", corr) + body
    return struct.pack(">i", len(payload)) + payload


def test_fetch_v4_request_golden_bytes(monkeypatch):
    batch = _hand_built_batch()
    fetch_resp_body = (
        struct.pack(">i", 0)  # throttle_time_ms
        + struct.pack(">i", 1)  # topic array len
        + _kstr("events")
        + struct.pack(">i", 1)  # partition array len
        + struct.pack(">i", 0)  # partition index
        + struct.pack(">h", 0)  # error code
        + struct.pack(">q", 2)  # high watermark
        + struct.pack(">q", 2)  # last stable offset
        + struct.pack(">i", 0)  # aborted transactions
        + struct.pack(">i", len(batch))
        + batch
    )
    sock = _ScriptedSock(_kafka_response(1, fetch_resp_body))
    monkeypatch.setattr(
        kw.socket, "create_connection", lambda *a, **k: sock
    )
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    recs, hw = client.fetch("events", 0, 0, max_bytes=1 << 20)

    # request frame, assembled per the protocol guide: Fetch (key 1) v4
    req_header = (
        struct.pack(">h", 1)  # api_key = Fetch
        + struct.pack(">h", 4)  # api_version
        + struct.pack(">i", 1)  # correlation_id (first request)
        + _kstr("golden")  # client_id
    )
    req_body = (
        struct.pack(">i", -1)  # replica_id (consumer)
        + struct.pack(">i", 100)  # max_wait_ms
        + struct.pack(">i", 1)  # min_bytes
        + struct.pack(">i", 1 << 20)  # max_bytes (v3+)
        + b"\x00"  # isolation_level = read_uncommitted (v4+)
        + struct.pack(">i", 1)  # topic array len
        + _kstr("events")
        + struct.pack(">i", 1)  # partition array len
        + struct.pack(">i", 0)  # partition
        + struct.pack(">q", 0)  # fetch_offset
        + struct.pack(">i", 1 << 20)  # partition_max_bytes
    )
    payload = req_header + req_body
    expected = struct.pack(">i", len(payload)) + payload
    assert bytes(sock.sent) == expected

    # and the response path decoded the hand-built batch correctly
    assert hw == 2
    assert [(r["key"], r["value"]) for r in recs] == [
        (b"k0", b"hello"),
        (None, b"world"),
    ]


def test_produce_v3_request_golden_bytes(monkeypatch):
    produce_resp_body = (
        struct.pack(">i", 1)  # topic array len
        + _kstr("events")
        + struct.pack(">i", 1)  # partition array len
        + struct.pack(">i", 0)  # partition index
        + struct.pack(">h", 0)  # error code
        + struct.pack(">q", 41)  # base offset
        + struct.pack(">q", -1)  # log append time
        + struct.pack(">i", 0)  # throttle_time_ms
    )
    sock = _ScriptedSock(_kafka_response(1, produce_resp_body))
    monkeypatch.setattr(
        kw.socket, "create_connection", lambda *a, **k: sock
    )
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    base = client.produce("events", 0, _ITEMS)
    assert base == 41

    req_header = (
        struct.pack(">h", 0)  # api_key = Produce
        + struct.pack(">h", 3)  # api_version
        + struct.pack(">i", 1)  # correlation_id
        + _kstr("golden")
    )
    batch = _hand_built_batch()
    req_body = (
        _kstr(None)  # transactional_id (v3+)
        + struct.pack(">h", -1)  # acks = all
        + struct.pack(">i", 10_000)  # timeout_ms
        + struct.pack(">i", 1)  # topic array len
        + _kstr("events")
        + struct.pack(">i", 1)  # partition array len
        + struct.pack(">i", 0)  # partition
        + struct.pack(">i", len(batch))
        + batch  # record set = the spec-layout RecordBatch v2
    )
    payload = req_header + req_body
    expected = struct.pack(">i", len(payload)) + payload
    assert bytes(sock.sent) == expected


# ---------------------------------------------------------------------------
# MQTT 3.1.1: CONNECT — SUBSCRIBE — PUBLISH(QoS2) — PUBREL
# ---------------------------------------------------------------------------


def test_mqtt_311_connect_subscribe_qos2_publish_golden_bytes(monkeypatch):
    canned = (
        b"\x20\x02\x00\x00"  # CONNACK: session_present=0, accepted
        + b"\x90\x03\x00\x01\x01"  # SUBACK pid=1, granted QoS 1
        + b"\x50\x02\x00\x02"  # PUBREC pid=2
        + b"\x70\x02\x00\x02"  # PUBCOMP pid=2
    )
    sock = _ScriptedSock(canned)
    monkeypatch.setattr(
        mw.socket, "create_connection", lambda *a, **k: sock
    )
    client = mw.MqttWireClient(
        "tcp://127.0.0.1:1883", client_id="golden", protocol_level=4, keepalive=60
    )
    client.subscribe("sensors/#", qos=1)
    client.publish("a/b", b"hi", qos=2)

    # spec 3.1: CONNECT — protocol name "MQTT", level 4, flags
    # 0x02 (clean session), keepalive 60, then the client identifier
    connect = bytes(
        [0x10, 18]
    ) + b"\x00\x04MQTT\x04\x02\x00\x3c\x00\x06golden"
    # spec 3.8: SUBSCRIBE — fixed-header flags MUST be 0x02; packet id,
    # then (filter, requested QoS) pairs
    subscribe = bytes([0x82, 14]) + b"\x00\x01\x00\x09sensors/#\x01"
    # spec 3.3: PUBLISH QoS2 (fixed header 0x34 = type 3, QoS bits 10),
    # topic, packet id, application payload
    publish = bytes([0x34, 9]) + b"\x00\x03a/b\x00\x02hi"
    # spec 3.6: PUBREL — fixed-header flags MUST be 0x02, body = pid
    pubrel = bytes([0x62, 0x02]) + b"\x00\x02"

    assert bytes(sock.sent) == connect + subscribe + publish + pubrel


def test_mqtt_311_qos1_and_retain_golden_bytes(monkeypatch):
    canned = (
        b"\x20\x02\x00\x00"  # CONNACK
        + b"\x40\x02\x00\x01"  # PUBACK pid=1
    )
    sock = _ScriptedSock(canned)
    monkeypatch.setattr(
        mw.socket, "create_connection", lambda *a, **k: sock
    )
    client = mw.MqttWireClient(
        "tcp://127.0.0.1:1883", client_id="golden", protocol_level=4, keepalive=60
    )
    client.publish("t", b"x", qos=1, retain=True)
    connect = bytes(
        [0x10, 18]
    ) + b"\x00\x04MQTT\x04\x02\x00\x3c\x00\x06golden"
    # QoS1 + retain: fixed header 0x33 (type 3, QoS bits 01, retain 1)
    publish = bytes([0x33, 6]) + b"\x00\x01t\x00\x01x"
    assert bytes(sock.sent) == connect + publish


def test_mqtt_50_connect_properties_golden_bytes(monkeypatch):
    """MQTT 5.0 layouts (OASIS mqtt-v5.0 §3.1/3.3/3.8): CONNECT with a
    session-expiry property, SUBSCRIBE with its empty property block,
    and PUBLISH carrying a user property — all hand-assembled."""
    canned = (
        b"\x20\x03\x00\x00\x00"  # CONNACK v5: flags, reason 0, no props
        + b"\x90\x04\x00\x01\x00\x01"  # SUBACK v5 pid=1, props 0, granted 1
        + b"\x40\x02\x00\x02"  # PUBACK pid=2
    )
    sock = _ScriptedSock(canned)
    monkeypatch.setattr(mw.socket, "create_connection", lambda *a, **k: sock)
    client = mw.MqttWireClient(
        "tcp://127.0.0.1:1883",
        client_id="golden",
        protocol_level=5,
        keepalive=60,
        session_expiry=120,
    )
    client.subscribe("sensors/#", qos=1)
    client.publish("t", b"x", qos=1, user_properties={"k": "v"})

    # §3.1: variable header "MQTT" 5, flags 0x02, keepalive, property
    # block (0x11 session expiry interval, four-byte int), client id
    connect = bytes([0x10, 24]) + (
        b"\x00\x04MQTT\x05\x02\x00\x3c"
        + b"\x05\x11\x00\x00\x00\x78"  # props len 5: session expiry 120
        + b"\x00\x06golden"
    )
    # §3.8: pid, empty property block, (filter, options) pairs
    subscribe = bytes([0x82, 15]) + b"\x00\x01\x00\x00\x09sensors/#\x01"
    # §3.3: topic, pid, property block (0x26 user property k/v), payload
    publish = bytes([0x32, 14]) + (
        b"\x00\x01t\x00\x02" + b"\x07\x26\x00\x01k\x00\x01v" + b"x"
    )
    assert bytes(sock.sent) == connect + subscribe + publish


# ---------------------------------------------------------------------------
# Kafka consumer-group protocol (r14, VERDICT r13 #3): FindCoordinator v0,
# JoinGroup v0, SyncGroup v0, Heartbeat v0, LeaveGroup v0, OffsetCommit v2,
# OffsetFetch v1 — request schemas and the embedded consumer-protocol
# Subscription/Assignment blobs, hand-assembled from the protocol guide
# (kafka.apache.org/protocol, "The consumer protocol" wiki layout).
# ---------------------------------------------------------------------------


def _req_frame(api_key: int, version: int, corr: int, client_id: str, body: bytes) -> bytes:
    payload = (
        struct.pack(">h", api_key)
        + struct.pack(">h", version)
        + struct.pack(">i", corr)
        + _kstr(client_id)
        + body
    )
    return struct.pack(">i", len(payload)) + payload


def _ref_subscription(topics: list[str]) -> bytes:
    """ConsumerProtocolSubscription v0: version, topics, user_data."""
    return (
        struct.pack(">h", 0)
        + struct.pack(">i", len(topics))
        + b"".join(_kstr(t) for t in topics)
        + struct.pack(">i", 0)  # empty user_data bytes
    )


def _ref_assignment(topic: str, parts: list[int]) -> bytes:
    """ConsumerProtocolAssignment v0: version, [(topic, [int32])], user_data."""
    return (
        struct.pack(">h", 0)
        + struct.pack(">i", 1)
        + _kstr(topic)
        + struct.pack(">i", len(parts))
        + b"".join(struct.pack(">i", p) for p in parts)
        + struct.pack(">i", 0)
    )


def test_find_coordinator_v0_golden_bytes(monkeypatch):
    resp = struct.pack(">h", 0) + struct.pack(">i", 0) + _kstr("10.0.0.7") + struct.pack(">i", 9093)
    sock = _ScriptedSock(_kafka_response(1, resp))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    host, port = client.find_coordinator("g1")
    assert (host, port) == ("10.0.0.7", 9093)
    # FindCoordinator v0 request body is just the coordinator key string
    assert bytes(sock.sent) == _req_frame(10, 0, 1, "golden", _kstr("g1"))


def test_join_group_v0_request_and_response_golden_bytes(monkeypatch):
    sub = _ref_subscription(["events"])
    resp = (
        struct.pack(">h", 0)  # error
        + struct.pack(">i", 3)  # generation
        + _kstr("range")  # group protocol
        + _kstr("member-1")  # leader
        + _kstr("member-1")  # member id
        + struct.pack(">i", 1)  # members array (leader view)
        + _kstr("member-1")
        + struct.pack(">i", len(sub))
        + sub
    )
    sock = _ScriptedSock(_kafka_response(1, resp))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    join = client.join_group("g1", ["events"], session_timeout_ms=30_000)

    body = (
        _kstr("g1")
        + struct.pack(">i", 30_000)  # session_timeout_ms
        + _kstr("")  # member_id (first join: empty)
        + _kstr("consumer")  # protocol_type
        + struct.pack(">i", 1)  # group protocols array
        + _kstr("range")
        + struct.pack(">i", len(sub))
        + sub
    )
    assert bytes(sock.sent) == _req_frame(11, 0, 1, "golden", body)
    assert join == {
        "generation": 3,
        "member_id": "member-1",
        "leader_id": "member-1",
        "protocol": "range",
        "members": [("member-1", ["events"])],
    }


def test_sync_group_v0_request_and_response_golden_bytes(monkeypatch):
    assign = _ref_assignment("events", [0, 1])
    resp = struct.pack(">h", 0) + struct.pack(">i", len(assign)) + assign
    sock = _ScriptedSock(_kafka_response(1, resp))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    got = client.sync_group("g1", 3, "member-1", {"member-1": {"events": [0, 1]}})

    body = (
        _kstr("g1")
        + struct.pack(">i", 3)  # generation
        + _kstr("member-1")
        + struct.pack(">i", 1)  # group assignment array
        + _kstr("member-1")
        + struct.pack(">i", len(assign))
        + assign
    )
    assert bytes(sock.sent) == _req_frame(14, 0, 1, "golden", body)
    assert got == {"events": [0, 1]}


def test_heartbeat_v0_golden_bytes(monkeypatch):
    sock = _ScriptedSock(_kafka_response(1, struct.pack(">h", 27)))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    assert client.heartbeat("g1", 3, "member-1") == kw.ERR_REBALANCE_IN_PROGRESS
    body = _kstr("g1") + struct.pack(">i", 3) + _kstr("member-1")
    assert bytes(sock.sent) == _req_frame(12, 0, 1, "golden", body)


def test_leave_group_v0_golden_bytes(monkeypatch):
    sock = _ScriptedSock(_kafka_response(1, struct.pack(">h", 0)))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    client.leave_group("g1", "member-1")
    assert bytes(sock.sent) == _req_frame(13, 0, 1, "golden", _kstr("g1") + _kstr("member-1"))


def test_offset_commit_v2_request_golden_bytes(monkeypatch):
    resp = (
        struct.pack(">i", 1)
        + _kstr("events")
        + struct.pack(">i", 1)
        + struct.pack(">i", 0)  # partition
        + struct.pack(">h", 0)  # error
    )
    sock = _ScriptedSock(_kafka_response(1, resp))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    client.offset_commit("g1", {("events", 0): 42}, generation=3, member_id="member-1")

    body = (
        _kstr("g1")
        + struct.pack(">i", 3)  # generation
        + _kstr("member-1")
        + struct.pack(">q", -1)  # retention_time_ms: broker default
        + struct.pack(">i", 1)  # topics
        + _kstr("events")
        + struct.pack(">i", 1)  # partitions
        + struct.pack(">i", 0)
        + struct.pack(">q", 42)  # offset
        + _kstr(None)  # metadata
    )
    assert bytes(sock.sent) == _req_frame(8, 2, 1, "golden", body)


def test_offset_fetch_v1_golden_bytes(monkeypatch):
    resp = (
        struct.pack(">i", 1)
        + _kstr("events")
        + struct.pack(">i", 1)
        + struct.pack(">i", 0)  # partition
        + struct.pack(">q", 42)  # committed offset
        + _kstr(None)  # metadata
        + struct.pack(">h", 0)  # error
    )
    sock = _ScriptedSock(_kafka_response(1, resp))
    monkeypatch.setattr(kw.socket, "create_connection", lambda *a, **k: sock)
    client = kw.MiniKafkaClient("127.0.0.1:9092", client_id="golden")
    got = client.offset_fetch("g1", [("events", 0)])
    body = _kstr("g1") + struct.pack(">i", 1) + _kstr("events") + struct.pack(">i", 1) + struct.pack(">i", 0)
    assert bytes(sock.sent) == _req_frame(9, 1, 1, "golden", body)
    assert got == {("events", 0): 42}


def test_consumer_protocol_blob_roundtrip_against_reference_layout():
    """The production Subscription/Assignment codecs must emit exactly
    the hand-assembled reference layout (and read it back)."""
    assert kw.encode_subscription(["a", "bb"]) == _ref_subscription(["a", "bb"])
    assert kw.decode_subscription(_ref_subscription(["x"])) == ["x"]
    assert kw.encode_assignment({"t": [1, 0]}) == _ref_assignment("t", [0, 1])
    assert kw.decode_assignment(_ref_assignment("t", [0, 1])) == {"t": [0, 1]}
