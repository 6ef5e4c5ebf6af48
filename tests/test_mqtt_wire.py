"""MQTT 3.1.1 wire tests (r8): ConsumeMQTT/PublishMQTT execute over
real TCP in the real packet format via the stdlib client + in-process
broker (sources/mqtt_wire.py) — paho stays the cluster path."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest

from nifi_minifi_cpp_spark.sources.mqtt_wire import (
    MiniMqttBroker,
    MqttWireClient,
    mqtt_wire_client_factory,
    topic_matches,
)


@pytest.fixture()
def broker():
    b = MiniMqttBroker().start()
    yield b
    b.stop()


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="mnf-mqtt-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_topic_filter_matching():
    assert topic_matches("a/b/c", "a/b/c")
    assert topic_matches("a/+/c", "a/x/c")
    assert not topic_matches("a/+/c", "a/x/y")
    assert topic_matches("a/#", "a/b/c/d")
    assert topic_matches("#", "anything/at/all")
    assert not topic_matches("a/b", "a/b/c")
    assert not topic_matches("a/b/c", "a/b")


def test_broker_client_pubsub_qos(broker):
    sub = MqttWireClient(broker.address, "sub")
    sub.subscribe("sensors/+/temp", qos=1)
    pub = MqttWireClient(broker.address, "pub")
    pub.publish("sensors/room1/temp", b"21.5", qos=1)  # PUBACK path
    pub.publish("sensors/room2/temp", b"19.0", qos=0)
    pub.publish("other/topic", b"filtered-out", qos=1)
    got = {sub.recv_message(timeout=5) for _ in range(2)}
    assert got == {("sensors/room1/temp", b"21.5"), ("sensors/room2/temp", b"19.0")}
    assert sub.recv_message(timeout=0.5) is None  # non-matching filtered
    pub.disconnect()
    sub.disconnect()
    assert ("other/topic", b"filtered-out") in broker.published


def test_consume_mqtt_wire_through_spark(spark, broker, tmpdir):
    """mqttlisten transport=wire end-to-end: live wire publishes become
    stream rows with sender=topic."""
    from nifi_minifi_cpp_spark.sources.datasource import register_listeners

    register_listeners(spark)
    stream = (
        spark.readStream.format("mqttlisten")
        .option("topic", "tele/+")
        .option("broker", broker.address)
        .option("transport", "wire")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("mqw")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    try:
        # wait for the READER's subscription to land (no retained
        # messages: publishes before it are dropped by design)
        deadline = time.time() + 45
        while time.time() < deadline and not broker.subscription_filters:
            time.sleep(0.2)
        assert broker.subscription_filters == ["tele/+"]
        pub = MqttWireClient(broker.address, "tester")
        for i in range(5):
            pub.publish("tele/dev%d" % (i % 2), b"reading-%d" % i, qos=1)
        rows = []
        deadline = time.time() + 45
        while time.time() < deadline:
            rows = spark.sql("select * from mqw").collect()
            if len(rows) >= 5:
                break
            time.sleep(0.5)
        pub.disconnect()
    finally:
        q.stop()
    assert {r["message"] for r in rows} == {f"reading-{i}" for i in range(5)}
    assert {r["sender"] for r in rows} == {"tele/dev0", "tele/dev1"}


def test_publish_mqtt_wire_handler_roundtrip(spark, broker):
    """publish_mqtt_handler with the wire client factory: every row's
    content lands on the broker under its per-row topic."""
    from nifi_minifi_cpp_spark.streaming.adapters import publish_mqtt_handler

    df = spark.createDataFrame(
        [(f"msg-{i}", f"out/{i % 2}") for i in range(6)], "content string, t string"
    )
    handler = publish_mqtt_handler(
        broker.address,
        topic="unused-default",
        topic_col="t",
        qos=1,
        client_factory=mqtt_wire_client_factory(broker.address),
    )
    handler(df, 0)
    assert sorted((t, bytes(p)) for t, p in broker.published) == sorted(
        (f"out/{i % 2}", b"msg-%d" % i) for i in range(6)
    )


def test_flow_consume_mqtt_wire_transport(spark, broker, tmpdir):
    """A compiled flow's ConsumeMQTT runs on the wire transport: the
    native-source wrapper passes 'transport: wire' through to the
    mqttlisten reader; messages stream into downstream processors."""
    from nifi_minifi_cpp_spark.plans import compile_flow

    cfg = f"""
processors:
  - id: src
    type: ConsumeMQTT
    properties: {{topic: "flow/#", broker: "{broker.address}", transport: wire}}
connections: []
"""
    flow = compile_flow(spark, cfg)
    out = flow.df("src")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("mqflow")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline and not broker.subscription_filters:
            time.sleep(0.2)
        pub = MqttWireClient(broker.address, "flowpub")
        for i in range(3):
            pub.publish("flow/a", b"fm-%d" % i, qos=1)
        pub.disconnect()
        rows = []
        deadline = time.time() + 45
        while time.time() < deadline:
            rows = spark.sql("select * from mqflow").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert {r["message"] for r in rows} == {"fm-0", "fm-1", "fm-2"}
