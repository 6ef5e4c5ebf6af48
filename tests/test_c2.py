"""C2 agent protocol tests: heartbeat response nodes, operation
dispatch, and acknowledge discipline (C2.md; C2Agent.h:60-240;
C2Payload.h:36-49)."""

from __future__ import annotations

import pytest

from nifi_minifi_cpp_spark.plans import C2Agent, FlowController


def _flow_cfg(text: str) -> dict:
    return {
        "processors": [
            {"id": "gen", "type": "GenerateFlowFile",
             "properties": {"batch_size": 2, "custom_text": text}},
        ],
        "connections": [],
    }


class FakeServer:
    """Records every payload; serves queued requestedOperations."""

    def __init__(self):
        self.received = []
        self.queue = []

    def __call__(self, payload):
        self.received.append(payload)
        if payload.get("operation") == "heartbeat" and self.queue:
            return {"requestedOperations": self.queue.pop(0)}
        return {}

    def heartbeats(self):
        return [p for p in self.received if p["operation"] == "heartbeat"]

    def acks(self):
        return [p for p in self.received if p["operation"] == "acknowledge"]


def test_heartbeat_nodes_and_light_mode(spark):
    """First heartbeat carries the agent manifest; subsequent ones are
    light (nifi.c2.full.heartbeat=false semantics, C2.md:71-75)."""
    ctl = FlowController(spark, _flow_cfg("a")).start()
    server = FakeServer()
    agent = C2Agent(ctl, server, agent_class="edge-01")
    agent.run(heartbeats=2)

    h1, h2 = server.heartbeats()
    assert h1["sequence"] == 1 and h2["sequence"] == 2
    assert h1["agentInfo"]["agentClass"] == "edge-01"
    procs = {p["type"] for p in h1["agentInfo"]["agentManifest"]["bundles"][0]["componentManifest"]["processors"]}
    assert {"GenerateFlowFile", "RouteOnAttribute", "MergeContent"} <= procs
    assert "agentManifest" not in h2["agentInfo"]  # light heartbeat
    assert h1["flowInfo"]["flowId"] == h2["flowInfo"]["flowId"]
    assert h1["deviceInfo"]["systemInformation"]["vCores"] >= 1


def test_describe_manifest_and_configuration(spark):
    ctl = FlowController(spark, _flow_cfg("a")).start()
    server = FakeServer()
    server.queue.append([
        {"operation": "DESCRIBE", "operand": "manifest", "identifier": "op-1"},
        {"operation": "describe", "operand": "configuration", "identifier": "op-2"},
    ])
    agent = C2Agent(ctl, server)
    acks = agent.heartbeat()
    assert [a["operationId"] for a in acks] == ["op-1", "op-2"]
    assert all(a["operationState"]["state"] == "FULLY_APPLIED" for a in acks)
    assert "agentManifest" in acks[0]
    assert "GenerateFlowFile" in acks[1]["configuration"]
    # acks were also SENT to the server, not just returned
    assert len(server.acks()) == 2


def test_update_configuration_hot_swap_and_rollback(spark):
    """UPDATE configuration hot-swaps the flow (FULLY_APPLIED, flowId
    changes); a broken payload rolls back and acks NOT_APPLIED."""
    ctl = FlowController(spark, _flow_cfg("old")).start()
    server = FakeServer()
    agent = C2Agent(ctl, server)
    before = agent.config_checksum()

    ack = agent.process_operation(
        {"operation": "update", "operand": "configuration",
         "identifier": "u1", "content": _flow_cfg("new")}
    )
    assert ack["operationState"]["state"] == "FULLY_APPLIED"
    assert ack["flowId"] != before
    assert ctl.flow.df("gen").first()["content"] == "new"

    bad = {"processors": [{"id": "x", "type": "NoSuchProcessor"}], "connections": []}
    ack2 = agent.process_operation(
        {"operation": "update", "operand": "configuration", "identifier": "u2", "content": bad}
    )
    assert ack2["operationState"]["state"] == "NOT_APPLIED"
    assert "unknown processor type" in ack2["operationState"]["details"]
    # rolled back: the flow still serves the previous config
    assert ctl.flow.df("gen").first()["content"] == "new"


def test_stop_start_pause_resume_and_unknowns(spark):
    ctl = FlowController(spark, _flow_cfg("a")).start()
    agent = C2Agent(ctl, FakeServer())

    assert agent.process_operation({"operation": "stop", "identifier": "s1"})[
        "operationState"]["state"] == "FULLY_APPLIED"
    assert agent.process_operation({"operation": "restart", "identifier": "r1"})[
        "operationState"]["state"] == "FULLY_APPLIED"
    assert agent.process_operation({"operation": "pause", "identifier": "p1"})[
        "operationState"]["state"] == "FULLY_APPLIED"
    assert agent.paused
    assert agent.process_operation({"operation": "resume", "identifier": "p2"})[
        "operationState"]["state"] == "FULLY_APPLIED"
    assert not agent.paused
    assert agent.process_operation({"operation": "clear", "identifier": "c1"})[
        "operationState"]["state"] == "NO_OPERATION"
    assert agent.process_operation({"operation": "explode", "identifier": "x1"})[
        "operationState"]["state"] == "NOT_APPLIED"
    assert agent.process_operation({"operation": "update", "operand": "banana",
                                    "identifier": "x2"})["operationState"]["state"] == "NOT_APPLIED"
    assert agent.process_operation({"operation": "update", "operand": "configuration",
                                    "identifier": "x3"})["operationState"]["state"] == "NOT_APPLIED"


def test_rest_sender_import_gated():
    import importlib.util

    from nifi_minifi_cpp_spark.plans import rest_sender

    if importlib.util.find_spec("requests") is not None:
        pytest.skip("requests present; gate not exercisable")
    with pytest.raises(NotImplementedError, match="transport"):
        rest_sender("http://c2.test/heartbeat")({"operation": "heartbeat"})


# -- Prometheus publisher (METRICS.md:98-130 parity) --------------------------


def test_prometheus_exposition_and_scrape(spark, tables):
    """Transfer counters + device gauges render in the Prometheus text
    format with the minifi_ prefix and generic labels, and the scrape
    endpoint actually serves them over HTTP."""
    import urllib.request

    from nifi_minifi_cpp_spark.metrics import (
        prometheus_exposition,
        serve_prometheus,
        with_transfer_metrics,
    )
    from nifi_minifi_cpp_spark.model import documents_to_flowfiles

    docs = documents_to_flowfiles(tables["documents"].limit(25))
    observed, handle = with_transfer_metrics(docs, "route-out")
    observed.write.format("noop").mode("overwrite").save()

    text = prometheus_exposition([handle], agent_identifier="Agent1")
    assert 'minifi_flow_files_out{metric_class="FlowInformation",agent_identifier="Agent1",processor_name="route-out"} 25' in text
    assert "minifi_bytes_out{" in text
    assert 'minifi_physical_mem{metric_class="DeviceInfoNode"' in text
    assert "minifi_cpu_load_average{" in text

    # scrape over HTTP (the publisher's port property)
    import random

    port = random.randint(29000, 29999)
    server = serve_prometheus(port, [handle], agent_identifier="Agent1")
    try:
        got = urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=5).read().decode()
        assert "minifi_flow_files_out{" in got
    finally:
        server.shutdown()


def test_prometheus_streaming_progress_metrics():
    from nifi_minifi_cpp_spark.metrics import FlowMetricsLog, prometheus_exposition

    log = FlowMetricsLog(
        progress=[
            {"id": "q-1", "batchId": 0, "numInputRows": 100, "durationMs": {"triggerExecution": 50}},
            {"id": "q-1", "batchId": 1, "numInputRows": 40, "durationMs": {"triggerExecution": 30}},
        ]
    )
    text = prometheus_exposition(flow_log=log, agent_identifier="a2")
    assert 'minifi_flow_files_in{metric_class="QueueMetrics",agent_identifier="a2",connection_uuid="q-1"} 140' in text
    assert 'minifi_invocations{metric_class="FlowInformation",agent_identifier="a2",processor_uuid="q-1"} 2' in text
    assert "minifi_processing_nanos{" in text and "} 80000000" in text


def test_heartbeat_survives_transport_failure_and_keeps_manifest(spark):
    """Review r5: a transport exception must not kill the loop NOR
    latch the manifest flag — the server still gets the manifest on
    the first DELIVERED heartbeat."""
    ctl = FlowController(spark, _flow_cfg("a")).start()
    calls = {"n": 0}
    received = []

    def flaky(payload):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionError("c2 server down")
        received.append(payload)
        return {}

    agent = C2Agent(ctl, flaky)
    assert agent.heartbeat() == []  # no raise
    assert "c2 server down" in agent.last_transport_error
    agent.heartbeat()
    assert agent.last_transport_error is None
    # the delivered heartbeat carries the manifest (not lost to the outage)
    assert "agentManifest" in received[0]["agentInfo"]
    agent.heartbeat()
    assert "agentManifest" not in received[1]["agentInfo"]  # now light


def test_prometheus_scrape_before_first_action_does_not_block(spark):
    """Review r5: Observation.get blocks until the observed frame's
    first action; a scrape that fires earlier must return immediately
    with the metric omitted."""
    import time

    from nifi_minifi_cpp_spark.metrics import prometheus_exposition, with_transfer_metrics

    df = spark.range(10).selectExpr("CAST(id AS STRING) AS content")
    _observed, handle = with_transfer_metrics(df, "never-run")  # NO action
    start = time.monotonic()
    text = prometheus_exposition([handle], agent_identifier="a")
    assert time.monotonic() - start < 5  # did not block on .get
    assert "never-run" not in text  # metric omitted until ready
    assert not handle.ready
