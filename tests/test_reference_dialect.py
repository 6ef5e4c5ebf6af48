"""compile_flow accepts the reference's OWN config.yml dialect
(FlowSchema.cpp:30-99; live examples under
libminifi/test/resources/*.yml): capitalized sections, namespaced
class names, 'source id'/'source relationship names' connections,
value-wrapped properties, group-level ports and services.
"""

from __future__ import annotations

import pytest

from nifi_minifi_cpp_spark.plans.pipeline import compile_flow
from nifi_minifi_cpp_spark.plans.reference_dialect import (
    is_reference_dialect,
    normalize_flow_config,
)

REFERENCE_YAML = """
Flow Controller:
  name: MiNiFi Flow
  id: 2438e3c8-015a-1000-79ca-83af40ec1990
Core Properties:
  flow controller graceful shutdown period: 10 sec
Content Repository:
  content claim max appendable size: 10 MB
Security Properties:
  keystore: ''
Processors:
- id: 4ed2d51d-076a-49b0-88de-5cf5adf52a7e
  name: GenerateFlowFile
  class: org.apache.nifi.minifi.processors.GenerateFlowFile
  max concurrent tasks: 1
  scheduling strategy: TIMER_DRIVEN
  scheduling period: 15000 ms
  auto-terminated relationships list: []
  Properties:
    Batch Size: '4'
    Custom Text: hello from minifi
- id: 1d51724d-dd76-46a0-892d-a7c7408d58dd
  name: Logger
  class: org.apache.nifi.minifi.processors.LogAttribute
  Properties: {}
Input Ports:
- id: 012fc536-3137-4360-be65-3e3b47e05941
  name: in
Connections:
- id: 189bee81-3e56-45ac-b6bb-aa70b7180dc8
  name: GenerateFlowFile/success/in
  source id: 4ed2d51d-076a-49b0-88de-5cf5adf52a7e
  source relationship names:
  - success
  destination id: 012fc536-3137-4360-be65-3e3b47e05941
  max work queue size: 0
  flowfile expiration: 0 seconds
  queue prioritizer class: ''
- id: f5d1dd2d-f675-41bd-bf1b-b571aa23ebfb
  source name: in
  destination name: Logger
  source relationship names:
  - success
Controller Services:
- name: SSLClientServiceTest
  id: 2438e3c8-015a-1000-79ca-83af40ec1922
  class: SSLContextService
  Properties:
    Client Certificate:
    - value: cn.crt.pem
    Private Key:
    - value: cn.ckey.pem
    CA Certificate:
    - value: nifi-cert.pem
"""


def test_detect_and_normalize_sections():
    import yaml

    config = yaml.safe_load(REFERENCE_YAML)
    assert is_reference_dialect(config)
    norm = normalize_flow_config(config)
    # agent sections dropped, dataflow sections lowercased
    assert "Content Repository" not in norm and "Security Properties" not in norm
    types = {p["id"]: p["type"] for p in norm["processors"]}
    assert types["4ed2d51d-076a-49b0-88de-5cf5adf52a7e"] == "GenerateFlowFile"
    assert types["012fc536-3137-4360-be65-3e3b47e05941"] == "LocalPort"
    # name references resolved to ids
    conns = norm["connections"]
    assert conns[1]["source"] == "012fc536-3137-4360-be65-3e3b47e05941"
    assert conns[1]["destination"] == "1d51724d-dd76-46a0-892d-a7c7408d58dd"
    # snake_case aliases added alongside reference spellings
    gen = next(p for p in norm["processors"] if p["type"] == "GenerateFlowFile")
    assert gen["properties"]["Batch Size"] == "4"
    assert gen["properties"]["batch_size"] == "4"
    # value-wrapped service properties unwrap to scalars
    svc = norm["Controller Services"][0]
    assert svc["Properties"]["Client Certificate"] == "cn.crt.pem"


def test_reference_yaml_compiles_and_runs(spark):
    flow = compile_flow(spark, REFERENCE_YAML)
    out = flow.df("1d51724d-dd76-46a0-892d-a7c7408d58dd")
    rows = out.collect()
    assert len(rows) == 4
    assert all(r.content == "hello from minifi" for r in rows)
    assert "SSLClientServiceTest" in flow.services


def test_group_level_ports_and_services_hoist(spark):
    import yaml

    config = yaml.safe_load(
        """
Processors:
- id: gen
  name: gen
  class: GenerateFlowFile
  Properties: {Batch Size: '2', Custom Text: nested}
Process Groups:
- id: sub
  name: sub
  Processors:
  - id: sublog
    name: sublog
    class: LogAttribute
  Input Ports:
  - id: subin
    name: subin
  Connections:
  - source id: subin
    destination id: sublog
    source relationship names: [success]
  Controller Services:
  - name: SubPolicy
    id: subpol
    class: UpdatePolicyControllerService
    Properties: {Allow All Properties: 'true'}
Connections:
- source id: gen
  destination id: sub/subin
  source relationship names: [success]
"""
    )
    norm = normalize_flow_config(config)
    assert norm["Controller Services"][0]["name"] == "SubPolicy"  # hoisted
    flow = compile_flow(spark, norm)
    assert flow.df("sub/sublog").count() == 2


def test_multi_relationship_connection_fans_out():
    config = {
        "Processors": [
            {"id": "r", "class": "RouteOnAttribute", "Properties": {}},
            {"id": "sink", "class": "LogAttribute"},
        ],
        "Connections": [
            {
                "source id": "r",
                "destination id": "sink",
                "source relationship names": ["matched", "unmatched"],
            }
        ],
    }
    norm = normalize_flow_config(config)
    rels = sorted(c["relationship"] for c in norm["connections"])
    assert rels == ["matched", "unmatched"]


def test_local_port_without_input_is_an_error(spark):
    with pytest.raises(Exception, match="LocalPort has no incoming connection"):
        compile_flow(
            spark,
            {"processors": [{"id": "p", "type": "LocalPort"}], "connections": []},
        )


def test_every_reference_resource_yaml_normalizes():
    """The reference ships 38 flow YAMLs with its own tests; every
    well-formed one must normalize (TestBad.yml is its deliberately
    malformed case)."""
    import glob

    import yaml

    files = sorted(glob.glob("/root/reference/libminifi/test/resources/*.yml"))
    if not files:
        pytest.skip("reference checkout not present")
    normalized = 0
    for f in files:
        if f.endswith("TestBad.yml"):
            continue
        config = yaml.safe_load(open(f))
        norm = normalize_flow_config(config)
        assert isinstance(norm, dict)
        normalized += 1
    assert normalized >= 30


def test_rpg_input_port_maps_to_storage_channel(spark, tmp_path):
    """A Remote Process Group input port with a Channel property
    publishes through the engine's storage Site-to-Site channel."""
    chan = str(tmp_path / "rpg-chan")
    flow = compile_flow(
        spark,
        {
            "Processors": [
                {"id": "gen", "class": "GenerateFlowFile",
                 "Properties": {"Batch Size": "3", "Custom Text": "to-remote"}}
            ],
            "Remote Process Groups": [
                {
                    "name": "NiFi Flow",
                    "url": "http://localhost:8099/nifi",
                    "Input Ports": [
                        {"id": "rp1", "name": "From Node A",
                         "Properties": {"Channel": chan}}
                    ],
                }
            ],
            "Connections": [
                {"source id": "gen", "destination id": "rp1",
                 "source relationship names": ["success"]}
            ],
        },
    )
    assert flow is not None
    got = spark.read.option("recursiveFileLookup", "true").parquet(chan)
    assert got.count() == 3


def test_rpg_port_without_channel_gets_migration_error(spark):
    with pytest.raises(Exception, match="Channel.*storage channel"):
        compile_flow(
            spark,
            {
                "Processors": [
                    {"id": "gen", "class": "GenerateFlowFile", "Properties": {}}
                ],
                "Remote Processing Groups": [
                    {"name": "r", "url": "http://x/nifi",
                     "Input Ports": [{"id": "rp1", "name": "in"}]}
                ],
                "Connections": [
                    {"source id": "gen", "destination id": "rp1",
                     "source relationship names": ["success"]}
                ],
            },
        )


def test_scheduling_period_maps_to_trigger(spark, tmp_path):
    """TIMER_DRIVEN 'scheduling period' on the terminal processor
    becomes the streaming query's micro-batch trigger cadence."""
    import os

    import yaml

    from nifi_minifi_cpp_spark.plans.pipeline import FlowController

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(src)
    norm = normalize_flow_config(
        yaml.safe_load(
            f"""
Processors:
- id: in
  class: FileStreamSource
  Properties: {{path: {src}, schema: 'id long, v string'}}
- id: sink
  class: MemorySink
  scheduling strategy: TIMER_DRIVEN
  scheduling period: 2 sec
  Properties: {{name: sched_view_{os.getpid()}}}
Connections:
- source id: in
  destination id: sink
  source relationship names: [success]
"""
        )
    )
    sink = next(p for p in norm["processors"] if p["id"] == "sink")
    assert sink["properties"]["trigger_period"] == "2 sec"
    ctl = FlowController(spark, norm).start()
    try:
        q = ctl.queries[0]
        q.processAllAvailable()
        assert spark.sql(f"SELECT count(*) n FROM sched_view_{os.getpid()}").first().n == 1
    finally:
        ctl.stop()


def test_property_rename_table():
    """Reference property spellings land on the engine handler keys
    where the generic snake_case alias doesn't (PROCESSORS.md names)."""
    from nifi_minifi_cpp_spark.plans.reference_dialect import _props

    p = _props({"Remote URL": "http://x", "HTTP Method": "GET"}, "InvokeHTTP")
    assert p["url"] == "http://x" and p["method"] == "GET"

    p = _props({"File to Tail": "/var/log/x.log", "State File": "/tmp/st",
                "Input Delimiter": "\\n"}, "TailFile")
    assert p["pattern"] == "/var/log/x.log" and p["state_path"] == "/tmp/st"

    p = _props({"Merge Strategy": "Defragment",
                "Correlation Attribute Name": "frag.id",
                "Maximum Number of Entries": "50"}, "MergeContent")
    assert p["merge_strategy"] == "defragment"
    assert p["correlation_attribute"] == "frag.id" and p["max_entries"] == "50"

    p = _props({"Kafka Brokers": "b:9092", "Topic Names": "t1,t2"}, "ConsumeKafka")
    assert p["brokers"] == "b:9092" and p["topics"] == "t1,t2"

    p = _props({"Conflict Resolution Strategy": "fail"}, "PutFile")
    assert p["conflict_resolution"] == "fail"

    p = _props({"Hash Attribute": "h", "Hash Algorithm": "MD5"}, "HashContent")
    assert p["attribute"] == "h" and p["algorithm"] == "MD5"

    # explicit engine key always wins over a renamed reference key
    p = _props({"Remote URL": "http://ref", "url": "http://engine"}, "InvokeHTTP")
    assert p["url"] == "http://engine"


def test_reference_putfile_flow_runs(spark, tmp_path):
    """A reference-spelled PutFile flow writes through the engine."""
    out = str(tmp_path / "out")
    compile_flow(
        spark,
        {
            "Processors": [
                {"id": "gen", "class": "GenerateFlowFile",
                 "Properties": {"Batch Size": "2", "Custom Text": "w"}},
                {"id": "put", "class": "org.apache.nifi.minifi.processors.PutFile",
                 "Properties": {"Directory": out,
                                "Conflict Resolution Strategy": "replace"}},
            ],
            "Connections": [
                {"source id": "gen", "destination id": "put",
                 "source relationship names": ["success"]}
            ],
        },
    )
    assert spark.read.parquet(out).count() == 2


def test_rpg_only_group_and_name_reference(spark, tmp_path):
    """Review fix: a group whose only members are RPG ports keeps
    them, and connections may reference the port by display name."""
    chan = str(tmp_path / "rpg2")
    flow = compile_flow(
        spark,
        {
            "Processors": [
                {"id": "gen", "class": "GenerateFlowFile",
                 "Properties": {"Batch Size": "2", "Custom Text": "x"}}
            ],
            "Process Groups": [
                {"id": "g2", "name": "g2",
                 "Remote Process Groups": [
                     {"name": "remote", "url": "http://r/nifi",
                      "Input Ports": [{"id": "rp", "name": "Port Name",
                                       "Properties": {"Channel": chan}}]}
                 ]}
            ],
            "Connections": [
                {"source id": "gen", "destination name": "g2/rp",
                 "source relationship names": ["success"]}
            ],
        },
    )
    assert flow is not None
    assert spark.read.option("recursiveFileLookup", "true").parquet(chan).count() == 2


def test_convert_record_service_path_requires_schema(spark):
    """Review fix: the PROCESSORS.md 'Record Writer' spelling resolves,
    and a missing schema raises the designed error, not a KeyError."""
    flow = {
        "Controller Services": [
            {"id": "r1", "name": "reader", "class": "JsonTreeReader"},
            {"id": "w1", "name": "writer", "class": "JsonRecordSetWriter"},
        ],
        "Processors": [
            {"id": "gen", "class": "GenerateFlowFile",
             "Properties": {"Batch Size": "1", "Custom Text": '{"a":1}'}},
            {"id": "conv", "class": "ConvertRecord",
             "Properties": {"Record Reader": "reader", "Record Writer": "writer"}},
        ],
        "Connections": [
            {"source id": "gen", "destination id": "conv",
             "source relationship names": ["success"]}
        ],
    }
    with pytest.raises(Exception, match="needs a 'schema' property"):
        compile_flow(spark, flow)
    flow["Processors"][1]["Properties"]["schema"] = "a int"
    out = compile_flow(spark, flow).df("conv").first().content
    import json as _json

    assert _json.loads(out) == [{"a": 1}]


def test_streaming_reference_yaml_tail_route_put(spark, tmp_path):
    """r6 (VERDICT r5 #8): a STREAMING reference-dialect YAML runs end
    to end — TailFileStream -> RouteText -> PutFile — with the
    TIMER_DRIVEN scheduling period mapped onto the micro-batch trigger
    and RouteText's well-known reference properties (Matching/Routing
    Strategy) consumed as configuration, not mistaken for routes."""
    import yaml as _yaml

    from nifi_minifi_cpp_spark.plans.pipeline import FlowController
    from nifi_minifi_cpp_spark.plans.reference_dialect import normalize_flow_config

    logdir = tmp_path / "logs"
    logdir.mkdir()
    (logdir / "app.log").write_text(
        "INFO started\nERROR disk full\nINFO heartbeat\nERROR net down\n"
    )
    out_dir = tmp_path / "out"
    text = f"""
Flow Controller:
  name: tail-route-put
Processors:
- id: tail1
  name: TailApp
  class: org.apache.nifi.minifi.processors.TailFileStream
  scheduling strategy: EVENT_DRIVEN
  Properties:
    File to Tail: {logdir}/app.log
- id: route1
  name: RouteErrors
  class: org.apache.nifi.minifi.processors.RouteText
  scheduling strategy: EVENT_DRIVEN
  Properties:
    Routing Strategy: Dynamic Routing
    Matching Strategy: Starts With
    errors: ERROR
- id: put1
  name: PutErrors
  class: org.apache.nifi.minifi.processors.PutFile
  scheduling strategy: TIMER_DRIVEN
  scheduling period: 300 ms
  Properties:
    Directory: {out_dir}
    checkpoint: {tmp_path / 'ck'}
Connections:
- source id: tail1
  source relationship names: [success]
  destination id: route1
- source id: route1
  source relationship names: [errors]
  destination id: put1
"""
    config = _yaml.safe_load(text)
    norm = normalize_flow_config(config)
    # RouteText's well-known properties resolved to engine keys, the
    # dynamic route survived, and TIMER_DRIVEN landed on the sink
    route = next(p for p in norm["processors"] if p["id"] == "route1")
    assert route["properties"]["_matching"] == "Starts With"
    assert route["properties"]["_routing"] == "Dynamic Routing"
    assert route["properties"]["errors"] == "ERROR"
    put = next(p for p in norm["processors"] if p["id"] == "put1")
    assert put["properties"]["trigger_period"] == "300 ms"

    ctl = FlowController(spark, text).start()
    try:
        assert len(ctl.queries) == 1
        import time as _time

        deadline = _time.monotonic() + 60
        while _time.monotonic() < deadline:
            try:
                if spark.read.parquet(str(out_dir)).count() >= 2:
                    break
            except Exception:
                pass
            _time.sleep(0.3)
    finally:
        ctl.stop()
    rows = spark.read.parquet(str(out_dir)).select("content").collect()
    assert sorted(r["content"] for r in rows) == ["ERROR disk full", "ERROR net down"]
