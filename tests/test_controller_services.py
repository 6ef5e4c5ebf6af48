"""Controller services (plans/services.py) vs CONTROLLERS.md.

Covers: section parsing (name/id/class + Properties, list-props as
``- value: X`` per C2.md:299), credential services -> Hadoop conf,
record reader/writer services driving ConvertRecord in a compiled
flow, state storages as state-path providers, the UpdatePolicy gate
on C2 ``update properties``, and clear errors for unknown classes or
dangling references.
"""

from __future__ import annotations

import json
import os

import pytest

from nifi_minifi_cpp_spark.plans.services import (
    ControllerService,
    ServiceError,
    parse_controller_services,
    resolve_service_refs,
    state_path,
)

AWS_YAML = {
    "Controller Services": [
        {
            "id": "aws-1",
            "name": "MyAWSCreds",
            "class": "AWSCredentialsService",
            "Properties": {"Access Key": "AKIATEST", "Secret Key": "shhh"},
        }
    ]
}


def test_parse_section_and_lookup_by_name_and_id():
    reg = parse_controller_services(AWS_YAML)
    assert len(reg) == 1
    assert reg.get("MyAWSCreds") is reg.get("aws-1")
    assert "MyAWSCreds" in reg and "aws-1" in reg


def test_aws_credentials_props_to_s3a_conf():
    reg = parse_controller_services(AWS_YAML)
    conf = reg.resolve("MyAWSCreds")["hadoop_conf"]
    assert conf == {"fs.s3a.access.key": "AKIATEST", "fs.s3a.secret.key": "shhh"}


def test_aws_credentials_file_and_default_chain(tmp_path):
    f = tmp_path / "creds.properties"
    f.write_text("accessKey=AKIAFILE\nsecretKey=filesecret\n")
    svc = ControllerService("c", "c", "AWSCredentialsService", {"Credentials File": str(f)})
    conf = svc.resolve()["hadoop_conf"]
    assert conf["fs.s3a.access.key"] == "AKIAFILE"
    assert conf["fs.s3a.secret.key"] == "filesecret"

    chain = ControllerService(
        "d", "d", "AWSCredentialsService", {"Use Default Credentials": "true"}
    ).resolve()["hadoop_conf"]
    assert "DefaultAWSCredentialsProviderChain" in chain["fs.s3a.aws.credentials.provider"]

    with pytest.raises(ServiceError, match="Access Key"):
        ControllerService("e", "e", "AWSCredentialsService", {}).resolve()


def test_azure_connection_string_parse():
    svc = ControllerService(
        "az", "az", "AzureStorageCredentialsService",
        {"Connection String": "AccountName=acct1;AccountKey=k3y;EndpointSuffix=core.chinacloudapi.cn"},
    )
    conf = svc.resolve()["hadoop_conf"]
    assert conf["fs.azure.account.key.acct1.blob.core.chinacloudapi.cn"] == "k3y"


def test_azure_managed_identity_maps_to_oauth_msi():
    svc = ControllerService(
        "az", "az", "AzureStorageCredentialsService",
        {"Storage Account Name": "acct2", "Credential Configuration Strategy": "Managed Identity"},
    )
    conf = svc.resolve()["hadoop_conf"]
    assert conf["fs.azure.account.auth.type.acct2.dfs.core.windows.net"] == "OAuth"
    assert "MsiTokenProvider" in conf["fs.azure.account.oauth.provider.type.acct2.dfs.core.windows.net"]


def test_gcp_raw_json_materializes_keyfile():
    svc = ControllerService(
        "g", "g", "GCPCredentialsControllerService",
        {"Credentials Location": "Service Account JSON",
         "Service Account JSON": json.dumps({"type": "service_account"})},
    )
    conf = svc.resolve()["hadoop_conf"]
    keyfile = conf["google.cloud.auth.service.account.json.keyfile"]
    assert json.load(open(keyfile))["type"] == "service_account"
    os.unlink(keyfile)


def test_state_storages_path_contract(tmp_path):
    vol = ControllerService("v", "v", "VolatileMapStateStorage", {}).resolve()
    p1 = state_path(vol, "TailFile-1")
    assert p1.endswith("TailFile-1.json") and os.path.isdir(vol["directory"])

    with pytest.raises(ServiceError, match="File"):
        ControllerService("p", "p", "PersistentMapStateStorage", {}).resolve()
    per = ControllerService(
        "p", "p", "PersistentMapStateStorage",
        {"File": str(tmp_path / "state.db"), "Always Persist": "true"},
    ).resolve()
    assert state_path(per, "c1") == str(tmp_path / "state.db.c1.json")
    assert per["always_persist"] is True

    rocks = ControllerService(
        "r", "r", "RocksDbStateStorage", {"Directory": str(tmp_path / "rocks")}
    ).resolve()
    assert state_path(rocks, "c2") == str(tmp_path / "rocks" / "c2.json")
    assert os.path.isdir(str(tmp_path / "rocks"))


def test_proxy_and_odbc_and_es():
    assert ControllerService(
        "x", "x", "ProxyConfigurationService", {"Proxy Type": "DIRECT"}
    ).resolve()["proxy_url"] is None
    url = ControllerService(
        "x", "x", "ProxyConfigurationService",
        {"Proxy Server Host": "p.example", "Proxy Server Port": "8080",
         "Proxy User Name": "u", "Proxy User Password": "pw"},
    ).resolve()["proxy_url"]
    assert url == "http://u:pw@p.example:8080"

    odbc = ControllerService(
        "o", "o", "ODBCService",
        {"Connection String": "Driver=SQLite3;Database=/tmp/db.sqlite"},
    ).resolve()
    assert odbc["jdbc_options"]["database"] == "/tmp/db.sqlite"

    es = ControllerService(
        "e", "e", "ElasticsearchCredentialsControllerService",
        {"Username": "elastic", "Password": "pw"},
    ).resolve()
    assert es["auth_header"].startswith("Basic ")
    es_key = ControllerService(
        "e", "e", "ElasticsearchCredentialsControllerService", {"API Key": "abc"}
    ).resolve()
    assert es_key["auth_header"] == "ApiKey abc"


def test_update_policy_gate_semantics():
    """C2.md:290-304 example shape: disallowed wins over allow-all."""
    pol = ControllerService(
        "C2UpdatePolicy", "94491a38", "UpdatePolicyControllerService",
        {"Allow All Properties": "true",
         "Allowed Properties": [{"value": "Property_1"}],
         "Disallowed Properties": [{"value": "Property_3"}, {"value": "Property_4"}]},
    ).resolve()
    can = pol["can_update"]
    assert can("Property_1") and can("anything.else")
    assert not can("Property_3") and not can("Property_4")

    deny_default = ControllerService(
        "p", "p", "UpdatePolicyControllerService",
        {"Allowed Properties": [{"value": "only.this"}]},
    ).resolve()["can_update"]
    assert deny_default("only.this") and not deny_default("other")


def test_unknown_class_and_dangling_reference_errors(spark):
    with pytest.raises(ServiceError, match="unknown controller service class"):
        ControllerService("b", "b", "NoSuchService", {}).resolve()
    reg = parse_controller_services(AWS_YAML)
    with pytest.raises(ServiceError, match="not declared"):
        resolve_service_refs(spark, {"SSL Context Service": "missing"}, reg)


def test_agent_runtime_services_parse_without_fakery():
    svc = ControllerService("pm", "pm", "LinuxPowerManagerService", {"Battery Capacity Path": "/sys/x"})
    assert svc.resolve()["agent_runtime"] is True


def test_resolve_service_refs_swaps_and_applies(spark):
    reg = parse_controller_services(AWS_YAML)
    props = resolve_service_refs(
        spark, {"url": "s3a://b/k", "AWS Credentials Provider service": "MyAWSCreds"}, reg
    )
    assert "AWS Credentials Provider service" not in props
    assert props["credentials"]["hadoop_conf"]["fs.s3a.access.key"] == "AKIATEST"
    hc = spark._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.access.key") == "AKIATEST"


def test_convert_record_through_services_in_flow(spark):
    """A compiled flow whose ConvertRecord references declared
    JsonTreeReader/XMLRecordSetWriter services — the reference's
    actual wiring (ConvertRecord.cpp:36)."""
    from nifi_minifi_cpp_spark.plans.pipeline import compile_flow

    flow = {
        "Controller Services": [
            {"id": "r1", "name": "reader", "class": "JsonTreeReader"},
            {"id": "w1", "name": "writer", "class": "XMLRecordSetWriter",
             "Properties": {"Name of Record Tag": "rec", "Name of Root Tag": "root"}},
        ],
        "processors": [
            {"id": "src", "type": "GenerateFlowFile",
             "properties": {"batch_size": 2, "custom_text": '{"a": 1, "b": "x"}'}},
            {"id": "conv", "type": "ConvertRecord",
             "properties": {"Record Reader": "reader", "Record Set Writer": "writer",
                            "schema": "a int, b string"}},
        ],
        "connections": [{"source": "src", "destination": "conv"}],
    }
    out = compile_flow(spark, flow).df("conv")
    rows = [r.content for r in out.collect()]
    assert len(rows) == 2
    for xml in rows:
        assert xml.startswith("<rec>") and "<a>1</a>" in xml and "<b>x</b>" in xml


def test_convert_record_json_array_grouping(spark):
    from nifi_minifi_cpp_spark.sources.convert_record import convert_record_with_services

    df = spark.createDataFrame([('{"a": 5}',)], "content string")
    reader = ControllerService("r", "r", "JsonTreeReader", {}).resolve()
    arr_writer = ControllerService("w", "w", "JsonRecordSetWriter", {}).resolve()
    out = convert_record_with_services(df, reader, arr_writer, "a int").first().content
    assert json.loads(out) == [{"a": 5}]  # single row still an array

    line_writer = ControllerService(
        "w2", "w2", "JsonRecordSetWriter", {"Output Grouping": "One Line Per Object"}
    ).resolve()
    out2 = convert_record_with_services(df, reader, line_writer, "a int").first().content
    assert json.loads(out2) == {"a": 5}

    pretty_writer = ControllerService(
        "w3", "w3", "JsonRecordSetWriter", {"Pretty Print JSON": "true"}
    ).resolve()
    out3 = convert_record_with_services(df, reader, pretty_writer, "a int").first().content
    assert "\n" in out3 and json.loads(out3) == [{"a": 5}]


def test_c2_update_properties_gated_by_policy():
    from nifi_minifi_cpp_spark.plans.c2 import (
        FULLY_APPLIED,
        NO_OPERATION,
        NOT_APPLIED,
        PARTIALLY_APPLIED,
        C2Agent,
    )
    from nifi_minifi_cpp_spark.plans.pipeline import FlowController

    pol = ControllerService(
        "pol", "pol", "UpdatePolicyControllerService",
        {"Allowed Properties": [{"value": "nifi.c2.agent.heartbeat.period"}]},
    ).resolve()
    agent = C2Agent(
        FlowController.__new__(FlowController), transport=lambda p: None,
        properties={"nifi.c2.agent.heartbeat.period": "30"}, update_policy=pol,
    )

    ok = agent.process_operation(
        {"operation": "update", "operand": "properties", "identifier": "1",
         "args": {"nifi.c2.agent.heartbeat.period": "10"}}
    )
    assert ok["operationState"]["state"] == FULLY_APPLIED
    assert agent.properties["nifi.c2.agent.heartbeat.period"] == "10"

    denied = agent.process_operation(
        {"operation": "update", "operand": "properties", "identifier": "2",
         "args": {"nifi.secret.thing": "x"}}
    )
    assert denied["operationState"]["state"] == NOT_APPLIED
    assert "nifi.secret.thing" not in agent.properties

    mixed = agent.process_operation(
        {"operation": "update", "operand": "properties", "identifier": "3",
         "args": {"nifi.c2.agent.heartbeat.period": {"value": "5", "persist": False},
                  "nifi.secret.thing": "x"}}
    )
    assert mixed["operationState"]["state"] == PARTIALLY_APPLIED

    noop = agent.process_operation(
        {"operation": "update", "operand": "properties", "identifier": "4",
         "args": {"nifi.c2.agent.heartbeat.period": "5"}}
    )
    assert noop["operationState"]["state"] == NO_OPERATION


def test_http_session_factory_wires_ssl_and_proxy(monkeypatch):
    """Resolved SSLContextService/ProxyConfigurationService configs
    reach the requests transport: proxies/verify/cert set on the
    session (requests stubbed — the lib is not in this container)."""
    import sys
    import types

    from nifi_minifi_cpp_spark.plans.services import ControllerService
    from nifi_minifi_cpp_spark.streaming.sinks import build_http_session_factory

    class FakeSession:
        def __init__(self):
            self.proxies = {}
            self.verify = True
            self.cert = None

    fake_requests = types.SimpleNamespace(Session=FakeSession)
    monkeypatch.setitem(sys.modules, "requests", fake_requests)

    ssl_conf = ControllerService(
        "s", "s", "SSLContextService",
        {"Client Certificate": "/c.pem", "Private Key": "/k.pem", "CA Certificate": "/ca.pem"},
    ).resolve()
    proxy_conf = ControllerService(
        "p", "p", "ProxyConfigurationService",
        {"Proxy Server Host": "proxy.local", "Proxy Server Port": "3128"},
    ).resolve()

    factory = build_http_session_factory(ssl_conf, proxy_conf)
    s = factory()
    assert s.proxies == {"http": "http://proxy.local:3128",
                         "https": "http://proxy.local:3128"}
    assert s.verify == "/ca.pem"
    assert s.cert == ("/c.pem", "/k.pem")

    # DIRECT proxy + no certs -> no factory (plain session fallback)
    direct = ControllerService(
        "d", "d", "ProxyConfigurationService", {"Proxy Type": "DIRECT"}
    ).resolve()
    assert build_http_session_factory(None, direct) is None


def test_couchbase_and_k8s_services_reach_handlers(spark):
    """Declared CouchbaseClusterService resolves into the KV client
    factory (import-gated: absent lib -> the factory's clear error),
    and KubernetesControllerService filters default the collector's
    regex properties."""
    from nifi_minifi_cpp_spark.plans.pipeline import compile_flow

    with pytest.raises(ImportError, match="couchbase client library"):
        compile_flow(
            spark,
            {
                "Controller Services": [
                    {"id": "cb", "name": "cluster", "class": "CouchbaseClusterService",
                     "Properties": {"Connection String": "couchbase://db1"}}
                ],
                "processors": [
                    {"id": "gen", "type": "GenerateFlowFile",
                     "properties": {"custom_text": "k1"}},
                    {"id": "get", "type": "GetCouchbaseKey",
                     "properties": {"Couchbase Cluster Controller Service": "cluster",
                                    "key_col": "content"}},
                ],
                "connections": [{"source": "gen", "destination": "get"}],
            },
        )

    class FakeK8s:
        def pod_metrics_list(self):
            return '{"items": []}'

    flow = compile_flow(
        spark,
        {
            "Controller Services": [
                {"id": "k", "name": "kube", "class": "KubernetesControllerService",
                 "Properties": {"Namespace Filter": "prod-.*", "Pod Name Filter": "web-.*"}}
            ],
            "processors": [
                {"id": "pods", "type": "CollectKubernetesPodMetrics",
                 "properties": {"Kubernetes Controller Service": "kube",
                                "api_client": FakeK8s()}},
            ],
            "connections": [],
        },
    )
    assert flow.df("pods") is not None  # filters flowed from the service


def test_azure_connection_string_does_not_clobber_declared_key():
    """Review fix: a connection string without AccountKey must not
    erase an explicitly declared Storage Account Key."""
    svc = ControllerService(
        "az", "az", "AzureStorageCredentialsService",
        {"Connection String": "AccountName=acct;EndpointSuffix=core.windows.net",
         "Storage Account Key": "declared-key"},
    )
    conf = svc.resolve()["hadoop_conf"]
    assert conf["fs.azure.account.key.acct.blob.core.windows.net"] == "declared-key"

    sas_cs = ControllerService(
        "az2", "az2", "AzureStorageCredentialsService",
        {"Connection String": "AccountName=a2;SharedAccessSignature=sig=x"},
    ).resolve()["hadoop_conf"]
    assert sas_cs["fs.azure.sas.fixed.token.a2.dfs.core.windows.net"] == "sig=x"


def test_gcp_missing_property_is_service_error():
    with pytest.raises(ServiceError, match="Service Account JSON File"):
        ControllerService(
            "g", "g", "GCPCredentialsControllerService",
            {"Credentials Location": "Service Account JSON File"},
        ).resolve()
