"""Concrete push-sink adapters: batching boundaries, payload shapes,
and ack semantics — all with fakes, no network.

Mirrors the reference's per-processor unit tests:
PutSplunkHTTP.cpp:47-93, QuerySplunkIndexingStatus.cpp:77-101,
PushGrafanaLoki.cpp:30-67 / PushGrafanaLokiREST.cpp:100-143,
PutKinesisStream.cpp:44-52, PostElasticsearch.cpp:80-135.
"""

from __future__ import annotations

import json

from nifi_minifi_cpp_spark import streaming as st

# -- Splunk HEC ---------------------------------------------------------------


def test_splunk_hec_url_params():
    url = st.splunk_hec_url("https://splunk:8088", source_type="st v", source="s", host="h", index="i")
    assert url.startswith("https://splunk:8088/services/collector/raw?")
    assert "sourcetype=st%20v" in url and "source=s" in url and "host=h" in url and "index=i" in url
    assert st.splunk_hec_url("https://splunk:8088") == "https://splunk:8088/services/collector/raw"


def test_parse_hec_ack():
    assert st.parse_hec_ack('{"text":"Success","ackId":42}') == 42
    assert st.parse_hec_ack('{"text":"Success"}') is None
    assert st.parse_hec_ack("not json") is None
    assert st.parse_hec_ack('{"ackId": true}') is None  # bool is not an ack id


def test_splunk_ack_request_and_response_roundtrip():
    body = st.build_splunk_ack_request([3, 1, 2, 3])
    assert json.loads(body) == {"acks": [1, 2, 3]}
    status = st.parse_splunk_ack_response('{"acks": {"1": true, "2": false, "zzz": true, "3": 7}}')
    assert status == {1: True, 2: False}
    assert st.parse_splunk_ack_response("nope") == {}


def test_put_splunk_http_ack_column(spark):
    """End-to-end through mapInPandas with a fake HEC: every row gets a
    status and ackId; unacked rows route to retry after the poll."""

    def factory():
        class Resp:
            def __init__(self, n):
                self.status_code = 200
                self.text = json.dumps({"text": "Success", "ackId": n})

        class Sess:
            def request(self, method, url, data=None, headers=None, timeout=None):
                assert headers["Authorization"].startswith("Splunk ")
                if b"/ack" not in data and "collector/raw" in url:
                    return Resp(int(data.decode()))
                raise AssertionError("unexpected call")

        return Sess()

    df = spark.createDataFrame([(str(i),) for i in range(10)], "content string")
    out = st.put_splunk_http(df, "https://splunk:8088", "tok", session_factory=factory)
    rows = out.collect()
    assert {r["splunk_ack_id"] for r in rows} == set(range(10))
    assert all(r["splunk_status_code"] == 200 for r in rows)


def test_query_splunk_indexing_status(spark):
    """Ack poll: one request per Arrow batch; even ids acked."""

    def factory():
        class Resp:
            def __init__(self, acks):
                self.status_code = 200
                self.text = json.dumps({"acks": acks})

        class Sess:
            def request(self, method, url, data=None, headers=None, timeout=None):
                assert url.endswith("/services/collector/ack")
                ids = json.loads(data)["acks"]
                return Resp({str(i): (i % 2 == 0) for i in ids})

        return Sess()

    df = spark.createDataFrame([(i, f"c{i}") for i in range(8)], "splunk_ack_id long, content string")
    out = st.query_splunk_indexing_status(df, "https://splunk:8088", "tok", session_factory=factory)
    got = {r["splunk_ack_id"]: r["splunk_acknowledged"] for r in out.collect()}
    assert got == {i: (i % 2 == 0) for i in range(8)}


# -- Grafana Loki -------------------------------------------------------------


def test_loki_payload_shape():
    payload = json.loads(
        st.build_loki_payload(
            [(1000, "line one"), (2000, "line two", {"level": "err"})],
            {"job": "minifi", "env": "test"},
        )
    )
    assert payload["streams"][0]["stream"] == {"job": "minifi", "env": "test"}
    values = payload["streams"][0]["values"]
    assert values[0] == ["1000", "line one"]
    assert values[1] == ["2000", "line two", {"level": "err"}]


def test_loki_batch_by_count():
    batches = list(st.batch_by_count_and_age(range(10), batch_size=4, batch_wait_ms=None))
    assert [(len(b), r) for b, r in batches] == [(4, "size"), (4, "size"), (2, "final")]


def test_loki_batch_by_age():
    """Injected clock: the 3rd element arrives past the wait window."""
    t = {"now": 0}

    def clock():
        t["now"] += 40
        return t["now"]

    batches = list(st.batch_by_count_and_age(range(5), batch_size=None, batch_wait_ms=100, now_ms=clock))
    # start=40; flush when now-start >= 100 -> after elements at 80,120 (120-40>=100)
    assert batches[0][1] == "age"
    assert sum(len(b) for b, _ in batches) == 5


def test_loki_batch_no_limits_single_final():
    batches = list(st.batch_by_count_and_age(range(7), batch_size=None, batch_wait_ms=None))
    assert [(len(b), r) for b, r in batches] == [(7, "final")]


# -- Kinesis ------------------------------------------------------------------


def test_kinesis_batch_record_count_cap():
    recs = [("k", b"x") for _ in range(1200)]
    batches = list(st.build_kinesis_batches(recs))
    assert [len(b) for b in batches] == [500, 500, 200]


def test_kinesis_batch_size_cap():
    big = b"x" * (1024 * 1024)  # 1 MB each
    recs = [("k", big) for _ in range(9)]
    batches = list(st.build_kinesis_batches(recs))
    # soft cap: flush when total >= 4MB AFTER adding -> 4 per batch
    assert [len(b) for b in batches] == [4, 4, 1]


def test_kinesis_caps_clamp_to_service_limits():
    recs = [("k", b"x") for _ in range(600)]
    batches = list(st.build_kinesis_batches(recs, max_records=10_000))
    assert [len(b) for b in batches] == [500, 100]


# -- Elasticsearch ------------------------------------------------------------


def test_es_bulk_payload_actions():
    rows = [
        {"action": "index", "index": "logs", "id": "a", "doc": {"msg": "hi"}},
        {"action": "create", "index": "logs", "id": None, "doc": '{"msg":"raw"}'},
        {"action": "delete", "index": "logs", "id": "b", "doc": None},
        {"action": "update", "index": "logs", "id": "c", "doc": {"msg": "up"}},
        {"action": "upsert", "index": "logs", "id": "d", "doc": {"msg": "ups"}},
    ]
    payload, errors = st.build_es_bulk_payload(rows)
    assert errors == []
    lines = [json.loads(ln) for ln in payload.strip().split("\n")]
    # index: header+doc; create: header+doc; delete: header; update: header+doc; upsert->update: header+doc
    assert lines[0] == {"index": {"_index": "logs", "_id": "a"}}
    assert lines[1] == {"msg": "hi"}
    assert lines[2] == {"create": {"_index": "logs"}}
    assert lines[3] == {"msg": "raw"}
    assert lines[4] == {"delete": {"_index": "logs", "_id": "b"}}
    assert lines[5] == {"update": {"_index": "logs", "_id": "c"}}
    assert lines[6] == {"doc": {"msg": "up"}}
    assert lines[7] == {"update": {"_index": "logs", "_id": "d"}}
    assert lines[8] == {"doc": {"msg": "ups"}, "doc_as_upsert": True}
    assert payload.endswith("\n")


def test_es_bulk_payload_validation():
    rows = [
        {"action": "nuke", "index": "logs", "id": "a", "doc": {}},
        {"action": "index", "index": None, "id": "a", "doc": {}},
        {"action": "delete", "index": "logs", "id": None, "doc": None},
        {"action": "index", "index": "logs", "id": None, "doc": {"ok": 1}},
    ]
    payload, errors = st.build_es_bulk_payload(rows)
    assert [e[0] for e in errors] == [0, 1, 2]
    assert "missing or invalid action" in errors[0][1]
    assert "missing index" in errors[1][1]
    assert "identifier is required for delete" in errors[2][1]
    lines = [json.loads(ln) for ln in payload.strip().split("\n")]
    assert lines == [{"index": {"_index": "logs"}}, {"ok": 1}]


# -- PublishMQTT --------------------------------------------------------------


def test_publish_mqtt_handler_per_row_topic(spark, tmp_path):
    """Executor-side publish: the fake client writes to a shared file
    (local[n] executors share the FS) so publishes are observable."""
    out = tmp_path / "published.txt"

    def factory(path=str(out)):
        class Client:
            def publish(self, topic, payload, qos=0, retain=False):
                with open(path, "a") as f:
                    f.write(f"{topic}|{payload.decode()}|{qos}|{retain}\n")

        return Client()

    handler = st.publish_mqtt_handler(
        "tcp://broker:1883", "default/topic", topic_col="t", qos=1, client_factory=factory
    )
    batch = spark.createDataFrame(
        [("m1", "sensors/a"), ("m2", "sensors/b")], "content string, t string"
    )
    handler(batch, epoch_id=1)
    lines = sorted(out.read_text().strip().split("\n"))
    assert lines == ["sensors/a|m1|1|False", "sensors/b|m2|1|False"]
