"""TailFile rotation semantics, ListFile/FetchFile, archives, LLM
inference operator, Observation metrics."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from nifi_minifi_cpp_spark import analytics as an
from nifi_minifi_cpp_spark import operators as ops
from nifi_minifi_cpp_spark import sources as src
from nifi_minifi_cpp_spark.metrics import with_transfer_metrics


# -- TailFile -----------------------------------------------------------------


def test_tailfile_appends_and_partial_lines(spark, tmp_path):
    log = tmp_path / "app.log"
    state = str(tmp_path / "tail.json")
    tail = src.TailFile(str(log), state)

    log.write_text("line1\nline2\npartial")
    out = tail.poll(spark)
    assert [r["content"] for r in out.orderBy("position").collect()] == ["line1", "line2"]

    # completing the partial line + appending emits both
    with open(log, "a") as f:
        f.write("-done\nline4\n")
    out2 = tail.poll(spark)
    assert [r["content"] for r in out2.orderBy("position").collect()] == ["partial-done", "line4"]

    # nothing new -> None
    assert tail.poll(spark) is None


def test_tailfile_rotation_detected(spark, tmp_path):
    log = tmp_path / "rot.log"
    state = str(tmp_path / "tail2.json")
    tail = src.TailFile(str(log), state)
    log.write_text("old1\nold2\n")
    assert tail.poll(spark).count() == 2
    # rotate: replace file with new content (different head)
    log.write_text("new-a\nnew-b\nnew-c\n")
    out = tail.poll(spark)
    assert [r["content"] for r in out.orderBy("position").collect()] == ["new-a", "new-b", "new-c"]


def test_tailfile_empty_main_after_rotation_resets_state(spark, tmp_path):
    """r16 (ADVICE r15): after rotation recovery, an EMPTY new main
    file must still get fresh state — otherwise the stale
    position/checksum re-detects the same rotation (and re-CRCs every
    sibling) on every poll until data arrives."""
    log = tmp_path / "rot.log"
    state = str(tmp_path / "tail4.json")
    tail = src.TailFile(str(log), state)
    log.write_text("a\nb\n")
    assert tail.poll(spark).count() == 2
    # logrotate: rename away, recreate EMPTY
    os.rename(log, tmp_path / "rot.log.1")
    log.write_text("")
    out = tail.poll(spark)
    assert out is None  # nothing new: the sibling was fully read before
    # the second poll must NOT re-enter the rotation branch
    def _boom(path, last_read_time):
        raise AssertionError("rotation re-detected on a poll after recovery")

    tail._rotated_candidates = _boom
    assert tail.poll(spark) is None
    # and new data in the fresh main reads from 0
    log.write_text("c\n")
    assert [r["content"] for r in tail.poll(spark).collect()] == ["c"]


def test_tailfile_rolling_glob(spark, tmp_path):
    state = str(tmp_path / "tail3.json")
    (tmp_path / "x.log.1").write_text("rotated\n")
    (tmp_path / "x.log").write_text("current\n")
    tail = src.TailFile(str(tmp_path / "x.log*"), state)
    out = tail.poll(spark)
    got = {(os.path.basename(r["file"]), r["content"]) for r in out.collect()}
    assert got == {("x.log", "current"), ("x.log.1", "rotated")}


# -- ListFile / FetchFile -----------------------------------------------------


def test_fetch_file_is_distributed_no_driver_collect(spark, tmp_path):
    """FetchFile reads content executor-side (mapInPandas over the
    listing) — no driver path collect; unreadable paths -> NULL
    content (failure relationship)."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("alpha")
    listing = src.list_file(spark, str(d / "*.txt"))
    listing = listing.unionByName(
        spark.createDataFrame(
            [(str(d / "missing.txt"), "missing.txt", 0, 0.0)], listing.schema
        )
    )
    fetched = src.fetch_file(spark, listing)
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    got = {r["filename"]: r["content"] for r in fetched.collect()}
    assert got == {"a.txt": "alpha", "missing.txt": None}


def test_fetch_file_scan_prunes_and_joins(spark, tmp_path):
    """Object-store form: binaryFile scan of the root, pathGlobFilter
    pruning, join against the listing drops unlisted files."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("alpha")
    (d / "b.txt").write_text("beta")
    (d / "c.log").write_text("unlisted-format")
    listing = src.list_file(spark, str(d / "a.txt"))  # only a.txt listed
    fetched = src.fetch_file_scan(
        spark, listing, str(d), path_glob_filter="*.txt"
    )
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan and "FileScan" in plan
    got = {r["filename"]: r["content"] for r in fetched.collect()}
    assert got == {"a.txt": "alpha"}


def test_list_fetch_incremental(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("alpha")
    (d / "b.txt").write_text("beta")
    state = src.ListFileState(str(tmp_path / "ls.json"))

    listing = src.list_file(spark, str(d / "*.txt"), state)
    assert listing.count() == 2
    fetched = src.fetch_file(spark, listing)
    got = {r["filename"]: r["content"] for r in fetched.collect()}
    assert got == {"a.txt": "alpha", "b.txt": "beta"}

    # no new files -> None
    assert src.list_file(spark, str(d / "*.txt"), state) is None
    # new file arrives -> only it is listed
    time.sleep(0.05)
    (d / "c.txt").write_text("gamma")
    os.utime(d / "c.txt", (time.time() + 2, time.time() + 2))
    listing2 = src.list_file(spark, str(d / "*.txt"), state)
    assert [r["filename"] for r in listing2.collect()] == ["c.txt"]


# -- archives -----------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["zip", "tar"])
def test_archive_roundtrip(spark, fmt):
    from tests.test_operators import make_ff

    ff = make_ff(
        spark,
        [
            ("1", "content-one", {"filename": "one.txt"}),
            ("2", "content-two", {"filename": "two.txt"}),
        ],
    )
    packed = ops.merge_content_archive(ff, fmt=fmt)
    rows = packed.collect()
    assert len(rows) == 1 and rows[0]["n_entries"] == 2
    unpacked = ops.unpack_archive(packed, fmt=fmt)
    got = {r["entry_name"]: r["content"] for r in unpacked.collect()}
    assert got == {"one.txt": "content-one", "two.txt": "content-two"}


# -- LLM inference ------------------------------------------------------------


def test_llm_inference_fake_backend(spark, tables):
    docs = tables["documents"].limit(10)
    out = an.run_llm_inference(docs, "Summarize: {{text}}", batch_size=4)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["completion"].startswith("FAKE:") for r in rows)
    # deterministic: same input -> same completion
    again = {r["doc_id"]: r["completion"] for r in an.run_llm_inference(docs, "Summarize: {{text}}").collect()}
    assert all(again[r["doc_id"]] == r["completion"] for r in rows)


def test_llm_inference_real_backend_gated(spark, tables, monkeypatch):
    """The llama factory is LAZY (model loads per worker at first call,
    r5); the gate error fires at call time. sys.modules is pinned to
    None so an addPyFile from another test can't leak a fake module in."""
    import sys

    monkeypatch.setitem(sys.modules, "llama_cpp", None)
    gen = an.llm_inference.llama_cpp_generate("/nonexistent/model.gguf")
    with pytest.raises(NotImplementedError, match="llama-cpp-python"):
        gen(["one prompt"])


# -- metrics ------------------------------------------------------------------


def test_transfer_metrics_observation(spark, tables):
    from nifi_minifi_cpp_spark.model import documents_to_flowfiles

    docs = documents_to_flowfiles(tables["documents"])
    observed, handle = with_transfer_metrics(docs, "route-out")
    n = observed.count()
    vals = handle.values
    assert vals["transferred_flowfiles"] == n
    total_chars = tables["documents"].agg(F.sum(F.length("text"))).first()[0]
    assert vals["transferred_bytes"] == total_chars


# -- TailFile as a native Python Data Source ----------------------------------


def test_tailfile_datasource_live_and_recovery(spark, tmp_path):
    """readStream.format('tailfile'): offsets live in the checkpoint;
    restart from checkpoint is exactly-once with a durable sink."""
    import time

    from nifi_minifi_cpp_spark.sources.datasource import register_tailfile

    register_tailfile(spark)
    log = tmp_path / "svc.log"
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    log.write_text("l1\nl2\n")

    def run_until(n_target, timeout=40):
        df = spark.readStream.format("tailfile").option("pattern", str(log)).load()
        q = (
            df.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck).start()
        )
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n_target:
                    break
            except Exception:
                pass
            time.sleep(1)
        q.stop()
        return sorted(r["content"] for r in spark.read.parquet(out).collect())

    assert run_until(2) == ["l1", "l2"]
    # append while the query is DOWN; restart from the same checkpoint
    with open(log, "a") as f:
        f.write("l3\nl4\n")
    assert run_until(4) == ["l1", "l2", "l3", "l4"]  # no dupes, no loss


def test_listen_udp_tcp_sources(spark, tmp_path):
    """readStream.format('udplisten'/'tcplisten'): one row per
    datagram/delimited message, sender attribution, monotonic offsets
    (ListenUDP.cpp:57 / ListenTCP.cpp:65 parity)."""
    import socket
    import time

    from nifi_minifi_cpp_spark.sources.datasource import register_listeners

    register_listeners(spark)

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    # --- UDP ---------------------------------------------------------------
    uport = free_port()
    udf = spark.readStream.format("udplisten").option("port", str(uport)).load()
    q = udf.writeStream.format("memory").queryName("udp_rows").start()
    try:
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        deadline = time.time() + 60
        sent = set()
        i = 0
        # listener thread starts with the first micro-batch; keep sending
        # until rows land (UDP pre-bind datagrams are droppable by design)
        while time.time() < deadline:
            msg = f"dgram-{i}"
            tx.sendto(msg.encode(), ("127.0.0.1", uport))
            sent.add(msg)
            i += 1
            rows = spark.sql("SELECT * FROM udp_rows").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM udp_rows").collect()
        assert len(rows) >= 3
        assert all(r["sender"] == "127.0.0.1" for r in rows)
        assert {r["message"] for r in rows} <= sent
        assert sorted(r["offset"] for r in rows) == list(range(len(rows)))
    finally:
        q.stop()

    # --- TCP ---------------------------------------------------------------
    tport = free_port()
    tdf = spark.readStream.format("tcplisten").option("port", str(tport)).load()
    q2 = tdf.writeStream.format("memory").queryName("tcp_rows").start()
    try:
        deadline = time.time() + 60
        connected = False
        while time.time() < deadline and not connected:
            try:
                c = socket.create_connection(("127.0.0.1", tport), timeout=1)
                connected = True
            except OSError:
                time.sleep(0.5)
        assert connected, "tcp listener never came up"
        c.sendall(b"alpha\nbeta\ngam")
        c.sendall(b"ma\n")
        c.close()
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM tcp_rows").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        msgs = sorted(r["message"] for r in spark.sql("SELECT * FROM tcp_rows").collect())
        assert msgs == ["alpha", "beta", "gamma"]
    finally:
        q2.stop()


def test_listen_http_source(spark):
    """readStream.format('httplisten'): POST body + headers -> one row
    per request (ListenHTTP.cpp:138 parity)."""
    import json
    import socket
    import time
    import urllib.request

    from nifi_minifi_cpp_spark.sources.datasource import register_listeners

    register_listeners(spark)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    df = spark.readStream.format("httplisten").option("port", str(port)).load()
    q = df.writeStream.format("memory").queryName("http_rows").start()
    try:
        deadline = time.time() + 60
        posted = 0
        while time.time() < deadline:
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/ingest",
                    data=f"payload-{posted}".encode(),
                    headers={"X-Flow-Id": "f1"},
                )
                urllib.request.urlopen(req, timeout=2)
                posted += 1
            except OSError:
                time.sleep(0.5)
                continue
            if posted >= 2 and len(spark.sql("SELECT * FROM http_rows").collect()) >= 2:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM http_rows").collect()
        assert len(rows) >= 2
        doc = json.loads(rows[0]["message"])
        assert doc["path"] == "/ingest"
        assert doc["headers"]["x-flow-id"] == "f1"
        assert doc["body"].startswith("payload-")
    finally:
        q.stop()


def test_consume_mqtt_fake_transport(spark):
    """readStream.format('mqttlisten') with the fake transport: each
    MQTT message becomes one row (topic->sender, payload->message),
    monotonic offsets (ConsumeMQTT.cpp:149 parity; paho import-gated)."""
    import json as _json
    import time

    from nifi_minifi_cpp_spark.sources.datasource import register_listeners

    register_listeners(spark)
    messages = [["sensors/a", "21.5"], ["sensors/b", "22.0"], ["sensors/a", "21.7"]]
    df = (
        spark.readStream.format("mqttlisten")
        .option("topic", "sensors/#")
        .option("transport", "fake")
        .option("fake.messages", _json.dumps(messages))
        .load()
    )
    q = df.writeStream.format("memory").queryName("mqtt_rows").start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM mqtt_rows").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM mqtt_rows ORDER BY offset").collect()
        assert [[r["sender"], r["message"]] for r in rows] == messages
        assert [r["offset"] for r in rows] == [0, 1, 2]
    finally:
        q.stop()


def test_consume_mqtt_requires_topic_and_gates_paho(spark):
    import pytest as _pytest

    from nifi_minifi_cpp_spark.sources.datasource import _MqttListenReader, connect_paho_client

    with _pytest.raises(ValueError, match="topic"):
        _MqttListenReader({})
    # paho is absent in this container: the gate must raise a clear
    # ImportError, not an opaque ModuleNotFoundError mid-thread
    with _pytest.raises(ImportError, match="paho-mqtt"):
        connect_paho_client("tcp://127.0.0.1:1883", "cid")


def test_journald_export_parsing_and_syslog_format():
    from nifi_minifi_cpp_spark.sources.datasource import (
        format_journal_syslog,
        parse_journal_export,
    )

    export = (
        "MESSAGE=service started\n_HOSTNAME=edge01\nSYSLOG_IDENTIFIER=myapp\n"
        "_PID=1234\n__REALTIME_TIMESTAMP=1700000000000000\n"
        "\n"
        "MESSAGE=second entry\n_HOSTNAME=edge01\n_COMM=worker\n"
    )
    entries = parse_journal_export(export)
    assert len(entries) == 2
    assert entries[0]["MESSAGE"] == "service started"
    assert format_journal_syslog(entries[0]) == "edge01 myapp[1234]: service started"
    assert format_journal_syslog(entries[1]) == "edge01 worker: second entry"


def test_consume_journald_cursor_stream(spark, tmp_path):
    """readStream.format('journald') over an export file: the cursor
    offset survives between micro-batches — appended entries arrive
    exactly once (ConsumeJournald.cpp:81-89 cursor-seek parity)."""
    import time

    from nifi_minifi_cpp_spark.sources.datasource import register_listeners

    register_listeners(spark)
    jf = tmp_path / "journal.export"
    jf.write_text("MESSAGE=m1\n_HOSTNAME=h\n\nMESSAGE=m2\n_HOSTNAME=h\n")
    df = (
        spark.readStream.format("journald")
        .option("file", str(jf))
        .option("process.old.messages", "true")
        .load()
    )
    q = df.writeStream.format("memory").queryName("jd_rows").start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.sql("SELECT * FROM jd_rows").count() < 2:
            time.sleep(0.5)
        # append two more entries; only they should arrive next
        with open(jf, "a") as f:
            f.write("\nMESSAGE=m3\n_HOSTNAME=h\n\nMESSAGE=m4\n_HOSTNAME=h\n")
        while time.time() < deadline and spark.sql("SELECT * FROM jd_rows").count() < 4:
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM jd_rows ORDER BY cursor").collect()
        assert [r["message"] for r in rows] == ["m1", "m2", "m3", "m4"]
        assert [r["cursor"] for r in rows] == [0, 1, 2, 3]  # exactly once
    finally:
        q.stop()


def test_consume_journald_tail_start_and_gating(spark, tmp_path):
    import pytest as _pytest

    from nifi_minifi_cpp_spark.sources.datasource import _JournaldReader

    jf = tmp_path / "j.export"
    jf.write_text("MESSAGE=old\n")
    # default (process.old.messages false) starts at the tail
    r = _JournaldReader({"file": str(jf), "process.old.messages": "false"})
    assert r.initialOffset() == {"cursor": 1}
    with _pytest.raises(ValueError, match="file"):
        _JournaldReader({})
    with _pytest.raises(ImportError, match="python-systemd"):
        _JournaldReader({"journal": "system"})


def test_consume_journald_checkpoint_recovery(spark, tmp_path):
    """journald source: the cursor offset lives in the checkpoint, so a
    stopped query restarted from the same checkpoint picks up exactly
    the entries appended while it was down (ConsumeJournald.cpp:81-89
    cursor persistence parity)."""
    import time

    from nifi_minifi_cpp_spark.sources.datasource import register_listeners

    register_listeners(spark)
    jf = tmp_path / "svc.export"
    ck = str(tmp_path / "jck")
    out = str(tmp_path / "jout")
    jf.write_text("MESSAGE=j1\n\nMESSAGE=j2\n")

    def run_until(n_target, timeout=40):
        df = (
            spark.readStream.format("journald")
            .option("file", str(jf))
            .option("process.old.messages", "true")
            .load()
        )
        q = (
            df.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck).start()
        )
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n_target:
                    break
            except Exception:
                pass
            time.sleep(1)
        q.stop()
        return sorted(r["message"] for r in spark.read.parquet(out).collect())

    assert run_until(2) == ["j1", "j2"]
    with open(jf, "a") as f:
        f.write("\nMESSAGE=j3\n\nMESSAGE=j4\n")
    assert run_until(4) == ["j1", "j2", "j3", "j4"]  # exactly once


# -- OPC UA / Modbus (injected clients) ---------------------------------------


def _fake_opc_tree():
    from nifi_minifi_cpp_spark.sources import OpcNode

    class FakeOpcClient:
        def __init__(self):
            self.values = {"ns=1;s=temp": ("21.5", "ts1"), "ns=1;s=rpm": ("900", "ts1")}

        def traverse(self, node_id, max_depth):
            yield OpcNode("ns=1;i=85", "Objects", "/Objects", is_variable=False)
            for nid, (val, ts) in self.values.items():
                name = nid.split("=")[-1]
                yield OpcNode(nid, name, f"/Objects/{name}", value=val,
                              datatype="String", source_timestamp=ts)

    return FakeOpcClient()


def test_fetch_opc_lazy_timestamp_state(spark, tmp_path):
    from nifi_minifi_cpp_spark.sources import OpcLazyState, fetch_opc

    client = _fake_opc_tree()
    state = OpcLazyState(str(tmp_path / "opc.json"))
    out = fetch_opc(spark, client, "ns=1;i=85", lazy="on", state=state)
    rows = {r["uuid"]: dict(r["attributes"]) for r in out.collect()}
    assert set(rows) == {"ns=1;s=temp", "ns=1;s=rpm"}
    assert rows["ns=1;s=temp"]["Full path"] == "/Objects/temp"
    assert rows["ns=1;s=temp"]["Sourcetimestamp"] == "ts1"
    # unchanged timestamps -> nothing emitted
    assert fetch_opc(spark, client, "ns=1;i=85", lazy="on", state=state) is None
    # one node gets a new timestamp -> only it re-emits
    client.values["ns=1;s=temp"] = ("22.0", "ts2")
    out3 = fetch_opc(spark, client, "ns=1;i=85", lazy="on", state=state)
    assert [r["uuid"] for r in out3.collect()] == ["ns=1;s=temp"]


def test_fetch_opc_lazy_new_value_state(spark, tmp_path):
    from nifi_minifi_cpp_spark.sources import OpcLazyState, fetch_opc

    client = _fake_opc_tree()
    state = OpcLazyState(str(tmp_path / "opc2.json"))
    assert fetch_opc(spark, client, "x", lazy="new_value", state=state).count() == 2
    assert fetch_opc(spark, client, "x", lazy="new_value", state=state) is None
    client.values["ns=1;s=rpm"] = ("950", "ts1")  # same ts, new VALUE
    out = fetch_opc(spark, client, "x", lazy="new_value", state=state)
    assert [r["content"] for r in out.collect()] == ["950"]


def test_put_opc_update_or_create(spark, tmp_path):
    from nifi_minifi_cpp_spark.sources import put_opc

    log = str(tmp_path / "opcput.log")

    def factory(path=log):
        class Client:
            def exists(self, node_id):
                return node_id == "ns=1;s=known"

            def update_node(self, node_id, value):
                with open(path, "a") as f:
                    f.write(f"update|{node_id}|{value}\n")

            def create_node(self, parent, node_id, value):
                with open(path, "a") as f:
                    f.write(f"create|{parent}|{node_id}|{value}\n")

        return Client()

    ff = spark.createDataFrame(
        [
            ("u1", "42", {"targetnodeid": "ns=1;s=known"}),
            ("u2", "43", {"targetnodeid": "ns=1;s=new"}),
            ("u3", "44", {}),  # no target -> failure
        ],
        "uuid string, content string, attributes map<string,string>",
    )
    routed = put_opc(ff, factory, "ns=1;i=85")
    ok = {r["uuid"]: r["opc_action"] for r in routed["success"].collect()}
    assert ok == {"u1": "update", "u2": "create"}
    assert [r["uuid"] for r in routed["failure"].collect()] == ["u3"]
    lines = sorted(open(log).read().splitlines())
    assert lines == ["create|ns=1;i=85|ns=1;s=new|43", "update|ns=1;s=known|42"]


def test_parse_modbus_address_grammars():
    from nifi_minifi_cpp_spark.sources import parse_modbus_address as p

    r = p("holding-register:123:INT[4]")
    assert (r.kind, r.address, r.length, r.value_type) == ("holding-register", 123, 4, "INT")
    r = p("coil:7")
    assert (r.kind, r.address, r.length) == ("coil", 7, 1)
    r = p("input-register:42[2]")
    assert (r.kind, r.address, r.length) == ("input-register", 42, 2)
    # classic forms: 4x/3x/1x prefix, 1-based remainder
    r = p("4x00123")
    assert (r.kind, r.address) == ("holding-register", 122)
    r = p("300042")
    assert (r.kind, r.address) == ("input-register", 41)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        p("5x0001")
    with _pytest.raises(ValueError):
        p("not-an-address")


def test_fetch_modbus_tcp_records(spark):
    from nifi_minifi_cpp_spark.sources import fetch_modbus_tcp

    def factory():
        class Client:
            def read(self, kind, address, count, unit_id):
                if kind == "coil":
                    return [True] * count
                return [address + i for i in range(count)]

        return Client()

    ff = spark.createDataFrame([("u1", "x")], "uuid string, content string")
    routed = fetch_modbus_tcp(
        ff, factory, {"temp": "holding-register:10", "flags": "coil:3[2]", "rpm": "3x00042"}
    )
    import json as _json

    rec = _json.loads(routed["success"].first()["modbus_record"])
    assert rec == {"temp": 10, "flags": [True, True], "rpm": 41}


def test_flow_opc_modbus_processors(spark, tmp_path):
    """FetchOPC -> PutOPC and FetchModbusTcp are nameable from a flow."""
    from nifi_minifi_cpp_spark.plans import compile_flow

    put_log = str(tmp_path / "p.log")

    def put_factory(path=put_log):
        class Client:
            def exists(self, node_id):
                return False

            def create_node(self, parent, node_id, value):
                with open(path, "a") as f:
                    f.write(f"{parent}|{node_id}|{value}\n")

        return Client()

    cfg = {
        "processors": [
            {"id": "opc", "type": "FetchOPC",
             "properties": {"client": _fake_opc_tree(), "node_id": "ns=1;i=85"}},
            {"id": "tag", "type": "UpdateAttribute",
             "properties": {"targetnodeid": "${Browsename:prepend('ns=2;s=')}"}},
            {"id": "put", "type": "PutOPC",
             "properties": {"client_factory": put_factory, "parent_node_id": "ns=2;i=85"}},
            {"id": "modbus", "type": "FetchModbusTcp",
             "properties": {"client_factory": lambda: None, "address_map": {}}},
        ],
        "connections": [
            {"source": "opc", "destination": "tag"},
            {"source": "tag", "destination": "put"},
            {"source": "opc", "destination": "modbus"},
        ],
    }
    flow = compile_flow(spark, cfg)
    assert flow.df("put", "success").count() == 2
    created = sorted(open(put_log).read().splitlines())
    assert created == ["ns=2;i=85|ns=2;s=rpm|900", "ns=2;i=85|ns=2;s=temp|21.5"]


# -- ProcFsMonitor ------------------------------------------------------------


def _write_fake_proc(d, cpu_user=100, rx=1000, busy_utime=50):
    d.mkdir(exist_ok=True)
    (d / "stat").write_text(
        f"cpu  {cpu_user} 2 30 400 5 0 6 0 0 0\n"
        f"cpu0 {cpu_user // 2} 1 15 200 2 0 3 0 0 0\n"
        "intr 12345\n"
    )
    (d / "diskstats").write_text(
        "   8       0 sda 100 2 3000 40 50 6 7000 80 0 90 130\n"
    )
    net = d / "net"
    net.mkdir(exist_ok=True)
    (net / "dev").write_text(
        "Inter-|   Receive                                                |  Transmit\n"
        " face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed\n"
        f"  eth0: {rx} 10 0 0 0 0 0 0 2000 20 0 0 0 0 0 0\n"
    )
    (d / "meminfo").write_text("MemTotal:       16384 kB\nMemFree:         8192 kB\n")
    pid = d / "4242"
    pid.mkdir(exist_ok=True)
    stat_fields = ["4242", "(fake proc)", "S"] + ["0"] * 50
    stat_fields[13] = str(busy_utime)  # utime
    stat_fields[14] = "7"              # stime
    stat_fields[22] = "123456"         # vsize
    stat_fields[23] = "99"             # rss
    (pid / "stat").write_text(" ".join(stat_fields) + "\n")


def test_procfs_monitor_absolute_snapshot(spark, tmp_path):
    import json as _json

    proc = tmp_path / "proc"
    _write_fake_proc(proc)
    out = src.procfs_monitor(spark, src.ProcFs(str(proc)))
    row = out.first()
    body = _json.loads(row["content"])
    assert body["CPU"]["cpu"]["user"] == 100 and body["CPU"]["cpu0"]["system"] == 15
    assert body["Disk"]["sda"]["sectors_read"] == 3000
    assert body["Network"]["eth0"]["rx_bytes"] == 1000
    assert body["Memory"]["MemTotal"] == 16384
    assert body["Process"]["4242"]["comm"] == "fake proc"
    assert body["Process"]["4242"]["utime"] == 50 and body["Process"]["4242"]["rss"] == 99


def test_procfs_monitor_relative_deltas(spark, tmp_path):
    import json as _json

    proc = tmp_path / "proc"
    state = str(tmp_path / "procfs.json")
    _write_fake_proc(proc, cpu_user=100, rx=1000, busy_utime=50)
    # first relative poll stores the baseline, emits nothing
    assert src.procfs_monitor(spark, src.ProcFs(str(proc)), "relative", state) is None
    _write_fake_proc(proc, cpu_user=160, rx=1500, busy_utime=80)
    out = src.procfs_monitor(spark, src.ProcFs(str(proc)), "relative", state)
    body = _json.loads(out.first()["content"])
    assert body["CPU"]["cpu"]["user"] == 60        # counter delta
    assert body["Network"]["eth0"]["rx_bytes"] == 500
    assert body["Memory"]["MemTotal"] == 16384      # gauge stays absolute
    assert body["Process"]["4242"]["utime"] == 30   # per-process cpu delta
    assert body["Process"]["4242"]["rss"] == 99     # gauge


def test_procfs_monitor_real_proc_and_flow(spark, tmp_path):
    """On this Linux host the real /proc parses; the processor is
    nameable from a flow."""
    import json as _json

    from nifi_minifi_cpp_spark.plans import compile_flow

    cfg = {
        "processors": [
            {"id": "mon", "type": "ProcFsMonitor", "properties": {}},
            {"id": "json", "type": "EvaluateJsonPath",
             "properties": {"memtotal": "$.Memory.MemTotal"}},
        ],
        "connections": [{"source": "mon", "destination": "json"}],
    }
    flow = compile_flow(spark, cfg)
    row = flow.df("json").first()
    body = _json.loads(row["content"])
    assert body["CPU"]["cpu"]["user"] > 0
    assert int(dict(row["attributes"])["memtotal"]) > 0


# -- Kubernetes pod metrics (injected client) ---------------------------------


_POD_METRICS = {
    "kind": "PodMetricsList",
    "items": [
        {"metadata": {"namespace": "default", "name": "web-1"},
         "containers": [
             {"name": "nginx", "usage": {"cpu": "250m", "memory": "123Mi"}},
             {"name": "sidecar", "usage": {"cpu": "100n", "memory": "2048Ki"}},
         ]},
        {"metadata": {"namespace": "kube-system", "name": "dns-1"},
         "containers": [{"name": "coredns", "usage": {"cpu": "1", "memory": "129M"}}]},
    ],
}


def test_collect_pod_metrics_filters_and_lifts(spark):
    import json as _json

    class FakeApi:
        def pod_metrics_list(self):
            return _json.dumps(_POD_METRICS)

    out = src.collect_pod_metrics(spark, FakeApi(), namespace_filter="default")
    body = _json.loads(out.first()["content"])
    # kube-system pod dropped entirely (MetricsFilter.cpp pod-erase rule)
    assert [p["metadata"]["name"] for p in body["items"]] == ["web-1"]
    assert len(body["items"][0]["containers"]) == 2

    # container filter erases containers, pod survives while non-empty
    out2 = src.collect_pod_metrics(spark, FakeApi(), container_name_filter="core.*")
    body2 = _json.loads(out2.first()["content"])
    assert [p["metadata"]["name"] for p in body2["items"]] == ["dns-1"]

    # relational lift with typed quantities
    table = src.pod_metrics_table(src.collect_pod_metrics(spark, FakeApi()))
    rows = {(r["pod"], r["container"]): (r["cpu_nanocores"], r["memory_bytes"]) for r in table.collect()}
    assert rows[("web-1", "nginx")] == (250_000_000, 123 * 1024**2)
    assert rows[("web-1", "sidecar")] == (100, 2048 * 1024)
    assert rows[("dns-1", "coredns")] == (1_000_000_000, 129_000_000)
    # python + catalyst parsers agree
    assert src.parse_cpu_nanocores("250m") == 250_000_000
    assert src.parse_memory_bytes("123Mi") == 123 * 1024**2


def test_collect_pod_metrics_flow_processor(spark):
    import json as _json

    from nifi_minifi_cpp_spark.plans import compile_flow

    class FakeApi:
        def pod_metrics_list(self):
            return _json.dumps(_POD_METRICS)

    cfg = {
        "processors": [
            {"id": "k8s", "type": "CollectKubernetesPodMetrics",
             "properties": {"api_client": FakeApi(), "pod_name_filter": "web-.*"}},
        ],
        "connections": [],
    }
    row = compile_flow(spark, cfg).df("k8s").first()
    assert "web-1" in row["content"] and "dns-1" not in row["content"]


def test_tailfile_rotation_crc_truth_table(spark, tmp_path):
    """r15 (VERDICT r14 #7): the reference's rotated-file recovery
    truth table (TailFile.cpp:565-573 sortAndSkipMainFilePrefix):

    - rotated sibling, size >= position, head CRC MATCHES  -> the
      sibling is the renamed old file: resume AT position (the tail
      appended just before the rename is emitted exactly once);
    - head CRC MISMATCHES -> not the old file: read it fully from 0;
    - sibling SHORTER than position -> read fully from 0;
    - sibling with mtime < last read time -> not a rotation product:
      skipped entirely.
    """
    import os as _os

    # --- row 1: CRC match -> resume at saved position ---------------
    log = tmp_path / "app.log"
    state = str(tmp_path / "t1.json")
    tail = src.TailFile(str(log), state)
    log.write_text("L0\nL1\nL2\nL3\nL4\n")
    assert tail.poll(spark).count() == 5
    with open(log, "a") as f:
        f.write("L5\nL6\nL7\n")  # appended but NOT yet polled
    _os.rename(log, tmp_path / "app.log.1")  # logrotate rename
    log.write_text("L8\nL9\n")
    out = tail.poll(spark)
    got = [(r["content"], _os.path.basename(r["file"])) for r in out.orderBy("file", "position").collect()]
    # the unread tail comes from the ROTATED file at the saved
    # position; L0..L4 are never re-emitted
    assert got == [
        ("L8", "app.log"), ("L9", "app.log"),
        ("L5", "app.log.1"), ("L6", "app.log.1"), ("L7", "app.log.1"),
    ]
    assert tail.poll(spark) is None  # converged

    # --- row 2: CRC mismatch -> rotated file read fully from 0 ------
    slog = tmp_path / "sys.log"
    tail2 = src.TailFile(str(slog), str(tmp_path / "t2.json"))
    slog.write_text("M0\nM1\nM2\n")
    assert tail2.poll(spark).count() == 3
    # an unrelated sibling appears (size >= position, different head)
    (tmp_path / "sys.log.1").write_text("X0\nX1\nX2\nX3\n")
    slog.write_text("M3-line-longer\nM4\n")  # head changed -> rotation
    out2 = tail2.poll(spark)
    got2 = sorted(r["content"] for r in out2.collect())
    assert got2 == ["M3-line-longer", "M4", "X0", "X1", "X2", "X3"]

    # --- row 3: rotated sibling shorter than position -> from 0 -----
    dlog = tmp_path / "db.log"
    tail3 = src.TailFile(str(dlog), str(tmp_path / "t3.json"))
    dlog.write_text("D0\nD1\nD2\nD3\n")
    assert tail3.poll(spark).count() == 4
    (tmp_path / "db.log.1").write_text("S0\n")  # shorter than position
    dlog.write_text("D4\nD5\n")
    out3 = tail3.poll(spark)
    assert sorted(r["content"] for r in out3.collect()) == ["D4", "D5", "S0"]

    # --- row 4: stale sibling (mtime < last read time) is skipped ---
    wlog = tmp_path / "web.log"
    tail4 = src.TailFile(str(wlog), str(tmp_path / "t4.json"))
    old = tmp_path / "web.log.9"
    old.write_text("ANCIENT\n")
    wlog.write_text("W0\nW1\n")
    assert tail4.poll(spark).count() == 2
    _os.utime(old, (1_000_000, 1_000_000))  # long before the poll
    wlog.write_text("W2-different-head\n")  # rotation detected
    out4 = tail4.poll(spark)
    assert sorted(r["content"] for r in out4.collect()) == ["W2-different-head"]


def test_tailfile_stream_rotation_recovery(spark, tmp_path):
    """r15: the STREAMING tailfile source recovers a logrotate rename
    exactly like the batch poller — the unread tail written just
    before the rename is emitted once from the rotated sibling (the
    running-CRC identity check), the fresh main file restarts at 0,
    and nothing from before the rotation is re-emitted."""
    import time

    from nifi_minifi_cpp_spark.sources.datasource import register_tailfile

    register_tailfile(spark)
    log = tmp_path / "rot.log"
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    log.write_text("a1\na2\na3\n")

    def run_until(n_target, timeout=40):
        df = spark.readStream.format("tailfile").option("pattern", str(log)).load()
        q = (
            df.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck).start()
        )
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n_target:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()
        return sorted(r["content"] for r in spark.read.parquet(out).collect())

    assert run_until(3) == ["a1", "a2", "a3"]
    # while the query is DOWN: append unread lines, logrotate-rename,
    # write a fresh main file
    with open(log, "a") as f:
        f.write("b1\nb2\n")
    os.rename(log, tmp_path / "rot.log.1")
    log.write_text("c1\nc2\n")
    got = run_until(7)
    # b1/b2 recovered from the SIBLING exactly once; a* never re-read
    assert got == ["a1", "a2", "a3", "b1", "b2", "c1", "c2"]


def test_tailfile_stream_replay_covers_rotation(spark, tmp_path):
    """r15: readBetweenOffsets must replay the exact rows of a batch
    that contained a rotation reset and a sibling resume — the
    read_from marker makes the replay byte-exact instead of guessing
    from the start offset's (now stale) position."""
    import json as _json

    from nifi_minifi_cpp_spark.sources.datasource import TailFileStreamReader

    log = tmp_path / "app.log"
    rdr = TailFileStreamReader({"pattern": str(log)})

    log.write_text("L0\nL1\n")
    off0 = rdr.initialOffset()
    it1, off1 = rdr.read(off0)
    rows1 = list(it1)
    assert [r[2] for r in rows1] == ["L0", "L1"]

    with open(log, "a") as f:
        f.write("L2\n")  # unread tail
    os.rename(log, tmp_path / "app.log.1")
    log.write_text("L3\n")
    it2, off2 = rdr.read(off1)
    rows2 = list(it2)
    assert sorted(r[2] for r in rows2) == ["L2", "L3"]

    # crash replay of BOTH batches from the checkpointed offset pairs
    replay1 = list(rdr.readBetweenOffsets(off0, off1))
    replay2 = list(rdr.readBetweenOffsets(off1, off2))
    assert sorted(r[2] for r in replay1) == ["L0", "L1"]
    assert sorted(r[2] for r in replay2) == ["L2", "L3"]
    # byte-exact: same (file, position, content) triples, not just text
    assert sorted(replay2) == sorted(rows2)

    # the replayed sibling rows carry the rotated path at the RESUMED
    # position (no head re-read)
    state2 = _json.loads(off2["files"])
    sib = str(tmp_path / "app.log.1")
    assert state2[sib]["read_from"] == _json.loads(off1["files"])[str(log)]["position"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    blocks=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # lines before the poll
            st.integers(min_value=0, max_value=3),  # unread tail before rotate
        ),
        min_size=1,
        max_size=4,
    )
)
def test_tailfile_stream_exactly_once_property(tmp_path_factory, blocks):
    """Property (r15): across ANY sequence of append/poll/rotate
    blocks — including multiple same-second rotations — every line
    appended to the main file is emitted EXACTLY once, provided each
    rotation follows at least one consuming poll (the reference's own
    guarantee: rotation is detected via position > 0). Drives the
    streaming reader's offset state machine pure-Python; the model is
    a global exactly-once multiset."""
    import uuid

    from nifi_minifi_cpp_spark.sources.datasource import TailFileStreamReader

    tmp_path = tmp_path_factory.mktemp(f"tfp-{uuid.uuid4().hex[:6]}")
    log = tmp_path / "app.log"
    rdr = TailFileStreamReader({"pattern": str(log)})

    emitted: list[str] = []
    expected: list[str] = []
    counter = 0
    off = rdr.initialOffset()

    def write_lines(n, fh):
        nonlocal counter
        for _ in range(n):
            fh.write(f"line-{counter}\n")
            expected.append(f"line-{counter}")
            counter += 1

    log.write_text("")
    for rot_i, (n_before, n_tail) in enumerate(blocks, start=1):
        with open(log, "a") as f:
            write_lines(n_before, f)
        rows, off = rdr.read(off)
        emitted.extend(r[2] for r in rows)
        with open(log, "a") as f:
            write_lines(n_tail, f)
        os.rename(log, tmp_path / f"app.log.{rot_i}")
        log.write_text("")
    with open(log, "a") as f:
        write_lines(1, f)
    rows, off = rdr.read(off)
    emitted.extend(r[2] for r in rows)

    assert sorted(emitted) == sorted(expected), (
        f"exactly-once violated: emitted {len(emitted)} vs expected "
        f"{len(expected)}; dupes/losses: "
        f"{set(emitted) ^ set(expected) or 'multiset mismatch'}"
    )


def test_tailfile_batch_double_rotation_same_second(spark, tmp_path):
    """Regression (r15): two rotations inside one mtime second — the
    already-consumed .1 sibling passes the second rotation's mtime
    filter but must NOT consume the CRC-resume slot; the renamed .2 is
    the oldest UNCONSUMED candidate and resumes at the saved position
    (the pre-fix code read .2 fully from 0, duplicating its head)."""
    log = tmp_path / "app.log"
    tail = src.TailFile(str(log), str(tmp_path / "st.json"))

    log.write_text("A0\nA1\n")
    assert sorted(r["content"] for r in tail.poll(spark).collect()) == ["A0", "A1"]
    with open(log, "a") as f:
        f.write("A2\n")  # unread tail 1
    os.rename(log, tmp_path / "app.log.1")
    log.write_text("B0\n")
    out = tail.poll(spark)
    assert sorted(r["content"] for r in out.collect()) == ["A2", "B0"]

    with open(log, "a") as f:
        f.write("B1\n")  # unread tail 2
    os.rename(log, tmp_path / "app.log.2")
    log.write_text("C0\n")
    out2 = tail.poll(spark)
    # exactly the unread tail from .2 plus the fresh file — B0 must
    # NOT be re-emitted even though .1 and .2 share the mtime second
    assert sorted(r["content"] for r in out2.collect()) == ["B1", "C0"]
    assert tail.poll(spark) is None


def test_list_file_same_timestamp_keys_not_lost(spark, tmp_path):
    """r15 parity fix (ListingStateManager.cpp:28-41): a file whose
    mtime EQUALS the persisted watermark but whose key was never
    listed must still be listed exactly once — the pre-r15 strict
    ``mtime > watermark`` silently dropped it (the same-second batch
    write case)."""
    d = tmp_path / "in"
    d.mkdir()
    state = src.ListFileState(str(tmp_path / "ls.json"))
    ts = 1_700_000_000

    (d / "a.txt").write_text("alpha")
    os.utime(d / "a.txt", (ts, ts))
    got1 = [r["filename"] for r in src.list_file(spark, str(d / "*.txt"), state).collect()]
    assert got1 == ["a.txt"]

    # a new file lands on the SAME timestamp as the watermark
    (d / "b.txt").write_text("beta")
    os.utime(d / "b.txt", (ts, ts))
    got2 = [r["filename"] for r in src.list_file(spark, str(d / "*.txt"), state).collect()]
    assert got2 == ["b.txt"]  # listed once, a.txt not re-listed

    # nothing new -> None (neither a nor b re-listed)
    assert src.list_file(spark, str(d / "*.txt"), state) is None

    # a newer timestamp resets the listed-keys set
    (d / "c.txt").write_text("gamma")
    os.utime(d / "c.txt", (ts + 5, ts + 5))
    got3 = [r["filename"] for r in src.list_file(spark, str(d / "*.txt"), state).collect()]
    assert got3 == ["c.txt"]
    assert src.list_file(spark, str(d / "*.txt"), state) is None


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.lists(st.integers(min_value=0, max_value=2), min_size=1, max_size=3),
        min_size=1,
        max_size=4,
    )
)
def test_list_file_exactly_once_property(tmp_path_factory, batches):
    """Property (r15): with a forward-moving clock (same-timestamp
    collisions allowed), every created file is listed EXACTLY once
    across any create/poll interleaving. Drives the pure-Python state
    machine (no Spark job: a probe ListFileState + direct state
    inspection via a stub session is overkill — use the real function
    with a real session-less model by monkeypatching createDataFrame?
    No: the listing loop is pure until the final createDataFrame, so
    model it through list_file's row builder via a tiny fake spark)."""
    import uuid

    class _FakeSpark:
        def createDataFrame(self, rows, schema):
            return rows  # the property only needs the row list

    tmp = tmp_path_factory.mktemp(f"lfp-{uuid.uuid4().hex[:6]}")
    d = tmp / "in"
    d.mkdir()
    state = src.ListFileState(str(tmp / "ls.json"))
    fake = _FakeSpark()

    created: list[str] = []
    listed: list[str] = []
    clock = 1_700_000_000
    counter = 0
    for batch in batches:
        for dt in batch:
            clock += dt  # dt=0 -> same-timestamp collision
            name = f"f{counter}.txt"
            counter += 1
            p = d / name
            p.write_text("x")
            os.utime(p, (clock, clock))
            created.append(name)
        out = src.list_file(fake, str(d / "*.txt"), state)
        if out is not None:
            listed.extend(os.path.basename(r[0]) for r in out)
    # final sweep picks up any stragglers from the last batch
    out = src.list_file(fake, str(d / "*.txt"), state)
    if out is not None:
        listed.extend(os.path.basename(r[0]) for r in out)
    assert sorted(listed) == sorted(created), (
        f"exactly-once violated: {set(listed) ^ set(created)}"
    )
