"""Provenance/lineage parity: FORK on split, JOIN on merge, event log."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_minifi_cpp_spark import operators as ops
from nifi_minifi_cpp_spark import provenance as prov
from tests.test_operators import make_ff


def test_split_forks_lineage_and_uuids(spark):
    ff = make_ff(spark, [("p1", "a\nb\nc\nd", {})])
    out = ops.split_text(ff, line_split_count=2)
    rows = sorted(out.collect(), key=lambda r: r["uuid"])
    assert [r["uuid"] for r in rows] == ["p1-f1", "p1-f2"]
    # parent is an ancestor of every fragment
    assert all("p1" in list(r["lineage"]) for r in rows)
    # fragment.identifier still points at the parent
    assert all(dict(r["attributes"])["fragment.identifier"] == "p1" for r in rows)


def test_merge_joins_lineage(spark):
    ff = make_ff(spark, [("p1", "a\nb\nc\nd", {}), ("p2", "x\ny", {})])
    frags = ops.split_text(ff, line_split_count=1)
    merged = ops.merge_content_defragment(frags)
    got = {r["uuid"]: set(r["lineage"]) for r in merged.collect()}
    assert "p1" in got["p1"] and "p2" in got["p2"]


def test_emit_provenance_events(spark):
    ff = make_ff(spark, [("1", "x", {})])
    out = prov.emit(prov.emit(ff, "CREATE", "generator"), "ROUTE", "router")
    events = [(e["event"], e["component"]) for e in out.first()["provenance"]]
    assert events == [("CREATE", "generator"), ("ROUTE", "router")]


def test_emit_rejects_unknown_event(spark):
    ff = make_ff(spark, [("1", "x", {})])
    with pytest.raises(ValueError, match="unknown provenance event"):
        prov.emit(ff, "NOPE", "c")


def test_event_for_categories():
    from nifi_minifi_cpp_spark.provenance import EVENT_TYPES, event_for

    cases = {
        ("GenerateFlowFile", "success"): "CREATE",
        ("ConsumeKafka", "success"): "RECEIVE",
        ("PutFile", "success"): "SEND",
        ("RouteOnAttribute", "matched"): "ROUTE",
        ("ReplaceText", "failure"): "ROUTE",
        ("SplitText", "success"): "FORK",
        ("MergeContent", "success"): "JOIN",
        ("UpdateAttribute", "success"): "ATTRIBUTES_MODIFIED",
        ("ReplaceText", "success"): "CONTENT_MODIFIED",
        ("Funnel", "success"): "ADDINFO",
    }
    for (t, rel), want in cases.items():
        got = event_for(t, rel)
        assert got == want, (t, rel, got)
        assert got in EVENT_TYPES


def test_compiled_flow_provenance_report(spark):
    """A flow with 'Provenance Reporting' configured exposes the event
    stream: one row per (FlowFile, processor edge), publishable via
    the Site-to-Site channel (reference
    SiteToSiteProvenanceReportingTask semantics over storage)."""
    from nifi_minifi_cpp_spark.plans.pipeline import compile_flow

    flow = compile_flow(
        spark,
        """
Processors:
- id: gen
  class: GenerateFlowFile
  Properties: {Batch Size: '3', Custom Text: p}
- id: upd
  class: UpdateAttribute
  Properties: {}
Connections:
- source id: gen
  destination id: upd
  source relationship names: [success]
Provenance Reporting:
  scheduling period: 1 sec
  port uuid: 471deef6-2a6e-4a7d-912a-81cc17e3a204
  batch size: 100
""",
    )
    assert flow.provenance_reporting["batch_size"] == 100
    prov = flow.provenance()
    rows = prov.collect()
    # 3 flowfiles x 2 processor edges
    assert len(rows) == 6
    by_comp = {(r.component, r.event) for r in rows}
    assert ("gen", "CREATE") in by_comp and ("upd", "ATTRIBUTES_MODIFIED") in by_comp
    assert all(r.uuid is not None for r in rows)
