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
