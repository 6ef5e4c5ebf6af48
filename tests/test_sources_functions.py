"""Tests: incremental scan state, ExecuteSQL shaping, ConvertRecord,
ApplyTemplate, Jolt-lite, RecordTransform."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from nifi_minifi_cpp_spark import functions as fx
from nifi_minifi_cpp_spark import sources as src
from nifi_minifi_cpp_spark.session import register_views


# -- IncrementalTableScan (QueryDatabaseTable) --------------------------------


def test_incremental_scan_watermark(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state.json")
    scan = src.IncrementalTableScan(
        src.parquet_table_reader(f"{sf_dir}/orders.parquet"),
        max_value_columns=["o_orderkey"],
        state_path=state,
    )
    first = scan.poll(spark)
    n_total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert first.count() == n_total
    # watermark advanced -> second poll sees nothing
    assert scan.poll(spark) is None
    saved = json.load(open(state))
    assert saved["o_orderkey"] == spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
        F.max("o_orderkey")
    ).first()[0]


def test_incremental_scan_initial_max(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state2.json")
    max_key = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(F.max("o_orderkey")).first()[0]
    scan = src.IncrementalTableScan(
        src.parquet_table_reader(f"{sf_dir}/orders.parquet"),
        max_value_columns=["o_orderkey"],
        state_path=state,
        initial_max_values={"o_orderkey": int(max_key) - 10},
    )
    out = scan.poll(spark)
    assert 0 < out.count() <= 10
    assert f"maxvalue.o_orderkey" in out.columns


def test_incremental_scan_pushdown(spark, sf_dir, tmp_path):
    """The watermark predicate must reach the parquet scan."""
    state = str(tmp_path / "state3.json")
    scan = src.IncrementalTableScan(
        src.parquet_table_reader(f"{sf_dir}/orders.parquet"),
        ["o_orderkey"],
        state_path=state,
        initial_max_values={"o_orderkey": 100},
    )
    out = scan.poll(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_orderkey,100)" in plan


# -- ExecuteSQL ---------------------------------------------------------------


def test_execute_sql_chunking(spark, sf_dir):
    register_views(spark, sf_dir)
    out = src.execute_sql(spark, "SELECT r_regionkey, r_name FROM region", max_rows_per_flowfile=2)
    rows = out.collect()
    assert len(rows) == 3  # 5 regions / 2 per flowfile
    counts = sorted(int(dict(r["attributes"])["executesql.row.count"]) for r in rows)
    assert counts == [1, 2, 2]
    payload = json.loads(rows[0]["content"].split("\n")[0])
    assert set(payload) == {"r_regionkey", "r_name"}


# -- ConvertRecord ------------------------------------------------------------


def test_convert_record_json_xml_roundtrip(spark):
    df = spark.createDataFrame([('{"a": 1, "b": "x"}',)], "content string")
    as_xml = src.convert_record(df, "json", "xml", "a int, b string")
    xml = as_xml.first()["content"]
    assert "<a>1</a>" in xml and "<b>x</b>" in xml
    back = src.convert_record(as_xml, "xml", "json", "a int, b string")
    assert json.loads(back.first()["content"]) == {"a": 1, "b": "x"}


# -- ApplyTemplate ------------------------------------------------------------


def test_apply_template(spark):
    df = spark.createDataFrame(
        [({"filename": "a.txt", "size": "10"},)], "attributes map<string,string>"
    )
    out = fx.apply_template(df, "file={{filename}} size={{size}} missing=[{{nope}}]")
    assert out.first()["content"] == "file=a.txt size=10 missing=[]"


# -- Jolt-lite ----------------------------------------------------------------


def test_jolt_shift_default(spark):
    df = spark.createDataFrame(
        [('{"user": {"name": "ada", "id": 7}, "extra": true}',)], "content string"
    )
    out = fx.jolt_transform(
        df,
        shift={"user.name": "person.fullName", "user.id": "person.id"},
        default={"person.kind": "human", "version": 2},
    )
    got = json.loads(out.first()["content"])
    assert got == {"person": {"fullName": "ada", "id": "7", "kind": "human"}, "version": 2}


def test_jolt_default_fills_missing_only(spark):
    df = spark.createDataFrame([('{"a": "present"}',), ("{}",)], "content string")
    out = fx.jolt_transform(df, shift={"a": "a"}, default={"a": "fallback"})
    vals = sorted(json.loads(r["content"])["a"] for r in out.collect())
    assert vals == ["fallback", "present"]


# -- RecordTransform ----------------------------------------------------------


def test_record_transform_fn(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")

    def xform(rec):
        if rec["id"] == 2:
            return None  # drop
        if rec["id"] == 3:
            return [
                {"id": rec["id"], "v": rec["v"] + "-1"},
                {"id": rec["id"], "v": rec["v"] + "-2"},
            ]  # fan out
        return {"id": rec["id"], "v": rec["v"].upper()}

    out = fx.apply_record_transform(df, xform, "id int, v string")
    got = sorted((r["id"], r["v"]) for r in out.collect())
    assert got == [(1, "A"), (3, "c-1"), (3, "c-2")]


def test_record_transform_class(spark):
    class Upper(fx.FlowFileTransform):
        def transform(self, record):
            record["v"] = record["v"].upper()
            return record

    df = spark.createDataFrame([(1, "x")], "id int, v string")
    out = fx.apply_record_transform(df, Upper(), "id int, v string")
    assert out.first()["v"] == "X"
