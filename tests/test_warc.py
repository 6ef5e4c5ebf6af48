"""WARC (ISO 28500) writer/reader tests (r10, sources/warc.py): the
crawl-container stage of the training-data pipeline — member-per-record
.warc.gz shards written executor-side, scanned back distributed."""

from __future__ import annotations

import gzip
import zlib

import pytest

from nifi_minifi_cpp_spark.sources.warc import (
    _gzip_member,
    _warc_record,
    parse_warc_bytes,
    read_warc,
    write_warc_shards,
)


def test_record_format_and_plain_parse():
    rec = _warc_record(
        "response",
        {"WARC-Target-URI": "http://a.example/1", "WARC-Date": "2024-01-01T00:00:00Z"},
        b"hello body",
    )
    # spec layout: version line, headers, CRLFCRLF, payload, CRLFCRLF
    assert rec.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"Content-Length: 10\r\n\r\nhello body\r\n\r\n" in rec
    got = parse_warc_bytes(rec)
    assert len(got) == 1
    r = got[0]
    assert r["record_type"] == "response"
    assert r["url"] == "http://a.example/1"
    assert r["content_length"] == 10
    assert r["payload"] == b"hello body"


def test_member_per_record_gzip_layout():
    """Each record is its own gzip member (the spec's seekable layout):
    a single-member decompress leaves the NEXT member in unused_data."""
    blob = _gzip_member(_warc_record("warcinfo", {}, b"w1")) + _gzip_member(
        _warc_record("response", {"WARC-Target-URI": "u"}, b"r2")
    )
    d = zlib.decompressobj(wbits=31)
    first = d.decompress(blob)
    assert b"warcinfo" in first and d.unused_data  # second member intact
    recs = parse_warc_bytes(blob)
    assert [r["record_type"] for r in recs] == ["warcinfo", "response"]
    # the whole blob is ALSO a valid plain gzip stream for naive readers
    assert b"w1" in gzip.decompress(blob)


def test_parse_guards():
    rec = _warc_record("response", {"WARC-Target-URI": "u"}, b"0123456789")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(rec[:-8])  # payload cut short vs Content-Length
    with pytest.raises(ValueError, match="version"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc_bytes(_gzip_member(rec)[:-4])


def test_spark_roundtrip_shards(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"http://s{i % 3}.example/doc/{i}", f"payload-{i}".encode()) for i in range(20)],
        "url string, payload binary",
    ).repartition(4)
    manifest = write_warc_shards(df, str(tmp_path / "shards")).collect()
    assert len(manifest) == 4  # one shard per partition
    assert sum(m["n_records"] for m in manifest) == 20
    parsed = read_warc(spark, str(tmp_path / "shards" / "*.warc.gz"))
    rows = parsed.collect()
    # every shard leads with its warcinfo record
    assert sum(1 for r in rows if r["record_type"] == "warcinfo") == 4
    resp = {r["url"]: bytes(r["payload"]) for r in rows if r["record_type"] == "response"}
    assert len(resp) == 20
    assert resp["http://s1.example/doc/1"] == b"payload-1"
    assert all(r["content_length"] == len(bytes(r["payload"])) for r in rows)
