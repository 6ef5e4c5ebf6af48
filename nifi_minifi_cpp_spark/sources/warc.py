"""WARC (Web ARChive, ISO 28500) read/write for Spark (r10) — the
container format web-scale training corpora arrive in (Common Crawl
ships WARC shards; a 100 TB text pipeline's first stage is a
distributed WARC parse). Stdlib-only, from the PUBLIC spec
(iipc/warc-specifications, WARC/1.0):

- record = header block (CRLF-separated ``Name: value`` lines, led by
  the ``WARC/1.0`` version line) + CRLF CRLF + ``Content-Length``
  octets of payload + CRLF CRLF.
- the standard .warc.gz layout gzips EACH RECORD as its own gzip
  member (the spec's recommendation so readers can seek to member
  boundaries); the reader walks members via zlib's ``unused_data``.

Spark shape:
- ``write_warc_shards``: mapInPandas over any (url, payload) frame —
  each executor partition writes ONE .warc.gz shard (a leading
  warcinfo record + one response record per row) and emits a manifest
  row. No driver collect; shard count = partition count.
- ``read_warc``: ``spark.read.format('binaryFile')`` scan over a glob
  + mapInPandas parse — each shard parses where it lands, pushdown and
  parallelism come from the file scan. Arrow-batched; the gzip-member
  walk and header parse are pure bytes work.

Parity note: the reference has no WARC processor — this belongs to the
"operations a large-scale training-data pipeline needs" axis (like the
dedup/ANN family), not the §2 inventory.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CRLF = b"\r\n"

READ_SCHEMA = (
    "source_file string, record_type string, url string, warc_date string, "
    "content_length long, payload binary"
)
MANIFEST_SCHEMA = "shard string, n_records long, n_bytes long"


def _warc_record(rec_type: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rec_type.encode()]
    for k, v in headers.items():
        head.append(k.encode() + b": " + v.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return CRLF.join(head) + CRLF + CRLF + payload + CRLF + CRLF


def _gzip_member(data: bytes) -> bytes:
    # mtime pinned so shard bytes are deterministic run-to-run
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def parse_warc_bytes(raw: bytes, source_file: str = "") -> list[dict]:
    """Parse one WARC file's bytes -> record dicts. Accepts both the
    member-per-record .warc.gz layout (walked via zlib unused_data) and
    plain uncompressed WARC."""
    if raw[:2] == b"\x1f\x8b":
        chunks = []
        rest = raw
        while rest:
            d = zlib.decompressobj(wbits=31)
            chunks.append(d.decompress(rest))
            if not d.eof:
                raise ValueError("warc: truncated gzip member")
            rest = d.unused_data
        data = b"".join(chunks)
    else:
        data = raw
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding CRLFs
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.index(CRLF + CRLF, pos)
        head_lines = data[pos:head_end].split(CRLF)
        if not head_lines[0].startswith(b"WARC/"):
            raise ValueError(f"warc: bad version line {head_lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        length = int(headers["content-length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("warc: payload truncated vs Content-Length")
        out.append(
            {
                "source_file": source_file,
                "record_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_length": length,
                "payload": payload,
            }
        )
        pos = body_start + length
    return out


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "payload",
    warc_date: str = "2024-01-01T00:00:00Z",
) -> DataFrame:
    """Write ``df`` as member-per-record .warc.gz shards, one per input
    partition, executor-side (no driver collect). Returns the manifest
    (shard path, record count, byte size) — a small frame (one row per
    partition). Record ids are content-addressed (md5 of url+payload)
    so shard bytes are deterministic for a given partitioning.

    PATH SCOPE: shards are written with executor-local file IO, so
    ``out_dir`` must be a filesystem path VISIBLE TO EVERY EXECUTOR
    (local[*], NFS/Lustre, a FUSE-mounted object store). URI schemes
    (hdfs://, s3a://) are rejected up front — executors have no py4j
    bridge to the Hadoop FS API, and silently writing to a local
    directory literally named 'hdfs:/...' is the failure mode this
    guard exists to prevent; on such clusters write to the mount
    point instead."""
    import hashlib
    import os

    if "://" in out_dir:
        raise ValueError(
            f"write_warc_shards writes via executor-local file IO; got URI "
            f"{out_dir!r} — use a mounted path visible to every executor"
        )

    def _write(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        members = [
            _gzip_member(
                _warc_record(
                    "warcinfo",
                    {
                        "WARC-Date": warc_date,
                        "WARC-Record-ID": f"<urn:uuid:shard-{pid}>",
                        "Content-Type": "application/warc-fields",
                    },
                    b"software: nifi-minifi-cpp-spark warc writer\r\n",
                )
            )
        ]
        n = 0
        for pdf in it:
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                body = payload if isinstance(payload, bytes) else str(payload).encode()
                rid = hashlib.md5(url.encode() + body).hexdigest()
                members.append(
                    _gzip_member(
                        _warc_record(
                            "response",
                            {
                                "WARC-Target-URI": url,
                                "WARC-Date": warc_date,
                                "WARC-Record-ID": f"<urn:uuid:{rid}>",
                                "Content-Type": "application/http; msgtype=response",
                            },
                            body,
                        )
                    )
                )
                n += 1
        blob = b"".join(members)
        path = os.path.join(out_dir, f"shard-{pid:05d}.warc.gz")
        os.makedirs(out_dir, exist_ok=True)
        tmp = path + ".inprogress"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish, same commit move as ports
        yield pd.DataFrame({"shard": [path], "n_records": [n], "n_bytes": [len(blob)]})

    return df.select(url_col, payload_col).mapInPandas(_write, MANIFEST_SCHEMA)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC scan: binaryFile source (one row per shard,
    partition pruning and locality from the file index) + an
    Arrow-batched parse. At 100 TB the parallelism unit is the shard —
    exactly how Common Crawl is laid out (~1 GB shards x ~70k)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                recs.extend(parse_warc_bytes(bytes(content), source_file=path))
            yield pd.DataFrame(
                recs,
                columns=[
                    "source_file",
                    "record_type",
                    "url",
                    "warc_date",
                    "content_length",
                    "payload",
                ],
            )

    return files.mapInPandas(_parse, READ_SCHEMA)
