"""TailFile as a native Spark streaming source (Python Data Source API).

This is the architecturally-correct TailFile (SURVEY §4 'custom
sources'): the (file -> position) state that the reference keeps in
its StateManager
(/root/reference/extensions/standard-processors/processors/TailFile.cpp:244-308)
becomes the STREAMING OFFSET — checkpointed, replayable, exactly-once
— instead of a side file. Usage:

    from nifi_minifi_cpp_spark.sources.datasource import register_tailfile
    register_tailfile(spark)
    df = (spark.readStream.format("tailfile")
          .option("pattern", "/var/log/app*.log").load())

Rotation detection matches TailFile.cpp:106-215: a shrunken file or a
changed head checksum resets that file's offset to 0.
"""

from __future__ import annotations

import glob
import json
import os
import zlib

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

TAILFILE_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("position", LongType()),
        StructField("content", StringType()),
    ]
)

_HEAD_BYTES = 512


def _head_checksum(path: str, upto: int) -> int:
    n = min(upto, _HEAD_BYTES)
    if n <= 0:
        return 0
    with open(path, "rb") as f:
        return zlib.crc32(f.read(n))


class TailFileStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.pattern = options.get("pattern")
        if not self.pattern:
            raise ValueError("tailfile source requires option 'pattern'")
        self.delimiter = options.get("delimiter", "\n")

    def initialOffset(self) -> dict:
        return {"files": json.dumps({})}

    def read(self, start: dict):
        state: dict[str, dict] = json.loads(start.get("files", "{}"))
        rows: list[tuple[str, int, str]] = []
        for path in sorted(glob.glob(self.pattern)):
            try:
                size = os.path.getsize(path)
            except OSError:
                continue
            st = state.get(path, {"position": 0, "checksum": 0})
            pos = st["position"]
            if size < pos or (pos > 0 and _head_checksum(path, pos) != st["checksum"]):
                pos = 0  # rotation/truncation
            if size <= pos:
                state[path] = st
                continue
            with open(path, "rb") as f:
                f.seek(pos)
                chunk = f.read(size - pos)
            end = chunk.rfind(self.delimiter.encode())
            if end < 0:
                state[path] = st
                continue
            consumed = end + len(self.delimiter)
            text = chunk[:consumed].decode("utf-8", errors="replace")
            offset = pos
            for line in text.split(self.delimiter)[:-1]:
                rows.append((path, offset, line))
                offset += len(line.encode()) + len(self.delimiter)
            new_pos = pos + consumed
            state[path] = {"position": new_pos, "checksum": _head_checksum(path, new_pos)}
        return iter(rows), {"files": json.dumps(state)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after a crash: re-read the byte ranges between
        # the two checkpointed offsets (deterministic for files)
        s = json.loads(start.get("files", "{}"))
        e = json.loads(end.get("files", "{}"))
        rows: list[tuple[str, int, str]] = []
        for path, est in e.items():
            spos = s.get(path, {}).get("position", 0)
            epos = est["position"]
            if epos <= spos or not os.path.exists(path):
                continue
            with open(path, "rb") as f:
                f.seek(spos)
                text = f.read(epos - spos).decode("utf-8", errors="replace")
            offset = spos
            for line in text.split(self.delimiter)[:-1]:
                rows.append((path, offset, line))
                offset += len(line.encode()) + len(self.delimiter)
        return iter(rows)


class TailFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tailfile"

    def schema(self):
        return TAILFILE_SCHEMA

    def simpleStreamReader(self, schema):
        return TailFileStreamReader(self.options)


def register_tailfile(spark) -> None:
    spark.dataSource.register(TailFileDataSource)
