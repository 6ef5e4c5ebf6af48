"""TailFile: incremental tail of rolling log files with persisted
(position, checksum) state and rotated-file recovery.

Reference semantics (/root/reference/extensions/standard-processors/
processors/TailFile.cpp:582 onTrigger, state recovery :244-308,
rotation-detection checksum :106-215, rotated-file lookup + CRC
resume :504-583 parseRollingFilePattern / findRotatedFilesAfterLastReadTime /
sortAndSkipMainFilePrefix): per tailed file keep the read offset and a
CRC32 of the first ``position`` bytes. When the file shrinks or its
head CRC changes, it was rotated/replaced. Before re-reading the main
file from 0, RECOVER the rotated siblings (r15):

- candidates = files in the same directory matching the Rolling
  Filename Pattern (default ``${filename}.*`` with ``${filename}``
  replaced by the tailed file's stem, full-regex match like the
  reference's utils::regexMatch), excluding the main file, with
  mtime >= the last read time, sorted by (mtime, name);
- the FIRST (oldest) candidate is checked against the saved state:
  if its size >= position AND crc32(first position bytes) equals the
  saved checksum, the candidate IS the renamed old file — resume
  reading it AT position (the unread tail written just before the
  rename is emitted exactly once, nothing re-read);
- a CRC mismatch or a shorter candidate means it is NOT the old file
  — it is read in full from 0 (the reference's copy-truncate /
  unrelated-file row of the truth table);
- remaining candidates are read in full, then the main file restarts
  from 0.

Architecture note: tailing is inherently sequential per file and runs
agent-side in the reference. Here the *delta discovery* (stat + head
checksum + seek) runs driver-side per poll — cheap metadata work —
and the payload fans out into a distributed DataFrame for the
downstream operator pipeline. On a cluster the same state protocol
would live in a custom Python Data Source reader; the state layout is
identical so that swap is mechanical.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
import zlib

from pyspark.sql import DataFrame, SparkSession


def crc_upto(path: str, upto: int) -> int:
    """CRC32 of the first ``upto`` bytes — the reference's
    utils::file::computeChecksum(path, position) identity check
    (TailFile.cpp:568,625). Streaming read in 1 MiB chunks."""
    if upto <= 0:
        return 0
    crc = 0
    left = upto
    with open(path, "rb") as f:
        while left > 0:
            chunk = f.read(min(left, 1 << 20))
            if not chunk:
                break
            crc = zlib.crc32(chunk, crc)
            left -= len(chunk)
    return crc


def rotated_candidates(path: str, last_read_time: float, rolling_pattern: str) -> list[str]:
    """Rolling-pattern siblings of ``path``, oldest first
    (TailFile.cpp:504-555): ${filename} -> the stem (up to the last
    dot), full-regex match, main file excluded, mtime >= the last
    read time (floored to seconds like the reference's
    time_point_cast<seconds>), sorted by (mtime, name). Shared by the
    batch poller and the ``tailfile`` streaming Data Source."""
    dirname = os.path.dirname(path) or "."
    fname = os.path.basename(path)
    stem = fname[: fname.rfind(".")] if "." in fname else fname
    rx = re.compile(rolling_pattern.replace("${filename}", re.escape(stem)))
    out = []
    for name in os.listdir(dirname):
        if name == fname or not rx.fullmatch(name):
            continue
        full = os.path.join(dirname, name)
        if not os.path.isfile(full):
            continue
        mtime = os.path.getmtime(full)
        if mtime >= int(last_read_time):
            out.append((mtime, name, full))
    return [full for _, _, full in sorted(out)]


class TailFile:
    def __init__(
        self,
        file_pattern: str,
        state_path: str,
        delimiter: str = "\n",
        rolling_pattern: str = "${filename}.*",
    ):
        self.file_pattern = file_pattern
        self.state_path = state_path
        self.delimiter = delimiter
        self.rolling_pattern = rolling_pattern

    def _load_state(self) -> dict[str, dict]:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                return json.load(f)
        return {}

    def _save_state(self, state: dict[str, dict]) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    # module-level shared helpers (also used by the streaming source)
    _crc_upto = staticmethod(crc_upto)

    def _rotated_candidates(self, path: str, last_read_time: float) -> list[str]:
        return rotated_candidates(path, last_read_time, self.rolling_pattern)

    def _read_whole(
        self,
        path: str,
        start: int,
        rows: list[tuple[str, int, str]],
        state: dict[str, dict],
        now: float,
    ) -> None:
        """Emit everything from ``start`` to EOF of a ROTATED file —
        it is closed, so the final unterminated segment is a complete
        record too (the reference reads rotated files to the end,
        TailFile.cpp:660-676)."""
        size = os.path.getsize(path)
        if size > start:
            with open(path, "rb") as f:
                f.seek(start)
                chunk = f.read(size - start)
            text = chunk.decode("utf-8", errors="replace")
            offset = start
            parts = text.split(self.delimiter)
            for i, line in enumerate(parts):
                if i == len(parts) - 1 and line == "":
                    break  # trailing delimiter artifact
                rows.append((path, offset, line))
                offset += len(line.encode()) + len(self.delimiter)
        state[path] = {
            "position": size,
            "checksum": self._crc_upto(path, size),
            "last_read_time": now,
        }

    def poll(self, spark: SparkSession) -> DataFrame | None:
        """One tail sweep: returns (file, position, line) rows for
        bytes appended since the last poll; None when nothing new.
        Rotation (shrink or head-CRC mismatch) first RECOVERS the
        rotated siblings — resuming the first one at the saved
        position iff its head CRC matches the saved checksum — then
        re-reads the main file from 0."""
        state = self._load_state()
        new_rows: list[tuple[str, int, str]] = []
        state_dirty = False
        now = time.time()
        for path in sorted(glob.glob(self.file_pattern)):
            size = os.path.getsize(path)
            st = state.get(path, {"position": 0, "checksum": 0})
            pos = st["position"]
            if pos > 0 and (size < pos or self._crc_upto(path, pos) != st["checksum"]):
                # rotated or truncated: recover the renamed siblings
                # before restarting (TailFile.cpp:629-646)
                first = True
                for rpath in self._rotated_candidates(path, st.get("last_read_time", 0.0)):
                    rstate = state.get(rpath)
                    rsize = os.path.getsize(rpath)
                    if rstate is not None and rstate["position"] >= rsize:
                        # already fully read (earlier rotation product or
                        # own glob entry) — does NOT consume the CRC-resume
                        # slot: the renamed old main is the oldest
                        # UNCONSUMED candidate (a same-second double
                        # rotation would otherwise re-read it from 0)
                        continue
                    start = 0
                    if (
                        first
                        and rsize >= pos
                        and self._crc_upto(rpath, pos) == st["checksum"]
                    ):
                        # the sibling IS the old file, renamed: resume
                        # at the saved position (TailFile.cpp:565-573)
                        start = pos
                    self._read_whole(rpath, start, new_rows, state, now)
                    state_dirty = True
                    first = False
                pos = 0
                # reset the main file's state NOW, even if it has no
                # new bytes yet — otherwise the stale pos/checksum
                # re-detects this same rotation (and re-CRCs every
                # sibling) on every poll until data arrives (ADVICE r15)
                state[path] = {"position": 0, "checksum": 0, "last_read_time": now}
                state_dirty = True
            if size <= pos:
                continue
            with open(path, "rb") as f:
                f.seek(pos)
                chunk = f.read(size - pos)
            # only complete delimited messages are emitted; the tail
            # stays buffered until its delimiter arrives
            end = chunk.rfind(self.delimiter.encode())
            if end < 0:
                continue
            consumed = end + len(self.delimiter)
            text = chunk[:consumed].decode("utf-8", errors="replace")
            offset = pos
            # text always ends with the delimiter -> drop the final
            # empty artifact of split()
            for line in text.split(self.delimiter)[:-1]:
                new_rows.append((path, offset, line))
                offset += len(line.encode()) + len(self.delimiter)
            new_pos = pos + consumed
            state[path] = {
                "position": new_pos,
                "checksum": self._crc_upto(path, new_pos),
                "last_read_time": now,
            }
            state_dirty = True
        if state_dirty:
            self._save_state(state)
        if not new_rows:
            return None
        # Arrow ingestion: a tail sweep can carry many thousand lines,
        # and pandas->Arrow beats row-tuple pickling ~4x on the fan-out
        import pandas as pd

        pdf = pd.DataFrame(new_rows, columns=["file", "position", "content"])
        return spark.createDataFrame(pdf, "file string, position long, content string")
