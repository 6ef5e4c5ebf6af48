"""ProcFs host-telemetry source (Linux).

Reference: /root/reference/extensions/procfs/processors/
ProcFsMonitor.cpp:72 onTrigger — read /proc (cpu, disk, net, memory,
per-process), serialize one JSON FlowFile per trigger; Result
Relativeness {Absolute, Relative} controls whether counters are raw or
deltas against the previous poll (the reference keeps the previous
sample in the processor; here it persists to a state file so polls
survive restarts).

The /proc read is agent-side metadata work exactly like the
reference's; the emitted frame fans out into the distributed pipeline.
``root`` is injectable for tests (a fixture dir shaped like /proc).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_CPU_FIELDS = (
    "user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal", "guest", "guest_nice",
)
_DISK_FIELDS = (
    "reads_completed", "reads_merged", "sectors_read", "ms_reading",
    "writes_completed", "writes_merged", "sectors_written", "ms_writing",
    "ios_in_progress", "ms_io", "weighted_ms_io",
)
_NET_FIELDS = (
    "rx_bytes", "rx_packets", "rx_errs", "rx_drop", "rx_fifo", "rx_frame", "rx_compressed", "rx_multicast",
    "tx_bytes", "tx_packets", "tx_errs", "tx_drop", "tx_fifo", "tx_colls", "tx_carrier", "tx_compressed",
)


class ProcFs:
    """Parsed snapshots of the /proc surface the reference monitors."""

    def __init__(self, root: str = "/proc"):
        self.root = root

    def _read(self, rel: str) -> str:
        with open(os.path.join(self.root, rel)) as f:
            return f.read()

    def cpu_stats(self) -> dict[str, dict[str, int]]:
        out: dict[str, dict[str, int]] = {}
        for line in self._read("stat").splitlines():
            if not line.startswith("cpu"):
                continue
            parts = line.split()
            vals = [int(x) for x in parts[1:]]
            vals += [0] * (len(_CPU_FIELDS) - len(vals))
            out[parts[0]] = dict(zip(_CPU_FIELDS, vals))
        return out

    def disk_stats(self) -> dict[str, dict[str, int]]:
        out: dict[str, dict[str, int]] = {}
        for line in self._read("diskstats").splitlines():
            parts = line.split()
            if len(parts) < 14:
                continue
            vals = [int(x) for x in parts[3:14]]
            out[parts[2]] = dict(zip(_DISK_FIELDS, vals))
        return out

    def net_devs(self) -> dict[str, dict[str, int]]:
        out: dict[str, dict[str, int]] = {}
        for line in self._read("net/dev").splitlines():
            if ":" not in line:
                continue
            iface, rest = line.split(":", 1)
            vals = [int(x) for x in rest.split()[: len(_NET_FIELDS)]]
            out[iface.strip()] = dict(zip(_NET_FIELDS, vals))
        return out

    def mem_info(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for line in self._read("meminfo").splitlines():
            m = re.match(r"(\S+):\s+(\d+)", line)
            if m:
                out[m.group(1)] = int(m.group(2))  # kB (or counts)
        return out

    def process_stats(self) -> dict[str, dict[str, object]]:
        out: dict[str, dict[str, object]] = {}
        for entry in os.listdir(self.root):
            if not entry.isdigit():
                continue
            try:
                raw = self._read(f"{entry}/stat")
            except OSError:
                continue
            # comm may contain spaces; it is parenthesized
            m = re.match(r"\d+ \((.*)\) (\S) (.*)", raw, re.DOTALL)
            if not m:
                continue
            comm, state, rest = m.groups()
            fields = rest.split()
            # fields[10]=utime fields[11]=stime fields[19]=vsize
            # fields[20]=rss (offsets after pid/comm/state, see proc(5))
            out[entry] = {
                "comm": comm,
                "state": state,
                "utime": int(fields[10]),
                "stime": int(fields[11]),
                "vsize": int(fields[19]),
                "rss": int(fields[20]),
            }
        return out

    def snapshot(self) -> dict:
        return {
            "CPU": self.cpu_stats(),
            "Disk": self.disk_stats(),
            "Network": self.net_devs(),
            "Memory": self.mem_info(),
            "Process": self.process_stats(),
        }


_COUNTER_SECTIONS = ("CPU", "Disk", "Network")


def _relative(cur: dict, prev: dict) -> dict:
    """Counter sections become deltas vs the previous poll (the
    reference's Relative mode, ProcFsMonitor.cpp:processCPUInformation
    onward); gauges (Memory) and identities stay absolute."""
    out = {k: v for k, v in cur.items() if k not in _COUNTER_SECTIONS}
    for section in _COUNTER_SECTIONS:
        rel_section = {}
        for key, fields in cur.get(section, {}).items():
            p = prev.get(section, {}).get(key)
            if p is None:
                continue
            rel_section[key] = {f: v - p.get(f, 0) for f, v in fields.items()}
        out[section] = rel_section
    # Process deltas on cpu-time counters only
    procs = {}
    for pid, st in cur.get("Process", {}).items():
        p = prev.get("Process", {}).get(pid)
        if p is None or p.get("comm") != st.get("comm"):
            continue  # new or recycled pid — no meaningful delta
        procs[pid] = {
            **st,
            "utime": st["utime"] - p["utime"],
            "stime": st["stime"] - p["stime"],
        }
    out["Process"] = procs
    return out


def procfs_monitor(
    spark: SparkSession,
    procfs: ProcFs | None = None,
    relativeness: str = "absolute",
    state_path: str | None = None,
) -> DataFrame | None:
    """One monitoring trigger: a single FlowFile whose content is the
    JSON telemetry body (ProcFsMonitor.cpp:72). ``relative`` needs a
    previous sample — the first relative poll stores the baseline and
    emits None, like the reference's first onTrigger producing empty
    counter sections."""
    if relativeness not in ("absolute", "relative"):
        raise ValueError(f"unknown relativeness {relativeness!r}")
    pf = procfs or ProcFs()
    snap = pf.snapshot()
    body = snap
    if relativeness == "relative":
        if state_path is None:
            raise ValueError("relative mode requires state_path")
        prev = None
        if os.path.exists(state_path):
            with open(state_path) as f:
                prev = json.load(f)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, state_path)
        if prev is None:
            return None
        body = _relative(snap, prev)
    row = (
        "procfs",
        json.dumps(body, sort_keys=True),
        {"procfs.relativeness": relativeness},
    )
    return spark.createDataFrame(
        [row], "uuid string, content string, attributes map<string,string>"
    )
