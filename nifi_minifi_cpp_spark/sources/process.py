"""ExecuteProcess — external command stdout as a FlowFile source.

Parity: /root/reference/extensions/execute-process/ExecuteProcess.cpp:211
(fork/exec with stdout pumped into FlowFiles; properties Command,
Command Arguments, Working Directory, Batch Duration, Redirect Error
Stream). In the Spark engine this is a DRIVER-SIDE ingest edge — the
command runs once on the driver (the reference likewise runs it on its
single agent host), and stdout becomes a small FlowFile DataFrame that
downstream operators fan out across the cluster. It is NOT a
distributed map over rows; for per-record subprocess transforms use
functions.apply_record_transform.
"""

from __future__ import annotations

import datetime as dt
import subprocess
import uuid as uuidlib

from pyspark.sql import DataFrame, SparkSession

from ..model import FLOWFILE_SCHEMA


def execute_process(
    spark: SparkSession,
    command: str,
    arguments: list[str] | None = None,
    working_dir: str | None = None,
    batch_lines: int | None = None,
    redirect_error_stream: bool = False,
    timeout_s: float = 60.0,
) -> DataFrame:
    """Run ``command`` and return stdout as FlowFiles.

    batch_lines=None -> one FlowFile holding all of stdout (the
    reference's no-Batch-Duration mode); batch_lines=N -> one FlowFile
    per N lines (its batching mode, line-granular instead of
    time-granular since the run is one-shot here).
    """
    argv = [command, *(arguments or [])]
    proc = subprocess.run(
        argv,
        cwd=working_dir,
        text=True,
        timeout=timeout_s,
        check=False,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT if redirect_error_stream else subprocess.PIPE,
    )
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    base_attrs = {
        "command": command,
        "command.arguments": " ".join(arguments or []),
        "execution.status": str(proc.returncode),
    }

    if batch_lines:
        lines = proc.stdout.splitlines()
        chunks = [
            "\n".join(lines[i : i + batch_lines]) for i in range(0, len(lines), batch_lines)
        ] or [""]
    else:
        chunks = [proc.stdout]

    rows = []
    for i, chunk in enumerate(chunks):
        u = str(uuidlib.uuid4())
        rows.append((u, now, chunk, {**base_attrs, "batch.index": str(i)}, [u]))
    return spark.createDataFrame(rows, FLOWFILE_SCHEMA)
