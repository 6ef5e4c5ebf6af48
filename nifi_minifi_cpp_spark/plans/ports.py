"""Site-to-Site ports: exactly-once inter-flow handoff, Spark-first.

The reference implements Site-to-Site as a wire protocol between
agents (/root/reference/libminifi/src/sitetosite/SiteToSiteClient.cpp,
RawSocketProtocol.cpp: transactions, two-phase confirm with CRC
checksums, per-batch commit) and exposes it in flows as
RemoteProcessGroup input/output ports
(/root/reference/libminifi/include/core/RemoteProcessorGroupPort.h).

Spark-first, the same contract — durable, exactly-once, batched
handoff between independently-running flows — IS the checkpointed
file channel:

- ``output_port`` appends a frame to a channel directory. Batch
  frames write through a staging-dir + atomic rename commit (the
  two-phase confirm: readers never observe partial batches, a crashed
  writer leaves only invisible staging files). Streaming frames use
  the parquet file sink whose write-ahead ``_spark_metadata`` log is
  Spark's native exactly-once transaction.
- ``input_port`` tails the channel with a file stream (or reads it
  as a batch frame): each downstream flow tracks its own offsets in
  its own checkpoint, so N consumers replay independently — the
  queue-between-agents semantics with storage doing the work of the
  protocol.
"""

from __future__ import annotations

import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession


def output_port(df: DataFrame, channel_dir: str, checkpoint: str | None = None):
    """Producer side. Batch: staged-write + atomic rename per file
    (readers see all of a batch or none of it). Streaming: returns the
    started parquet-sink query (exactly-once via the sink's metadata
    log); ``checkpoint`` is required there.
    """
    if df.isStreaming:
        if checkpoint is None:
            raise ValueError("streaming output_port requires a checkpoint dir")
        return (
            df.writeStream.format("parquet")
            .option("path", channel_dir)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    os.makedirs(channel_dir, exist_ok=True)
    txn = _uuid.uuid4().hex
    staging = os.path.join(channel_dir, f".staging-{txn}")
    df.write.mode("overwrite").parquet(staging)
    for name in os.listdir(staging):  # strip non-data markers pre-publish
        if not (name.startswith(("part-", "part.")) and not name.endswith(".crc")):
            os.remove(os.path.join(staging, name))
    n = len(os.listdir(staging))
    # publish the WHOLE transaction with one atomic directory rename —
    # a multi-partition batch becomes visible all-or-none (per-file
    # renames would expose a torn batch to a concurrent reader), and a
    # crash before this line leaves only an invisible dot-dir
    os.rename(staging, os.path.join(channel_dir, f"txn-{txn}"))
    return n


def input_port(
    spark: SparkSession,
    channel_dir: str,
    schema: str,
    streaming: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Consumer side: a file stream over the channel (each consumer's
    checkpoint is its own replay cursor), or a batch read of
    everything currently committed."""
    if not streaming:
        return (
            spark.read.schema(schema)
            .option("recursiveFileLookup", "true")  # txn dirs, batch-committed
            .parquet(channel_dir)
        )
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(channel_dir)
