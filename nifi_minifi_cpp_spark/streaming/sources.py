"""Streaming sources (SURVEY §2.1 -> Structured Streaming).

The reference's source processors map onto readStream formats:

- GetFile/ListFile  -> file stream (incremental listing is the
  checkpointed file-source state, exactly ListFile's
  ListingStateManager watermark re-expressed)
- GenerateFlowFile  -> rate source + payload synthesis
- ConsumeKafka      -> format("kafka") with option mapping
- GetTCP/ListenTCP  -> format("socket") (simple case)

Backpressure parity: the reference's queue thresholds
(Connection.h:57-60) become admission options
(maxFilesPerTrigger/maxOffsetsPerTrigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import FLOWFILE_SCHEMA


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    path_glob: str | None = None,
) -> DataFrame:
    """GetFile/ListFile analog (GetFile.cpp:71, ListFile.cpp:92-118):
    incremental directory scan; the checkpoint holds the listing state."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def generate_flowfiles(
    spark: SparkSession,
    rows_per_second: int = 10,
    custom_text: str | None = None,
) -> DataFrame:
    """GenerateFlowFile analog (GenerateFlowFile.cpp:113): rate source
    synthesizing canonical FlowFile rows."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    content = F.lit(custom_text) if custom_text is not None else F.concat(
        F.lit("generated-"), F.col("value").cast("string")
    )
    return rate.select(
        F.expr("uuid()").alias("uuid"),
        F.col("timestamp").alias("ts"),
        content.alias("content"),
        F.create_map(F.lit("generator"), F.lit("rate")).alias("attributes"),
        F.array(F.col("value").cast("string")).alias("lineage"),
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | None = None,
    topic_pattern: str | None = None,
    group_id: str | None = None,
    offset_reset: str = "latest",
    honor_transactions: bool = True,
    max_poll_records: int | None = None,
    include_headers: bool = True,
) -> DataFrame:
    """ConsumeKafka property mapping (ConsumeKafka.h:42,100-238):

    - Topic Names / Topic Name Format pattern -> subscribe /
      subscribePattern
    - Offset Reset {earliest,latest} -> startingOffsets
    - Honor Transactions -> kafka.isolation.level
    - Max Poll Records -> maxOffsetsPerTrigger

    Requires the kafka connector jars on the cluster; constructing the
    reader is lazy so this module imports fine without them.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", offset_reset)
        .option("includeHeaders", str(include_headers).lower())
        .option(
            "kafka.isolation.level",
            "read_committed" if honor_transactions else "read_uncommitted",
        )
    )
    if topics:
        reader = reader.option("subscribe", topics)
    elif topic_pattern:
        reader = reader.option("subscribePattern", topic_pattern)
    else:
        raise ValueError("need topics or topic_pattern")
    if group_id:
        reader = reader.option("kafka.group.id", group_id)
    if max_poll_records:
        reader = reader.option("maxOffsetsPerTrigger", max_poll_records)
    return reader.load()


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """GetTCP/ListenTCP simple analog (GetTCP.cpp:127): line-delimited
    text from a socket, lifted to the canonical frame."""
    raw = spark.readStream.format("socket").option("host", host).option("port", port).load()
    return raw.select(
        F.expr("uuid()").alias("uuid"),
        F.current_timestamp().alias("ts"),
        F.col("value").alias("content"),
        F.create_map(F.lit("source.protocol"), F.lit("tcp")).alias("attributes"),
        F.array().cast("array<string>").alias("lineage"),
    )
