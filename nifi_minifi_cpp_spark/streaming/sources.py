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


def _parse_time_period_ms(value: str | int) -> int:
    """Reference TIME_PERIOD strings ('60 seconds', '5 min', '100 ms')
    -> milliseconds (StandardPropertyValidators::TIME_PERIOD_VALIDATOR
    grammar subset)."""
    if isinstance(value, (int, float)):
        return int(value)
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+)\s*", str(value))
    if not m:
        raise ValueError(f"bad time period {value!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    factor = {
        "ms": 1, "msec": 1, "millisecond": 1, "milliseconds": 1,
        "s": 1000, "sec": 1000, "secs": 1000, "second": 1000, "seconds": 1000,
        "m": 60_000, "min": 60_000, "mins": 60_000, "minute": 60_000, "minutes": 60_000,
        "h": 3_600_000, "hr": 3_600_000, "hour": 3_600_000, "hours": 3_600_000,
    }.get(unit)
    if factor is None:
        raise ValueError(f"bad time period unit {unit!r}")
    return n * factor


def _parse_data_size_bytes(value: str | int | float) -> int:
    """Reference DATA_SIZE strings -> bytes (TypedValues.h:108-147,
    Literals.h:22-60). The reference's backwards-compat quirk is kept
    verbatim: bare-letter units K/M/G/T/P are DECIMAL (1000^n) while
    two-letter KB/MB/GB/TB/PB are BINARY (1024^n); units are
    case-insensitive; an unrecognized unit is ignored with a warning
    (multiplier 1), exactly like StringToInt's compat path."""
    if isinstance(value, (int, float)):
        return int(value)
    import re as _re

    m = _re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", str(value))
    if not m:
        raise ValueError(f"bad data size {value!r}")
    n, unit = int(m.group(1)), m.group(2).upper()
    if not unit:
        return n
    factor = {
        "B": 1,
        "K": 1000, "M": 1000**2, "G": 1000**3, "T": 1000**4, "P": 1000**5,
        "KB": 1024, "MB": 1024**2, "GB": 1024**3, "TB": 1024**4, "PB": 1024**5,
    }.get(unit)
    if factor is None:
        import warnings as _warnings

        _warnings.warn(f"Unrecognized data unit: {unit!r}", stacklevel=2)
        factor = 1
    return n * factor


#: ConsumeKafka commit policies (ConsumeKafka.h:229-238) and how each
#: lands on Spark's model. Spark's Kafka source NEVER commits offsets
#: to the broker — progress lives in the query checkpoint, which is
#: commit-after-batch with exactly-once replay, STRICTLY stronger than
#: librdkafka's commit window. The map records the checkpoint-level
#: equivalence so flows can declare any reference policy.
CONSUME_KAFKA_COMMIT_POLICIES = {
    "NoCommit": "no broker commit; no checkpoint required",
    "AutoCommit": "checkpoint commit (engine-managed, after batch)",
    "CommitAfterBatch": "checkpoint commit (exact semantic match)",
    "CommitFromIncomingFlowFiles": "unsupported: requires per-flowfile offset control",
}


def consume_kafka_options(props: dict) -> dict[str, str]:
    """ConsumeKafka property map -> Spark ``readStream.format("kafka")``
    options, by REFERENCE property name (ConsumeKafka.h:93-238). This
    is the single source of truth the contract tests lock:

    - Kafka Brokers                 -> kafka.bootstrap.servers
    - Topic Names + Topic Name Format {Names, Patterns}
                                    -> subscribe / subscribePattern
    - Offset Reset {earliest, latest} -> startingOffsets; 'none' has no
      Spark analogue (progress lives in the checkpoint, so "fail when
      no committed offset" must instead be an explicit per-partition
      startingOffsets JSON) -> rejected with that guidance
    - Honor Transactions true/false -> kafka.isolation.level
      read_committed / read_uncommitted (ConsumeKafka.h:115-128)
    - Group ID                      -> kafka.group.id
    - Max Poll Records              -> maxOffsetsPerTrigger
    - Session Timeout (time period) -> kafka.session.timeout.ms
    - Headers To Add As Attributes / Message Header Encoding are
      POST-READ concerns (includeHeaders=true + the header filter in
      records.kafka_records_to_flowfiles)
    - Commit Offsets Policy         -> see CONSUME_KAFKA_COMMIT_POLICIES
      (CommitFromIncomingFlowFiles rejected)
    """
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": str(props.get("Kafka Brokers", "localhost:9092")),
        "includeHeaders": "true",
    }
    fmt = str(props.get("Topic Name Format", "Names"))
    topics = props.get("Topic Names")
    if not topics:
        raise ValueError("ConsumeKafka requires Topic Names")
    if fmt == "Names":
        opts["subscribe"] = str(topics)
    elif fmt == "Patterns":
        opts["subscribePattern"] = str(topics)
    else:
        raise ValueError(f"unknown Topic Name Format {fmt!r} (Names|Patterns)")

    reset = str(props.get("Offset Reset", "latest"))
    if reset in ("earliest", "latest") or reset.lstrip().startswith("{"):
        # earliest/latest, or an explicit per-partition offsets JSON
        # ({"topic":{"0":23}}), which Spark's startingOffsets accepts
        # directly — the escape hatch the 'none' error points at
        opts["startingOffsets"] = reset
    elif reset == "none":
        raise ValueError(
            "Offset Reset 'none' (fail without committed offsets) has no "
            "Spark analogue — offsets live in the checkpoint; pass an "
            "explicit per-partition startingOffsets JSON "
            '(e.g. \'{"topic":{"0":23}}\') as Offset Reset instead'
        )
    else:
        raise ValueError(
            f"unknown Offset Reset {reset!r} (earliest|latest|none|offsets JSON)"
        )

    honor = props.get("Honor Transactions", True)
    honor = str(honor).lower() in ("true", "1", "yes")
    opts["kafka.isolation.level"] = "read_committed" if honor else "read_uncommitted"

    if props.get("Group ID"):
        opts["kafka.group.id"] = str(props["Group ID"])
    if props.get("Max Poll Records"):
        opts["maxOffsetsPerTrigger"] = str(int(props["Max Poll Records"]))
    if props.get("Session Timeout"):
        opts["kafka.session.timeout.ms"] = str(_parse_time_period_ms(props["Session Timeout"]))

    policy = str(props.get("Commit Offsets Policy", "CommitAfterBatch"))
    if policy not in CONSUME_KAFKA_COMMIT_POLICIES:
        raise ValueError(f"unknown Commit Offsets Policy {policy!r}")
    if policy == "CommitFromIncomingFlowFiles":
        raise ValueError(
            "CommitFromIncomingFlowFiles requires per-flowfile offset "
            "control; Spark's checkpoint owns offsets — route the flow "
            "through CommitAfterBatch (the checkpoint equivalent)"
        )
    return opts


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
    session_timeout: str | None = None,
) -> DataFrame:
    """ConsumeKafka as a Spark streaming source: pythonic args ->
    reference property names -> :func:`consume_kafka_options` (one
    source of truth, locked by tests/test_kafka_contract.py).

    Requires the kafka connector jars on the cluster; constructing the
    reader is lazy so this module imports fine without them. Without
    jars, :func:`kafka_wire_source` runs the same property contract
    over the stdlib wire client (sources/kafka_wire.py) — the
    end-to-end path executes either way (COVERAGE.md).
    """
    if not topics and not topic_pattern:
        raise ValueError("need topics or topic_pattern")
    props = {
        "Kafka Brokers": bootstrap_servers,
        "Topic Names": topics or topic_pattern,
        "Topic Name Format": "Names" if topics else "Patterns",
        "Offset Reset": offset_reset,
        "Honor Transactions": honor_transactions,
    }
    if group_id:
        props["Group ID"] = group_id
    if max_poll_records:
        props["Max Poll Records"] = max_poll_records
    if session_timeout:
        props["Session Timeout"] = session_timeout
    opts = consume_kafka_options(props)
    opts["includeHeaders"] = str(include_headers).lower()
    return spark.readStream.format("kafka").options(**opts).load()


def kafka_wire_source(spark: SparkSession, props: dict) -> DataFrame:
    """ConsumeKafka WITHOUT connector jars (r8): the same reference
    property map -> :func:`consume_kafka_options` contract, executed by
    the stdlib ``kafkawire`` Python Data Source
    (sources/kafka_wire.py), which speaks the public Kafka binary
    protocol (RecordBatch v2 + Fetch/Metadata/ListOffsets) over TCP
    with checkpointed per-partition offsets. Topic Name Format
    'Patterns' resolves CLIENT-side (full-metadata regex match, the
    librdkafka behavior) and re-evaluates each micro-batch: topics
    created after stream start join at their earliest offset (r16)."""
    from ..sources.kafka_wire import register_kafkawire

    opts = consume_kafka_options(props)
    register_kafkawire(spark)
    reader = (
        spark.readStream.format("kafkawire")
        .option("kafka.bootstrap.servers", opts["kafka.bootstrap.servers"])
        .option("startingOffsets", opts.get("startingOffsets", "latest"))
    )
    if "subscribePattern" in opts:
        # Topic Name Format 'Patterns' (r15): client-side regex over
        # the broker's full topic metadata, the librdkafka contract;
        # re-evaluated every micro-batch (r16) so later-created topics
        # join at their earliest offset
        reader = reader.option("subscribePattern", opts["subscribePattern"])
    else:
        reader = reader.option("subscribe", opts["subscribe"])
    if "maxOffsetsPerTrigger" in opts:
        reader = reader.option("maxOffsetsPerTrigger", opts["maxOffsetsPerTrigger"])
    if "kafka.group.id" in opts:
        # Group ID (ConsumeKafka.h:129-132): committed group offsets
        # seed the FIRST start (they beat Offset Reset) and every batch
        # commits back — the checkpoint stays the offset truth on
        # restart (r15; see KafkaWireStreamReader.initialOffset)
        reader = reader.option("kafka.group.id", opts["kafka.group.id"])
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
