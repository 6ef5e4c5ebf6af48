"""Record-shape adapters: Kafka and syslog wire formats <-> the
canonical FlowFile frame. Pure column transforms — usable identically
on batch frames (tests, FIXTURES.md shapes) and streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Kafka (ConsumeKafka/PublishKafka parity)
# ---------------------------------------------------------------------------

# Attribute names match ConsumeKafka's output attribute definitions
# (/root/reference/extensions/kafka/ConsumeKafka.h:267-277).
KAFKA_TOPIC_ATTR = "kafka.topic"
KAFKA_PARTITION_ATTR = "kafka.partition"
KAFKA_COUNT_ATTR = "kafka.count"
KAFKA_KEY_ATTR = "kafka.key"
KAFKA_OFFSET_ATTR = "kafka.offset"


def kafka_records_to_flowfiles(
    df: DataFrame,
    headers_as_attributes: bool = True,
    headers_filter: str | None = None,
    duplicate_header_handling: str = "keep_latest",
) -> DataFrame:
    """Kafka record frame (key, value, headers, topic, partition,
    offset, timestamp) -> canonical FlowFiles with kafka.* attributes
    (ConsumeKafka.cpp:249-264) and optional header->attribute mapping
    (ConsumeKafka.cpp:236-245).

    ``headers_filter``: comma-separated header names to admit
    ('Headers To Add As Attributes', ConsumeKafka.h:177-185; None =
    admit all). ``duplicate_header_handling`` mirrors
    MessageHeaderPolicyEnum (ConsumeKafka.h:187-199): 'keep_first' |
    'keep_latest' (default, the reference's) | 'comma_merge'
    ("Comma-separated Merge"). All three run JVM-side on the headers
    array — no Python in the hot path.
    """
    base_attrs = F.create_map(
        F.lit(KAFKA_TOPIC_ATTR),
        F.col("topic"),
        F.lit(KAFKA_PARTITION_ATTR),
        F.col("partition").cast("string"),
        F.lit(KAFKA_OFFSET_ATTR),
        F.col("offset").cast("string"),
        F.lit(KAFKA_COUNT_ATTR),
        F.lit("1"),
        F.lit(KAFKA_KEY_ATTR),
        F.col("key").cast("string"),
    )
    attrs = base_attrs
    if headers_as_attributes and "headers" in df.columns:
        hs = F.coalesce(F.col("headers"), F.array())
        if headers_filter is not None:
            admit = [n.strip() for n in headers_filter.split(",") if n.strip()]
            hs = F.filter(hs, lambda h: h.getField("key").isin(admit))
        policy = duplicate_header_handling.lower()
        if policy not in ("keep_first", "keep_latest", "comma_merge"):
            raise ValueError(
                f"unknown duplicate_header_handling {duplicate_header_handling!r} "
                "(keep_first|keep_latest|comma_merge)"
            )

        # All three policies fold the header array into a map with an
        # explicit on-collision rule — NOT map_from_entries, whose
        # duplicate-key behavior depends on the session's
        # spark.sql.mapKeyDedupPolicy (EXCEPTION by default: a plain
        # SparkSession would throw DUPLICATE_MAP_KEY on the second
        # 'Accept' header). O(k^2) in the per-row header count, JVM-side.
        def on_collision(acc, h):
            new = h.getField("value").cast("string")
            if policy == "keep_first":
                return F.element_at(acc, h.getField("key"))
            if policy == "keep_latest":
                return new
            return F.concat(F.element_at(acc, h.getField("key")), F.lit(", "), new)

        empty = F.create_map().cast("map<string,string>")
        header_map = F.aggregate(
            hs,
            empty,
            lambda acc, h: F.map_concat(
                F.map_filter(acc, lambda k, _v: k != h.getField("key")),
                F.map_from_arrays(
                    F.array(h.getField("key")),
                    F.array(
                        F.when(
                            F.map_contains_key(acc, h.getField("key")),
                            on_collision(acc, h),
                        ).otherwise(h.getField("value").cast("string"))
                    ),
                ),
            ),
        )
        hmap = F.coalesce(header_map, F.create_map().cast("map<string,string>"))
        # collision-safe merge (a header literally named 'kafka.key'
        # must not trip mapKeyDedupPolicy=EXCEPTION): headers win over
        # the base kafka.* attributes, like an attribute overwrite
        attrs = F.map_concat(
            F.map_filter(base_attrs, lambda k, _v: ~F.map_contains_key(hmap, k)), hmap
        )
    return df.select(
        F.concat(F.col("topic"), F.lit("-"), F.col("partition"), F.lit("-"), F.col("offset")).alias("uuid"),
        F.col("timestamp").alias("ts"),
        F.col("value").cast("string").alias("content"),
        attrs.alias("attributes"),
        F.array().cast("array<string>").alias("lineage"),
    )


def flowfiles_to_kafka_records(
    df: DataFrame,
    topic: str,
    key_attribute: str | None = None,
    attributes_as_headers_regex: str | None = None,
) -> DataFrame:
    """PublishKafka shape (PublishKafka.cpp:610): canonical frame ->
    (key, value, topic[, headers]) columns for writeStream
    .format('kafka'). Key from an attribute (EL-style 'Kafka Key'),
    attributes matching a regex become headers.
    """
    cols = [
        (F.col("attributes").getItem(key_attribute) if key_attribute else F.col("uuid"))
        .cast("binary")
        .alias("key"),
        F.col("content").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    ]
    if attributes_as_headers_regex:
        headers = F.transform(
            F.map_entries(
                F.map_filter(F.col("attributes"), lambda k, v: k.rlike(attributes_as_headers_regex))
            ),
            lambda e: F.struct(e.getField("key").alias("key"), e.getField("value").cast("binary").alias("value")),
        )
        cols.append(headers.alias("headers"))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# Syslog (ListenSyslog parity)
# ---------------------------------------------------------------------------

# Standard RFC5424/RFC3164 shapes (parse fields per ListenSyslog.cpp:69-91).
_RFC5424_RE = (
    r"^<(\d{1,3})>(\d{1,2})\s+"  # pri, version
    r"(\S+)\s+"  # timestamp
    r"(\S+)\s+"  # hostname
    r"(\S+)\s+"  # app-name
    r"(\S+)\s+"  # procid
    r"(\S+)\s+"  # msgid
    r"(-|\[.*\])\s*"  # structured-data
    r"(.*)$"  # msg
)
_RFC3164_RE = r"^<(\d{1,3})>([A-Z][a-z]{2}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s+(\S+)\s+(.*)$"


def parse_syslog(df: DataFrame, content_col: str = "content") -> DataFrame:
    """ListenSyslog parse mode: RFC5424 first, RFC3164 fallback; sets
    syslog.* attributes + syslog.valid, raw content preserved
    (ListenSyslog.cpp:69-91 field set).
    """
    c = F.col(content_col)
    is5424 = c.rlike(_RFC5424_RE)
    is3164 = c.rlike(_RFC3164_RE)

    def g5(n: int):
        return F.regexp_extract(c, _RFC5424_RE, n)

    def g3(n: int):
        return F.regexp_extract(c, _RFC3164_RE, n)

    pri = F.when(is5424, g5(1)).when(is3164, g3(1)).otherwise(F.lit(None)).cast("int")
    fields = F.when(is5424, F.create_map(
        F.lit("syslog.priority"), g5(1),
        F.lit("syslog.severity"), (pri % 8).cast("string"),
        F.lit("syslog.facility"), F.floor(pri / 8).cast("string"),
        F.lit("syslog.version"), g5(2),
        F.lit("syslog.timestamp"), g5(3),
        F.lit("syslog.hostname"), g5(4),
        F.lit("syslog.app_name"), g5(5),
        F.lit("syslog.proc_id"), g5(6),
        F.lit("syslog.msg_id"), g5(7),
        F.lit("syslog.structured_data"), g5(8),
        F.lit("syslog.msg"), g5(9),
        F.lit("syslog.valid"), F.lit("true"),
    )).when(is3164, F.create_map(
        F.lit("syslog.priority"), g3(1),
        F.lit("syslog.severity"), (pri % 8).cast("string"),
        F.lit("syslog.facility"), F.floor(pri / 8).cast("string"),
        F.lit("syslog.timestamp"), g3(2),
        F.lit("syslog.hostname"), g3(3),
        F.lit("syslog.msg"), g3(4),
        F.lit("syslog.valid"), F.lit("true"),
    )).otherwise(F.create_map(F.lit("syslog.valid"), F.lit("false")))
    if "attributes" in df.columns:
        return df.withColumn("attributes", F.map_concat(F.col("attributes"), fields))
    return df.withColumn("attributes", fields)
