"""ConsumeKafka/PublishKafka option-map contract tests.

The container ships no kafka connector jars and no broker, so the
real-broker path cannot execute here (documented in COVERAGE.md). What
CAN silently misbehave against a live broker is the PROPERTY -> OPTION
mapping — these tests lock it against the reference's declarations
(ConsumeKafka.h:93-238) so the map cannot drift:

- topic names vs pattern subscription
- the three offset-reset policies (earliest / latest / none)
- Honor Transactions -> kafka.isolation.level
- Group ID / Max Poll Records / Session Timeout translation
- the four offset-commit policies and their checkpoint equivalence
- header->attribute lifting incl. the Duplicate Header Handling
  truth table (ConsumeKafka.h:187-199) and Headers To Add As
  Attributes filtering (ConsumeKafka.h:177-185)
- PublishKafka key/header column shaping (PublishKafka.cpp:610)
"""

from __future__ import annotations

import pytest

from nifi_minifi_cpp_spark.streaming.sources import (
    CONSUME_KAFKA_COMMIT_POLICIES,
    _parse_time_period_ms,
    consume_kafka_options,
)


def _base_props(**over):
    props = {"Kafka Brokers": "b1:9092,b2:9092", "Topic Names": "t1,t2"}
    props.update(over)
    return props


def test_topic_names_vs_pattern():
    assert consume_kafka_options(_base_props())["subscribe"] == "t1,t2"
    opts = consume_kafka_options(
        _base_props(**{"Topic Names": "logs-.*", "Topic Name Format": "Patterns"})
    )
    assert opts["subscribePattern"] == "logs-.*"
    assert "subscribe" not in opts
    with pytest.raises(ValueError, match="Topic Name Format"):
        consume_kafka_options(_base_props(**{"Topic Name Format": "Wildcards"}))
    with pytest.raises(ValueError, match="Topic Names"):
        consume_kafka_options({"Kafka Brokers": "b:9092"})


def test_offset_reset_policies():
    """OffsetResetPolicyEnum {earliest, latest, none}: the first two map
    to startingOffsets; 'none' (fail without committed offsets) has no
    Spark analogue because offsets live in the checkpoint — rejected
    with guidance toward an explicit startingOffsets JSON."""
    assert (
        consume_kafka_options(_base_props(**{"Offset Reset": "earliest"}))["startingOffsets"]
        == "earliest"
    )
    assert consume_kafka_options(_base_props())["startingOffsets"] == "latest"  # default
    with pytest.raises(ValueError, match="startingOffsets JSON"):
        consume_kafka_options(_base_props(**{"Offset Reset": "none"}))
    with pytest.raises(ValueError, match="Offset Reset"):
        consume_kafka_options(_base_props(**{"Offset Reset": "banana"}))


def test_honor_transactions_isolation_level():
    """ConsumeKafka.h:115-128: true -> read_committed (wait out the
    producer transaction), false -> read_uncommitted."""
    assert (
        consume_kafka_options(_base_props())["kafka.isolation.level"] == "read_committed"
    )  # reference default true
    assert (
        consume_kafka_options(_base_props(**{"Honor Transactions": False}))[
            "kafka.isolation.level"
        ]
        == "read_uncommitted"
    )
    assert (
        consume_kafka_options(_base_props(**{"Honor Transactions": "false"}))[
            "kafka.isolation.level"
        ]
        == "read_uncommitted"
    )


def test_group_id_poll_records_session_timeout():
    opts = consume_kafka_options(
        _base_props(
            **{
                "Group ID": "minifi-group",
                "Max Poll Records": 10_000,
                "Session Timeout": "60 seconds",  # the reference default
            }
        )
    )
    assert opts["kafka.group.id"] == "minifi-group"
    assert opts["maxOffsetsPerTrigger"] == "10000"
    assert opts["kafka.session.timeout.ms"] == "60000"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["includeHeaders"] == "true"


def test_time_period_grammar():
    assert _parse_time_period_ms("100 ms") == 100
    assert _parse_time_period_ms("4 seconds") == 4000
    assert _parse_time_period_ms("5 min") == 300_000
    assert _parse_time_period_ms("1 hour") == 3_600_000
    with pytest.raises(ValueError):
        _parse_time_period_ms("sixty seconds")


def test_commit_policies():
    """CommitPolicyEnum (ConsumeKafka.h:229-238): Spark never commits
    to the broker — the checkpoint is commit-after-batch with
    exactly-once replay. NoCommit/AutoCommit/CommitAfterBatch are
    accepted (checkpoint-equivalent or weaker-than-checkpoint);
    CommitFromIncomingFlowFiles needs per-flowfile offset control and
    is rejected."""
    assert set(CONSUME_KAFKA_COMMIT_POLICIES) == {
        "NoCommit",
        "AutoCommit",
        "CommitAfterBatch",
        "CommitFromIncomingFlowFiles",
    }
    for ok in ("NoCommit", "AutoCommit", "CommitAfterBatch"):
        consume_kafka_options(_base_props(**{"Commit Offsets Policy": ok}))
    with pytest.raises(ValueError, match="CommitFromIncomingFlowFiles"):
        consume_kafka_options(
            _base_props(**{"Commit Offsets Policy": "CommitFromIncomingFlowFiles"})
        )
    with pytest.raises(ValueError, match="Commit Offsets Policy"):
        consume_kafka_options(_base_props(**{"Commit Offsets Policy": "Sometimes"}))


# -- header lifting on kafka-shaped frames ------------------------------------


def _kafka_frame(spark, headers):
    """One kafka-record row with the given [(key, value)] headers."""
    rows = [
        (
            b"k",
            b"payload",
            [(hk, hv.encode()) for hk, hv in headers],
            "topic-a",
            3,
            42,
        )
    ]
    schema = (
        "key binary, value binary, "
        "headers array<struct<key: string, value: binary>>, "
        "topic string, partition int, offset long"
    )
    import datetime

    df = spark.createDataFrame(rows, schema)
    from pyspark.sql import functions as F

    return df.withColumn("timestamp", F.lit(datetime.datetime(2024, 1, 1)))


@pytest.mark.parametrize(
    "policy,expected",
    [
        ("keep_first", "text/html"),
        ("keep_latest", "application/xml"),
        ("comma_merge", "text/html, application/xml"),
    ],
)
def test_duplicate_header_handling_truth_table(spark, policy, expected):
    """The exact example from ConsumeKafka.h:187-199: two Accept
    headers, three policies."""
    from nifi_minifi_cpp_spark.streaming.records import kafka_records_to_flowfiles

    df = _kafka_frame(spark, [("Accept", "text/html"), ("Accept", "application/xml")])
    row = kafka_records_to_flowfiles(df, duplicate_header_handling=policy).first()
    assert row["attributes"]["Accept"] == expected
    assert row["attributes"]["kafka.topic"] == "topic-a"
    assert row["attributes"]["kafka.partition"] == "3"
    assert row["attributes"]["kafka.offset"] == "42"


def test_headers_filter_admits_only_listed(spark):
    """Headers To Add As Attributes (ConsumeKafka.h:177-185): only
    listed names become attributes."""
    from nifi_minifi_cpp_spark.streaming.records import kafka_records_to_flowfiles

    df = _kafka_frame(spark, [("keep-me", "yes"), ("drop-me", "no")])
    row = kafka_records_to_flowfiles(df, headers_filter="keep-me, also-missing").first()
    assert row["attributes"].get("keep-me") == "yes"
    assert "drop-me" not in row["attributes"]


def test_publish_kafka_record_shape(spark):
    """PublishKafka (PublishKafka.cpp:610): key from attribute,
    attributes matching the regex become headers."""
    from pyspark.sql import functions as F

    from nifi_minifi_cpp_spark.streaming.records import flowfiles_to_kafka_records

    ff = spark.createDataFrame(
        [("u1", "hello", {"kafka.key": "K", "hdr.a": "1", "other": "2"})],
        "uuid string, content string, attributes map<string,string>",
    ).withColumn("ts", F.current_timestamp()).withColumn(
        "lineage", F.array().cast("array<string>")
    )
    out = flowfiles_to_kafka_records(
        ff, topic="out-topic", key_attribute="kafka.key", attributes_as_headers_regex="hdr\\..*"
    )
    row = out.first()
    assert bytes(row["key"]) == b"K"
    assert bytes(row["value"]) == b"hello"
    assert row["topic"] == "out-topic"
    hdrs = {h["key"]: bytes(h["value"]) for h in row["headers"]}
    assert hdrs == {"hdr.a": b"1"}


def test_kafka_source_requires_subscription(spark):
    from nifi_minifi_cpp_spark.streaming.sources import kafka_source

    with pytest.raises(ValueError, match="topics or topic_pattern"):
        kafka_source(spark, "b:9092")


def test_explicit_offsets_json_accepted():
    """Review r5 regression: an explicit per-partition startingOffsets
    JSON (the escape hatch the 'none' error recommends) must pass
    through to Spark."""
    js = '{"t1":{"0":23,"1":-2}}'
    opts = consume_kafka_options(_base_props(**{"Offset Reset": js}))
    assert opts["startingOffsets"] == js


def test_duplicate_headers_work_under_exception_dedup_policy(spark):
    """Review r5: the header fold must not depend on the session's
    mapKeyDedupPolicy (default EXCEPTION throws on duplicate map keys).
    Also: a header named like a base kafka.* attribute must override
    it, not throw."""
    from nifi_minifi_cpp_spark.streaming.records import kafka_records_to_flowfiles

    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        df = _kafka_frame(
            spark,
            [("Accept", "text/html"), ("Accept", "application/xml"), ("kafka.key", "shadow")],
        )
        for policy, expected in (
            ("keep_first", "text/html"),
            ("keep_latest", "application/xml"),
            ("comma_merge", "text/html, application/xml"),
        ):
            row = kafka_records_to_flowfiles(df, duplicate_header_handling=policy).first()
            assert row["attributes"]["Accept"] == expected, policy
            assert row["attributes"]["kafka.key"] == "shadow"  # header wins
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
