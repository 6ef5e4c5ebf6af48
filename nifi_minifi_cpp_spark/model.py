"""Canonical FlowFile event-frame model.

The reference's unit of data is the FlowFile: opaque content bytes +
a flat string->string attribute map + identity/lineage metadata
(/root/reference/minifi-api/include/minifi-cpp/core/FlowFile.h:38-82).
Spark-first, that is a row of ``FLOWFILE_SCHEMA``; the attribute map is
a ``MapType(string,string)`` column, content is a string/binary column,
and hot attributes get promoted to top-level columns per pipeline.

Well-known attribute names mirror
/root/reference/minifi-api/common/include/minifi-cpp/core/SpecialFlowAttribute.h:21-32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# SpecialFlowAttribute.h parity
PATH = "path"
ABSOLUTE_PATH = "absolute.path"
FILENAME = "filename"
UUID = "uuid"
PRIORITY = "priority"
MIME_TYPE = "mime.type"
DISCARD_REASON = "discard.reason"
ALTERNATE_IDENTIFIER = "alternate.identifier"
FLOW_ID = "flow.id"

FLOWFILE_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("lineage", T.ArrayType(T.StringType()), True),
    ]
)

ATTR_MAP_TYPE = T.MapType(T.StringType(), T.StringType())


def events_to_flowfiles(events: DataFrame) -> DataFrame:
    """Lift the driver's ``events`` table into the canonical frame.

    ``props`` (a JSON object string) becomes the attribute map; typed
    event columns are promoted into it stringly, matching the
    reference's untyped attribute model.
    """
    attrs = F.map_concat(
        F.from_json(F.col("props"), ATTR_MAP_TYPE),
        F.create_map(
            F.lit("event_type"),
            F.col("event_type"),
            F.lit("user_id"),
            F.col("user_id").cast("string"),
            F.lit("value"),
            F.col("value").cast("string"),
        ),
    )
    return events.select(
        F.col("event_id").cast("string").alias("uuid"),
        F.col("ts"),
        F.col("props").alias("content"),
        attrs.alias("attributes"),
        F.array(F.col("event_id").cast("string")).alias("lineage"),
        # promoted hot attributes (SURVEY §1.5): typed top-level copies
        # so EL predicates on them push down to the scan
        F.col("event_type"),
        F.col("user_id"),
        F.col("value"),
    )


def documents_to_flowfiles(docs: DataFrame) -> DataFrame:
    """Lift the ``documents`` table: text is content, metadata attrs."""
    return docs.select(
        F.col("doc_id").cast("string").alias("uuid"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("text").alias("content"),
        F.create_map(
            F.lit("lang"),
            F.col("lang"),
            F.lit("source"),
            F.col("source"),
            F.lit("n_chars"),
            F.col("n_chars").cast("string"),
        ).alias("attributes"),
        F.array(F.col("doc_id").cast("string")).alias("lineage"),
    )


def attr(name: str) -> F.Column:
    """Column accessor for one attribute (null when absent)."""
    return F.col("attributes").getItem(name)
