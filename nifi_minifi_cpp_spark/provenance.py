"""Provenance / lineage parity.

The reference emits per-session provenance events — {CREATE, RECEIVE,
FETCH, SEND, DROP, EXPIRE, FORK, JOIN, CLONE, CONTENT_MODIFIED,
ATTRIBUTES_MODIFIED, ROUTE, ...}
(/root/reference/minifi-api/include/minifi-cpp/provenance/Provenance.h:45-135)
persisted to a RocksDB repository. Spark-first, lineage is data:

- the ``lineage`` array column carries ancestor uuids (FlowFile.h:51
  lineageIdentifiers); FORK appends the parent, JOIN unions children;
- an optional ``provenance`` array column accumulates event structs
  so a pipeline can ship its own provenance stream to any sink;
- engine-level lineage (which files/stages produced what) is Spark's
  event log — free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EVENT_TYPES = (
    "CREATE",
    "RECEIVE",
    "FETCH",
    "SEND",
    "DOWNLOAD",
    "DROP",
    "EXPIRE",
    "FORK",
    "JOIN",
    "CLONE",
    "CONTENT_MODIFIED",
    "ATTRIBUTES_MODIFIED",
    "ROUTE",
    "ADDINFO",
    "REPLAY",
)

PROVENANCE_EVENT_TYPE = "struct<event:string,component:string,ts:timestamp>"


#: processor-category -> provenance event (Provenance.h:45-135 enum;
#: assignments mirror which event each processor family records in the
#: reference: sources CREATE/RECEIVE, sinks SEND, Route* ROUTE,
#: splitters FORK, mergers JOIN, attribute ops ATTRIBUTES_MODIFIED,
#: content ops CONTENT_MODIFIED)
_SOURCE_TYPES = frozenset(
    {"GetFile", "GenerateFlowFile", "TableSource", "FileStreamSource", "ExecuteProcess"}
)
_RECEIVE_PREFIXES = ("Listen", "Consume", "Fetch", "GetTCP", "GetCouchbase", "InputPort")
_SEND_PREFIXES = ("Put", "Publish", "InvokeHTTP", "OutputPort")
_ATTR_TYPES = frozenset(
    {
        "UpdateAttribute",
        "AppendHostInfo",
        "ExtractText",
        "EvaluateJsonPath",
        "HashContent",
        "AttributesToJSON",
        "LogAttribute",
        "RetryFlowFile",
    }
)


def event_for(processor_type: str, relationship: str = "success") -> str:
    """Provenance event type for a processor's output edge."""
    t = processor_type
    if t in _SOURCE_TYPES:
        return "CREATE"
    if t.startswith(_RECEIVE_PREFIXES) or t in ("QueryDatabaseTable", "ExecuteSQL", "TailFile"):
        return "RECEIVE"
    if t.startswith(_SEND_PREFIXES):
        return "SEND"
    if t.startswith("Route") or relationship not in ("success", "matched"):
        return "ROUTE"
    if t.startswith(("Split", "Segment")) or t == "DefragmentText":
        return "FORK"
    if t.startswith("Merge"):
        return "JOIN"
    if t in _ATTR_TYPES:
        return "ATTRIBUTES_MODIFIED"
    if t in ("Funnel", "LocalPort"):
        return "ADDINFO"
    return "CONTENT_MODIFIED"


def emit(df: DataFrame, event: str, component: str) -> DataFrame:
    """Append a provenance event to the ``provenance`` column
    (created on first use)."""
    if event not in EVENT_TYPES:
        raise ValueError(f"unknown provenance event {event!r}")
    ev = F.struct(
        F.lit(event).alias("event"),
        F.lit(component).alias("component"),
        F.current_timestamp().alias("ts"),
    )
    if "provenance" in df.columns:
        return df.withColumn("provenance", F.concat(F.col("provenance"), F.array(ev)))
    return df.withColumn("provenance", F.array(ev))


def fork_lineage(parent_uuid: Column, parent_lineage: Column) -> Column:
    """FORK: the child's lineage = parent's ancestors + the parent."""
    return F.array_union(
        F.coalesce(parent_lineage, F.array().cast("array<string>")), F.array(parent_uuid)
    )


def child_uuid(parent_uuid: Column, index: Column, tag: str = "f") -> Column:
    """Deterministic child id minted from the parent + fragment index."""
    return F.concat(parent_uuid, F.lit(f"-{tag}"), index.cast("string"))
