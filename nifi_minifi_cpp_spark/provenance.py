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
