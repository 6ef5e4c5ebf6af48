"""OPC UA and Modbus/TCP processors (the reference's last protocol
family) under the injected-client pattern — the open62541/asio stacks
aren't importable here, so the transport is a constructor argument and
everything above it (traversal, lazy-state, address parsing, routing,
the Spark plan shape) is real and tested.

Reference semantics:
- FetchOPC (/root/reference/extensions/opc/src/fetchopc.cpp:60
  onTrigger, lazy modes :120-180): traverse from a root node to
  ``max_depth``, one FlowFile per VARIABLE node with the node's
  attributes; lazy mode On skips nodes whose Sourcetimestamp is
  unchanged since the persisted state, NewValue skips unchanged
  values.
- PutOPC (/root/reference/extensions/opc/src/putopc.cpp:276
  onTrigger): per FlowFile resolve the target node under a parent —
  update when it exists, create when it doesn't; success/failure.
- FetchModbusTcp (/root/reference/extensions/standard-processors/
  modbus/FetchModbusTcp.cpp:152, address grammar
  ReadModbusFunctions.cpp:192-230): per FlowFile, read a map of
  {variable: address-spec} and emit one record of variable->values.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# OPC UA
# ---------------------------------------------------------------------------


@dataclass
class OpcNode:
    """One node surfaced by the injected OPC client's traverse()."""

    node_id: str
    browsename: str
    path: str
    value: object = None
    datatype: str = "String"
    source_timestamp: str = ""
    is_variable: bool = True
    attributes: dict[str, str] = field(default_factory=dict)


class OpcLazyState:
    """FetchOPC's per-node state map (fetchopc.cpp:120-180: the
    StateManager keys are '<full path>_timestamp' / '<full path>_new_value')."""

    def __init__(self, state_path: str):
        self.state_path = state_path

    def load(self) -> dict[str, str]:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                return json.load(f)
        return {}

    def save(self, state: dict[str, str]) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)


def fetch_opc(
    spark: SparkSession,
    client,
    node_id: str,
    max_depth: int = 0,
    lazy: str = "off",
    state: OpcLazyState | None = None,
) -> DataFrame | None:
    """FetchOPC (fetchopc.cpp:60): one FlowFile per variable node under
    ``node_id``. ``client.traverse(node_id, max_depth) ->
    iterable[OpcNode]``. ``lazy``: ``off`` emits everything; ``on``
    emits only nodes with a new Sourcetimestamp; ``new_value`` only
    nodes whose value changed (both against the persisted state).
    Traversal is agent-side metadata work (like the reference); the
    emitted frame fans out for the downstream operator pipeline.
    """
    if lazy not in ("off", "on", "new_value"):
        raise ValueError(f"unknown lazy mode {lazy!r}")
    state_map = state.load() if state else {}
    rows = []
    for node in client.traverse(node_id, max_depth):
        if not node.is_variable:
            continue
        value_str = "" if node.value is None else str(node.value)
        if lazy == "on":
            key = f"{node.path}_timestamp"
            if state_map.get(key) == node.source_timestamp:
                continue
            state_map[key] = node.source_timestamp
        elif lazy == "new_value":
            key = f"{node.path}_new_value"
            if state_map.get(key) == value_str:
                continue
            state_map[key] = value_str
        attrs = {
            "NodeID": node.node_id,
            "Browsename": node.browsename,
            "Full path": node.path,
            "Datatype": node.datatype,
            "Sourcetimestamp": node.source_timestamp,
            **node.attributes,
        }
        rows.append((node.node_id, value_str, attrs))
    if state:
        state.save(state_map)
    if not rows:
        return None
    return spark.createDataFrame(
        rows, "uuid string, content string, attributes map<string,string>"
    )


def put_opc(
    df: DataFrame,
    client_factory,
    parent_node_id: str,
    target_attr: str = "targetnodeid",
    content_col: str = "content",
) -> dict[str, DataFrame]:
    """PutOPC (putopc.cpp:276): write each row's content to its target
    node under ``parent_node_id`` — ``update`` when the node exists,
    ``create`` otherwise — executor-side (one client per partition).
    The injected client needs ``exists(node_id) -> bool``,
    ``update_node(node_id, value)`` and
    ``create_node(parent_node_id, node_id, value)``.
    Returns success/failure relationship frames; ``opc_action``
    records update/create per row.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("opc_action", StringType()), StructField("opc_status", StringType())]
    )

    def run(batches):
        client = client_factory()
        for pdf in batches:
            actions, statuses = [], []
            for attrs, content in zip(pdf["attributes"], pdf[content_col]):
                target = (attrs or {}).get(target_attr)
                if not target:
                    actions.append(None)
                    statuses.append("failure")
                    continue
                try:
                    if client.exists(target):
                        client.update_node(target, content)
                        actions.append("update")
                    else:
                        client.create_node(parent_node_id, target, content)
                        actions.append("create")
                    statuses.append("success")
                except Exception:
                    actions.append(None)
                    statuses.append("failure")
            out = pdf.copy()
            out["opc_action"] = actions
            out["opc_status"] = statuses
            yield out

    sent = df.mapInPandas(run, out_schema)
    # exactly-once barrier: both relationship frames read the
    # materialized result instead of re-running the writes (see
    # streaming.sinks.route_invoke_http); streaming frames defer to
    # their micro-batch barrier
    if not sent.isStreaming:
        sent = sent.localCheckpoint(eager=True)
    ok = F.col("opc_status") == "success"
    return {"success": sent.filter(ok), "failure": sent.filter(~ok)}


# ---------------------------------------------------------------------------
# Modbus/TCP
# ---------------------------------------------------------------------------

# ReadModbusFunctions.cpp:193 — long form; :216 — short/classic form
_MODBUS_LONG = re.compile(r"(holding-register|coil|input-register):(\d+)(?::([a-zA-Z_]+))?(?:\[(\d+)\])?$")
_MODBUS_SHORT = re.compile(r"(\dx|\d)(\d{4,5})?(?::([a-zA-Z_]+))?(?:\[(\d+)\])?$")

_SHORT_KINDS = {"1": "coil", "1x": "coil", "3": "input-register", "3x": "input-register",
                "4": "holding-register", "4x": "holding-register"}


@dataclass
class ModbusRead:
    """Parsed address spec: what to read and how to type it."""

    kind: str  # coil | input-register | holding-register
    address: int
    length: int = 1
    value_type: str = "UINT"


def parse_modbus_address(spec: str) -> ModbusRead:
    """The reference's two address grammars
    (ReadModbusFunctions.cpp:192-230): ``holding-register:123:INT[4]``
    and the classic ``4x00123[4]`` / ``300042`` forms."""
    m = _MODBUS_LONG.match(spec)
    if m:
        kind, addr, vtype, length = m.groups()
        return ModbusRead(kind, int(addr), int(length or 1), (vtype or "UINT").upper())
    m = _MODBUS_SHORT.match(spec)
    if m:
        prefix, addr, vtype, length = m.groups()
        kind = _SHORT_KINDS.get(prefix)
        if kind is None:
            raise ValueError(f"bad modbus address {spec!r}")
        # classic addressing: the remaining digits are 1-based
        address = int(addr) - 1 if addr else 0
        return ModbusRead(kind, address, int(length or 1), (vtype or "UINT").upper())
    raise ValueError(f"bad modbus address {spec!r}")


def fetch_modbus_tcp(
    df: DataFrame,
    client_factory,
    address_map: dict[str, str],
    unit_id: int = 1,
) -> dict[str, DataFrame]:
    """FetchModbusTcp (FetchModbusTcp.cpp:152): per input row, read
    every variable in ``address_map`` and attach the record as a JSON
    content column — executor-side, one connection per partition. The
    injected client needs
    ``read(kind, address, count, unit_id) -> list[int|bool]``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    parsed = {var: parse_modbus_address(spec) for var, spec in address_map.items()}
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("modbus_record", StringType()), StructField("modbus_status", StringType())]
    )

    def run(batches):
        client = client_factory()
        for pdf in batches:
            records, statuses = [], []
            for _ in range(len(pdf)):
                rec = {}
                try:
                    for var, read in parsed.items():
                        vals = client.read(read.kind, read.address, read.length, unit_id)
                        rec[var] = vals[0] if read.length == 1 and len(vals) == 1 else list(vals)
                    records.append(json.dumps(rec, sort_keys=True))
                    statuses.append("success")
                except Exception:
                    records.append(None)
                    statuses.append("failure")
            out = pdf.copy()
            out["modbus_record"] = records
            out["modbus_status"] = statuses
            yield out

    sent = df.mapInPandas(run, out_schema)
    # one poll of the device per row: without the barrier each
    # relationship re-reads the registers and the frames could disagree
    if not sent.isStreaming:
        sent = sent.localCheckpoint(eager=True)
    ok = F.col("modbus_status") == "success"
    return {"success": sent.filter(ok), "failure": sent.filter(~ok)}
