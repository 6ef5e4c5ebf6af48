"""Accept the reference's OWN flow-config dialect.

MiNiFi C++ flows ship as ``config.yml`` in the schema of
/root/reference/libminifi/src/core/flow/FlowSchema.cpp:30-99:
capitalized section names (``Processors`` / ``Connections`` /
``Process Groups`` / ``Controller Services`` / ``Funnels`` /
``Input Ports`` / ``Output Ports``), namespaced ``class`` names
(``org.apache.nifi.minifi.processors.GenerateFlowFile``), connection
endpoints as ``source id``/``destination id`` (or names) with a
``source relationship names`` LIST, and property values that may be
wrapped as ``- value: X`` items (see
libminifi/test/resources/*.yml for live examples).

``normalize_flow_config`` rewrites that dialect into the engine's
internal shape so ``compile_flow`` runs a reference config.yml
unmodified:

- agent-runtime sections (repositories, Core Properties, Security
  Properties, Flow Controller header) are dropped — Spark owns
  scheduling, durability, and transport;
- group-level ``Input Ports``/``Output Ports`` become LocalPort
  pass-through processors (their graph role inside one flow is edge
  plumbing; cross-flow Site-to-Site ports are plans/ports.py),
  ``Funnels`` become Funnel processors;
- one connection is emitted per entry in ``source relationship
  names``; queue fields the engine honors (``flowfile expiration``,
  ``drop empty``) are carried through, backpressure fields are
  dropped (micro-batch planning replaces queues, SURVEY §1.5);
- processor properties keep their reference spelling AND gain a
  snake_case alias (``Batch Size`` -> ``batch_size``) when absent, so
  engine handlers find their inputs without a per-processor rename
  table; name collisions defer to the explicit key.
"""

from __future__ import annotations

from typing import Any

#: agent-runtime sections with no dataflow content
_AGENT_SECTIONS = {
    "Flow Controller",
    "Core Properties",
    "FlowFile Repository",
    "Content Repository",
    "Provenance Repository",
    "Component Status Repository",
    "Security Properties",
    "MiNiFi Config Version",
}

_REFERENCE_MARKERS = ("Processors", "Process Groups", "Flow Controller", "Connections")


def is_reference_dialect(config: dict) -> bool:
    """A config is reference-dialect when it uses the capitalized
    FlowSchema section names (the internal dialect is lowercase)."""
    return any(k in config for k in _REFERENCE_MARKERS)


def _unwrap(value: Any) -> Any:
    """Reference property values may arrive as ``[{value: X}, ...]``
    (FlowSchema value lists, e.g. TestControllerServices.yml). A
    single-item list unwraps to the scalar; multi-item stays a list of
    the inner values (the services layer parses those)."""
    if isinstance(value, list) and value and all(
        isinstance(v, dict) and set(v) == {"value"} for v in value
    ):
        vals = [v["value"] for v in value]
        return vals[0] if len(vals) == 1 else [{"value": v} for v in vals]
    return value


#: processors whose properties are DYNAMIC (each key is a route /
#: attribute name, not a configuration knob) — snake_case aliasing
#: would inject phantom entries ("Bad Events" AND "bad_events" both
#: becoming routes), so these keep their properties verbatim.
_DYNAMIC_PROPERTY_TYPES = frozenset({"RouteOnAttribute", "RouteText", "UpdateAttribute"})

#: well-known (non-dynamic) properties of dynamic-property processors:
#: mapped to the handler's underscore-prefixed keys so they are never
#: mistaken for user-defined routes (RouteText.h:124-162)
_DYNAMIC_KNOWN_PROPS: dict[str, dict[str, str]] = {
    "RouteText": {
        "Routing Strategy": "_routing",
        "Matching Strategy": "_matching",
        "Ignore Case": "_ignore_case",
        "Ignore Leading/Trailing Whitespace": "_trim",
        "Grouping Regular Expression": "_grouping_regex",
        "Character Set": "_charset",
    },
}


#: reference property name (snake form) -> engine handler key, for the
#: processors where the generic snake_case alias does not land on the
#: handler's input (names from PROCESSORS.md property tables).
_PROPERTY_RENAMES: dict[str, dict[str, str]] = {
    "InvokeHTTP": {"remote_url": "url", "http_method": "method"},
    "CompressContent": {"compression_format": "fmt"},
    "MergeContent": {
        "correlation_attribute_name": "correlation_attribute",
        "maximum_number_of_entries": "max_entries",
    },
    "TailFile": {"file_to_tail": "pattern", "state_file": "state_path",
                 "input_delimiter": "delimiter"},
    "TailFileStream": {"file_to_tail": "pattern", "input_delimiter": "delimiter"},
    "PutFile": {"conflict_resolution_strategy": "conflict_resolution"},
    "RetryFlowFile": {"maximum_retries": "max_retries"},
    "ConsumeKafka": {"kafka_brokers": "brokers", "topic_names": "topics"},
    "PublishKafka": {"known_brokers": "brokers", "topic_name": "topic"},
    "HashContent": {"hash_attribute": "attribute", "hash_algorithm": "algorithm"},
}

#: reference allowable-values that need normalizing for the engine
#: (e.g. MergeContent 'Defragment' vs the handler's 'defragment')
_VALUE_TRANSFORMS: dict[tuple[str, str], Any] = {
    ("MergeContent", "merge_strategy"): lambda v: str(v).lower().replace("-", "_").split(" ")[0],
    ("CompressContent", "mode"): lambda v: str(v).lower(),
}


def _props(raw: dict | None, ptype: str = "") -> dict:
    props = {k: _unwrap(v) for k, v in (raw or {}).items()}
    if ptype in _DYNAMIC_PROPERTY_TYPES:
        for src, dst in _DYNAMIC_KNOWN_PROPS.get(ptype, {}).items():
            if src in props:
                props[dst] = props.pop(src)
        return props
    for k, v in list(props.items()):
        alias = k.strip().lower().replace(" ", "_")
        if alias not in props:
            props[alias] = v
    for src, dst in _PROPERTY_RENAMES.get(ptype, {}).items():
        if src in props and dst not in props:
            props[dst] = props[src]
    for (t, key), fn in _VALUE_TRANSFORMS.items():
        if t == ptype and key in props:
            props[key] = fn(props[key])
    return props


def _type_of(entry: dict) -> str:
    ctype = entry.get("class") or entry.get("type") or ""
    return str(ctype).rsplit(".", 1)[-1]


def _norm_group(group: dict, top: bool) -> tuple[dict, list[dict]]:
    """One group -> internal shape; returns (group, hoisted services).

    Controller services are hoisted to the flow level: the engine's
    registry is flat (service names must be unique flow-wide, which
    the reference's own examples satisfy)."""
    out: dict[str, Any] = {}
    services: list[dict] = []
    for svc in group.get("Controller Services") or []:
        svc = dict(svc)
        # single-item value-wrapped scalars unwrap; genuine lists
        # (Allowed Properties, Linked Services) keep the wrapped form
        # the services layer parses
        svc["Properties"] = {
            k: _unwrap(v) for k, v in (svc.get("Properties") or {}).items()
        }
        services.append(svc)

    procs = []
    for p in group.get("Processors") or []:
        ptype = _type_of(p)
        props = _props(p.get("Properties"), ptype)
        # TIMER_DRIVEN cadence -> the micro-batch trigger of the query
        # this processor terminates (FlowController applies it on the
        # streaming sink). EVENT_DRIVEN = Spark's default
        # as-fast-as-available; CRON_DRIVEN has no native trigger —
        # drive an availableNow run from an external scheduler.
        if (
            str(p.get("scheduling strategy", "TIMER_DRIVEN")) == "TIMER_DRIVEN"
            and p.get("scheduling period")
            and "trigger_period" not in props
        ):
            props["trigger_period"] = str(p["scheduling period"])
        procs.append(
            {
                "id": str(p.get("id") or p.get("name")),
                "name": p.get("name"),
                "type": ptype,
                "properties": props,
            }
        )
    # ports inside a flow are edge plumbing: pass-through nodes
    for section, ptype in (
        ("Input Ports", "LocalPort"),
        ("Output Ports", "LocalPort"),
        ("Funnels", "Funnel"),
    ):
        for port in group.get(section) or []:
            procs.append(
                {
                    "id": str(port.get("id") or port.get("name")),
                    "name": port.get("name"),
                    "type": ptype,
                    "properties": {},
                }
            )
    # Remote Process Group ports: the wire-protocol Site-to-Site
    # target becomes the engine's STORAGE channel (plans/ports.py).
    # An RPG input port maps to an OutputPort processor whose channel
    # comes from the port's `Channel` property (engine extension — the
    # reference's host:port has no storage analogue); a flow that
    # routes into an unconfigured RPG port gets a clear migration
    # error instead of "unknown processor". Runs BEFORE the processors
    # guard and the name->id alias map so RPG-only groups keep their
    # ports and name-based connections to RPG ports resolve (review).
    for rpg in group.get("Remote Process Groups") or group.get("Remote Processing Groups") or []:
        for port in rpg.get("Input Ports") or []:
            port_props = _props(port.get("Properties"))
            channel = port_props.get("channel") or port_props.get("Channel")
            entry = {
                "id": str(port.get("id") or port.get("name")),
                "name": port.get("name"),
                "type": "OutputPort",
                "properties": {"channel": channel} if channel else {
                    "__rpg_unconfigured__": (
                        f"RPG port {port.get('name')!r} targets "
                        f"{rpg.get('url')!r} over the Site-to-Site wire "
                        "protocol; give the port a 'Channel' property "
                        "(shared storage dir) to route it through the "
                        "engine's storage channel"
                    )
                },
            }
            procs.append(entry)

    if procs:
        out["processors"] = procs

    # connections may reference siblings by display name instead of id
    alias = {p["name"]: p["id"] for p in procs if p.get("name")}

    conns = []
    for c in group.get("Connections") or []:
        src = c.get("source id") or c.get("source name") or c.get("source")
        dst = c.get("destination id") or c.get("destination name") or c.get("destination")
        src = alias.get(src, src)
        dst = alias.get(dst, dst)
        rels = c.get("source relationship names")
        if not rels:
            single = c.get("source relationship name") or c.get("relationship")
            rels = [single] if single else ["success"]
        for rel in rels:
            conn = {"source": str(src), "destination": str(dst), "relationship": str(rel)}
            for carried in ("flowfile expiration", "drop empty"):
                if carried in c:
                    conn[carried] = c[carried]
            conns.append(conn)
    if conns:
        out["connections"] = conns

    children = []
    for child in group.get("Process Groups") or []:
        norm_child, child_services = _norm_group(child, top=False)
        norm_child.setdefault("name", child.get("name", child.get("id", "group")))
        norm_child.setdefault("id", child.get("id"))
        if child.get("Parameter Context Name"):
            norm_child["parameter_context_name"] = child["Parameter Context Name"]
        children.append(norm_child)
        services.extend(child_services)
    if children:
        out["process_groups"] = children
    return out, services


def normalize_flow_config(config: dict) -> dict:
    """Reference config.yml dict -> the engine's internal flow shape.
    Unknown non-agent sections are preserved untouched (forward
    compatibility); agent-runtime sections are dropped."""
    root, services = _norm_group(config, top=True)

    contexts = []
    for ctx in config.get("Parameter Contexts") or []:
        contexts.append(
            {
                "name": ctx.get("name"),
                "parameters": [
                    {"name": p.get("name"), "value": p.get("value")}
                    for p in (ctx.get("Parameters") or [])
                ],
                "inherited_parameter_contexts": list(
                    ctx.get("Inherited Parameter Contexts") or []
                ),
            }
        )
    if contexts:
        root["parameter_contexts"] = contexts
    if config.get("Parameter Context Name"):
        root["parameter_context_name"] = config["Parameter Context Name"]
    if services:
        root["Controller Services"] = services
    if config.get("Provenance Reporting"):
        pr = config["Provenance Reporting"]
        # the reference ships events to a Site-to-Site port
        # (SiteToSiteProvenanceReportingTask); the engine's channel is
        # the storage port, so carry the batch size + an optional
        # channel dir (engine extension; host/port have no analogue)
        root["provenance_reporting"] = {
            "batch_size": pr.get("batch size", 100),
            "port_uuid": pr.get("port uuid"),
            "channel": pr.get("channel"),
        }

    handled = _AGENT_SECTIONS | {
        "Processors",
        "Connections",
        "Process Groups",
        "Controller Services",
        "Funnels",
        "Input Ports",
        "Output Ports",
        "Parameter Contexts",
        "Parameter Context Name",
        "Provenance Reporting",
        "Remote Process Groups",
        "Remote Processing Groups",
    }
    for k, v in config.items():
        if k not in handled and k not in root:
            root[k] = v
    return root
