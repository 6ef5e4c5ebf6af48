"""C2 agent protocol: heartbeats, response nodes, and operation acks.

Reference: /root/reference/C2.md (heartbeat with response nodes,
requested operations in the response), C2Agent
(/root/reference/libminifi/include/c2/C2Agent.h:60-240: heartbeat
loop, operation dispatch, ack queue) and the operation enum
(/root/reference/libminifi/include/c2/C2Payload.h:36-49:
acknowledge/start/stop/restart/describe/heartbeat/update/clear/
transfer/pause/resume/sync).

Spark-first shape: the agent wraps a :class:`FlowController` (the
hot-swap analogue of FlowController::applyConfiguration already
existed); the C2 server transport is an injected callable
``send(payload: dict) -> dict | None`` so the protocol runs against
any REST endpoint (import-gated requests default) or an in-process
fake in tests. Heartbeats carry the reference's response nodes —
AgentInformation (with manifest on the first/full heartbeat),
DeviceInfoNode, FlowInformation (running queries), and
ConfigurationChecksums — and every requested operation is answered
with an acknowledge payload carrying FULLY_APPLIED / NOT_APPLIED
state, matching the reference's ack discipline.
"""

from __future__ import annotations

import hashlib
import json
import os
import socket
import time
import uuid as _uuid
from collections.abc import Callable
from typing import Any

from .pipeline import FlowController, registered_processors

#: C2Payload.h:36-49 — the full operation vocabulary
C2_OPERATIONS = (
    "acknowledge",
    "start",
    "stop",
    "restart",
    "describe",
    "heartbeat",
    "update",
    "clear",
    "transfer",
    "pause",
    "resume",
    "sync",
)

FULLY_APPLIED = "FULLY_APPLIED"
PARTIALLY_APPLIED = "PARTIALLY_APPLIED"
NOT_APPLIED = "NOT_APPLIED"
NO_OPERATION = "NO_OPERATION"


def rest_sender(url: str, session_factory=None) -> Callable[[dict], dict | None]:
    """Default HTTP transport (nifi.c2.rest.url): POST the heartbeat
    JSON, return the parsed response. requests is import-gated (absent
    in this container — tests inject a fake transport instead)."""

    def send(payload: dict) -> dict | None:
        try:
            import requests  # type: ignore[import-untyped]
        except ImportError as e:
            raise NotImplementedError(
                "requests is not installed; inject a transport callable"
            ) from e
        sess = session_factory() if session_factory else requests.Session()
        resp = sess.post(url, json=payload, timeout=30)
        if resp.status_code != 200 or not resp.content:
            return None
        return resp.json()

    return send


class C2Agent:
    """Heartbeat + operation-ack loop around a FlowController.

    ``full_heartbeat=False`` mirrors nifi.c2.full.heartbeat: the agent
    manifest rides only on the FIRST heartbeat (or on DESCRIBE
    manifest), keeping steady-state payloads light (C2.md:71-75).
    """

    def __init__(
        self,
        controller: FlowController,
        transport: Callable[[dict], dict | None],
        agent_id: str | None = None,
        agent_class: str = "spark-engine",
        full_heartbeat: bool = False,
        properties: dict[str, str] | None = None,
        update_policy: dict | None = None,
    ):
        self.controller = controller
        self.transport = transport
        self.agent_id = agent_id or _uuid.uuid4().hex
        self.agent_class = agent_class
        self.full_heartbeat = full_heartbeat
        self.started_at = time.monotonic()
        self.sequence = 0
        self._sent_manifest = False
        self.paused = False
        self.last_transport_error: str | None = None
        #: agent configuration the C2 server may update (the
        #: minifi.properties analogue); gated by an
        #: UpdatePolicyControllerService resolved via plans.services
        #: (C2.md:288-304, enforcement C2Agent.cpp:658)
        self.properties: dict[str, str] = dict(properties or {})
        self.update_policy = update_policy

    # -- response nodes (C2.md "C2 Response Nodes") ----------------------

    def _manifest(self) -> dict:
        return {
            "bundles": [
                {
                    "artifact": "nifi-minifi-cpp-spark",
                    "componentManifest": {
                        "processors": [{"type": t} for t in sorted(registered_processors())]
                    },
                }
            ]
        }

    def _agent_info(self, include_manifest: bool) -> dict:
        info: dict[str, Any] = {
            "identifier": self.agent_id,
            "agentClass": self.agent_class,
            "uptime": round(time.monotonic() - self.started_at, 3),
            "status": {"running": bool(self.controller.queries) or self.controller.flow is not None},
        }
        if include_manifest:
            info["agentManifest"] = self._manifest()
        return info

    def _device_info(self) -> dict:
        return {
            "systemInformation": {"vCores": os.cpu_count(), "machineArch": os.uname().machine},
            "networkInformation": {"hostname": socket.gethostname()},
        }

    def _flow_info(self) -> dict:
        queries = [
            {"id": q.id, "name": q.name, "isActive": q.isActive}
            for q in self.controller.queries
        ]
        return {
            "flowId": self.config_checksum(),
            "components": queries,
            "paused": self.paused,
        }

    def config_checksum(self) -> str:
        """ConfigurationChecksums node: sha256 of the deployed config
        (C2.md response-node list)."""
        cfg = self.controller.config
        raw = cfg if isinstance(cfg, str) else json.dumps(cfg, sort_keys=True, default=str)
        return hashlib.sha256(raw.encode()).hexdigest()

    def heartbeat_payload(self) -> dict:
        include_manifest = self.full_heartbeat or not self._sent_manifest
        self.sequence += 1
        return {
            "operation": "heartbeat",
            "sequence": self.sequence,
            "agentInfo": self._agent_info(include_manifest),
            "deviceInfo": self._device_info(),
            "flowInfo": self._flow_info(),
        }

    # -- operation dispatch (C2Agent.h: handle_c2_server_response) -------

    def heartbeat(self) -> list[dict]:
        """Send one heartbeat; process requested operations from the
        response; send (and return) the acknowledge payloads.

        Transport failures must not kill the heartbeat loop (the
        reference keeps beating through server outages) and must not
        latch the manifest flag: ``_sent_manifest`` flips only after a
        DELIVERED heartbeat, so the server is guaranteed to eventually
        receive the first-contact manifest."""
        payload = self.heartbeat_payload()
        try:
            response = self.transport(payload) or {}
        except Exception as exc:  # noqa: BLE001 — keep beating
            self.last_transport_error = f"{type(exc).__name__}: {exc}"
            return []
        self.last_transport_error = None
        self._sent_manifest = True
        acks = []
        for op in response.get("requestedOperations", []) or []:
            ack = self.process_operation(op)
            try:
                self.transport(ack)
            except Exception as exc:  # noqa: BLE001 — ack redelivery is server-side
                self.last_transport_error = f"{type(exc).__name__}: {exc}"
            acks.append(ack)
        return acks

    def _ack(self, op: dict, state: str, details: str = "", extra: dict | None = None) -> dict:
        ack = {
            "operation": "acknowledge",
            "operationId": op.get("identifier") or op.get("operationId"),
            "operationState": {"state": state, "details": details},
        }
        if extra:
            ack.update(extra)
        return ack

    def _update_properties(self, op: dict) -> dict:
        """``update properties`` (C2Agent.cpp:618 handlePropertyUpdate):
        each arg is ``name -> value`` or ``name -> {value, persist}``;
        the UpdatePolicyControllerService gate (C2Agent.cpp:658) rejects
        disallowed names. State machine is the reference's exactly:
        NO_OPERATION until a change, FULLY_APPLIED/NOT_APPLIED on
        all-success/all-fail, PARTIALLY_APPLIED on a mix; a same-value
        no-op never changes the state."""
        state = NO_OPERATION
        details: list[str] = []
        for pname, pval in (op.get("args") or {}).items():
            persist = True
            if isinstance(pval, dict):
                persist = bool(pval.get("persist", True))
                pval = pval.get("value")
            pval = str(pval)
            gate = self.update_policy.get("can_update") if self.update_policy else None
            if gate is not None and not gate(pname):
                ok = False
                details.append(f"{pname}: update not allowed by policy")
            elif self.properties.get(pname) == pval:
                continue  # NO_UPDATE: state unchanged
            else:
                self.properties[pname] = pval
                if persist:
                    self._persisted_properties = getattr(self, "_persisted_properties", {})
                    self._persisted_properties[pname] = pval
                ok = True
            if state == NO_OPERATION:
                state = FULLY_APPLIED if ok else NOT_APPLIED
            elif (state == FULLY_APPLIED and not ok) or (state == NOT_APPLIED and ok):
                state = PARTIALLY_APPLIED
        return self._ack(op, state, "; ".join(details))

    def process_operation(self, op: dict) -> dict:
        """One requested operation -> acknowledge payload. Unknown
        operations ack NOT_APPLIED (the reference logs and acks rather
        than dying mid-heartbeat)."""
        name = str(op.get("operation", "")).lower()
        operand = str(op.get("operand", "")).lower()
        try:
            if name not in C2_OPERATIONS:
                return self._ack(op, NOT_APPLIED, f"unknown operation {name!r}")
            if name == "describe":
                if operand == "manifest":
                    return self._ack(op, FULLY_APPLIED, extra={"agentManifest": self._manifest()})
                if operand == "configuration":
                    cfg = self.controller.config
                    raw = cfg if isinstance(cfg, str) else json.dumps(cfg, sort_keys=True, default=str)
                    return self._ack(op, FULLY_APPLIED, extra={"configuration": raw})
                if operand == "metrics":
                    return self._ack(op, FULLY_APPLIED, extra={"metrics": self._flow_info()})
                return self._ack(op, NOT_APPLIED, f"unknown describe operand {operand!r}")
            if name == "update":
                if operand == "properties":
                    return self._update_properties(op)
                if operand != "configuration":
                    return self._ack(op, NOT_APPLIED, f"unknown update operand {operand!r}")
                new_config = op.get("content") or op.get("args", {}).get("flowYaml")
                if not new_config:
                    return self._ack(op, NOT_APPLIED, "update carries no configuration payload")
                # FlowController.apply_configuration already rolls back
                # to the previous flow on failure (C2 contract)
                self.controller.apply_configuration(new_config)
                return self._ack(op, FULLY_APPLIED, extra={"flowId": self.config_checksum()})
            if name == "stop":
                self.controller.stop()
                return self._ack(op, FULLY_APPLIED)
            if name in ("start", "restart"):
                self.controller.stop()
                self.controller.start()
                return self._ack(op, FULLY_APPLIED)
            if name == "pause":
                # no per-query pause in Structured Streaming: stop the
                # queries, keep the config; resume restarts from each
                # query's checkpoint (same effective semantics)
                self.controller.stop()
                self.paused = True
                return self._ack(op, FULLY_APPLIED)
            if name == "resume":
                if self.paused:
                    self.controller.start()
                    self.paused = False
                return self._ack(op, FULLY_APPLIED)
            if name in ("clear", "sync", "transfer", "acknowledge", "heartbeat"):
                return self._ack(op, NO_OPERATION, f"{name} is a no-op for this engine")
        except Exception as exc:  # noqa: BLE001 — ack the failure, keep heartbeating
            return self._ack(op, NOT_APPLIED, f"{type(exc).__name__}: {exc}"[:500])
        return self._ack(op, NOT_APPLIED, "unhandled")

    def run(self, heartbeats: int, period_s: float = 0.0) -> None:
        """Bounded heartbeat loop (tests drive this; a daemon would
        loop forever on nifi.c2.agent.heartbeat.period)."""
        for _ in range(heartbeats):
            self.heartbeat()
            if period_s:
                time.sleep(period_s)
