"""Controller services: the flow-level service registry, Spark-first.

Reference: the ``Controller Services`` flow section
(/root/reference/libminifi/src/core/flow/FlowSchema.cpp:57 — entries
carry name/id/class+Properties; list-valued properties are
``- value: X`` items, /root/reference/C2.md:290-304) and the service
catalogue in /root/reference/CONTROLLERS.md. In MiNiFi a controller
service is a live object processors share (credential chains, record
readers/writers, state stores). In the Spark rebuild a service
resolves to plain *configuration* the engine already understands:

- credential services -> Hadoop filesystem conf dicts (``fs.s3a.*``,
  ``fs.azure.*``, ``google.cloud.auth.*``) applied to the session's
  hadoopConfiguration — exactly how any Spark job authenticates to
  object stores; no bespoke credential chain to maintain.
- record readers/writers (JsonTreeReader / JsonRecordSetWriter /
  XMLReader / XMLRecordSetWriter, CONTROLLERS.md) -> format + option
  dicts for the ``from_json``/``from_xml``/``to_json``/``to_xml``
  Catalyst expressions behind ConvertRecord.
- state storages (VolatileMap / PersistentMap / RocksDb,
  CONTROLLERS.md:231-345) -> state-path providers for the
  watermark-state sources (TailFile / ListFile / QueryDatabaseTable).
  RocksDB itself is not reimplemented: a keyed JSON file (volatile =
  tempdir, persistent = configured location) is the moral equivalent
  under Spark, where *bulk* state lives in checkpoints already.
- UpdatePolicyControllerService -> the C2 agent's property-update
  gate (C2Agent.cpp:658 ``update_service_->canUpdate``).
- client/credential holders for the adapter families (Couchbase,
  Elasticsearch, SMB, Kubernetes, ODBC->JDBC, SSL, proxy) -> typed
  dicts consumed by the matching source/sink adapters.

``compile_flow`` parses the section and passes the registry to every
processor handler, which resolve reference-style service-name
properties ("AWS Credentials Provider service", "Record Reader", ...)
through it.
"""

from __future__ import annotations

import configparser
import io
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any, Callable


class ServiceError(ValueError):
    """Bad controller-service declaration or reference."""


def _flag(v: Any, default: bool = False) -> bool:
    if v is None:
        return default
    return str(v).strip().lower() in ("true", "1", "yes")


def _value_list(v: Any) -> list[str]:
    """Reference list-property shape: ``[{value: X}, ...]`` (C2.md:299)
    or a plain list/comma string."""
    if v is None:
        return []
    if isinstance(v, str):
        return [s.strip() for s in v.split(",") if s.strip()]
    out = []
    for item in v:
        if isinstance(item, dict):
            out.append(str(item.get("value")))
        else:
            out.append(str(item))
    return out


@dataclass
class ControllerService:
    """One declared service: identity + raw properties + a typed
    ``resolve()`` product (dict of engine-ready config)."""

    name: str
    service_id: str
    ctype: str
    props: dict[str, Any] = field(default_factory=dict)

    #: services that configure the agent host runtime (power, NIC
    #: prioritization) — parseable for manifest parity, no dataflow
    #: analogue under Spark, so resolve() returns the raw props.
    AGENT_RUNTIME = frozenset({"LinuxPowerManagerService", "NetworkPrioritizerService"})

    def resolve(self) -> dict[str, Any]:
        fn = _RESOLVERS.get(self.ctype)
        if fn is None:
            if self.ctype in self.AGENT_RUNTIME:
                return {"agent_runtime": True, **self.props}
            raise ServiceError(f"unknown controller service class {self.ctype!r} ({self.name})")
        return fn(self.props)


_RESOLVERS: dict[str, Callable[[dict], dict]] = {}


def _resolver(*names: str):
    def deco(fn):
        for n in names:
            _RESOLVERS[n] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# credential services -> Hadoop FS conf
# ---------------------------------------------------------------------------


@_resolver("AWSCredentialsService")
def _aws_credentials(props: dict) -> dict:
    """CONTROLLERS.md AWSCredentialsService -> ``fs.s3a.*`` conf.

    Precedence mirrors AWSCredentialsProvider.cpp: explicit keys, then
    credentials file (java-properties accessKey/secretKey), then the
    default chain if requested.
    """
    conf: dict[str, str] = {}
    access, secret = props.get("Access Key"), props.get("Secret Key")
    if not access and props.get("Credentials File"):
        cp = configparser.ConfigParser()
        with open(props["Credentials File"]) as f:
            cp.read_string("[s]\n" + f.read())
        access = cp["s"].get("accesskey")
        secret = cp["s"].get("secretkey")
    if access:
        conf["fs.s3a.access.key"] = str(access)
        if secret:
            conf["fs.s3a.secret.key"] = str(secret)
    elif _flag(props.get("Use Default Credentials")):
        conf["fs.s3a.aws.credentials.provider"] = (
            "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
        )
    else:
        raise ServiceError(
            "AWSCredentialsService needs Access Key/Secret Key, a Credentials "
            "File, or Use Default Credentials: true"
        )
    return {"hadoop_conf": conf}


@_resolver("AzureStorageCredentialsService")
def _azure_credentials(props: dict) -> dict:
    """CONTROLLERS.md AzureStorageCredentialsService -> ``fs.azure.*``.

    From Properties: account key (or parsed Connection String) becomes
    the per-account key conf; Managed Identity maps to the abfs OAuth
    MSI provider — the Spark-native forms of the same strategies.
    """
    strategy = props.get("Credential Configuration Strategy", "From Properties")
    account = props.get("Storage Account Name")
    suffix = props.get("Common Storage Account Endpoint Suffix", "core.windows.net")
    if cs := props.get("Connection String"):
        parts = dict(
            kv.split("=", 1) for kv in str(cs).split(";") if "=" in kv
        )
        account = parts.get("AccountName", account)
        # only override explicitly-declared credentials with values the
        # connection string actually carries
        if "AccountKey" in parts:
            props = {**props, "Storage Account Key": parts["AccountKey"]}
        if "SharedAccessSignature" in parts:
            props = {**props, "SAS Token": parts["SharedAccessSignature"]}
        suffix = parts.get("EndpointSuffix", suffix)
    if not account:
        raise ServiceError("AzureStorageCredentialsService needs a Storage Account Name")
    conf: dict[str, str] = {}
    if strategy in ("Managed Identity", "Workload Identity"):
        conf[f"fs.azure.account.auth.type.{account}.dfs.{suffix}"] = "OAuth"
        conf[f"fs.azure.account.oauth.provider.type.{account}.dfs.{suffix}"] = (
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
        )
        if client_id := props.get("Managed Identity Client ID"):
            conf[f"fs.azure.account.oauth2.client.id.{account}.dfs.{suffix}"] = str(client_id)
    elif key := props.get("Storage Account Key"):
        conf[f"fs.azure.account.key.{account}.blob.{suffix}"] = str(key)
        conf[f"fs.azure.account.key.{account}.dfs.{suffix}"] = str(key)
    elif sas := props.get("SAS Token"):
        conf[f"fs.azure.sas.fixed.token.{account}.dfs.{suffix}"] = str(sas).lstrip("?")
        conf[f"fs.azure.account.auth.type.{account}.dfs.{suffix}"] = "SAS"
    else:
        raise ServiceError(
            "AzureStorageCredentialsService: no key/SAS/connection string and "
            f"strategy {strategy!r} is not an identity strategy"
        )
    return {"hadoop_conf": conf, "account": account}


@_resolver("GCPCredentialsControllerService")
def _gcp_credentials(props: dict) -> dict:
    """CONTROLLERS.md GCPCredentialsControllerService ->
    ``google.cloud.auth.*`` (GCS connector conf names)."""
    loc = props.get("Credentials Location", "Google Application Default Credentials")
    conf: dict[str, str] = {}
    if loc == "Service Account JSON File":
        keyfile = props.get("Service Account JSON File")
        if not keyfile:
            raise ServiceError(
                "GCPCredentialsControllerService: Credentials Location is "
                "'Service Account JSON File' but the property is missing"
            )
        conf["google.cloud.auth.service.account.enable"] = "true"
        conf["google.cloud.auth.service.account.json.keyfile"] = str(keyfile)
    elif loc == "Service Account JSON":
        raw = props.get("Service Account JSON")
        if not raw:
            raise ServiceError(
                "GCPCredentialsControllerService: Credentials Location is "
                "'Service Account JSON' but the property is missing"
            )
        # raw JSON has no conf-name form: materialize once per resolve
        fd, path = tempfile.mkstemp(prefix="gcp_sa_", suffix=".json")
        with io.open(fd, "w") as f:
            f.write(str(raw))
        conf["google.cloud.auth.service.account.enable"] = "true"
        conf["google.cloud.auth.service.account.json.keyfile"] = path
    elif loc == "Use Anonymous credentials":
        conf["google.cloud.auth.null.enable"] = "true"
    else:  # application-default / compute-engine: the connector default
        conf["google.cloud.auth.service.account.enable"] = "true"
    return {"hadoop_conf": conf}


def apply_hadoop_conf(spark, conf: dict[str, str]) -> None:
    """Apply a credential service's conf to the session (the scope
    Hadoop filesystems are configured at; same effect as spark-submit
    ``--conf spark.hadoop.fs...``)."""
    hc = spark._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hc.set(k, v)


# ---------------------------------------------------------------------------
# record readers / writers -> ConvertRecord format+options
# ---------------------------------------------------------------------------


@_resolver("JsonTreeReader")
def _json_tree_reader(props: dict) -> dict:
    return {"record_io": "reader", "format": "json", "options": {}}


@_resolver("JsonRecordSetWriter")
def _json_record_set_writer(props: dict) -> dict:
    """Output Grouping: Array | One Line Per Object (pretty-print only
    meaningful for Array output, per CONTROLLERS.md)."""
    grouping = props.get("Output Grouping", "Array")
    if grouping not in ("Array", "One Line Per Object"):
        raise ServiceError(f"JsonRecordSetWriter: bad Output Grouping {grouping!r}")
    return {
        "record_io": "writer",
        "format": "json",
        "options": {
            "grouping": "array" if grouping == "Array" else "line",
            "pretty": _flag(props.get("Pretty Print JSON")) and grouping == "Array",
        },
    }


@_resolver("XMLReader")
def _xml_reader(props: dict) -> dict:
    return {
        "record_io": "reader",
        "format": "xml",
        "options": {
            "attributePrefix": "_" if _flag(props.get("Parse XML Attributes")) else "__ignore_attr_",
            "valueTag": props.get("Field Name for Content") or "value",
        },
    }


@_resolver("XMLRecordSetWriter")
def _xml_record_set_writer(props: dict) -> dict:
    opts: dict[str, str] = {
        "rowTag": props.get("Name of Record Tag") or "record",
        "rootTag": props.get("Name of Root Tag") or "root",
    }
    if props.get("Array Tag Name") and props.get("Wrap Elements of Arrays") != "No Wrapping":
        opts["arrayElementName"] = str(props["Array Tag Name"])
    return {
        "record_io": "writer",
        "format": "xml",
        "options": opts,
        "pretty": _flag(props.get("Pretty Print XML")),
        "declaration": not _flag(props.get("Omit XML Declaration"), default=False),
    }


# ---------------------------------------------------------------------------
# state storages -> state-path providers
# ---------------------------------------------------------------------------


@_resolver("VolatileMapStateStorage")
def _volatile_state(props: dict) -> dict:
    """In-memory map in the reference (CONTROLLERS.md:345); here a
    process-lifetime tempdir — gone on restart, same contract."""
    return {"state_storage": True, "directory": tempfile.mkdtemp(prefix="volatile_state_"), "persistent": False}


@_resolver("PersistentMapStateStorage")
def _persistent_state(props: dict) -> dict:
    f = props.get("File")
    if not f:
        raise ServiceError("PersistentMapStateStorage requires File")
    # one file per *component* keyed next to the configured path (the
    # reference multiplexes components into one file; per-component
    # siblings keep writes atomic-rename simple)
    return {"state_storage": True, "directory": os.path.dirname(os.path.abspath(str(f))) or ".",
            "stem": os.path.basename(str(f)), "persistent": True,
            "always_persist": _flag(props.get("Always Persist"))}


@_resolver("RocksDbStateStorage")
def _rocksdb_state(props: dict) -> dict:
    """RocksDB is the reference's durable KV engine; the Spark engine's
    durable per-component state is a JSON file under the configured
    directory (bulk state lives in checkpoints)."""
    d = props.get("Directory")
    if not d:
        raise ServiceError("RocksDbStateStorage requires Directory")
    os.makedirs(str(d), exist_ok=True)
    return {"state_storage": True, "directory": str(d), "persistent": True,
            "always_persist": _flag(props.get("Always Persist"))}


def state_path(resolved: dict, component_id: str) -> str:
    """Per-component state file under a resolved state storage."""
    if not resolved.get("state_storage"):
        raise ServiceError("service is not a state storage")
    stem = resolved.get("stem")
    name = f"{stem}.{component_id}.json" if stem else f"{component_id}.json"
    return os.path.join(resolved["directory"], name)


# ---------------------------------------------------------------------------
# connection/credential holders for the adapter families
# ---------------------------------------------------------------------------


@_resolver("SSLContextService")
def _ssl_context(props: dict) -> dict:
    """Client Certificate / Private Key / Passphrase / CA Certificate
    (CONTROLLERS.md SSLContextService) -> an ``ssl.SSLContext`` factory
    consumed by the socket/HTTP adapters. Windows cert-store properties
    are accepted but unused off-Windows (same as the reference's
    posix build)."""
    cert = props.get("Client Certificate")
    key = props.get("Private Key")
    ca = props.get("CA Certificate")
    passphrase = props.get("Passphrase")
    use_system = _flag(props.get("Use System Cert Store"))

    def context_factory():
        import ssl

        # the default context already trusts the system store, which
        # covers both Use System Cert Store and the no-CA case
        ctx = ssl.create_default_context()
        if ca:
            ctx.load_verify_locations(cafile=str(ca))
        if cert:
            ctx.load_cert_chain(str(cert), keyfile=str(key) if key else None,
                                password=str(passphrase) if passphrase else None)
        return ctx

    return {"ssl": True, "context_factory": context_factory,
            "cert": cert, "key": key, "ca": ca}


@_resolver("ProxyConfigurationService")
def _proxy(props: dict) -> dict:
    """-> requests-style proxy URL (DIRECT disables the proxy)."""
    if props.get("Proxy Type", "HTTP") == "DIRECT":
        return {"proxy_url": None}
    host = props.get("Proxy Server Host")
    if not host:
        raise ServiceError("ProxyConfigurationService requires Proxy Server Host")
    auth = ""
    if user := props.get("Proxy User Name"):
        auth = str(user)
        if pw := props.get("Proxy User Password"):
            auth += f":{pw}"
        auth += "@"
    port = f":{props['Proxy Server Port']}" if props.get("Proxy Server Port") else ""
    return {"proxy_url": f"http://{auth}{host}{port}"}


@_resolver("ODBCService")
def _odbc(props: dict) -> dict:
    """ODBC Connection String -> the JDBC reader/writer options the
    engine's ExecuteSQL/PutSQL take (SQLProcessor family). Key=Value;
    pairs are parsed so Driver/Database/Server survive as options."""
    cs = props.get("Connection String")
    if not cs:
        raise ServiceError("ODBCService requires Connection String")
    parts = {k.strip().lower(): v for k, v in
             (kv.split("=", 1) for kv in str(cs).split(";") if "=" in kv)}
    return {"connection_string": str(cs), "jdbc_options": parts}


@_resolver("CouchbaseClusterService")
def _couchbase(props: dict) -> dict:
    if not props.get("Connection String"):
        raise ServiceError("CouchbaseClusterService requires Connection String")
    return {"connection_string": str(props["Connection String"]),
            "username": props.get("User Name"), "password": props.get("User Password")}


@_resolver("ElasticsearchCredentialsControllerService")
def _elasticsearch(props: dict) -> dict:
    """-> the auth header the _bulk adapter attaches (API key wins,
    matching the reference's precedence)."""
    if key := props.get("API Key"):
        return {"auth_header": f"ApiKey {key}"}
    if props.get("Username"):
        import base64

        raw = f"{props['Username']}:{props.get('Password', '')}".encode()
        return {"auth_header": "Basic " + base64.b64encode(raw).decode()}
    return {"auth_header": None}


@_resolver("SmbConnectionControllerService")
def _smb(props: dict) -> dict:
    for req in ("Hostname", "Share"):
        if not props.get(req):
            raise ServiceError(f"SmbConnectionControllerService requires {req}")
    return {"hostname": str(props["Hostname"]), "share": str(props["Share"]),
            "domain": props.get("Domain"), "username": props.get("Username"),
            "password": props.get("Password")}


@_resolver("KubernetesControllerService")
def _kubernetes(props: dict) -> dict:
    """Namespace/Pod/Container regex filters (CONTROLLERS.md) — the
    exact inputs sources.k8s.MetricsFilter takes."""
    return {"namespace_filter": props.get("Namespace Filter", "default"),
            "pod_filter": props.get("Pod Name Filter"),
            "container_filter": props.get("Container Name Filter")}


@_resolver("UpdatePolicyControllerService")
def _update_policy(props: dict) -> dict:
    """C2 property-update gate (C2.md:288-304; enforcement point
    C2Agent.cpp:658). Disallowed wins; then the allow list; then
    Allow All Properties."""
    allowed = set(_value_list(props.get("Allowed Properties")))
    disallowed = set(_value_list(props.get("Disallowed Properties")))
    allow_all = _flag(props.get("Allow All Properties"))

    def can_update(name: str) -> bool:
        if name in disallowed:
            return False
        return allow_all or name in allowed

    return {"can_update": can_update, "persist_updates": _flag(props.get("Persist Updates")),
            "allow_all": allow_all, "allowed": allowed, "disallowed": disallowed}


# ---------------------------------------------------------------------------
# registry + flow-section parsing
# ---------------------------------------------------------------------------


class ServiceRegistry:
    """Declared services keyed by BOTH name and id (processors
    reference either, FlowSchema.cpp name/identifier fields)."""

    def __init__(self, services: list[ControllerService] | None = None):
        self._services: list[ControllerService] = []
        self._by_key: dict[str, ControllerService] = {}
        self._resolved: dict[str, dict] = {}
        for s in services or []:
            self.add(s)

    def add(self, svc: ControllerService) -> None:
        for key in {svc.name, svc.service_id}:  # set: name may equal id
            if key:
                if key in self._by_key:
                    raise ServiceError(f"duplicate controller service key {key!r}")
                self._by_key[key] = svc
        self._services.append(svc)

    def __contains__(self, key: str) -> bool:
        return key in self._by_key

    def __len__(self) -> int:
        return len(self._services)

    def get(self, key: str) -> ControllerService:
        try:
            return self._by_key[key]
        except KeyError:
            raise ServiceError(
                f"processor references controller service {key!r} but the flow "
                f"declares only {sorted({s.name for s in self._services})}"
            ) from None

    def resolve(self, key: str) -> dict:
        """Resolve-once-per-service (mirrors the reference's enabled
        singleton services; also keeps tempdir-backed storages stable)."""
        svc = self.get(key)
        cache_key = svc.service_id or svc.name
        if cache_key not in self._resolved:
            self._resolved[cache_key] = svc.resolve()
        return self._resolved[cache_key]

    def names(self) -> list[str]:
        return [s.name for s in self._services]


def parse_controller_services(config: dict) -> ServiceRegistry:
    """Parse the flow's ``Controller Services`` section (the YAML shape
    of C2.md:290-304: ``id``/``name``/``class``(or ``type``) +
    ``Properties``)."""
    reg = ServiceRegistry()
    for section in ("Controller Services", "controllerServices"):
        for item in config.get(section) or []:
            ctype = item.get("class") or item.get("type")
            if not ctype:
                raise ServiceError(f"controller service {item.get('name')!r} has no class")
            # strip the reference's namespace prefix if present
            ctype = str(ctype).rsplit(".", 1)[-1]
            reg.add(
                ControllerService(
                    name=str(item.get("name") or item.get("id") or ctype),
                    service_id=str(item.get("id") or item.get("name") or ctype),
                    ctype=ctype,
                    props=dict(item.get("Properties") or item.get("properties") or {}),
                )
            )
    return reg


#: processor property names that carry a service reference, mapped to
#: the props key handlers consume after resolution (the reference
#: names from PROCESSORS.md property tables).
SERVICE_REF_PROPERTIES = {
    "AWS Credentials Provider service": "credentials",
    "Azure Storage Credentials Service": "credentials",
    "GCP Credentials Provider Service": "credentials",
    "Credentials Service": "credentials",
    "SSL Context Service": "ssl_context",
    "Proxy Configuration Service": "proxy",
    "Record Reader": "record_reader",
    "Record Set Writer": "record_writer",
    "Record Writer": "record_writer",  # the PROCESSORS.md spelling
    "Couchbase Cluster Controller Service": "couchbase",
    "Elasticsearch Credentials Provider Service": "es_credentials",
    "SMB Connection Controller Service": "smb_connection",
    "Kubernetes Controller Service": "k8s_controller",
    "DB Controller Service": "jdbc",
    "State Storage": "state_storage",
}


def resolve_service_refs(spark, props: dict, services: ServiceRegistry | None) -> dict:
    """Swap reference-style service-name properties for their resolved
    config. Credential services additionally apply their Hadoop conf to
    the session (the one engine-global effect — identical to the
    reference enabling the service at flow start)."""
    out = dict(props)
    for ref_name, key in SERVICE_REF_PROPERTIES.items():
        if ref_name in out:
            if services is None or out[ref_name] not in services:
                raise ServiceError(
                    f"property {ref_name!r} references service {out[ref_name]!r} "
                    "not declared in Controller Services"
                )
            resolved = services.resolve(out.pop(ref_name))
            out[key] = resolved
            if "hadoop_conf" in resolved:
                apply_hadoop_conf(spark, resolved["hadoop_conf"])
    return out
