"""CollectKubernetesPodMetrics under the injected-client pattern.

Reference: /root/reference/extensions/kubernetes/processors/
CollectKubernetesPodMetrics.cpp:34 onTrigger — fetch the
``metrics.k8s.io`` podMetricsList JSON through the API client, filter
containers by the controller service's (namespace, pod, container)
regexes (MetricsFilter.cpp:18-70: containers that fail any filter are
erased; pods left with no containers are erased), emit the filtered
JSON as one FlowFile.

The injected ``api_client`` needs ``pod_metrics_list() -> str`` (the
raw JSON) — in-cluster auth is the client's concern, mirroring the
reference's KubernetesControllerService. Beyond the reference,
``pod_metrics_table`` lifts the JSON into a relational frame
(namespace, pod, container, cpu_nanocores, memory_bytes) so the
telemetry is queryable like any other table.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CPU_SUFFIX = {"n": 1, "u": 1_000, "m": 1_000_000}  # -> nanocores
_MEM_SUFFIX = {
    "Ki": 1024, "Mi": 1024**2, "Gi": 1024**3, "Ti": 1024**4,
    "k": 1000, "M": 1000**2, "G": 1000**3, "T": 1000**4,
}


def parse_cpu_nanocores(value: str) -> int:
    """'100n' -> 100, '250m' -> 250_000_000, '1' -> 1_000_000_000."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([num]?)", str(value))
    if not m:
        raise ValueError(f"bad cpu quantity {value!r}")
    qty, suffix = m.groups()
    return int(float(qty) * (_CPU_SUFFIX[suffix] if suffix else 1_000_000_000))


def parse_memory_bytes(value: str) -> int:
    """'128974848' / '129e6' / '123Mi' / '129M' -> bytes."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?(?:e\d+)?)([KMGT]i?|k)?", str(value))
    if not m:
        raise ValueError(f"bad memory quantity {value!r}")
    qty, suffix = m.groups()
    return int(float(qty) * (_MEM_SUFFIX[suffix] if suffix else 1))


def filter_pod_metrics(
    metrics_json: str,
    namespace_filter: str | None = None,
    pod_name_filter: str | None = None,
    container_name_filter: str | None = None,
) -> str:
    """MetricsFilter.cpp:18-70 parity: drop containers failing any
    regex filter, then pods left with no containers; return the
    filtered document re-serialized."""
    doc = json.loads(metrics_json)
    items = doc.get("items")
    if not isinstance(items, list):
        raise ValueError("Unexpected JSON from the Kubernetes API: missing list of 'items'")

    def keep(ns: str, pod: str, container: str) -> bool:
        for pattern, value in (
            (namespace_filter, ns),
            (pod_name_filter, pod),
            (container_name_filter, container),
        ):
            if pattern and not re.fullmatch(pattern, value):
                return False
        return True

    kept_pods = []
    for pod in items:
        meta = pod.get("metadata") or {}
        ns, name = meta.get("namespace"), meta.get("name")
        if not isinstance(ns, str) or not isinstance(name, str):
            kept_pods.append(pod)
            continue
        containers = pod.get("containers")
        if not isinstance(containers, list):
            kept_pods.append(pod)
            continue
        pod["containers"] = [
            c for c in containers
            if not isinstance(c.get("name"), str) or keep(ns, name, c["name"])
        ]
        if pod["containers"]:
            kept_pods.append(pod)
    doc["items"] = kept_pods
    return json.dumps(doc, separators=(",", ":"))


def collect_pod_metrics(
    spark: SparkSession,
    api_client,
    namespace_filter: str | None = None,
    pod_name_filter: str | None = None,
    container_name_filter: str | None = None,
) -> DataFrame:
    """One trigger: the filtered podMetricsList JSON as a single
    FlowFile (CollectKubernetesPodMetrics.cpp:34)."""
    raw = api_client.pod_metrics_list()
    filtered = filter_pod_metrics(raw, namespace_filter, pod_name_filter, container_name_filter)
    return spark.createDataFrame(
        [("k8s-pod-metrics", filtered, {"mime.type": "application/json"})],
        "uuid string, content string, attributes map<string,string>",
    )


def pod_metrics_table(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Relational lift: explode the metrics JSON into one row per
    container with typed usage columns — pure Catalyst (from_json +
    two explodes), the telemetry-as-a-table extension."""
    schema = (
        "STRUCT<items: ARRAY<STRUCT<"
        "metadata: STRUCT<namespace: STRING, name: STRING>, "
        "containers: ARRAY<STRUCT<name: STRING, usage: STRUCT<cpu: STRING, memory: STRING>>>>>>"
    )
    parsed = df.select(F.from_json(F.col(content_col), schema).alias("_m"))
    pods = parsed.select(F.explode("_m.items").alias("_pod"))
    containers = pods.select(
        F.col("_pod.metadata.namespace").alias("namespace"),
        F.col("_pod.metadata.name").alias("pod"),
        F.explode("_pod.containers").alias("_c"),
    )
    cpu = F.col("_c.usage.cpu")
    mem = F.col("_c.usage.memory")
    # quantity parsing as Catalyst expressions (n/u/m cpu suffixes,
    # Ki/Mi/Gi/k/M/G/T memory suffixes, bare numbers)
    cpu_qty = F.regexp_extract(cpu, r"^(\d+(?:\.\d+)?)", 1).cast("double")
    cpu_sfx = F.regexp_extract(cpu, r"([num])$", 1)
    cpu_nano = (
        cpu_qty
        * F.when(cpu_sfx == "n", F.lit(1))
        .when(cpu_sfx == "u", F.lit(1_000))
        .when(cpu_sfx == "m", F.lit(1_000_000))
        .otherwise(F.lit(1_000_000_000))
    ).cast("long")
    mem_qty = F.regexp_extract(mem, r"^(\d+(?:\.\d+)?(?:e\d+)?)", 1).cast("double")
    mem_sfx = F.regexp_extract(mem, r"([KMGT]i?|k)$", 1)
    mem_bytes = (
        mem_qty
        * F.when(mem_sfx == "Ki", F.lit(1024))
        .when(mem_sfx == "Mi", F.lit(1024**2))
        .when(mem_sfx == "Gi", F.lit(1024**3))
        .when(mem_sfx == "Ti", F.lit(1024**4))
        .when(mem_sfx == "k", F.lit(1000))
        .when(mem_sfx == "M", F.lit(1000**2))
        .when(mem_sfx == "G", F.lit(1000**3))
        .when(mem_sfx == "T", F.lit(1000**4))
        .otherwise(F.lit(1))
    ).cast("long")
    return containers.select(
        "namespace",
        "pod",
        F.col("_c.name").alias("container"),
        cpu_nano.alias("cpu_nanocores"),
        mem_bytes.alias("memory_bytes"),
    )
