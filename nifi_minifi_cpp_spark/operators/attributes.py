"""Attribute & scalar transform operators (SURVEY §2.4).

Each operator is a pure ``DataFrame -> DataFrame`` function over the
canonical FlowFile frame (``content`` string + ``attributes``
map<string,string>). All expressions stay JVM-side; dynamic property
values are EL strings compiled via :mod:`nifi_minifi_cpp_spark.el`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..el import el_string, promoted_columns


def _merge_attrs(df: DataFrame, new_pairs: list[Column]) -> Column:
    """attributes ++ new pairs, new keys winning (LAST_WIN dedup)."""
    return F.map_concat(F.col("attributes"), F.create_map(*new_pairs))


def update_attribute(df: DataFrame, props: dict[str, str]) -> DataFrame:
    """UpdateAttribute: set each dynamic property (EL string) as an
    attribute. Reference:
    /root/reference/extensions/standard-processors/processors/UpdateAttribute.cpp:37.

    Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by
    ``session.get_spark``/``configure``) so re-set keys overwrite.
    """
    cols = promoted_columns(df)
    pairs: list[Column] = []
    for name, el_text in props.items():
        pairs.append(F.lit(name))
        pairs.append(el_string(el_text, columns=cols))
    return df.withColumn("attributes", _merge_attrs(df, pairs))


def append_host_info(
    df: DataFrame, hostname_attr: str = "source.hostname", ip_attr: str = "source.ipv4"
) -> DataFrame:
    """AppendHostInfo (AppendHostInfo.cpp:58): hostname + IP attributes."""
    import socket

    host = socket.gethostname()
    try:
        ip = socket.gethostbyname(host)
    except OSError:
        ip = "127.0.0.1"
    return df.withColumn(
        "attributes",
        _merge_attrs(df, [F.lit(hostname_attr), F.lit(host), F.lit(ip_attr), F.lit(ip)]),
    )


def extract_text(
    df: DataFrame,
    attribute: str,
    regex: str,
    include_capture_group_zero: bool = True,
    max_capture_group_length: int | None = None,
) -> DataFrame:
    """ExtractText (ExtractText.cpp:45): run a regex against content;
    whole match -> ``attribute`` (group 0), capture group N ->
    ``attribute.N``. No-match leaves attributes unset (null lookups).
    """
    import re as _re

    n_groups = _re.compile(regex).groups
    pairs: list[Column] = []
    groups = range(0, n_groups + 1) if include_capture_group_zero else range(1, n_groups + 1)
    for g in groups:
        val = F.regexp_extract(F.col("content"), regex, g)
        if max_capture_group_length is not None:
            val = F.substring(val, 1, max_capture_group_length)
        key = attribute if g == 0 else f"{attribute}.{g}"
        pairs.append(F.lit(key))
        pairs.append(val)
    # regexp_extract yields '' on no-match; only merge when matched
    matched = F.col("content").rlike(regex)
    merged = F.when(matched, _merge_attrs(df, pairs)).otherwise(F.col("attributes"))
    return df.withColumn("attributes", merged)


def evaluate_json_path(
    df: DataFrame,
    props: dict[str, str],
    destination: str = "attribute",
) -> DataFrame:
    """EvaluateJsonPath (EvaluateJsonPath.cpp:50-69): JSONPath per
    dynamic property -> attribute (or content when destination=content
    and a single property is given). Uses get_json_object (JVM).
    """
    if destination == "content":
        (path,) = list(props.values())
        return df.withColumn("content", F.get_json_object(F.col("content"), path))
    pairs: list[Column] = []
    for attr_name, path in props.items():
        pairs.append(F.lit(attr_name))
        pairs.append(F.get_json_object(F.col("content"), path))
    return df.withColumn("attributes", _merge_attrs(df, pairs))


def hash_content(df: DataFrame, attribute: str = "hash.value", algorithm: str = "SHA256") -> DataFrame:
    """HashContent (HashContent.cpp:57): MD5/SHA1/SHA256 of content
    into an attribute (uppercase hex, matching the reference's output).
    """
    algo = algorithm.upper().replace("-", "")
    c = F.col("content").cast("binary")
    if algo == "MD5":
        h = F.md5(c)
    elif algo == "SHA1":
        h = F.sha1(c)
    elif algo in ("SHA256", "SHA2"):
        h = F.sha2(c, 256)
    else:
        raise ValueError(f"unsupported hash algorithm {algorithm}")
    return df.withColumn("attributes", _merge_attrs(df, [F.lit(attribute), F.upper(h)]))


def attributes_to_json(
    df: DataFrame,
    attributes_list: list[str] | None = None,
    attributes_regex: str | None = None,
    destination: str = "content",
    include_core_attributes: bool = True,
) -> DataFrame:
    """AttributesToJSON (AttributesToJSON.cpp:116): serialize selected
    attributes as a JSON object into content (or an attribute).

    Key order in the output JSON follows the reference: the explicit
    ``attributes_list`` order, else map order.
    """
    if attributes_list:
        obj = F.to_json(
            F.struct(*[F.col("attributes").getItem(a).alias(a) for a in attributes_list])
        )
    elif attributes_regex:
        obj = F.to_json(F.map_filter(F.col("attributes"), lambda k, v: k.rlike(attributes_regex)))
    else:
        obj = F.to_json(F.col("attributes"))
    if destination == "content":
        return df.withColumn("content", obj)
    return df.withColumn("attributes", _merge_attrs(df, [F.lit("JSONAttributes"), obj]))


def log_attribute(df: DataFrame) -> DataFrame:
    """LogAttribute (LogAttribute.cpp:124): debug pass-through."""
    return df
