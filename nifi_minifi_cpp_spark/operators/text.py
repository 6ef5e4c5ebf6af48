"""Content transform + split/merge operators (SURVEY §2.5-2.6).

Split operators are the reference's fan-out ops (one FlowFile -> many);
they become ``posexplode`` pipelines emitting the same ``fragment.*``
provenance attributes. Merge-defragment is the inverse: a grouped
ordered reassembly (one shuffle, no per-group sort — order is restored
with sort_array over (index, payload) structs).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# ReplaceText — evaluation modes × replacement strategies
# (ReplaceText.h:37-60, ReplaceText.cpp:49)
# ---------------------------------------------------------------------------

_LINE_MODES = {"line_by_line", "first_line", "last_line", "except_first_line", "except_last_line"}


def _apply_strategy(text: Column, strategy: str, search: str | None, replacement: str) -> Column:
    if strategy == "prepend":
        return F.concat(F.lit(replacement), text)
    if strategy == "append":
        return F.concat(text, F.lit(replacement))
    if strategy == "regex_replace":
        return F.regexp_replace(text, search, replacement)
    if strategy == "literal_replace":
        return F.replace(text, F.lit(search), F.lit(replacement))
    if strategy == "always_replace":
        return F.lit(replacement)
    raise ValueError(f"unknown replacement strategy {strategy}")


def replace_text(
    df: DataFrame,
    strategy: str = "regex_replace",
    search: str | None = None,
    replacement: str = "",
    mode: str = "entire_text",
) -> DataFrame:
    """ReplaceText: Evaluation mode {entire_text, line_by_line,
    first_line, last_line, except_first_line, except_last_line} ×
    strategy {prepend, append, regex_replace, literal_replace,
    always_replace}. Line modes run the strategy per line via a
    higher-order transform (no explode/shuffle).
    """
    content = F.col("content")
    if mode == "entire_text":
        return df.withColumn("content", _apply_strategy(content, strategy, search, replacement))
    if mode not in _LINE_MODES:
        raise ValueError(f"unknown evaluation mode {mode}")

    lines = F.split(content, "\n")
    n = F.size(lines)

    def per_line(line: Column, i: Column) -> Column:
        replaced = _apply_strategy(line, strategy, search, replacement)
        if mode == "line_by_line":
            return replaced
        if mode == "first_line":
            return F.when(i == 0, replaced).otherwise(line)
        if mode == "last_line":
            return F.when(i == n - 1, replaced).otherwise(line)
        if mode == "except_first_line":
            return F.when(i == 0, line).otherwise(replaced)
        return F.when(i == n - 1, line).otherwise(replaced)  # except_last_line

    return df.withColumn("content", F.array_join(F.transform(lines, per_line), "\n"))


# ---------------------------------------------------------------------------
# Split family — fragment.* attribute parity (SplitText.h:92-156)
# ---------------------------------------------------------------------------


def _with_fragment_attrs(
    exploded: DataFrame, count_col: Column, extra: dict[str, Column] | None = None
) -> DataFrame:
    """Attach fragment.identifier/index/count (+extras), mint child
    uuids, and record the FORK in lineage (Provenance FORK event —
    the parent becomes an ancestor of every fragment)."""
    from ..provenance import child_uuid, fork_lineage

    pairs: list[Column] = [
        F.lit("fragment.identifier"),
        F.col("uuid"),
        F.lit("fragment.index"),
        (F.col("_idx") + 1).cast("string"),
        F.lit("fragment.count"),
        count_col.cast("string"),
    ]
    for k, v in (extra or {}).items():
        pairs.extend([F.lit(k), v.cast("string")])
    out = exploded.withColumn("attributes", F.map_concat(F.col("attributes"), F.create_map(*pairs)))
    if "lineage" in out.columns:
        out = out.withColumn("lineage", fork_lineage(F.col("uuid"), F.col("lineage")))
    out = out.withColumn("uuid", child_uuid(F.col("uuid"), F.col("_idx") + 1))
    return out


def split_text(
    df: DataFrame,
    line_split_count: int,
    header_line_count: int = 0,
    remove_trailing_newlines: bool = True,
) -> DataFrame:
    """SplitText (SplitText.cpp:431): split content on line boundaries
    into chunks of ``line_split_count`` lines, propagating the first
    ``header_line_count`` lines into every fragment. Emits
    fragment.identifier/index/count and text.line.count attributes.

    Plan shape: split -> slice via sequence/transform -> posexplode.
    All JVM higher-order functions; scales linearly, no shuffle.
    """
    lines = F.split(F.col("content"), "\n")
    header = F.slice(lines, 1, header_line_count) if header_line_count else F.array()
    body = F.slice(lines, header_line_count + 1, F.greatest(F.size(lines) - header_line_count, F.lit(0)))
    n_chunks = F.ceil(F.size(body) / F.lit(line_split_count)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.slice(body, i * line_split_count + 1, line_split_count),
    )
    chunks = F.filter(chunks, lambda c: F.size(c) > 0)
    base = (
        df.withColumn("_header", header)
        .withColumn("_chunks", chunks)
        .withColumn("_nchunks", F.size(F.col("_chunks")))
    )
    exploded = base.select(
        *[c for c in df.columns if c != "content"],
        F.col("_header"),
        F.col("_nchunks"),
        F.posexplode(F.col("_chunks")).alias("_idx", "_chunk"),
    )
    chunk_lines = F.concat(F.col("_header"), F.col("_chunk")) if header_line_count else F.col("_chunk")
    content = F.array_join(chunk_lines, "\n")
    if remove_trailing_newlines:
        content = F.regexp_replace(content, "\n+$", "")
    out = exploded.withColumn("content", content)
    out = _with_fragment_attrs(
        out, F.col("_nchunks"), {"text.line.count": F.size(F.col("_chunk"))}
    )
    return out.drop("_header", "_chunks", "_nchunks", "_idx", "_chunk")


def split_content(df: DataFrame, delimiter: str, keep_delimiter: str = "none") -> DataFrame:
    """SplitContent (SplitContent.cpp:204): split on a byte/str
    delimiter. keep_delimiter: none|trailing|leading.
    """
    parts = F.split(F.col("content"), _re.escape(delimiter))
    if keep_delimiter == "trailing":
        n = F.size(parts)
        parts = F.transform(parts, lambda p, i: F.when(i < n - 1, F.concat(p, F.lit(delimiter))).otherwise(p))
        parts = F.filter(parts, lambda p: p != "")
    elif keep_delimiter == "leading":
        parts = F.transform(parts, lambda p, i: F.when(i > 0, F.concat(F.lit(delimiter), p)).otherwise(p))
        parts = F.filter(parts, lambda p: p != "")
    base = df.withColumn("_parts", parts).withColumn("_n", F.size(F.col("_parts")))
    exploded = base.select(
        *[c for c in df.columns if c != "content"],
        F.col("_n"),
        F.posexplode(F.col("_parts")).alias("_idx", "content"),
    )
    out = _with_fragment_attrs(exploded, F.col("_n"))
    return out.drop("_parts", "_n", "_idx")


def segment_content(df: DataFrame, segment_size: int) -> DataFrame:
    """SegmentContent (SegmentContent.cpp:54): fixed-size segmentation
    with segment.* attribute parity (segment attrs mirror fragment's).
    """
    content = F.col("content")
    n_seg = F.ceil(F.length(content) / F.lit(segment_size)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), F.greatest(n_seg - 1, F.lit(0))),
        lambda i: F.substring(content, i * segment_size + 1, segment_size),
    )
    segs = F.filter(segs, lambda s: F.length(s) > 0)
    base = df.withColumn("_segs", segs).withColumn("_n", F.size(F.col("_segs")))
    exploded = base.select(
        *[c for c in df.columns if c != "content"],
        F.col("_n"),
        F.posexplode(F.col("_segs")).alias("_idx", "content"),
    )
    out = _with_fragment_attrs(
        exploded,
        F.col("_n"),
        {
            "segment.original.filename": F.col("attributes").getItem("filename"),
            "segment.index": (F.col("_idx") + 1),
            "segment.count": F.col("_n"),
        },
    )
    return out.drop("_segs", "_n", "_idx")


def split_json(df: DataFrame, element_schema: str = "string") -> DataFrame:
    """SplitJson (SplitJson.cpp:79): content holding a JSON array ->
    one row per element. ``element_schema`` is the Spark DDL type of
    one element ('string' for scalars; a struct DDL for objects —
    objects are re-serialized with to_json).
    """
    arr = F.from_json(F.col("content"), f"array<{element_schema}>")
    base = df.withColumn("_arr", arr).withColumn("_n", F.size(F.col("_arr")))
    exploded = base.select(
        *[c for c in df.columns if c != "content"],
        F.col("_n"),
        F.posexplode(F.col("_arr")).alias("_idx", "_elem"),
    )
    elem = F.col("_elem") if element_schema == "string" else F.to_json(F.col("_elem"))
    out = exploded.withColumn("content", elem)
    out = _with_fragment_attrs(out, F.col("_n"))
    return out.drop("_arr", "_n", "_idx", "_elem")


def split_record(df: DataFrame, records_per_split: int) -> DataFrame:
    """SplitRecord (SplitRecord.cpp:43): content = JSON-lines records,
    re-chunked into <= records_per_split records per row.
    """
    return split_text(df, line_split_count=records_per_split)


# ---------------------------------------------------------------------------
# Merge / defragment (MergeContent.cpp:193, BinFiles.cpp:284)
# ---------------------------------------------------------------------------


def merged_attribute_maps(src: DataFrame, group_cols, strategy: str) -> DataFrame:
    """(group, attributes) under a MergeContent attribute strategy
    (MergeContent.h:253-285): ``keep_only_common`` keeps a key only
    when every member carries it with the same value; ``keep_all_unique``
    keeps every key that never conflicts (one distinct value, any
    member count). One explode + two aggregations, all JVM-side.
    """
    if strategy not in ("keep_only_common", "keep_all_unique"):
        raise ValueError(f"unknown attribute strategy {strategy!r}")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    kv = src.select(*group_cols, F.explode_outer("attributes").alias("key", "value")).filter(
        F.col("key").isNotNull()
    )
    per_key = kv.groupBy(*group_cols, "key").agg(
        F.count_distinct("value").alias("_nv"),
        F.count(F.lit(1)).alias("_n"),
        F.first("value").alias("value"),
    )
    if strategy == "keep_only_common":
        # null-safe member-count join: a group keyed by a null value
        # (missing fragment.identifier/correlation attribute) must
        # still find its member count — a plain equi-join drops it and
        # the bin would get an empty attribute map
        members = src.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n_members"))
        renamed = members.select(
            *[F.col(c).alias(f"_m_{c}") for c in group_cols], "_n_members"
        )
        cond = None
        for c in group_cols:
            eq = F.col(c).eqNullSafe(F.col(f"_m_{c}"))
            cond = eq if cond is None else (cond & eq)
        per_key = (
            per_key.join(renamed, cond)
            .drop(*[f"_m_{c}" for c in group_cols])
            .filter((F.col("_nv") == 1) & (F.col("_n") == F.col("_n_members")))
        )
    else:
        per_key = per_key.filter(F.col("_nv") == 1)
    return per_key.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("key", "value"))).alias("attributes")
    )


def merge_content_defragment(
    df: DataFrame,
    demarcator: str = "\n",
    header: str = "",
    footer: str = "",
    require_complete: bool = True,
    attribute_strategy: str = "first",
) -> DataFrame:
    """MergeContent, Defragment strategy (MergeContent.h:44):
    reassemble fragments by ``fragment.identifier`` ordered by
    ``fragment.index``; a bundle is complete when the fragment count
    matches ``fragment.count``.

    One shuffle on the identifier; ordering restored via
    sort_array(collect_list(struct(index, payload))). At 100 TB the
    identifier is high-cardinality (one group per original file) so
    the aggregation parallelizes cleanly; no skew expected.

    ``attribute_strategy``: ``first`` (fast path — fragments of one
    parent share their attributes, so first() is exact and skips a
    second aggregation) or the reference's ``keep_only_common`` /
    ``keep_all_unique`` (MergeContent.h:253-285) via
    :func:`merged_attribute_maps`.
    """
    frag_id = F.col("attributes").getItem("fragment.identifier")
    frag_idx = F.col("attributes").getItem("fragment.index").cast("int")
    frag_cnt = F.col("attributes").getItem("fragment.count").cast("int")
    has_lineage = "lineage" in df.columns
    cols = [
        frag_id.alias("_fid"),
        frag_idx.alias("_fidx"),
        frag_cnt.alias("_fcnt"),
        "content",
        "attributes",
    ]
    aggs = [
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("_fidx"), F.col("content").alias("_c")))),
                lambda s: s.getField("_c"),
            ),
            demarcator,
        ).alias("_joined"),
        F.count(F.lit(1)).alias("_have"),
        F.first("_fcnt").alias("_want"),
        F.first("attributes").alias("attributes"),
    ]
    if has_lineage:
        # JOIN provenance: the bundle's ancestors = union of children's
        cols.append(F.col("lineage"))
        aggs.append(F.array_distinct(F.flatten(F.collect_list("lineage"))).alias("_lineage"))
    selected = df.select(*cols)
    grouped = selected.groupBy("_fid").agg(*aggs)
    if attribute_strategy != "first":
        # null-safe join: rows with a missing fragment.identifier group
        # under a null key, and a plain equi-join would silently hand
        # that bin an empty attribute map
        amap = merged_attribute_maps(selected, "_fid", attribute_strategy).withColumnRenamed(
            "_fid", "_fid_m"
        )
        grouped = (
            grouped.drop("attributes")
            .join(amap, F.col("_fid").eqNullSafe(F.col("_fid_m")), "left")
            .drop("_fid_m")
        )
    if require_complete:
        grouped = grouped.filter(F.col("_have") == F.col("_want"))
    content = F.concat(F.lit(header), F.col("_joined"), F.lit(footer))
    return grouped.select(
        F.col("_fid").alias("uuid"),
        F.lit(None).cast("timestamp").alias("ts"),
        content.alias("content"),
        F.map_filter(
            F.coalesce(F.col("attributes"), F.create_map().cast("map<string,string>")),
            lambda k, v: ~k.isin("fragment.identifier", "fragment.index", "fragment.count", "text.line.count"),
        ).alias("attributes"),
        (F.col("_lineage") if has_lineage else F.array(F.col("_fid"))).alias("lineage"),
    )


def merge_content_bin_packing(
    df: DataFrame,
    min_entries: int = 1,
    max_entries: int = 1000,
    correlation_attribute: str | None = None,
    demarcator: str = "\n",
    id_col: str = "uuid",
    attribute_strategy: str = "first",
) -> DataFrame:
    """MergeContent, Bin-Packing strategy (MergeContent.h:315-319) —
    batch flavor: pack rows into bins of <= max_entries per
    correlation key. Bin assignment = row_number() div max_entries
    within the correlation partition; the streaming flavor with
    age/size flush lives in streaming.stateful.
    ``attribute_strategy``: ``first`` fast path or the reference's
    ``keep_only_common`` / ``keep_all_unique`` (MergeContent.h:253-285).
    """
    from pyspark.sql import Window

    corr = (
        F.col("attributes").getItem(correlation_attribute)
        if correlation_attribute
        else F.lit("")
    )
    w = Window.partitionBy(corr).orderBy(F.col(id_col))
    binned = df.withColumn("_corr", corr).withColumn(
        "_bin", F.floor((F.row_number().over(w) - 1) / max_entries)
    )
    merged = (
        binned.groupBy("_corr", "_bin")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("_id"), F.col("content").alias("_c")))),
                    lambda s: s.getField("_c"),
                ),
                demarcator,
            ).alias("content"),
            F.count(F.lit(1)).alias("_mcount"),
            F.min(id_col).alias("uuid"),
            F.first("attributes").alias("attributes"),
        )
        .filter(F.col("_mcount") >= min_entries)
    )
    if attribute_strategy != "first":
        # null-safe on _corr: a missing correlation attribute groups
        # rows under a null key (see defragment flavor above)
        amap = (
            merged_attribute_maps(binned, ["_corr", "_bin"], attribute_strategy)
            .withColumnRenamed("_corr", "_corr_m")
            .withColumnRenamed("_bin", "_bin_m")
        )
        merged = (
            merged.drop("attributes")
            .join(
                amap,
                F.col("_corr").eqNullSafe(F.col("_corr_m")) & (F.col("_bin") == F.col("_bin_m")),
                "left",
            )
            .drop("_corr_m", "_bin_m")
        )
    return merged.select(
        "uuid",
        F.lit(None).cast("timestamp").alias("ts"),
        "content",
        F.map_concat(
            F.coalesce(F.col("attributes"), F.create_map().cast("map<string,string>")),
            F.create_map(F.lit("merge.count"), F.col("_mcount").cast("string")),
        ).alias("attributes"),
        F.array(F.col("uuid")).alias("lineage"),
    )


def defragment_text(
    df: DataFrame,
    message_start_pattern: str | None = None,
    message_end_pattern: str | None = None,
    id_col: str = "uuid",
) -> DataFrame:
    """DefragmentText (DefragmentText.cpp:59) — batch flavor: lines
    across an ordered sequence are glued into messages delimited by a
    start (or end) regex. Sessionization via a running sum over the
    start-marker indicator (classic gap/marker cumsum pattern).
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        "attributes",
        F.posexplode(F.split(F.col("content"), "\n")).alias("_idx", "_line"),
    )
    w = Window.partitionBy(id_col).orderBy("_idx")
    if message_start_pattern:
        marker = F.col("_line").rlike(message_start_pattern).cast("int")
        msg_id = F.sum(marker).over(w)
    elif message_end_pattern:
        marker = F.col("_line").rlike(message_end_pattern).cast("int")
        msg_id = F.sum(marker).over(w) - marker
    else:
        raise ValueError("need a start or end pattern")
    seg = lines.withColumn("_msg", msg_id)
    return (
        seg.groupBy(id_col, "_msg")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("_idx"), F.col("_line").alias("_l")))),
                    lambda s: s.getField("_l"),
                ),
                "\n",
            ).alias("content"),
            F.first("attributes").alias("attributes"),
        )
        .withColumnRenamed(id_col, "parent_uuid")
        .withColumn("uuid", F.concat(F.col("parent_uuid"), F.lit("-m"), F.col("_msg").cast("string")))
        .drop("_msg")
    )


# ---------------------------------------------------------------------------
# CompressContent / ConvertRecord-lite
# ---------------------------------------------------------------------------


#: CompressContent format registry. The reference supports gzip, lzma,
#: xz-lzma2 and bzip2 via libarchive (CompressContent.h:48-98); here each
#: maps to a stdlib codec.  "lzma" is the legacy raw/alone container
#: (FORMAT_ALONE), "xz-lzma2" the modern .xz container.
_COMPRESS_MIME = {
    "gzip": "application/gzip",
    "bzip2": "application/x-bzip2",
    "lzma": "application/x-lzma",
    "xz-lzma2": "application/x-xz",
}
_COMPRESS_MAGIC = [
    (b"\x1f\x8b", "gzip"),
    (b"BZh", "bzip2"),
    (b"\xfd7zXZ\x00", "xz-lzma2"),
    (b"\x5d\x00\x00", "lzma"),
]


def _codec(fmt: str):
    import bz2
    import gzip
    import lzma

    if fmt == "gzip":
        return gzip.compress, gzip.decompress
    if fmt == "bzip2":
        return bz2.compress, bz2.decompress
    if fmt == "lzma":
        return (
            lambda b: lzma.compress(b, format=lzma.FORMAT_ALONE),
            lambda b: lzma.decompress(b, format=lzma.FORMAT_ALONE),
        )
    if fmt == "xz-lzma2":
        return (
            lambda b: lzma.compress(b, format=lzma.FORMAT_XZ),
            lambda b: lzma.decompress(b, format=lzma.FORMAT_XZ),
        )
    raise NotImplementedError(f"unknown CompressContent format {fmt!r}")


def compress_content(
    df: DataFrame,
    mode: str = "compress",
    fmt: str = "gzip",
    update_mime: bool = False,
) -> DataFrame:
    """CompressContent (CompressContent.cpp:68; formats CompressContent.h:48-98):
    gzip / bzip2 / lzma / xz-lzma2, compress or decompress. Binary-safe via
    Pandas UDF over Arrow batches. ``fmt='auto'`` on decompress sniffs the
    codec per record from magic bytes (the reference's mime-detect mode);
    ``update_mime`` maintains the ``mime.type`` attribute like the reference.
    """
    from pyspark.sql.types import BinaryType

    if mode == "compress":
        comp, _ = _codec(fmt)

        def _run(s):
            return s.map(lambda x: comp(x if isinstance(x, bytes) else str(x).encode()))

    elif fmt == "auto":

        def _sniff(b):
            b = bytes(b)
            for magic, name in _COMPRESS_MAGIC:
                if b.startswith(magic):
                    return _codec(name)[1](b)
            return b  # pass through unrecognized payloads (reference routes to failure)

        def _run(s):
            return s.map(_sniff)

    else:
        _, decomp = _codec(fmt)

        def _run(s):
            return s.map(lambda x: decomp(bytes(x)))

    # lambda-style registration: `from __future__ import annotations`
    # stringifies hints, which pandas_udf can't resolve
    run = F.pandas_udf(_run, BinaryType())

    col = F.col("content").cast("binary") if mode == "compress" else F.col("content")
    out = df.withColumn("content", run(col))
    if mode == "decompress":
        out = out.withColumn("content", F.col("content").cast("string"))
    if update_mime and "attributes" in df.columns:
        mime = _COMPRESS_MIME.get(fmt, "application/octet-stream")
        out = out.withColumn(
            "attributes",
            F.map_concat(
                F.map_filter(F.col("attributes"), lambda k, _: k != F.lit("mime.type")),
                F.create_map(F.lit("mime.type"), F.lit(mime)),
            ),
        )
    return out
