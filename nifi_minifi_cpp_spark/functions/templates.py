"""ApplyTemplate + Jolt-lite: declarative content restructuring.

- ApplyTemplate (/root/reference/extensions/bustache/ApplyTemplate.cpp:39)
  renders a Mustache template of attributes into content. The template
  is parsed ONCE at compile time into a concat of literals and
  attribute lookups — render is pure Catalyst.
- JoltTransformJSON (/root/reference/extensions/standard-processors/
  processors/JoltTransformJSON.cpp:46 + utils/JoltUtils.cpp, an
  1142-line Jolt engine). The common Jolt operations on dot-paths
  (shift, default, remove) compile here to from_json-free
  get_json_object reads + nested struct construction + to_json — the
  restructure happens columnar in the JVM, not per-record in an
  interpreter.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MUSTACHE_RE = re.compile(r"\{\{\s*([\w.\-]+)\s*\}\}")


def compile_template(template: str, attr_col: str = "attributes") -> Column:
    """Mustache-lite ``{{attr}}`` template -> string Column."""
    parts: list[Column] = []
    pos = 0
    for m in _MUSTACHE_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.coalesce(F.col(attr_col).getItem(m.group(1)), F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def apply_template(df: DataFrame, template: str) -> DataFrame:
    """ApplyTemplate: render attributes into content."""
    return df.withColumn("content", compile_template(template))


# ---------------------------------------------------------------------------
# Jolt-lite
# ---------------------------------------------------------------------------


def _nest(paths: dict[str, Column]) -> Column:
    """Build a nested struct Column from dot-path -> leaf columns."""
    tree: dict = {}
    for path, col in paths.items():
        node = tree
        segs = path.split(".")
        for seg in segs[:-1]:
            node = node.setdefault(seg, {})
        node[segs[-1]] = col
    def build(node: dict) -> Column:
        fields = []
        for k, v in node.items():
            fields.append((build(v) if isinstance(v, dict) else v).alias(k))
        return F.struct(*fields)

    return build(tree)


def _shift_input_schema(in_paths: list[str]):
    """Inferred from_json schema for a shift's input dot-paths: every
    leaf a string (get_json_object's type model). Returns None when a
    path is a prefix of another (the leaf would need to be both string
    and struct) — callers fall back to per-path JSONPath reads."""
    from pyspark.sql import types as T

    tree: dict = {}
    for p in in_paths:
        node = tree
        segs = p.split(".")
        for seg in segs[:-1]:
            nxt = node.setdefault(seg, {})
            if nxt is None:
                return None  # prefix conflict: seg already a leaf
            node = nxt
        if isinstance(node.get(segs[-1]), dict):
            return None  # prefix conflict: leaf already a subtree
        node[segs[-1]] = None

    def build(node: dict) -> T.StructType:
        return T.StructType(
            [
                T.StructField(k, T.StringType() if v is None else build(v))
                for k, v in node.items()
            ]
        )

    return build(tree) if tree else None


def jolt_transform(
    df: DataFrame,
    shift: dict[str, str] | None = None,
    default: dict[str, object] | None = None,
    remove: list[str] | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Jolt-lite over JSON content.

    shift: {input_dot_path: output_dot_path} — moves values.
    default: {output_dot_path: literal} — fills when absent.
    remove: input paths dropped from shift's implicit passthrough
    (explicit spec model: only shifted/defaulted paths are emitted, so
    remove simply documents exclusions).
    """
    shift = shift or {}
    default = default or {}
    c = F.col(content_col)
    outputs: dict[str, Column] = {}
    schema = _shift_input_schema(list(shift))
    if schema is not None and shift:
        # Parse ONCE with an inferred string-leaf schema instead of one
        # get_json_object per path (r8): beyond the single parse, when
        # the content was itself built by to_json upstream (the
        # standard flowfile pipeline), Catalyst's OptimizeJsonExprs
        # elides from_json(to_json(struct)) entirely — the whole
        # restructure becomes struct rewiring with ZERO runtime JSON
        # work, which get_json_object can never achieve.
        parsed = F.from_json(c, schema)
        for in_path, out_path in shift.items():
            col = parsed
            for seg in in_path.split("."):
                col = col.getField(seg)
            outputs[out_path] = col
    else:
        # a path is a prefix of another (string-vs-struct conflict in
        # the inferred schema): keep the per-path JSONPath reads
        for in_path, out_path in shift.items():
            outputs[out_path] = F.get_json_object(c, f"$.{in_path}")
    for out_path, lit in default.items():
        if out_path in outputs:
            outputs[out_path] = F.coalesce(outputs[out_path], F.lit(lit))
        else:
            outputs[out_path] = F.lit(lit)
    for r in remove or []:
        outputs.pop(r, None)
    if not outputs:
        return df.withColumn(content_col, F.lit("{}"))
    return df.withColumn(content_col, F.to_json(_nest(outputs)))
