"""Compile expression-language ASTs to Catalyst ``Column`` trees.

This replaces the reference's per-FlowFile closure interpreter
(/root/reference/libminifi/src/expression-language/Expression.cpp) with
vectorized JVM-side evaluation: one EL property compiles once into a
Column expression that Tungsten codegen evaluates per batch. No Python
runs per row.

Type model parity (/root/reference/libminifi/include/expression-language/Value.h:37-75):
EL values are string-centric with numeric sniffing. We track a static
kind per compiled node ('str' | 'int' | 'num' | 'bool'); 'num' marks
double-valued arithmetic whose inputs may have been integral strings —
its stringification drops a trailing ``.0`` so ``${'3':plus(4)}``
renders ``7`` exactly like the reference's int64 path
(Expression.cpp:833-847 expr_binary_op int-sniffing).
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ast import AttrRef, Expr, FnCall, Literal, MultiAttr, Node, Property, Text
from .parser import parse

STR, INT, NUM, BOOL = "str", "int", "num", "bool"


@dataclass
class Typed:
    col: Column
    kind: str


class ELCompileError(ValueError):
    pass


# ---------------------------------------------------------------------------
# coercion helpers
# ---------------------------------------------------------------------------


def as_str(t: Typed) -> Column:
    if t.kind == STR:
        # promoted columns resolve typed (int/double) but carry STR
        # kind; normalize. For true string columns SimplifyCasts
        # removes the no-op, so pushdown is unaffected.
        return t.col.cast("string")
    if t.kind == BOOL:
        return F.when(t.col, F.lit("true")).otherwise(F.lit("false"))
    if t.kind == NUM:
        # integral doubles print without '.0' (reference int-sniff parity)
        lng = t.col.cast("long")
        return F.when(t.col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(lng.cast("double") == t.col, lng.cast("string")).otherwise(t.col.cast("string"))
        )
    return t.col.cast("string")


def as_num(t: Typed) -> Column:
    return t.col.cast("double")


def as_int(t: Typed) -> Column:
    if t.kind == NUM or t.kind == STR:
        return t.col.cast("double").cast("long")
    return t.col.cast("long")


def as_bool(t: Typed) -> Column:
    if t.kind == BOOL:
        return t.col
    return as_str(t) == F.lit("true")


def _is_intlike(t: Typed) -> bool:
    return t.kind == INT


def _truthy(t: Typed) -> Column:
    """Value::asBoolean (Value.h:128-137): bool as-is, numbers != 0,
    strings via trimmed case-insensitive toBool ('true'/'false', else
    false)."""
    if t.kind == BOOL:
        return F.coalesce(t.col, F.lit(False))
    if t.kind in (INT, NUM):
        return F.coalesce(t.col.cast("double") != 0.0, F.lit(False))
    return F.coalesce(F.lower(F.trim(t.col.cast("string"))) == "true", F.lit(False))


# ---------------------------------------------------------------------------
# function registry
# ---------------------------------------------------------------------------

_FN: dict[str, Callable[..., Typed]] = {}


def _fn(name: str):
    def deco(f):
        _FN[name] = f
        return f

    return deco


def _arith(subject: Typed, arg: Typed, op) -> Typed:
    # reference sniffs ints at runtime; statically we keep INT only when
    # both sides are known-int, else compute in double tagged NUM so the
    # string form still collapses 7.0 -> "7".
    if _is_intlike(subject) and _is_intlike(arg):
        return Typed(op(subject.col.cast("long"), arg.col.cast("long")), INT)
    return Typed(op(as_num(subject), as_num(arg)), NUM)


@_fn("plus")
def _plus(s, a):
    return _arith(s, a[0], lambda x, y: x + y)


@_fn("minus")
def _minus(s, a):
    return _arith(s, a[0], lambda x, y: x - y)


@_fn("multiply")
def _multiply(s, a):
    return _arith(s, a[0], lambda x, y: x * y)


@_fn("divide")
def _divide(s, a):
    # Expression.cpp:876 divide is long_only=true -> always decimal
    return Typed(as_num(s) / as_num(a[0]), NUM)


@_fn("mod")
def _mod(s, a):
    return _arith(s, a[0], lambda x, y: x % y)


@_fn("toRadix")
def _to_radix(s, a):
    out = F.call_function("conv", as_int(s).cast("string"), F.lit(10), as_int(a[0]).cast("int"))
    out = F.lower(out)  # reference emits lowercase digits (Expression.cpp:897)
    if len(a) > 1:
        out = F.call_function("lpad", out, as_int(a[1]).cast("int"), F.lit("0"))
    return Typed(out, STR)


@_fn("fromRadix")
def _from_radix(s, a):
    return Typed(F.call_function("conv", as_str(s), as_int(a[0]).cast("int"), F.lit(10)).cast("long"), INT)


@_fn("random")
def _random(s, a):
    return Typed((F.rand() * F.lit(float(2**62))).cast("long"), INT)


# -- string -----------------------------------------------------------------


@_fn("toUpper")
def _to_upper(s, a):
    return Typed(F.upper(as_str(s)), STR)


@_fn("toLower")
def _to_lower(s, a):
    return Typed(F.lower(as_str(s)), STR)


@_fn("trim")
def _trim(s, a):
    # reference trim strips isspace() (StringUtils.cpp:48-56) = Java \s,
    # not just spaces like Spark's trim()
    return Typed(F.regexp_replace(as_str(s), r"^\s+|\s+$", ""), STR)


@_fn("length")
def _length(s, a):
    return Typed(F.length(as_str(s)).cast("long"), INT)


@_fn("substring")
def _substring(s, a):
    # reference: 0-based offset (+ optional count) (Expression.cpp:227-236)
    offset = as_int(a[0])
    if len(a) > 1:
        return Typed(F.substring(as_str(s), offset.cast("int") + 1, as_int(a[1]).cast("int")), STR)
    sub = as_str(s)
    return Typed(F.substring(sub, offset.cast("int") + 1, F.length(sub)), STR)


def _instr(sub: Column, d: Column) -> Column:
    # F.call_function routes to SQL instr, which takes arbitrary
    # expressions (the pyspark wrapper wants a literal substring)
    return F.call_function("instr", sub, d)


@_fn("substringBefore")
def _substring_before(s, a):
    sub, d = as_str(s), as_str(a[0])
    pos = _instr(sub, d)
    return Typed(F.when(pos > 0, F.substring(sub, 1, pos - 1)).otherwise(sub), STR)


@_fn("substringAfter")
def _substring_after(s, a):
    sub, d = as_str(s), as_str(a[0])
    pos = _instr(sub, d)
    out = F.when(pos > 0, F.substring(sub, pos + F.length(d), F.length(sub))).otherwise(sub)
    return Typed(out, STR)


def _last_pos(sub: Column, d: Column) -> Column:
    """1-based position of the last occurrence of d in sub (0 if none)."""
    rev_pos = _instr(F.reverse(sub), F.reverse(d))
    return F.when(rev_pos > 0, F.length(sub) - rev_pos - F.length(d) + 2).otherwise(F.lit(0))


@_fn("substringBeforeLast")
def _substring_before_last(s, a):
    sub, d = as_str(s), as_str(a[0])
    pos = _last_pos(sub, d)
    return Typed(F.when(pos > 0, F.substring(sub, 1, pos - 1)).otherwise(sub), STR)


@_fn("substringAfterLast")
def _substring_after_last(s, a):
    sub, d = as_str(s), as_str(a[0])
    pos = _last_pos(sub, d)
    return Typed(F.when(pos > 0, F.substring(sub, pos + F.length(d), F.length(sub))).otherwise(sub), STR)


@_fn("getDelimitedField")
def _get_delimited_field(s, a):
    # 1-based field index, QUOTE-AWARE like the reference's CSV state
    # machine (Expression.cpp:269-330: quote_ch is always active, a
    # delimiter inside quotes does not split, strip_chars removes the
    # quote/escape characters). r15: split on delimiters followed by
    # an EVEN number of quote chars (the outside-quotes invariant) —
    # a Java-regex lookahead, so the whole thing stays one Catalyst
    # expression. The escape_ch arg is accepted for arity parity and
    # used by strip mode; escape-prefixed delimiters inside UNQUOTED
    # fields are not honored by the lookahead (quote the field — the
    # reference's own tests only exercise quoting).
    idx = as_int(a[0])
    sub = as_str(s)
    delim = as_str(a[1]) if len(a) > 1 else F.lit(",")
    quote = as_str(a[2]) if len(a) > 2 else F.lit('"')
    esc = as_str(a[3]) if len(a) > 3 else F.lit("\\")
    strip = as_bool(a[4]) if len(a) > 4 else F.lit(False)
    qd, qq, qe = _regex_quote(delim), _regex_quote(quote), _regex_quote(esc)
    not_q = F.concat(F.lit("[^"), qq, F.lit("]*"))
    # split on delimiters with an EVEN number of quote chars BEFORE
    # them (the reference toggles on every quote char, escaped or
    # not). Java has no variable-length lookbehind, so express
    # "even-before" through the total quote parity: even total ->
    # even-ahead, odd total -> odd-ahead.
    even_ahead = F.concat(
        qd, F.lit("(?s)(?=(?:"), not_q, qq, not_q, qq, F.lit(")*"), not_q, F.lit("$)")
    )
    odd_ahead = F.concat(
        qd,
        F.lit("(?s)(?="),
        not_q,
        qq,
        F.lit("(?:"),
        not_q,
        qq,
        not_q,
        qq,
        F.lit(")*"),
        not_q,
        F.lit("$)"),
    )
    n_quotes = F.length(sub) - F.length(
        F.call_function("regexp_replace", sub, qq, F.lit(""))
    )
    pattern = F.when(n_quotes % 2 == 0, even_ahead).otherwise(odd_ahead)
    parts = F.split(sub, pattern)
    # out-of-range index yields "" like the reference's untouched
    # accumulator (Expression.cpp:385), not NULL
    field = F.coalesce(
        F.get(parts, (idx - 1).cast("int")),
        F.when(sub.isNotNull(), F.lit("")),
    )
    # strip mode drops quote chars and escape PREFIXES but keeps the
    # escaped character itself (an escaped escape survives as one);
    # an escaped quote drops entirely — exactly the reference loop's
    # append rules under strip_chars
    strip_pat = F.concat(
        F.lit("(?s)"), qe, qq, F.lit("|"), qe, F.lit("(.)|"), qq, F.lit("|"), qe
    )
    stripped = F.call_function("regexp_replace", field, strip_pat, F.lit("$1"))
    return Typed(F.when(strip, stripped).otherwise(field), STR)


def _regex_quote(c: Column) -> Column:
    return F.concat(F.lit("\\Q"), c, F.lit("\\E"))


@_fn("append")
def _append(s, a):
    return Typed(F.concat(as_str(s), as_str(a[0])), STR)


@_fn("prepend")
def _prepend(s, a):
    return Typed(F.concat(as_str(a[0]), as_str(s)), STR)


@_fn("replace")
def _replace(s, a):
    return Typed(F.replace(as_str(s), as_str(a[0]), as_str(a[1])), STR)


@_fn("replaceFirst")
def _replace_first(s, a):
    # regex replace of the first match only, WITH $1 replacement
    # backrefs (Expression.cpp:771-776: std::regex_replace with
    # format_first_only — ECMA format supports capture references).
    # r16: locate the first match with regexp_instr, then run the
    # backref-capable regexp_replace over the SUFFIX starting at that
    # position with the pattern anchored at ^ inside a non-capturing
    # group (group numbers preserved). The ^ anchor means exactly one
    # replacement happens (Java's Matcher can't re-match ^ past
    # position 0, so an empty-matchable pattern can't fire twice —
    # replaceFirst('a*','X') on 'aab' is 'Xb', not 'XXb'), and the
    # suffix keeps the lookahead context past the match end intact
    # (replaceFirst('a(?=b)','X') on 'ab' is 'Xb'). Lookbehind would
    # lose its left context here, but the reference's std::regex
    # ECMAScript grammar has no lookbehind at all, so nothing is lost.
    pat, rep = as_str(a[0]), as_str(a[1])
    sub = as_str(s)
    pos = F.call_function("regexp_instr", sub, pat)
    suffix = F.substring(sub, pos, F.length(sub) - pos + 1)
    anchored = F.concat(F.lit("^(?:"), pat, F.lit(")"))
    spliced = F.concat(
        F.substring(sub, 1, pos - 1),
        F.call_function("regexp_replace", suffix, anchored, rep),
    )
    return Typed(F.when(pos > 0, spliced).otherwise(sub), STR)


@_fn("replaceAll")
def _replace_all(s, a):
    return Typed(F.regexp_replace(as_str(s), as_str(a[0]), as_str(a[1])), STR)


@_fn("replaceNull")
def _replace_null(s, a):
    return Typed(F.coalesce(as_str(s), as_str(a[0])), STR)


@_fn("replaceEmpty")
def _replace_empty(s, a):
    sub = as_str(s)
    return Typed(F.when(sub.isNull() | (F.trim(sub) == ""), as_str(a[0])).otherwise(sub), STR)


# -- search -----------------------------------------------------------------


@_fn("startsWith")
def _starts_with(s, a):
    return Typed(F.startswith(as_str(s), as_str(a[0])), BOOL)


@_fn("endsWith")
def _ends_with(s, a):
    return Typed(F.endswith(as_str(s), as_str(a[0])), BOOL)


@_fn("contains")
def _contains(s, a):
    return Typed(F.contains(as_str(s), as_str(a[0])), BOOL)


@_fn("in")
def _in(s, a):
    sub = as_str(s)
    cond = F.lit(False)
    for arg in a:
        cond = cond | (sub == as_str(arg))
    return Typed(cond, BOOL)


@_fn("find")
def _find(s, a):
    # unanchored regex search (Expression.cpp:807)
    return Typed(F.rlike(as_str(s), as_str(a[0])), BOOL)


@_fn("matches")
def _matches(s, a):
    # full-string anchored match (Expression.cpp:800)
    return Typed(F.rlike(as_str(s), F.concat(F.lit("^(?:"), as_str(a[0]), F.lit(")$"))), BOOL)


@_fn("indexOf")
def _index_of(s, a):
    return Typed((F.instr(as_str(s), as_str(a[0])) - 1).cast("long"), INT)


@_fn("lastIndexOf")
def _last_index_of(s, a):
    return Typed((_last_pos(as_str(s), as_str(a[0])) - 1).cast("long"), INT)


# -- boolean ----------------------------------------------------------------


@_fn("isNull")
def _is_null(s, a):
    return Typed(s.col.isNull(), BOOL)


@_fn("notNull")
def _not_null(s, a):
    return Typed(s.col.isNotNull(), BOOL)


@_fn("isEmpty")
def _is_empty(s, a):
    sub = as_str(s)
    return Typed(sub.isNull() | (F.trim(sub) == ""), BOOL)


@_fn("equals")
def _equals(s, a):
    return Typed(as_str(s) == as_str(a[0]), BOOL)


@_fn("equalsIgnoreCase")
def _equals_ic(s, a):
    return Typed(F.lower(as_str(s)) == F.lower(as_str(a[0])), BOOL)


@_fn("gt")
def _gt(s, a):
    return Typed(as_num(s) > as_num(a[0]), BOOL)


@_fn("ge")
def _ge(s, a):
    return Typed(as_num(s) >= as_num(a[0]), BOOL)


@_fn("lt")
def _lt(s, a):
    return Typed(as_num(s) < as_num(a[0]), BOOL)


@_fn("le")
def _le(s, a):
    return Typed(as_num(s) <= as_num(a[0]), BOOL)


@_fn("and")
def _and(s, a):
    return Typed(as_bool(s) & as_bool(a[0]), BOOL)


@_fn("or")
def _or(s, a):
    return Typed(as_bool(s) | as_bool(a[0]), BOOL)


@_fn("not")
def _not(s, a):
    return Typed(~as_bool(s), BOOL)


@_fn("ifElse")
def _if_else(s, a):
    t, f = a[0], a[1]
    if t.kind == f.kind:
        return Typed(F.when(as_bool(s), t.col).otherwise(f.col), t.kind)
    return Typed(F.when(as_bool(s), as_str(t)).otherwise(as_str(f)), STR)


# -- encode / decode ---------------------------------------------------------


def _chain_replace(col: Column, pairs: list[tuple[str, str]]) -> Column:
    for old, new in pairs:
        col = F.replace(col, F.lit(old), F.lit(new))
    return col


_JSON_ESC = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"), ("\b", "\\b"), ("\f", "\\f")]
_XML_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]
_HTML3_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


@_fn("escapeJson")
def _escape_json(s, a):
    return Typed(_chain_replace(as_str(s), _JSON_ESC), STR)


@_fn("unescapeJson")
def _unescape_json(s, a):
    # JSON unescaping must tokenize left-to-right: in "\\r" (escaped
    # backslash, then a literal r) the backslash pair consumes BOTH
    # characters before the \r rule may look at the tail. Sequential
    # replaces can't express that, so the escaped backslash is parked
    # in a NUL sentinel first and restored last (reference parses with
    # a real JSON reader, Expression.cpp:455-466; raw NUL cannot occur
    # in escaped-JSON input — the escape side writes it as the \\u0000 escape).
    col = F.replace(as_str(s), F.lit("\\\\"), F.lit("\x00"))
    for orig, esc in _JSON_ESC:
        if orig != "\\":
            col = F.replace(col, F.lit(esc), F.lit(orig))
    return Typed(F.replace(col, F.lit("\x00"), F.lit("\\")), STR)


@_fn("escapeXml")
def _escape_xml(s, a):
    return Typed(_chain_replace(as_str(s), _XML_ESC), STR)


@_fn("unescapeXml")
def _unescape_xml(s, a):
    return Typed(_chain_replace(as_str(s), [(n, o) for o, n in reversed(_XML_ESC)]), STR)


@_fn("escapeHtml3")
def _escape_html3(s, a):
    return Typed(_chain_replace(as_str(s), _HTML3_ESC), STR)


@_fn("unescapeHtml3")
def _unescape_html3(s, a):
    return Typed(_chain_replace(as_str(s), [(n, o) for o, n in reversed(_HTML3_ESC)]), STR)


@_fn("escapeHtml4")
def _escape_html4(s, a):
    return _escape_html3(s, a)


@_fn("unescapeHtml4")
def _unescape_html4(s, a):
    return _unescape_html3(s, a)


@_fn("escapeCsv")
def _escape_csv(s, a):
    sub = as_str(s)
    needs = F.contains(sub, F.lit(",")) | F.contains(sub, F.lit('"')) | F.contains(sub, F.lit("\n")) | F.contains(sub, F.lit("\r"))
    quoted = F.concat(F.lit('"'), F.replace(sub, F.lit('"'), F.lit('""')), F.lit('"'))
    return Typed(F.when(needs, quoted).otherwise(sub), STR)


@_fn("unescapeCsv")
def _unescape_csv(s, a):
    sub = as_str(s)
    is_quoted = F.startswith(sub, F.lit('"')) & F.endswith(sub, F.lit('"')) & (F.length(sub) >= 2)
    inner = F.substring(sub, 2, F.length(sub) - 2)
    return Typed(F.when(is_quoted, F.replace(inner, F.lit('""'), F.lit('"'))).otherwise(sub), STR)


@_fn("urlEncode")
def _url_encode(s, a):
    return Typed(F.url_encode(as_str(s)), STR)


@_fn("urlDecode")
def _url_decode(s, a):
    return Typed(F.url_decode(as_str(s)), STR)


@_fn("base64Encode")
def _base64_encode(s, a):
    # Spark's base64 MIME-chunks with CRLF every 76 chars; the reference
    # emits one unbroken string (Expression.cpp:747) — strip the breaks
    return Typed(
        F.regexp_replace(F.base64(F.encode(as_str(s), "utf-8")), r"[\r\n]", ""), STR
    )


@_fn("base64Decode")
def _base64_decode(s, a):
    return Typed(F.decode(F.unbase64(as_str(s)), "utf-8"), STR)


# -- date / time -------------------------------------------------------------
# EL convention: timestamps travel as epoch-millis integers
# (Expression.cpp:636-674 format/toDate/now).


@_fn("now")
def _now(s, a):
    return Typed(F.unix_millis(F.current_timestamp()), INT)


@_fn("format")
def _format(s, a):
    ts = F.timestamp_millis(as_int(s))
    return Typed(F.call_function("date_format", ts, as_str(a[0])), STR)


@_fn("toDate")
def _to_date(s, a):
    return Typed(F.unix_millis(F.call_function("to_timestamp", as_str(s), as_str(a[0]))), INT)


@_fn("toNumber")
def _to_number(s, a):
    return Typed(as_num(s).cast("long"), INT)


@_fn("toDecimal")
def _to_decimal(s, a):
    return Typed(as_num(s), NUM)


@_fn("toString")
def _to_string(s, a):
    return Typed(as_str(s), STR)


# -- misc subjectless ---------------------------------------------------------


@_fn("UUID")
def _uuid_fn(s, a):
    return Typed(F.expr("uuid()"), STR)


@_fn("hostname")
def _hostname(s, a):
    import socket

    return Typed(F.lit(socket.gethostname()), STR)


@_fn("ip")
def _ip(s, a):
    import socket

    try:
        addr = socket.gethostbyname(socket.gethostname())
    except OSError:
        addr = "127.0.0.1"
    return Typed(F.lit(addr), STR)


@_fn("literal")
def _literal(s, a):
    return a[0]


@_fn("nextInt")
def _next_int(s, a):
    return Typed(F.monotonically_increasing_id(), INT)


@_fn("reverseDnsLookup")
def _reverse_dns(s, a):
    # the one EL function that genuinely needs Python (Expression.cpp:191)
    # — a per-value network call; batched through Arrow, cached per worker
    from pyspark.sql.types import StringType

    def lookup(series):
        import socket

        cache: dict[str, str] = {}

        def one(ip):
            if ip is None:
                return None
            if ip not in cache:
                try:
                    cache[ip] = socket.gethostbyaddr(ip)[0]
                except OSError:
                    cache[ip] = ip
            return cache[ip]

        return series.map(one)

    udf = F.pandas_udf(lookup, StringType())
    return Typed(udf(as_str(s)), STR)


# ---------------------------------------------------------------------------
# compiler core
# ---------------------------------------------------------------------------

Resolver = Callable[[str], Column]


def default_resolver(attr_col: str = "attributes", columns: set[str] | None = None) -> Resolver:
    """Resolve attribute references; promoted top-level columns win.

    Resolving to the typed column (not a string cast of it) keeps
    predicates pushdown-eligible: ``${event_type:equals('error')}``
    over a promoted column reaches the parquet scan as
    ``EqualTo(event_type, 'error')``; the attributes-map path never
    pushes down.
    """

    def resolve(name: str) -> Column:
        if columns and name in columns:
            return F.col(f"`{name}`") if "." in name else F.col(name)
        return F.col(attr_col).getItem(name)

    return resolve


class Compiler:
    def __init__(self, resolver: Resolver):
        self.resolver = resolver

    def compile_node(self, node: Node) -> Typed:
        if isinstance(node, Text):
            return Typed(F.lit(node.value), STR)
        if isinstance(node, Literal):
            v = node.value
            if isinstance(v, bool):
                return Typed(F.lit(v), BOOL)
            if isinstance(v, int):
                return Typed(F.lit(v), INT)
            if isinstance(v, float):
                return Typed(F.lit(v), NUM)
            return Typed(F.lit(v), STR)
        if isinstance(node, AttrRef):
            return Typed(self.resolver(node.name), STR)
        if isinstance(node, Expr):
            return self.compile_node(node.body)
        if isinstance(node, FnCall):
            return self.compile_fn(node)
        if isinstance(node, MultiAttr):
            return self.compile_multi(node)
        if isinstance(node, Property):
            return self.compile_property(node)
        raise ELCompileError(f"unknown node {node!r}")

    def compile_fn(self, node: FnCall) -> Typed:
        fn = _FN.get(node.name)
        if fn is None:
            raise ELCompileError(f"unsupported EL function: {node.name}")
        subject = self.compile_node(node.subject) if node.subject is not None else None
        args = [self.compile_node(arg) for arg in node.args]
        return fn(subject, args)

    def _apply_chain(self, value: Typed, chain: tuple[FnCall, ...]) -> Typed:
        for call in chain:
            fn = _FN.get(call.name)
            if fn is None:
                raise ELCompileError(f"unsupported EL function: {call.name}")
            args = [self.compile_node(arg) for arg in call.args]
            value = fn(value, args)
        return value

    def compile_multi(self, node: MultiAttr) -> Typed:
        kind = node.kind
        chain = node.chain
        agg = chain and chain[-1].name in ("join", "count")
        per_value_chain = chain[:-1] if agg else chain

        def chained(col: Column) -> Typed:
            return self._apply_chain(Typed(col, STR), per_value_chain)

        if kind in ("allAttributes", "anyAttribute"):
            values = [self.resolver(_lit_str(arg)) for arg in node.args]
            results = [chained(v) for v in values]
        elif kind in ("allMatchingAttributes", "anyMatchingAttribute"):
            pattern = _lit_str(node.args[0])
            filtered = F.map_filter(F.col("attributes"), lambda k, v: k.rlike(pattern))
            arr = F.map_values(filtered)
            return self._multi_over_array(arr, kind.startswith("all"), per_value_chain, chain, agg)
        elif kind in ("allDelineatedValues", "anyDelineatedValue"):
            src = self.compile_node(node.args[0])
            delim = _lit_str(node.args[1])
            arr = F.split(as_str(src), _py_regex_quote(delim))
            return self._multi_over_array(arr, kind.startswith("all"), per_value_chain, chain, agg)
        else:
            raise ELCompileError(f"unknown multi-attribute kind {kind}")

        if agg:
            return self._aggregate([r for r in results], chain[-1])
        combined = None
        for r in results:
            b = as_bool(r)
            combined = b if combined is None else (combined & b if kind.startswith("all") else combined | b)
        return Typed(combined if combined is not None else F.lit(kind.startswith("all")), BOOL)

    def _multi_over_array(self, arr: Column, is_all: bool, per_value_chain, chain, agg) -> Typed:
        def lam(v: Column) -> Column:
            return as_bool(self._apply_chain(Typed(v, STR), per_value_chain))

        if agg:
            last = chain[-1]
            if last.name == "join":
                mapped = F.transform(
                    arr, lambda v: as_str(self._apply_chain(Typed(v, STR), per_value_chain))
                )
                delim = _lit_str(last.args[0])
                return Typed(F.array_join(mapped, delim), STR)
            # count: truthy results only (Expression.cpp:1324-1333 —
            # each sub-expression's Value::asBoolean gates the tally)
            return Typed(
                F.size(
                    F.filter(arr, lambda v: _truthy(self._apply_chain(Typed(v, STR), per_value_chain)))
                ).cast("long"),
                INT,
            )
        if is_all:
            return Typed(F.forall(arr, lam), BOOL)
        return Typed(F.exists(arr, lam), BOOL)

    def _aggregate(self, results: list[Typed], last: FnCall) -> Typed:
        if last.name == "join":
            arr = F.array(*[as_str(r) for r in results])
            delim = _lit_str(last.args[0])
            return Typed(F.array_join(arr, delim), STR)
        if last.name == "count":
            # Value::asBoolean per sub-expression (Expression.cpp:1326)
            total = None
            for r in results:
                b = _truthy(r).cast("int")
                total = b if total is None else total + b
            return Typed((total if total is not None else F.lit(0)).cast("long"), INT)
        raise ELCompileError(f"unsupported aggregate {last.name}")

    def compile_property(self, prop: Property) -> Typed:
        parts = prop.parts
        if len(parts) == 1:
            return self.compile_node(parts[0])
        if not parts:
            return Typed(F.lit(""), STR)
        cols = [as_str(self.compile_node(p)) for p in parts]
        return Typed(F.concat_ws("", *cols), STR)


def _lit_str(node: Node) -> str:
    if isinstance(node, Literal):
        return str(node.value)
    raise ELCompileError(f"expected literal argument, got {node!r}")


def _py_regex_quote(s: str) -> str:
    import re

    return re.escape(s)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def compile_el(
    text: str,
    attr_col: str = "attributes",
    columns: set[str] | None = None,
    resolver: Resolver | None = None,
) -> Column:
    """Compile an EL property string to a Column.

    ``columns``: names resolved as top-level DataFrame columns
    (promoted attributes); everything else reads ``attr_col[name]``.
    """
    typed = compile_el_typed(text, attr_col=attr_col, columns=columns, resolver=resolver)
    return typed.col


def compile_el_typed(
    text: str,
    attr_col: str = "attributes",
    columns: set[str] | None = None,
    resolver: Resolver | None = None,
) -> Typed:
    prop = parse(text)
    comp = Compiler(resolver or default_resolver(attr_col, columns))
    return comp.compile_property(prop)


def el_string(text: str, **kw) -> Column:
    """Compile and coerce to string (attribute-storage convention)."""
    t = compile_el_typed(text, **kw)
    return as_str(t)


def el_bool(text: str, **kw) -> Column:
    """Compile and coerce to boolean (routing predicate convention)."""
    t = compile_el_typed(text, **kw)
    return as_bool(t)


_CANONICAL = {"uuid", "ts", "content", "attributes", "lineage"}


def promoted_columns(df) -> set[str]:
    """Non-canonical columns of a FlowFile frame — the promoted
    attributes an EL expression should resolve as typed columns."""
    return {c for c in df.columns if c not in _CANONICAL}
