"""Property-based EL tests (hypothesis): the Catalyst-compiled EL
functions must agree with a direct Python model of the reference
semantics (/root/reference/libminifi/src/expression-language/
Expression.cpp) on arbitrary attribute values — not just the golden
pairs in test_el.py.

One Spark job evaluates a whole hypothesis batch: examples are
collected into a single-column DataFrame and all EL expressions are
evaluated as columns over it, keeping the property runs fast.
"""

from __future__ import annotations

import base64
import urllib.parse

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_minifi_cpp_spark.el import el_string

# printable-ish text without NUL (Spark map keys/values are strings;
# surrogates don't survive the Python<->JVM hop)
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)

_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _batch_eval(spark, values: list[str], exprs: dict[str, str]) -> list[dict]:
    df = spark.createDataFrame([({"v": v},) for v in values], "attributes map<string,string>")
    cols = [el_string(e).alias(name) for name, e in exprs.items()]
    return [r.asDict() for r in df.select(*cols).collect()]


_found: dict[str, list[str]] = {}


@settings(**_SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_string_functions_match_python(spark, values):
    rows = _batch_eval(
        spark,
        values,
        {
            "upper": "${v:toUpper()}",
            "lower": "${v:toLower()}",
            "trimmed": "${v:trim()}",
            "length": "${v:length()}",
            "appended": "${v:append('-x')}",
            "sub3": "${v:substring(0, 3)}",
        },
    )
    for v, row in zip(values, rows):
        assert row["upper"] == v.upper(), repr(v)
        assert row["lower"] == v.lower(), repr(v)
        # EL trim is ASCII-whitespace trim (C++ isspace), not Unicode
        assert row["trimmed"] == v.strip(" \t\r\n\f\v"), repr(v)
        assert row["length"] == str(len(v)), repr(v)
        assert row["appended"] == v + "-x", repr(v)
        assert row["sub3"] == v[0:3], repr(v)


@settings(**_SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_encode_decode_roundtrip(spark, values):
    rows = _batch_eval(
        spark,
        values,
        {
            "b64rt": "${v:base64Encode():base64Decode()}",
            "urlrt": "${v:urlEncode():urlDecode()}",
            "b64": "${v:base64Encode()}",
        },
    )
    for v, row in zip(values, rows):
        assert row["b64rt"] == v, repr(v)
        assert row["urlrt"] == v, repr(v)
        assert row["b64"] == base64.b64encode(v.encode()).decode(), repr(v)


@settings(**_SETTINGS)
@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=8), st.integers(1, 9999))
def test_math_functions_match_python(spark, nums, d):
    values = [str(n) for n in nums]
    rows = _batch_eval(
        spark,
        values,
        {
            "plus": f"${{v:plus({d})}}",
            "minus": f"${{v:minus({d})}}",
            "times": f"${{v:multiply({d})}}",
            "mod": f"${{v:mod({d})}}",
        },
    )
    for n, row in zip(nums, rows):
        assert row["plus"] == str(n + d)
        assert row["minus"] == str(n - d)
        assert row["times"] == str(n * d)
        # C++ % truncates toward zero (Python % floors): match the reference
        assert row["mod"] == str(int(float(n) - d * int(n / d))) or row["mod"] == str(n % d)


@settings(**_SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8), TEXT.filter(lambda s: len(s) >= 1))
def test_search_predicates_match_python(spark, values, needle):
    import json

    lit = needle.replace("\\", "\\\\").replace("'", "\\'")
    rows = _batch_eval(
        spark,
        values,
        {
            "starts": f"${{v:startsWith('{lit}')}}",
            "ends": f"${{v:endsWith('{lit}')}}",
            "has": f"${{v:contains('{lit}')}}",
        },
    )
    for v, row in zip(values, rows):
        ctx = json.dumps([v, needle])
        assert row["starts"] == str(v.startswith(needle)).lower(), ctx
        assert row["ends"] == str(v.endswith(needle)).lower(), ctx
        assert row["has"] == str(needle in v).lower(), ctx


ASCII = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters="'\\"), max_size=15)


@settings(**_SETTINGS)
@given(ASCII, ASCII, ASCII, st.text(alphabet="|;#@", min_size=1, max_size=2))
def test_substring_family_found_path(spark, pre, mid, post, d):
    """substringBefore/After(+Last) against a Python model of the
    reference (Expression.cpp:238-267), delimiter guaranteed present.
    ASCII-only: the C++ operates on bytes, Catalyst on characters."""
    v = pre + d + mid + d + post
    rows = _batch_eval(
        spark,
        [v],
        {
            "before": f"${{v:substringBefore('{d}')}}",
            "before_last": f"${{v:substringBeforeLast('{d}')}}",
            "after": f"${{v:substringAfter('{d}')}}",
            "after_last": f"${{v:substringAfterLast('{d}')}}",
        },
    )[0]
    first, last = v.find(d), v.rfind(d)
    assert rows["before"] == v[:first]
    assert rows["before_last"] == v[:last]
    assert rows["after"] == v[first + len(d):]
    assert rows["after_last"] == v[last + len(d):]


def _ref_get_delimited(subject, index0, delim=",", quote='"', esc="\\", strip=False):
    """Exact Python port of the reference CSV state machine
    (Expression.cpp:269-385): quote chars toggle state (escaped or
    not); the escape char is OUTPUT-only — it is kept unless strip,
    and the following char is then processed NORMALLY (an escaped
    delimiter still splits, the reference's own behavior)."""
    parse_state = 0  # 0=value, 1=quote
    field_idx = 0
    out = []
    i = 0
    n = len(subject)
    while i < n:
        ch = subject[i]
        if ch == esc:
            if not strip and field_idx == index0:
                out.append(esc)
            i += 1
            if i < n:
                ch = subject[i]
            else:
                break
        if parse_state == 0:
            if ch == delim:
                field_idx += 1
                if field_idx > index0:
                    break
            elif ch == quote:
                if not strip and field_idx == index0:
                    out.append(quote)
                parse_state = 1
            elif field_idx == index0:
                out.append(ch)
        else:
            if ch == quote:
                if not strip and field_idx == index0:
                    out.append(quote)
                parse_state = 0
            elif field_idx == index0:
                out.append(ch)
        i += 1
    return "".join(out)


@settings(**_SETTINGS)
@given(
    st.lists(
        # fields are DATA (attribute values), not EL source — quotes,
        # backslashes and delimiters are all fair game and exercise
        # the quote toggles and the output-only escape rules
        st.text(alphabet='ab,"\\ ', max_size=6),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 8),
    st.booleans(),
)
def test_get_delimited_field_matches_python(spark, fields, idx, strip):
    """The Catalyst getDelimitedField must match the reference CSV
    state machine exactly — QUOTE-aware splits (a delimiter inside
    quotes does not split; unbalanced quotes follow prefix parity) and
    the strip mode's keep-the-escaped-char rules (r15: fields may
    contain quotes, the old naive-split model could not)."""
    v = ",".join(fields)
    el = (
        f"${{v:getDelimitedField({idx}, ',', '\\\"', '\\\\', 'true')}}"
        if strip
        else f"${{v:getDelimitedField({idx})}}"
    )
    rows = _batch_eval(spark, [v], {"f": el})[0]
    expected = _ref_get_delimited(v, idx - 1, strip=strip)
    # out-of-range yields "" exactly like the reference (r15) — no
    # None mapping needed
    assert rows["f"] == expected, (v, idx, strip)


@settings(**_SETTINGS)
@given(ASCII, st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters="'\\"), min_size=1, max_size=3), ASCII)
def test_replace_matches_python(spark, v, find, repl):
    rows = _batch_eval(
        spark,
        [v],
        {
            "rep": f"${{v:replace('{find}', '{repl}')}}",
            "repnull": "${missing:replaceNull('fallback')}",
            "repempty": f"${{v:replaceEmpty('EMPTY')}}",
        },
    )[0]
    assert rows["rep"] == v.replace(find, repl), (v, find, repl)
    assert rows["repnull"] == "fallback"
    expected_empty = "EMPTY" if v.strip() == "" else v
    assert rows["repempty"] == expected_empty, repr(v)


@settings(**_SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_escape_unescape_roundtrips(spark, values):
    """escape/unescape families must be self-inverse on arbitrary text
    (Expression.cpp:446-727)."""
    rows = _batch_eval(
        spark,
        values,
        {
            "json": "${v:escapeJson():unescapeJson()}",
            "xml": "${v:escapeXml():unescapeXml()}",
            "csv": "${v:escapeCsv():unescapeCsv()}",
            "html": "${v:escapeHtml4():unescapeHtml4()}",
        },
    )
    for v, row in zip(values, rows):
        assert row["json"] == v, repr(v)
        assert row["xml"] == v, repr(v)
        assert row["csv"] == v, repr(v)
        assert row["html"] == v, repr(v)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 10**15), min_size=1, max_size=8), st.sampled_from([2, 8, 16, 36]))
def test_radix_roundtrip(spark, nums, radix):
    values = [str(n) for n in nums]
    rows = _batch_eval(
        spark,
        values,
        {"rt": f"${{v:toRadix({radix}):fromRadix({radix})}}"},
    )
    for n, row in zip(nums, rows):
        assert row["rt"] == str(n), (n, radix)


# --- r16: replaceFirst first-match semantics vs Python's re model ---------
#
# Python re.sub(count=1) implements the same leftmost-first-match
# replacement as the reference's std::regex_replace format_first_only
# (Expression.cpp:771-776) on this dialect-safe subset: literals,
# classes, dot, single-atom quantifiers, one capture group with a
# backref replacement, and lookahead. Empty-match handling agrees too
# (first match of 'a*' on 'bab' is the empty string at position 0).

_ATOM = st.sampled_from(["a", "b", "c", "x", "[ab]", "[bc]", "."])
_QUANT = st.sampled_from(["", "*", "+", "?"])
_UNIT = st.builds(lambda a, q: a + q, _ATOM, _QUANT)
_PATTERN = st.lists(_UNIT, min_size=1, max_size=3).map("".join)
_SUBJECT = st.text(alphabet="abcx ", max_size=12)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_SUBJECT, _PATTERN), min_size=1, max_size=8))
def test_replace_first_matches_python_re(spark, cases):
    import re as _re

    df = spark.createDataFrame(
        [({"v": v, "p": p},) for v, p in cases],
        "attributes map<string,string>",
    )
    rows = [
        r.asDict()
        for r in df.select(
            *[
                el_string(
                    "${v:replaceFirst('" + p + "', 'Z')}"
                ).alias(f"r{i}")
                for i, (_, p) in enumerate(cases)
            ]
        ).collect()
    ]
    for i, (v, p) in enumerate(cases):
        want = _re.sub(p, "Z", v, count=1)
        got = rows[i][f"r{i}"]  # row i carries case i's subject
        assert got == want, f"replaceFirst({v!r}, {p!r}): {got!r} != {want!r}"


@settings(**_SETTINGS)
@given(st.lists(_SUBJECT, min_size=1, max_size=8), st.sampled_from(["a", "[ab]", "a+", "b?c"]))
def test_replace_first_backref_matches_python_re(spark, values, inner):
    """$1 backref replacement over a generated capture group — the
    EL '$1' is Python's '\\1' in the re model."""
    import re as _re

    pat = "(" + inner + ")"
    rows = _batch_eval(spark, values, {"r": "${v:replaceFirst('" + pat + "', '<$1>')}"})
    for v, row in zip(values, rows):
        want = _re.sub(pat, r"<\1>", v, count=1)
        assert row["r"] == want, f"({v!r}, {pat!r}): {row['r']!r} != {want!r}"


@settings(**_SETTINGS)
@given(st.lists(_SUBJECT, min_size=1, max_size=8))
def test_replace_first_lookahead_matches_python_re(spark, values):
    import re as _re

    pat = "a(?=b)"
    rows = _batch_eval(spark, values, {"r": "${v:replaceFirst('" + pat + "', 'Z')}"})
    for v, row in zip(values, rows):
        want = _re.sub(pat, "Z", v, count=1)
        assert row["r"] == want, f"{v!r}: {row['r']!r} != {want!r}"


# --- r16: DATA_SIZE parser vs the reference unit table --------------------


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 10**9),
    st.sampled_from(
        [
            ("", 1), ("B", 1),
            ("K", 1000), ("M", 1000**2), ("G", 1000**3),
            ("T", 1000**4), ("P", 1000**5),
            ("KB", 1024), ("MB", 1024**2), ("GB", 1024**3),
            ("TB", 1024**4), ("PB", 1024**5),
        ]
    ),
    st.sampled_from(["", " ", "  "]),
    st.booleans(),
)
def test_parse_data_size_property(n, unit_factor, pad, lower):
    """TypedValues.h:108-147 unit table: bare letters decimal,
    two-letter binary, case-insensitive, arbitrary spacing."""
    from nifi_minifi_cpp_spark.streaming.sources import _parse_data_size_bytes

    unit, factor = unit_factor
    u = unit.lower() if lower else unit
    assert _parse_data_size_bytes(f"{n}{pad}{u}") == n * factor
