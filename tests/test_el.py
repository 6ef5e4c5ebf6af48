"""Expression-language golden tests.

Mirrors the reference's layer-2 strategy
(/root/reference/libminifi/test/unit/ExpressionLanguageTests.cpp):
(attributes, EL string) -> expected value pairs, evaluated here through
the Catalyst compiler instead of the closure interpreter.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_minifi_cpp_spark.el import el_bool, el_string, parse
from nifi_minifi_cpp_spark.el.ast import AttrRef, Expr, FnCall, Property, Text

ATTRS = {
    "filename": "Report_2024.CSV",
    "path": "/data/in/Report_2024.CSV",
    "mime.type": "text/csv",
    "size": "1536",
    "ratio": "2.5",
    "empty": "  ",
    "csvline": "a,b,c,d",
    "json.esc": 'say "hi"\nnow',
    "b64": "aGVsbG8=",
    "num.a": "7",
    "num.b": "3",
    "when": "1700000000000",
}


def _eval(spark, expr_text: str, attrs: dict[str, str] | None = None) -> str | None:
    df = spark.createDataFrame(
        [(attrs or ATTRS,)],
        "attributes map<string,string>",
    )
    return df.select(el_string(expr_text).alias("v")).collect()[0]["v"]


def _eval_bool(spark, expr_text: str, attrs: dict[str, str] | None = None) -> bool | None:
    df = spark.createDataFrame([(attrs or ATTRS,)], "attributes map<string,string>")
    return df.select(el_bool(expr_text).alias("v")).collect()[0]["v"]


# -- parser shape -------------------------------------------------------------


def test_parse_plain_text():
    assert parse("hello world") == Property((Text("hello world"),))


def test_parse_escaped_dollar():
    assert parse("cost: $$5") == Property((Text("cost: $5"),))


def test_parse_attr_and_chain():
    p = parse("${filename:toUpper()}")
    assert isinstance(p.parts[0], Expr)
    fn = p.parts[0].body
    assert isinstance(fn, FnCall) and fn.name == "toUpper" and fn.subject == AttrRef("filename")


def test_parse_mixed():
    p = parse("a ${x} b")
    assert p.parts[0] == Text("a ") and p.parts[2] == Text(" b")


# -- golden pairs -------------------------------------------------------------

GOLDEN = [
    ("${filename}", "Report_2024.CSV"),
    ("${filename:toUpper()}", "REPORT_2024.CSV"),
    ("${filename:toLower()}", "report_2024.csv"),
    ("${filename:substring(0, 6)}", "Report"),
    ("${filename:substring(7)}", "2024.CSV"),
    ("${filename:substringBefore('.')}", "Report_2024"),
    ("${filename:substringAfter('_')}", "2024.CSV"),
    ("${path:substringBeforeLast('/')}", "/data/in"),
    ("${path:substringAfterLast('/')}", "Report_2024.CSV"),
    ("${filename:length()}", "15"),
    ("${filename:trim()}", "Report_2024.CSV"),
    ("${filename:append('.bak')}", "Report_2024.CSV.bak"),
    ("${filename:prepend('in/')}", "in/Report_2024.CSV"),
    ("${filename:replace('_', '-')}", "Report-2024.CSV"),
    ("${filename:replaceAll('[0-9]+', 'N')}", "Report_N.CSV"),
    ("${missing:replaceNull('fallback')}", "fallback"),
    ("${empty:replaceEmpty('was-empty')}", "was-empty"),
    ("${csvline:getDelimitedField(2)}", "b"),
    ("${csvline:getDelimitedField(1, ',')}", "a"),
    ("${filename:indexOf('2024')}", "7"),
    ("${filename:indexOf('zzz')}", "-1"),
    ("${path:lastIndexOf('/')}", "8"),
    ("${num.a:plus(3)}", "10"),
    ("${num.a:plus(${num.b})}", "10"),
    ("${num.a:minus(3)}", "4"),
    ("${num.a:multiply(${num.b})}", "21"),
    ("${num.a:divide(2)}", "3.5"),
    ("${num.a:mod(${num.b})}", "1"),
    ("${ratio:plus(1)}", "3.5"),
    ("${size:toNumber()}", "1536"),
    ("${literal(255):toRadix(16)}", "ff"),
    ("${literal('ff'):fromRadix(16)}", "255"),
    ("${b64:base64Decode()}", "hello"),
    ("${literal('hello'):base64Encode()}", "aGVsbG8="),
    ("${literal('a b&c'):urlEncode()}", "a+b%26c"),
    ("${literal('a+b%26c'):urlDecode()}", "a b&c"),
    ("${literal('<tag>'):escapeXml()}", "&lt;tag&gt;"),
    ("${literal('&lt;tag&gt;'):unescapeXml()}", "<tag>"),
    ("${json.esc:escapeJson()}", 'say \\"hi\\"\\nnow'),
    ("${literal('a,b'):escapeCsv()}", '"a,b"'),
    ("${literal('plain'):escapeCsv()}", "plain"),
    ("${when:format('yyyy-MM-dd')}", "2023-11-14"),
    ("${literal('2023-11-14 22:13:20'):toDate('yyyy-MM-dd HH:mm:ss')}", "1700000000000"),
    ("prefix-${filename:toLower()}-suffix", "prefix-report_2024.csv-suffix"),
    ("$${not-an-expr}", "${not-an-expr}"),
    ("${filename:substringBefore('_'):toUpper()}", "REPORT"),
    ("${allAttributes('num.a', 'num.b'):join('|')}", "7|3"),
    # count tallies TRUTHY sub-results only (Expression.cpp:1324-1333 +
    # Value::asBoolean: bool true / nonzero number / string 'true')
    ("${allAttributes('num.a', 'num.b'):gt(5):count()}", "1"),
    ("${allAttributes('num.a', 'num.b'):gt(0):count()}", "2"),
    ("${allAttributes('num.a', 'num.b'):gt(9):count()}", "0"),
    ("${allAttributes('num.a', 'num.b'):count()}", "0"),  # '7'/'3' are not 'true'
    ("${allDelineatedValues(${csvline}, ','):equals('c'):count()}", "1"),
    ("${allDelineatedValues(${csvline}, ','):matches('[a-d]'):count()}", "4"),
    ("${allMatchingAttributes('num\\..*'):gt(5):count()}", "1"),
    ("${allDelineatedValues(${csvline}, ','):join('-')}", "a-b-c-d"),
]


@pytest.mark.parametrize("expr_text,expected", GOLDEN)
def test_golden(spark, expr_text, expected):
    assert _eval(spark, expr_text) == expected


BOOL_GOLDEN = [
    ("${filename:startsWith('Report')}", True),
    ("${filename:endsWith('.CSV')}", True),
    ("${filename:contains('2024')}", True),
    ("${filename:contains('xyz')}", False),
    ("${mime.type:in('text/csv', 'text/plain')}", True),
    ("${mime.type:in('application/json')}", False),
    ("${filename:matches('Report_[0-9]{4}\\.CSV')}", True),
    ("${filename:matches('Report')}", False),
    ("${filename:find('Report')}", True),
    ("${missing:isNull()}", True),
    ("${filename:isNull()}", False),
    ("${filename:notNull()}", True),
    ("${empty:isEmpty()}", True),
    ("${filename:isEmpty()}", False),
    ("${mime.type:equals('text/csv')}", True),
    ("${mime.type:equalsIgnoreCase('TEXT/CSV')}", True),
    ("${size:gt(1000)}", True),
    ("${size:le(1536)}", True),
    ("${size:lt(100)}", False),
    ("${size:gt(1000):and(${mime.type:equals('text/csv')})}", True),
    ("${size:lt(100):or(${filename:startsWith('Report')})}", True),
    ("${size:gt(1000):not()}", False),
    ("${allAttributes('num.a', 'num.b'):gt(1)}", True),
    ("${allAttributes('num.a', 'num.b'):gt(5)}", False),
    ("${anyAttribute('num.a', 'num.b'):gt(5)}", True),
    ("${allMatchingAttributes('num\\..*'):gt(2)}", True),
    ("${anyMatchingAttribute('num\\..*'):equals('7')}", True),
    ("${anyDelineatedValue(${csvline}, ','):equals('c')}", True),
    ("${allDelineatedValues(${csvline}, ','):matches('[a-d]')}", True),
]


@pytest.mark.parametrize("expr_text,expected", BOOL_GOLDEN)
def test_bool_golden(spark, expr_text, expected):
    assert _eval_bool(spark, expr_text) is expected


def test_if_else(spark):
    assert _eval(spark, "${size:gt(1000):ifElse('big', 'small')}") == "big"
    assert _eval(spark, "${size:gt(99999):ifElse('big', 'small')}") == "small"


def test_uuid_shape(spark):
    v = _eval(spark, "${UUID()}")
    assert len(v) == 36 and v.count("-") == 4


def test_missing_attr_in_text_is_empty(spark):
    assert _eval(spark, "x${missing}y") == "xy"


def test_replace_first(spark):
    assert _eval(spark, "${literal('one two two'):replaceFirst('two', 'X')}") == "one X two"
    assert _eval(spark, "${literal('aaa'):replaceFirst('b', 'X')}") == "aaa"
    # r15: $1 replacement backrefs (Expression.cpp:771 regex_replace
    # format semantics) and reference test vectors
    assert (
        _eval(spark, r"${literal('hello world'):replaceFirst('(\\w+)', '[$1]')}")
        == "[hello] world"
    )
    assert (
        _eval(spark, "${literal('a brand new filename.txt'):replaceFirst('a', 'the')}")
        == "the brand new filename.txt"
    )
    assert (
        _eval(spark, "${literal('a brand new filename.txt'):replaceFirst('[br]', 'g')}")
        == "a grand new filename.txt"
    )
    # r16 (ADVICE r15): the two confirmed format_first_only deviations —
    # an empty-matchable pattern replaces ONCE (the old prefix-splice
    # found a second empty match at the prefix end), and lookahead past
    # the match end keeps its context (the prefix boundary cut it off)
    assert _eval(spark, "${literal('aab'):replaceFirst('a*', 'X')}") == "Xb"
    assert _eval(spark, "${literal('bab'):replaceFirst('a*', 'X')}") == "Xbab"
    assert _eval(spark, "${literal('ab'):replaceFirst('a(?=b)', 'X')}") == "Xb"
    assert _eval(spark, "${literal('xxab'):replaceFirst('a(?=b)', 'Y')}") == "xxYb"
    # r15 escape rule: an unknown escape KEEPS its backslash, so a
    # single-backslash regex class works instead of silently matching
    # the bare letter (the pre-fix corruption); the reference escapes
    # (\' \" \\) still unescape and \n/\t/\r stay conveniences
    assert (
        _eval(spark, r"${literal('hello world'):replaceFirst('(\w+)', '[$1]')}")
        == "[hello] world"
    )
    from nifi_minifi_cpp_spark.el.parser import parse

    def _lex(s):
        node = parse("${literal('" + s + "')}")
        return node.parts[0].body.args[0].value

    assert _lex(r"\w+\d") == "\\w+\\d"  # unknown escapes preserved
    assert _lex(r"\\w") == "\\w"  # double form unescapes to the same
    assert _lex(r"a\'b") == "a'b" and _lex('a\\"b') == 'a"b'
    assert _lex(r"a\nb") == "a\nb" and _lex(r"a\tb") == "a\tb"
    # backref with a second occurrence untouched
    assert (
        _eval(spark, r"${literal('x=1 y=2'):replaceFirst('(\\w)=(\\d)', '$2:$1')}")
        == "1:x y=2"
    )


def test_reverse_dns_lookup(spark):
    # env-dependent result; assert it resolves to SOMETHING stable
    v = _eval(spark, "${literal('127.0.0.1'):reverseDnsLookup()}")
    assert isinstance(v, str) and len(v) > 0


def test_get_delimited_field_quote_aware(spark):
    """r15 (Expression.cpp:269-330 + ExpressionLanguageTests.cpp
    Get Delimited 1-3): the quote char is ALWAYS active — a delimiter
    inside quotes does not split — and strip mode removes the
    quote/escape characters. Exact reference vectors."""
    assert (
        _eval(spark, '${literal(\'"Jacobson, John", 32, Mr.\'):getDelimitedField(2)}')
        == " 32"
    )
    assert (
        _eval(spark, '${literal(\'"Jacobson, John", 32, Mr.\'):getDelimitedField(1)}')
        == '"Jacobson, John"'
    )
    assert (
        _eval(
            spark,
            "${literal('\"Jacobson, John\", 32, Mr.'):"
            "getDelimitedField(1, ',', '\\\"', '\\\\', 'true')}",
        )
        == "Jacobson, John"
    )
    # unquoted input unchanged by the quote-awareness
    assert _eval(spark, "${literal('a,b,c'):getDelimitedField(3)}") == "c"
