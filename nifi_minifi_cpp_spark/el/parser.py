"""Recursive-descent parser for the expression language.

Accepts the embedded-expression property syntax of the reference
(/root/reference/libminifi/include/expression-language/Parser.yy:159-200,
Scanner.ll): ``text ${subject:fn(arg, ...):fn2()} more text``.

- ``$$`` is a literal ``$``.
- A subject is an attribute name (bare, may contain dots/spaces when
  quoted), a quoted attribute name, or a function call (subjectless
  functions like ``hostname()``, ``literal(...)``, and multi-attribute
  combinators like ``allAttributes('a','b')``).
- Arguments are single/double-quoted strings, numbers, booleans, or
  nested ``${...}`` expressions.
"""

from __future__ import annotations

from .ast import AttrRef, Expr, FnCall, Literal, MultiAttr, Node, Property, Text

MULTI_ATTR_KINDS = frozenset(
    {
        "allAttributes",
        "anyAttribute",
        "allMatchingAttributes",
        "anyMatchingAttribute",
        "allDelineatedValues",
        "anyDelineatedValue",
    }
)

# Functions that may begin an expression with no subject
# (Expression.cpp:94-211,952,1046 — hostname/ip/UUID/literal/nextInt/now/random).
SUBJECTLESS_FNS = frozenset(
    {"hostname", "ip", "UUID", "literal", "nextInt", "now", "random", "reverseDnsLookup", "getStateValue"}
)

_IDENT_END = frozenset(":}(,)")


class ELParseError(ValueError):
    def __init__(self, msg: str, text: str, pos: int):
        super().__init__(f"{msg} at position {pos} in {text!r}")
        self.pos = pos


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    # -- low-level helpers -------------------------------------------------
    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def advance(self) -> str:
        ch = self.peek()
        self.pos += 1
        return ch

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            raise ELParseError(f"expected {ch!r}, got {self.peek()!r}", self.text, self.pos)
        self.pos += 1

    def skip_ws(self) -> None:
        while self.peek() in " \t\r\n" and self.peek():
            self.pos += 1

    # -- property level -----------------------------------------------------
    def parse_property(self) -> Property:
        parts: list[Node] = []
        buf: list[str] = []
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch == "$" and self.pos + 1 < len(self.text):
                nxt = self.text[self.pos + 1]
                if nxt == "$":
                    buf.append("$")
                    self.pos += 2
                    continue
                if nxt == "{":
                    if buf:
                        parts.append(Text("".join(buf)))
                        buf = []
                    parts.append(self.parse_expr())
                    continue
            buf.append(ch)
            self.pos += 1
        if buf:
            parts.append(Text("".join(buf)))
        return Property(tuple(parts))

    # -- expression level ---------------------------------------------------
    def parse_expr(self) -> Expr:
        self.expect("$")
        self.expect("{")
        self.skip_ws()
        body = self.parse_subject()
        body = self.parse_chain(body)
        self.skip_ws()
        self.expect("}")
        return Expr(body)

    def parse_chain(self, subject: Node) -> Node:
        while True:
            self.skip_ws()
            if self.peek() != ":":
                return subject
            self.pos += 1
            self.skip_ws()
            name = self.parse_ident()
            args = self.parse_args()
            if isinstance(subject, MultiAttr):
                subject = MultiAttr(subject.kind, subject.args, subject.chain + (FnCall(name, args),))
            else:
                subject = FnCall(name, args, subject=subject)

    def parse_subject(self) -> Node:
        self.skip_ws()
        ch = self.peek()
        if ch in "'\"":
            return AttrRef(self.parse_quoted())
        name = self.parse_ident()
        self.skip_ws()
        if self.peek() == "(":
            args = self.parse_args()
            if name in MULTI_ATTR_KINDS:
                return MultiAttr(name, args)
            return FnCall(name, args, subject=None)
        return AttrRef(name)

    def parse_ident(self) -> str:
        start = self.pos
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch in _IDENT_END or ch in "'\"":
                break
            self.pos += 1
        name = self.text[start : self.pos].strip()
        if not name:
            raise ELParseError("empty identifier", self.text, start)
        return name

    def parse_quoted(self) -> str:
        quote = self.advance()
        buf: list[str] = []
        while True:
            if self.pos >= len(self.text):
                raise ELParseError("unterminated string", self.text, self.pos)
            ch = self.advance()
            if ch == "\\" and self.peek():
                # The reference grammar (Parser.yy:144-149) unescapes
                # only \' \" \\ ; \n/\t/\r are kept as conveniences
                # (the Java NiFi EL grammar has them). Any OTHER
                # escape keeps its backslash (r15): the old
                # drop-the-backslash rule silently corrupted regex
                # arguments (\w became w and matched the letter) where
                # the reference would refuse to parse.
                nxt = self.advance()
                if nxt in ("'", '"', "\\"):
                    buf.append(nxt)
                elif nxt in ("n", "t", "r"):
                    buf.append({"n": "\n", "t": "\t", "r": "\r"}[nxt])
                else:
                    buf.append("\\" + nxt)
            elif ch == quote:
                return "".join(buf)
            else:
                buf.append(ch)

    def parse_args(self) -> tuple[Node, ...]:
        self.expect("(")
        args: list[Node] = []
        self.skip_ws()
        if self.peek() == ")":
            self.pos += 1
            return ()
        while True:
            args.append(self.parse_arg())
            self.skip_ws()
            if self.peek() == ",":
                self.pos += 1
                self.skip_ws()
                continue
            self.expect(")")
            return tuple(args)

    def parse_arg(self) -> Node:
        self.skip_ws()
        ch = self.peek()
        if ch in "'\"":
            return Literal(self.parse_quoted())
        if ch == "$" and self.text[self.pos : self.pos + 2] == "${":
            return self.parse_expr()
        # bare token: number, boolean, or unquoted string until , or )
        start = self.pos
        depth = 0
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            self.pos += 1
        token = self.text[start : self.pos].strip()
        if token == "true":
            return Literal(True)
        if token == "false":
            return Literal(False)
        try:
            return Literal(int(token))
        except ValueError:
            pass
        try:
            return Literal(float(token))
        except ValueError:
            pass
        return Literal(token)


def parse(text: str) -> Property:
    """Parse a property value into a Property AST."""
    return _Parser(text).parse_property()
