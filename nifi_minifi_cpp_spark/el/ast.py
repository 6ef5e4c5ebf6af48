"""AST for the expression language.

Grammar parity with the reference's bison grammar
(/root/reference/libminifi/include/expression-language/Parser.yy:159-200):
a property value is interleaved text and ``${...}`` expressions; an
expression is a subject (attribute reference, quoted attribute,
literal-producing function, or multi-attribute combinator) followed by
a ``:fn(args)`` chain. ``$$`` escapes a literal ``$``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Text(Node):
    """Literal text segment of a property value."""

    value: str


@dataclass(frozen=True)
class AttrRef(Node):
    """``${attr.name}`` — attribute-map lookup."""

    name: str


@dataclass(frozen=True)
class Literal(Node):
    """Number / quoted string / boolean argument."""

    value: object  # str | int | float | bool


@dataclass(frozen=True)
class FnCall(Node):
    """``subject:name(args)``; subject None for subjectless fns."""

    name: str
    args: tuple[Node, ...] = ()
    subject: Node | None = None


@dataclass(frozen=True)
class MultiAttr(Node):
    """Multi-attribute / delineated-value subjects.

    kind: one of allAttributes anyAttribute allMatchingAttributes
    anyMatchingAttribute allDelineatedValues anyDelineatedValue.
    The fn chain is applied per candidate value then combined
    (all* -> AND, any* -> OR); ``join``/``count`` aggregate instead.
    """

    kind: str
    args: tuple[Node, ...] = ()
    chain: tuple[FnCall, ...] = field(default=())


@dataclass(frozen=True)
class Expr(Node):
    """One ``${...}`` occurrence."""

    body: Node


@dataclass(frozen=True)
class Property(Node):
    """A whole property value: text and expressions interleaved."""

    parts: tuple[Node, ...]
