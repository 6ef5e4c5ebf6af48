"""Expression-language → Catalyst Column compiler.

Reference grammar: /root/reference/libminifi/include/expression-language/Parser.yy:159-200;
evaluator: /root/reference/libminifi/src/expression-language/Expression.cpp.
"""

from .compiler import (
    ELCompileError,
    compile_el,
    compile_el_typed,
    el_bool,
    el_string,
    promoted_columns,
)
from .parser import ELParseError, parse

__all__ = [
    "compile_el",
    "compile_el_typed",
    "el_bool",
    "el_string",
    "promoted_columns",
    "parse",
    "ELParseError",
    "ELCompileError",
]
