"""Scalar function pack + templating + user-transform surface.

The EL compiler (el/) exposes the full scalar surface through EL
strings; this package adds the standalone pieces: templates (Mustache,
Jolt-lite compiled to Catalyst), the full Jolt DSL engine, and the
Python RecordTransform API (SURVEY §2.9).
"""

from .jolt import jolt_chainr, jolt_shift, jolt_transform_json
from .record_transform import FlowFileTransform, apply_record_transform, lua_record_transform
from .templates import apply_template, compile_template, jolt_transform

__all__ = [
    "apply_template",
    "compile_template",
    "jolt_transform",
    "jolt_chainr",
    "jolt_shift",
    "jolt_transform_json",
    "FlowFileTransform",
    "apply_record_transform",
    "lua_record_transform",
]
