"""Flow-config compiler (SURVEY §3.1 query lifecycle, Spark-first)."""

from .pipeline import (
    CompiledFlow,
    FlowCompileError,
    FlowController,
    compile_flow,
    processor,
    registered_processors,
)

__all__ = [
    "compile_flow",
    "CompiledFlow",
    "FlowController",
    "FlowCompileError",
    "processor",
    "registered_processors",
]
