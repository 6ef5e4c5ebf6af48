"""Flow-config compiler (SURVEY §3.1 query lifecycle, Spark-first)."""

from .bucketing import cobucket_join, read_bucketed, write_bucketed
from .c2 import C2Agent, rest_sender
from .ports import input_port, output_port
from .pipeline import (
    CompiledFlow,
    FlowCompileError,
    FlowController,
    compile_flow,
    processor,
    registered_processors,
)

__all__ = [
    "C2Agent",
    "rest_sender",
    "input_port",
    "output_port",
    "write_bucketed",
    "read_bucketed",
    "cobucket_join",
    "compile_flow",
    "CompiledFlow",
    "FlowController",
    "FlowCompileError",
    "processor",
    "registered_processors",
]
