"""Structured Streaming layer: sources, record adapters, stateful
operators, sinks (SURVEY §2.1-2.2, §2.6, §2.10)."""

from .records import (
    flowfiles_to_kafka_records,
    kafka_records_to_flowfiles,
    parse_syslog,
)
from .sinks import (
    console_sink,
    foreach_batch_sink,
    http_post_handler,
    http_relationship,
    invoke_http,
    route_invoke_http,
    kafka_sink,
    memory_sink,
    put_file_sink,
    put_tcp_handler,
    put_udp_handler,
)
from .sources import file_stream, generate_flowfiles, kafka_source, socket_source
from .stateful import (
    defragment_text_stream,
    make_bin_packer,
    make_defragmenter,
    merge_content_bin_packing_stream,
)

__all__ = [
    "file_stream",
    "generate_flowfiles",
    "kafka_source",
    "socket_source",
    "kafka_records_to_flowfiles",
    "flowfiles_to_kafka_records",
    "parse_syslog",
    "merge_content_bin_packing_stream",
    "defragment_text_stream",
    "make_bin_packer",
    "make_defragmenter",
    "put_file_sink",
    "put_udp_handler",
    "put_tcp_handler",
    "kafka_sink",
    "console_sink",
    "memory_sink",
    "foreach_batch_sink",
    "http_post_handler",
    "http_relationship",
    "invoke_http",
    "route_invoke_http",
]
