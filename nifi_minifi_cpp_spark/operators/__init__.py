"""Operator library: each reference processor as DataFrame -> DataFrame.

SURVEY.md §2 is the inventory; citations sit on each function.
"""

from .archive import (
    ArchiveOpError,
    edit_archive_entries,
    focus_archive_entry,
    manipulate_archive,
    merge_content_archive,
    unfocus_archive_entry,
    unpack_archive,
    validate_archive_op,
)
from .attributes import (
    append_host_info,
    attributes_to_json,
    evaluate_json_path,
    extract_text,
    hash_content,
    log_attribute,
    update_attribute,
)
from .routing import funnel, retry_flow_file, route_on_attribute, route_text
from .temporal import asof_join, range_join, stream_interval_join
from .text import (
    merged_attribute_maps,
    compress_content,
    defragment_text,
    merge_content_bin_packing,
    merge_content_defragment,
    replace_text,
    segment_content,
    split_content,
    split_json,
    split_record,
    split_text,
)
from .window import (
    attribute_rolling_window_count,
    attribute_rolling_window_time,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "update_attribute",
    "append_host_info",
    "extract_text",
    "evaluate_json_path",
    "hash_content",
    "attributes_to_json",
    "log_attribute",
    "route_on_attribute",
    "route_text",
    "retry_flow_file",
    "funnel",
    "asof_join",
    "range_join",
    "stream_interval_join",
    "replace_text",
    "split_text",
    "split_content",
    "segment_content",
    "split_json",
    "split_record",
    "defragment_text",
    "merge_content_defragment",
    "merged_attribute_maps",
    "merge_content_bin_packing",
    "compress_content",
    "ArchiveOpError",
    "edit_archive_entries",
    "focus_archive_entry",
    "manipulate_archive",
    "merge_content_archive",
    "unfocus_archive_entry",
    "unpack_archive",
    "validate_archive_op",
    "attribute_rolling_window_time",
    "attribute_rolling_window_count",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
]
