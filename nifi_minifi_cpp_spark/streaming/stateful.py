"""Custom stateful streaming operators via applyInPandasWithState.

The two reference operators that genuinely need cross-batch state
(SURVEY §4 item 3):

- MergeContent bin-packing (BinFiles.h:190-229 flush conditions:
  Min/Max Entries, Min/Max Size, Max Bin Age; correlation key
  MergeContent.h:293-299)
- DefragmentText (DefragmentText.h:37-92: buffer per key, flush on
  pattern boundary or Max Buffer Age/Size)

State layout is (buffered payloads, first-seen wallclock); flush
decisions run per micro-batch and on ProcessingTimeTimeout — the exact
analogue of the reference's onTrigger + bin-age sweep.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MERGED_SCHEMA = T.StructType(
    [
        T.StructField("correlation", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("merge_count", T.IntegerType()),
        T.StructField("flush_reason", T.StringType()),
    ]
)

_BIN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("payloads", T.ArrayType(T.StringType())),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("first_seen_ms", T.LongType()),
    ]
)


def make_bin_packer(
    min_entries: int = 1,
    max_entries: int = 100,
    max_bytes: int = 1 << 20,
    max_bin_age_ms: int = 60_000,
    demarcator: str = "\n",
):
    """Build the applyInPandasWithState function for MergeContent
    bin-packing. Returns (func, output_schema, state_schema).

    Flush when: entries >= max_entries, OR bytes >= max_bytes, OR the
    bin is older than max_bin_age_ms (via state timeout). Bins smaller
    than min_entries are still flushed on timeout — matching BinFiles'
    age-based eviction.
    """

    def pack(key, pdf_iter, state: GroupState):
        import pandas as pd

        correlation = key[0]
        if state.hasTimedOut:
            (payloads, total, first) = state.get if state.exists else ([], 0, 0)
            state.remove()
            if payloads:
                yield pd.DataFrame(
                    {
                        "correlation": [correlation],
                        "content": [demarcator.join(payloads)],
                        "merge_count": [len(payloads)],
                        "flush_reason": ["age"],
                    }
                )
            return

        payloads, total, first = state.get if state.exists else ([], 0, int(time.time() * 1000))
        payloads = list(payloads)
        out_rows = {"correlation": [], "content": [], "merge_count": [], "flush_reason": []}
        for pdf in pdf_iter:
            for content in pdf["content"]:
                payloads.append(content)
                total += len(content)
                if len(payloads) >= max_entries or total >= max_bytes:
                    reason = "entries" if len(payloads) >= max_entries else "bytes"
                    out_rows["correlation"].append(correlation)
                    out_rows["content"].append(demarcator.join(payloads))
                    out_rows["merge_count"].append(len(payloads))
                    out_rows["flush_reason"].append(reason)
                    payloads, total = [], 0
                    first = int(time.time() * 1000)
        if payloads:
            state.update((payloads, total, first))
            state.setTimeoutDuration(max_bin_age_ms)
        elif state.exists:
            state.remove()
        if out_rows["correlation"]:
            yield pd.DataFrame(out_rows)

    return pack, MERGED_SCHEMA, _BIN_STATE_SCHEMA


def merge_content_bin_packing_stream(
    df: DataFrame,
    correlation_col: str = "correlation",
    **kwargs,
) -> DataFrame:
    """MergeContent bin-packing as a streaming operator.

    Input: a streaming frame with (correlation, content) columns.
    Output: merged bundles per correlation key with flush provenance.
    """
    func, out_schema, state_schema = make_bin_packer(**kwargs)
    return (
        df.groupBy(correlation_col)
        .applyInPandasWithState(
            func, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


DEFRAG_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("n_pieces", T.IntegerType()),
        T.StructField("flush_reason", T.StringType()),
    ]
)

_DEFRAG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pieces", T.ArrayType(T.StringType())),
        T.StructField("first_seen_ms", T.LongType()),
    ]
)


def make_defragmenter(
    message_start_pattern: str,
    max_buffer_age_ms: int = 60_000,
    max_buffer_size: int = 1 << 20,
):
    """DefragmentText streaming core: pieces for one key are buffered
    until the next start-pattern piece arrives (which begins a new
    message), buffer age expires, or the buffer exceeds max size.
    Pieces must arrive in order per key (the reference's
    connection-ordering assumption, DefragmentText.cpp:59).
    """
    import re

    start_re = re.compile(message_start_pattern)

    def defrag(key, pdf_iter, state: GroupState):
        import pandas as pd

        k = key[0]
        if state.hasTimedOut:
            (pieces, first) = state.get if state.exists else ([], 0)
            state.remove()
            if pieces:
                yield pd.DataFrame(
                    {"key": [k], "content": ["\n".join(pieces)], "n_pieces": [len(pieces)], "flush_reason": ["age"]}
                )
            return

        pieces, first = state.get if state.exists else ([], int(time.time() * 1000))
        pieces = list(pieces)
        out = {"key": [], "content": [], "n_pieces": [], "flush_reason": []}

        def emit(reason: str):
            nonlocal pieces
            if pieces:
                out["key"].append(k)
                out["content"].append("\n".join(pieces))
                out["n_pieces"].append(len(pieces))
                out["flush_reason"].append(reason)
            pieces = []

        for pdf in pdf_iter:
            for piece in pdf["content"]:
                if start_re.search(piece):
                    emit("boundary")
                pieces.append(piece)
                if sum(len(p) for p in pieces) >= max_buffer_size:
                    emit("size")
        if pieces:
            state.update((pieces, first))
            state.setTimeoutDuration(max_buffer_age_ms)
        elif state.exists:
            state.remove()
        if out["key"]:
            yield pd.DataFrame(out)

    return defrag


def defragment_text_stream(
    df: DataFrame,
    message_start_pattern: str,
    key_col: str = "key",
    **kwargs,
) -> DataFrame:
    func = make_defragmenter(message_start_pattern, **kwargs)
    return df.groupBy(key_col).applyInPandasWithState(
        func, DEFRAG_SCHEMA, _DEFRAG_STATE_SCHEMA, "append", GroupStateTimeout.ProcessingTimeTimeout
    )
