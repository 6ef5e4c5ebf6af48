"""Property-based split/merge roundtrip: SplitText then MergeContent
defragment must reproduce the original content for arbitrary line
structure (SplitText.cpp:431 + MergeContent defragment semantics).

One Spark job per hypothesis batch: examples collect into a single
frame (same batching trick as test_el_properties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_minifi_cpp_spark import operators as ops

# lines of printable-ish text without newlines (newlines are the
# delimiter under test); keep the alphabet wide enough for unicode
line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    max_size=24,
)
doc = st.lists(line, min_size=0, max_size=17).map(lambda ls: "\n".join(ls))


def _spark():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from nifi_minifi_cpp_spark.session import get_spark

    return get_spark("split-merge-props", cpus=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(doc, min_size=1, max_size=8), n=st.integers(1, 7))
def test_split_then_defragment_roundtrips(docs, n):
    spark = _spark()
    ff = spark.createDataFrame(
        [(str(i), d, {}) for i, d in enumerate(docs)],
        "uuid string, content string, attributes map<string,string>",
    )
    # remove_trailing_newlines=False: the reference's default strips
    # blank chunk tails (lossy by design); the exact-roundtrip property
    # holds only with stripping off
    frags = ops.split_text(ff, line_split_count=n, remove_trailing_newlines=False)
    merged = ops.merge_content_defragment(frags)
    got = {r["uuid"]: r["content"] for r in merged.collect()}
    for i, d in enumerate(docs):
        assert got.get(str(i), "") == d, (i, docs, n)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200),
        min_size=1,
        max_size=5,
    ),
    fmt=st.sampled_from(["gzip", "bzip2", "lzma", "xz-lzma2"]),
)
def test_compress_roundtrip_property(texts, fmt):
    """CompressContent roundtrip is exact for arbitrary unicode content
    in every supported codec, including via auto-detect decompress."""
    spark = _spark()
    ff = spark.createDataFrame(
        [(str(i), t, {}) for i, t in enumerate(texts)],
        "uuid string, content string, attributes map<string,string>",
    )
    packed = ops.compress_content(ff, mode="compress", fmt=fmt)
    unpacked = ops.compress_content(packed, mode="decompress", fmt=fmt)
    got = {r["uuid"]: r["content"] for r in unpacked.collect()}
    assert got == {str(i): t for i, t in enumerate(texts)}
    sniffed = ops.compress_content(packed, mode="decompress", fmt="auto")
    got2 = {r["uuid"]: r["content"] for r in sniffed.collect()}
    assert got2 == {str(i): t for i, t in enumerate(texts)}
