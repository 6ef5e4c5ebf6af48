"""Per-operator unit tests, mirroring the reference's layer-1 strategy
(SingleProcessorTestController: content+attributes in, relationship
frames out — /root/reference/libminifi/test/libtest/unit/SingleProcessorTestController.h:32-59).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nifi_minifi_cpp_spark import operators as ops


def make_ff(spark, rows):
    """rows: list of (uuid, content, attributes-dict)."""
    return spark.createDataFrame(
        [(u, None, c, a, [u]) for (u, c, a) in rows],
        "uuid string, ts timestamp, content string, attributes map<string,string>, lineage array<string>",
    )


def attrs_of(df, uuid):
    row = [r for r in df.collect() if r["uuid"] == uuid][0]
    return dict(row["attributes"])


# -- UpdateAttribute ----------------------------------------------------------


def test_update_attribute(spark):
    ff = make_ff(spark, [("1", "x", {"filename": "a.txt", "size": "10"})])
    out = ops.update_attribute(ff, {"upper": "${filename:toUpper()}", "next": "${size:plus(1)}"})
    a = attrs_of(out, "1")
    assert a["upper"] == "A.TXT"
    assert a["next"] == "11"


def test_update_attribute_overwrites(spark):
    ff = make_ff(spark, [("1", "x", {"k": "old"})])
    out = ops.update_attribute(ff, {"k": "new"})
    assert attrs_of(out, "1")["k"] == "new"


# -- ExtractText --------------------------------------------------------------


def test_extract_text(spark):
    ff = make_ff(spark, [("1", "error code=42 msg=boom", {})])
    out = ops.extract_text(ff, "err", r"code=(\d+) msg=(\w+)")
    a = attrs_of(out, "1")
    assert a["err"] == "code=42 msg=boom"
    assert a["err.1"] == "42"
    assert a["err.2"] == "boom"


def test_extract_text_no_match_keeps_attrs(spark):
    ff = make_ff(spark, [("1", "nothing here", {"keep": "me"})])
    out = ops.extract_text(ff, "err", r"code=(\d+)")
    a = attrs_of(out, "1")
    assert a == {"keep": "me"}


# -- EvaluateJsonPath ---------------------------------------------------------


def test_evaluate_json_path(spark):
    ff = make_ff(spark, [("1", '{"a": {"b": 7}, "tags": ["x", "y"]}', {})])
    out = ops.evaluate_json_path(ff, {"ab": "$.a.b", "t0": "$.tags[0]"})
    a = attrs_of(out, "1")
    assert a["ab"] == "7"
    assert a["t0"] == "x"


def test_evaluate_json_path_to_content(spark):
    ff = make_ff(spark, [("1", '{"a": "inner"}', {})])
    out = ops.evaluate_json_path(ff, {"c": "$.a"}, destination="content")
    assert out.collect()[0]["content"] == "inner"


# -- HashContent --------------------------------------------------------------


def test_hash_content_sha256(spark):
    ff = make_ff(spark, [("1", "hello", {})])
    out = ops.hash_content(ff, "hash.value", "SHA256")
    expected = hashlib.sha256(b"hello").hexdigest().upper()
    assert attrs_of(out, "1")["hash.value"] == expected


def test_hash_content_md5(spark):
    ff = make_ff(spark, [("1", "hello", {})])
    out = ops.hash_content(ff, "h", "MD5")
    assert attrs_of(out, "1")["h"] == hashlib.md5(b"hello").hexdigest().upper()


# -- AttributesToJSON ---------------------------------------------------------


def test_attributes_to_json_list(spark):
    ff = make_ff(spark, [("1", "", {"a": "1", "b": "2", "c": "3"})])
    out = ops.attributes_to_json(ff, attributes_list=["a", "c"])
    assert out.collect()[0]["content"] == '{"a":"1","c":"3"}'


def test_attributes_to_json_regex(spark):
    ff = make_ff(spark, [("1", "", {"x.a": "1", "x.b": "2", "y.c": "3"})])
    out = ops.attributes_to_json(ff, attributes_regex=r"x\..*")
    import json

    assert json.loads(out.collect()[0]["content"]) == {"x.a": "1", "x.b": "2"}


# -- RouteOnAttribute ---------------------------------------------------------


def test_route_on_attribute(spark):
    ff = make_ff(
        spark,
        [
            ("1", "", {"event_type": "error"}),
            ("2", "", {"event_type": "click"}),
            ("3", "", {"event_type": "error", "sev": "9"}),
            ("4", "", {}),
        ],
    )
    routed = ops.route_on_attribute(
        ff,
        {
            "errors": "${event_type:equals('error')}",
            "severe": "${sev:gt(5)}",
        },
    )
    assert {r["uuid"] for r in routed["errors"].collect()} == {"1", "3"}
    assert {r["uuid"] for r in routed["severe"].collect()} == {"3"}
    assert {r["uuid"] for r in routed["unmatched"].collect()} == {"2", "4"}


# -- RouteText ----------------------------------------------------------------


def test_route_text_contains(spark):
    ff = make_ff(spark, [("1", "apple pie\nbanana split\napple tart", {})])
    routed = ops.route_text(ff, {"apples": "apple"}, matching="contains")
    rows = routed["apples"].collect()
    assert len(rows) == 1
    assert rows[0]["content"] == "apple pie\napple tart"
    un = routed["unmatched"].collect()
    assert un[0]["content"] == "banana split"


def test_route_text_empty_routes(spark):
    """ADVICE r6: the dynamic fast path crashed (reduce over an empty
    predicate list) when no routes are declared — everything must go
    to unmatched instead."""
    ff = make_ff(spark, [("1", "apple pie\nbanana split", {})])
    routed = ops.route_text(ff, {}, matching="contains")
    assert set(routed) == {"unmatched"}
    rows = routed["unmatched"].collect()
    assert rows[0]["content"] == "apple pie\nbanana split"


def test_route_text_regex_grouping(spark):
    ff = make_ff(spark, [("1", "a:1\nb:2\na:3", {})])
    routed = ops.route_text(
        ff, {"all": ".*:.*"}, matching="matches_regex", grouping_regex=r"^(\w):"
    )
    rows = {r["_group"]: r["content"] for r in routed["all"].collect()}
    assert rows == {"a": "a:1\na:3", "b": "b:2"}


# -- RetryFlowFile ------------------------------------------------------------


def test_retry_flow_file(spark):
    # "3" at the boundary: 2 retries consumed of max 3 -> one MORE
    # retry is due (the r5 off-by-one resolved the comparison against
    # the post-increment map and exceeded it a pass early)
    ff = make_ff(
        spark,
        [("1", "", {}), ("2", "", {"flowfile.retries": "3"}), ("3", "", {"flowfile.retries": "2"})],
    )
    routed = ops.retry_flow_file(ff, max_retries=3)
    retry = {r["uuid"]: dict(r["attributes"]) for r in routed["retry"].collect()}
    exceeded = {r["uuid"]: dict(r["attributes"]) for r in routed["retries_exceeded"].collect()}
    assert sorted(retry) == ["1", "3"] and retry["1"]["flowfile.retries"] == "1"
    assert retry["3"]["flowfile.retries"] == "3"
    assert list(exceeded) == ["2"]
    # the exceeded route does NOT bump the counter (reference parity)
    assert exceeded["2"]["flowfile.retries"] == "3"


# -- Funnel -------------------------------------------------------------------


def test_funnel(spark):
    a = make_ff(spark, [("1", "", {})])
    b = make_ff(spark, [("2", "", {})])
    assert ops.funnel(a, b).count() == 2


# -- ReplaceText --------------------------------------------------------------


def test_replace_text_truth_table(spark):
    # reference behave truth table: replace_text.feature:34-41
    ff = make_ff(spark, [("1", "one apple, two apples", {})])
    out = ops.replace_text(ff, "regex_replace", r"a([a-z]+)e", r"ri$1et")
    assert out.collect()[0]["content"] == "one ripplet, two ripplets"


@pytest.mark.parametrize(
    "mode,strategy,search,repl,expected",
    [
        ("entire_text", "prepend", None, ">> ", ">> l1\nl2"),
        ("entire_text", "append", None, " <<", "l1\nl2 <<"),
        ("entire_text", "always_replace", None, "gone", "gone"),
        ("entire_text", "literal_replace", "l1", "L1", "L1\nl2"),
        ("line_by_line", "prepend", None, "# ", "# l1\n# l2"),
        ("first_line", "prepend", None, "# ", "# l1\nl2"),
        ("last_line", "append", None, ";", "l1\nl2;"),
        ("except_first_line", "prepend", None, "  ", "l1\n  l2"),
        ("except_last_line", "append", None, ",", "l1,\nl2"),
    ],
)
def test_replace_text_modes(spark, mode, strategy, search, repl, expected):
    ff = make_ff(spark, [("1", "l1\nl2", {})])
    out = ops.replace_text(ff, strategy, search, repl, mode=mode)
    assert out.collect()[0]["content"] == expected


# -- Split family -------------------------------------------------------------


def test_split_text(spark):
    ff = make_ff(spark, [("1", "h\na\nb\nc\nd\ne", {})])
    out = ops.split_text(ff, line_split_count=2, header_line_count=1)
    rows = sorted(out.collect(), key=lambda r: int(dict(r["attributes"])["fragment.index"]))
    contents = [r["content"] for r in rows]
    assert contents == ["h\na\nb", "h\nc\nd", "h\ne"]
    a0 = dict(rows[0]["attributes"])
    assert a0["fragment.identifier"] == "1"
    assert a0["fragment.count"] == "3"
    assert a0["text.line.count"] == "2"


def test_split_content_roundtrip(spark):
    ff = make_ff(spark, [("1", "a|b|c", {})])
    out = ops.split_content(ff, "|")
    assert [r["content"] for r in out.orderBy("attributes.`fragment.index`").collect()] == ["a", "b", "c"]


def test_segment_content(spark):
    ff = make_ff(spark, [("1", "abcdefgh", {})])
    out = ops.segment_content(ff, 3)
    rows = sorted(out.collect(), key=lambda r: int(dict(r["attributes"])["fragment.index"]))
    assert [r["content"] for r in rows] == ["abc", "def", "gh"]
    assert dict(rows[0]["attributes"])["segment.count"] == "3"


def test_split_json_scalars(spark):
    ff = make_ff(spark, [("1", '["x", "y", "z"]', {})])
    out = ops.split_json(ff)
    assert {r["content"] for r in out.collect()} == {"x", "y", "z"}


def test_split_json_objects(spark):
    ff = make_ff(spark, [("1", '[{"a": 1}, {"a": 2}]', {})])
    out = ops.split_json(ff, element_schema="struct<a:int>")
    assert {r["content"] for r in out.collect()} == {'{"a":1}', '{"a":2}'}


# -- Merge / defragment -------------------------------------------------------


def test_split_then_merge_roundtrip(spark, tables):
    """FIXTURES.md round-trip: split documents then reassemble; the
    merged content must hash-match the original."""
    from nifi_minifi_cpp_spark.model import documents_to_flowfiles

    docs = documents_to_flowfiles(tables["documents"]).limit(50)
    frags = ops.split_text(docs, line_split_count=2)
    merged = ops.merge_content_defragment(frags)
    orig = {r["uuid"]: r["content"] for r in docs.collect()}
    back = {r["uuid"]: r["content"] for r in merged.collect()}
    assert len(back) == len(orig)
    mismatches = {
        k for k in orig
        if hashlib.sha256(orig[k].encode()).hexdigest() != hashlib.sha256(back[k].encode()).hexdigest()
    }
    assert mismatches == set()


def test_merge_defragment_incomplete_dropped(spark):
    ff = make_ff(
        spark,
        [
            ("f1-0", "a", {"fragment.identifier": "f1", "fragment.index": "1", "fragment.count": "2"}),
            ("f1-1", "b", {"fragment.identifier": "f1", "fragment.index": "2", "fragment.count": "2"}),
            ("f2-0", "x", {"fragment.identifier": "f2", "fragment.index": "1", "fragment.count": "2"}),
        ],
    )
    out = ops.merge_content_defragment(ff)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["content"] == "a\nb"
    assert "fragment.identifier" not in dict(rows[0]["attributes"])


def test_merge_bin_packing(spark):
    ff = make_ff(spark, [(f"{i:02d}", f"c{i}", {"corr": "k" + str(i % 2)}) for i in range(10)])
    out = ops.merge_content_bin_packing(ff, max_entries=3, correlation_attribute="corr")
    rows = out.collect()
    # 5 per key, bins of 3 -> 2 bins per key -> 4 bundles
    assert len(rows) == 4
    assert sum(int(dict(r["attributes"])["merge.count"]) for r in rows) == 10


def test_defragment_text_start_pattern(spark):
    ff = make_ff(spark, [("1", "<1> a\ncont\n<2> b\ncont2", {})])
    out = ops.defragment_text(ff, message_start_pattern=r"^<\d+>")
    contents = sorted(r["content"] for r in out.collect())
    assert contents == ["<1> a\ncont", "<2> b\ncont2"]


# -- CompressContent ----------------------------------------------------------


def test_compress_roundtrip(spark):
    ff = make_ff(spark, [("1", "squeeze me", {})])
    for fmt in ("gzip", "bzip2", "lzma", "xz-lzma2"):
        comp = ops.compress_content(ff, "compress", fmt=fmt)
        out = ops.compress_content(comp, "decompress", fmt=fmt)
        assert out.collect()[0]["content"] == "squeeze me", fmt


def test_compress_auto_detect_and_mime(spark):
    ff = make_ff(spark, [("1", "sniff me", {"mime.type": "text/plain"})])
    for fmt in ("gzip", "bzip2", "xz-lzma2", "lzma"):
        comp = ops.compress_content(ff, "compress", fmt=fmt, update_mime=True)
        row = comp.collect()[0]
        assert dict(row["attributes"])["mime.type"] == ops.text._COMPRESS_MIME[fmt]
        out = ops.compress_content(comp, "decompress", fmt="auto")
        assert out.collect()[0]["content"] == "sniff me", fmt


# -- Rolling window -----------------------------------------------------------


def test_rolling_window_count_based(spark):
    rows = [("u", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = ops.attribute_rolling_window_count(df, "v", order_col="ts", window_length=3, partition_by="k")
    got = {r["ts"]: r for r in out.collect()}
    assert got[0]["rolling.window.value"] == 1.0
    assert got[2]["rolling.window.value"] == 6.0
    assert got[4]["rolling.window.value"] == 12.0
    assert got[4]["rolling.window.mean"] == 4.0
    assert got[4]["rolling.window.median"] == 4.0
    assert got[3]["rolling.window.variance"] == pytest.approx(2 / 3)


def test_rolling_window_time_based(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [("u", base + dt.timedelta(seconds=s), float(v)) for s, v in [(0, 1), (10, 2), (100, 3)]]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = ops.attribute_rolling_window_time(df, "v", window_seconds=60, partition_by="k")
    got = sorted(out.collect(), key=lambda r: r["ts"])
    assert got[1]["rolling.window.value"] == 3.0  # 0s and 10s in window
    assert got[2]["rolling.window.value"] == 3.0  # only 100s itself


# -- ManipulateArchive / Focus / Unfocus --------------------------------------


def _entries():
    return [("a.txt", b"alpha"), ("b.txt", b"bravo"), ("c.txt", b"charlie")]


def test_edit_archive_entries_all_ops():
    from nifi_minifi_cpp_spark.operators import edit_archive_entries

    # remove: target gone, others byte-identical
    out = edit_archive_entries(_entries(), "remove", target="b.txt")
    assert out == [("a.txt", b"alpha"), ("c.txt", b"charlie")]
    # copy with before: duplicate bytes at position
    out = edit_archive_entries(_entries(), "copy", target="c.txt", destination="c2.txt", before="b.txt")
    assert out == [("a.txt", b"alpha"), ("c2.txt", b"charlie"), ("b.txt", b"bravo"), ("c.txt", b"charlie")]
    # move with after
    out = edit_archive_entries(_entries(), "move", target="a.txt", destination="z.txt", after="b.txt")
    assert out == [("b.txt", b"bravo"), ("z.txt", b"alpha"), ("c.txt", b"charlie")]
    # touch: new empty entry appended when no position given
    out = edit_archive_entries(_entries(), "touch", destination="new.txt")
    assert out[-1] == ("new.txt", b"")
    # missing position entry -> append at end (reference warning path)
    out = edit_archive_entries(_entries(), "copy", target="a.txt", destination="d.txt", before="zzz")
    assert out[-1] == ("d.txt", b"alpha")
    # runtime failures -> None
    assert edit_archive_entries(_entries(), "remove", target="nope.txt") is None
    assert edit_archive_entries(_entries(), "copy", target="a.txt", destination="b.txt") is None


def test_validate_archive_op_matrix():
    from nifi_minifi_cpp_spark.operators import ArchiveOpError, validate_archive_op

    validate_archive_op("remove", "t", None, None, None)
    validate_archive_op("touch", None, "d", "b", None)
    for bad in [
        ("nuke", "t", "d", None, None),      # unknown op
        ("copy", "t", None, None, None),     # create op needs destination
        ("remove", "t", "d", None, None),    # remove forbids destination
        ("touch", "t", "d", None, None),     # touch forbids target
        ("move", None, "d", None, None),     # move needs target
        ("copy", "t", "d", "b", "a"),        # before XOR after
    ]:
        with pytest.raises(ArchiveOpError):
            validate_archive_op(*bad)


def test_manipulate_archive_roundtrip(spark):
    """Edit one entry inside a packed archive; the rest stays
    byte-identical after unpack (ManipulateArchive.cpp:95 parity)."""
    from nifi_minifi_cpp_spark.operators import (
        manipulate_archive,
        merge_content_archive,
        unpack_archive,
    )

    ff = spark.createDataFrame(
        [(n, c, {"filename": n}) for n, c in [("a.txt", "alpha"), ("b.txt", "bravo"), ("c.txt", "charlie")]],
        "uuid string, content string, attributes map<string,string>",
    )
    packed = merge_content_archive(ff, fmt="zip")
    routed = manipulate_archive(packed, "move", target="a.txt", destination="a2.txt", after="b.txt")
    assert routed["failure"].count() == 0
    entries = {
        r["entry_name"]: r["content"]
        for r in unpack_archive(routed["success"], fmt="zip").collect()
    }
    assert entries == {"b.txt": "bravo", "a2.txt": "alpha", "c.txt": "charlie"}
    # per-row failure: missing target routes to failure with archive intact
    routed2 = manipulate_archive(packed, "remove", target="nope.txt")
    assert routed2["success"].count() == 0
    assert unpack_archive(routed2["failure"], fmt="zip").count() == 3


def test_focus_unfocus_archive_entry(spark):
    from nifi_minifi_cpp_spark.operators import (
        focus_archive_entry,
        merge_content_archive,
        unfocus_archive_entry,
        unpack_archive,
    )
    from pyspark.sql import functions as F

    ff = spark.createDataFrame(
        [(n, c, {"filename": n}) for n, c in [("x.txt", "hello"), ("y.txt", "world")]],
        "uuid string, content string, attributes map<string,string>",
    )
    packed = merge_content_archive(ff, fmt="tar")
    focused = focus_archive_entry(packed, "x.txt", fmt="tar")
    assert focused.first()["content"] == "hello"
    transformed = focused.withColumn("content", F.upper(F.col("content")))
    unfocused = unfocus_archive_entry(transformed, "x.txt", fmt="tar")
    entries = {r["entry_name"]: r["content"] for r in unpack_archive(unfocused, fmt="tar").collect()}
    assert entries == {"x.txt": "HELLO", "y.txt": "world"}


# -- MergeContent attribute strategies ----------------------------------------


def test_merge_attribute_strategies(spark):
    """Keep-Only-Common vs Keep-All-Unique (MergeContent.h:253-285):
    common requires every member to carry the (key, value); unique
    keeps any non-conflicting key."""
    from nifi_minifi_cpp_spark.operators import merge_content_bin_packing

    rows = [
        ("a", "m1", {"env": "prod", "shared": "x", "only1": "v"}),
        ("b", "m2", {"env": "prod", "shared": "y"}),
        ("c", "m3", {"env": "prod", "shared": "x"}),
    ]
    ff = spark.createDataFrame(rows, "uuid string, content string, attributes map<string,string>")
    common = merge_content_bin_packing(ff, attribute_strategy="keep_only_common").first()
    attrs = dict(common["attributes"])
    # env identical everywhere -> kept; shared conflicts -> dropped;
    # only1 missing from two members -> dropped
    assert attrs["env"] == "prod"
    assert "shared" not in attrs and "only1" not in attrs
    assert attrs["merge.count"] == "3"

    unique = merge_content_bin_packing(ff, attribute_strategy="keep_all_unique").first()
    uattrs = dict(unique["attributes"])
    # only1 never conflicts -> kept under unique
    assert uattrs["env"] == "prod" and uattrs["only1"] == "v"
    assert "shared" not in uattrs


def test_defragment_attribute_strategy(spark):
    from nifi_minifi_cpp_spark.operators import merge_content_defragment

    rows = [
        ("u1", "part0", {"fragment.identifier": "f1", "fragment.index": "0",
                          "fragment.count": "2", "src": "fileA", "part": "p0"}),
        ("u2", "part1", {"fragment.identifier": "f1", "fragment.index": "1",
                          "fragment.count": "2", "src": "fileA", "part": "p1"}),
    ]
    ff = spark.createDataFrame(rows, "uuid string, content string, attributes map<string,string>")
    out = merge_content_defragment(ff, attribute_strategy="keep_only_common").first()
    attrs = dict(out["attributes"])
    assert attrs == {"src": "fileA"}  # part conflicts; fragment.* stripped
    assert out["content"] == "part0\npart1"


def test_defragment_null_fragment_id_keeps_attributes(spark):
    """Regression (round 3/4 null-key fixes): fragments with NO
    fragment.identifier group under a null key; both the attribute-map
    outer join and the member-count join inside merged_attribute_maps
    must be null-safe or the bundle comes back with an empty map."""
    from nifi_minifi_cpp_spark.operators import merge_content_defragment

    rows = [
        ("u1", "a", {"fragment.index": "0", "src": "orphan"}),
        ("u2", "b", {"fragment.index": "1", "src": "orphan"}),
    ]
    ff = spark.createDataFrame(rows, "uuid string, content string, attributes map<string,string>")
    out = merge_content_defragment(
        ff, attribute_strategy="keep_only_common", require_complete=False
    ).first()
    assert dict(out["attributes"]) == {"src": "orphan"}
    assert out["content"] == "a\nb"


def test_bin_packing_null_correlation_keeps_attributes(spark):
    """Same regression for the bin-packing path: a missing correlation
    attribute must not strip the merged attribute map."""
    from nifi_minifi_cpp_spark.operators import merge_content_bin_packing

    rows = [
        ("u1", "a", {"env": "prod", "x": "1"}),
        ("u2", "b", {"env": "prod", "x": "2"}),
    ]
    ff = spark.createDataFrame(rows, "uuid string, content string, attributes map<string,string>")
    out = merge_content_bin_packing(
        ff, max_entries=2, correlation_attribute="corr", attribute_strategy="keep_only_common"
    ).first()
    attrs = dict(out["attributes"])
    assert attrs["env"] == "prod"  # common across members -> kept
    assert "x" not in attrs  # conflicting -> dropped


def test_sliding_and_session_windows(spark, tables):
    """Sliding: each event lands in duration/slide windows; session:
    gap-based grouping equals the manual lag/cumsum sessionization."""
    from nifi_minifi_cpp_spark.operators import session_window_agg, sliding_window_agg

    ev = tables["events"].limit(2000)
    n = ev.count()
    slid = sliding_window_agg(ev, duration="1 hour", slide="30 minutes")
    # every event is in exactly 2 overlapping hourly windows
    assert slid.agg(F.sum("n")).first()[0] == 2 * n
    sess = session_window_agg(ev, gap="10 minutes", group_by=["user_id"])
    total = sess.agg(F.sum("n")).first()[0]
    assert total == n


def test_cohort_retention_matrix(spark):
    """r10 continuation: first-seen day buckets users; later-day
    activity lands in the right (cohort, day_offset) cell."""
    import datetime as dt

    from nifi_minifi_cpp_spark.operators.window import cohort_retention

    d0 = dt.datetime(2024, 1, 1, 9, 0)
    d1 = dt.datetime(2024, 1, 2, 9, 0)
    d2 = dt.datetime(2024, 1, 3, 9, 0)
    rows = [
        (1, d0), (1, d1), (1, d2),   # day-0 cohort, back on days 1 and 2
        (2, d0), (2, d2),            # day-0 cohort, back on day 2
        (3, d1),                     # day-1 cohort, never back
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort"].day, r["day_offset"]): r["n_users"]
        for r in cohort_retention(df, bucket="day").collect()
    }
    assert got[(1, 0)] == 2 and got[(1, 1)] == 1 and got[(1, 2)] == 2
    assert got[(2, 0)] == 1 and (2, 1) not in got


def test_funnel_conversion_strict_order(spark):
    """r10 continuation: funnel counts only users whose steps occur in
    strict first-touch order."""
    import datetime as dt

    from nifi_minifi_cpp_spark.operators.window import funnel_conversion

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: full ordered funnel
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2: clicked BEFORE first view, never clicked after -> stops at view
        (2, "click", t(0)), (2, "view", t(1)), (2, "purchase", t(2)),
        # user 3: view+click, no purchase
        (3, "view", t(0)), (3, "click", t(5)),
        # user 4: purchase before click -> stops at click
        (4, "view", t(0)), (4, "purchase", t(1)), (4, "click", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r["n_users"] for r in
           funnel_conversion(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 3, "purchase": 1}
