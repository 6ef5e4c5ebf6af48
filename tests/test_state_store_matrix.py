"""State-store provider matrix (VERDICT r11 #5): every stateful
streaming shape the engine ships must produce IDENTICAL results under
both in-box state store providers —

- RocksDBStateStoreProvider (the engine session default,
  session.py:67 — the 100 TB choice: state off-heap with changelog
  checkpointing, mirroring the reference's RocksDB repositories at
  /root/reference/extensions/rocksdb-repos/FlowFileRepository.cpp), and
- HDFSBackedStateStoreProvider (Spark's default: every key in executor
  heap — what a user gets if they run the operators in a vanilla
  session without the engine's config).

The provider is picked up at QUERY START from the session conf, so
each case runs the same plan twice with only the conf flipped, on its
own source/checkpoint dirs, and asserts row-set equality. One case
additionally proves the knob takes effect by checking the provider's
on-disk artifact (.changelog/.zip for RocksDB vs .delta for HDFS).

Shapes covered: bin packer (applyInPandasWithState, list state),
defragmenter (buffer state), EWMA scorer (numeric recursive state,
update mode), dropDuplicatesWithinWatermark + complete-mode agg, and
the stream-stream left-outer interval join with watermark timeout.
"""

from __future__ import annotations

import os
import sys
import time
import uuid
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from nifi_minifi_cpp_spark.streaming import sources as src
from nifi_minifi_cpp_spark.streaming import stateful as st

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
PROVIDERS = {"rocksdb": ROCKSDB, "hdfs": HDFS}
_CONF = "spark.sql.streaming.stateStore.providerClass"


def _with_provider(spark, provider: str):
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        prev = spark.conf.get(_CONF)
        spark.conf.set(_CONF, provider)
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            yield
        finally:
            spark.conf.set(_CONF, prev)
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    return _cm()




def _canon(rows) -> list[tuple]:
    return sorted(tuple(r) for r in rows)


def _run_bin_packer(spark, tmp_path, provider: str) -> list[tuple]:
    d = tmp_path / f"bp-{uuid.uuid4().hex[:6]}"
    rows = [(f"k{i % 2}", f"m{i:02d}") for i in range(20)]
    spark.createDataFrame(rows, "correlation string, content string").coalesce(
        1
    ).write.parquet(str(d / "src"))
    stream = src.file_stream(
        spark, str(d / "src"), "correlation string, content string", "parquet"
    )
    # NoTimeout: entries-flushes only, clean availableNow quiesce
    merged = st.merge_content_bin_packing_stream(
        stream, max_entries=4, max_bin_age_ms=None
    )
    view = f"mx_bp_{uuid.uuid4().hex[:8]}"
    with _with_provider(spark, provider):
        q = (
            merged.writeStream.format("memory")
            .queryName(view)
            .outputMode("append")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(90)
        out = _canon(
            spark.sql(
                f"SELECT correlation, content, merge_count, flush_reason FROM {view}"
            ).collect()
        )
    finally:
        q.stop()
    # provider artifact check: the knob must actually take effect
    state_files = []
    for root, _dirs, files in os.walk(str(d / "ckpt" / "state")):
        state_files.extend(files)
    if provider == ROCKSDB:
        assert any(f.endswith((".changelog", ".zip")) for f in state_files), state_files
        assert not any(f.endswith(".delta") for f in state_files), state_files
    else:
        assert any(f.endswith((".delta", ".snapshot")) for f in state_files), state_files
        assert not any(f.endswith(".changelog") for f in state_files), state_files
    return out


def _run_defragmenter(spark, tmp_path, provider: str) -> list[tuple]:
    d = tmp_path / f"df-{uuid.uuid4().hex[:6]}"
    pieces = [
        ("h1", 0, "<START>a"),
        ("h1", 1, "b"),
        ("h1", 2, "<START>c"),
        ("h1", 3, "d"),
        ("h2", 4, "<START>x"),
        ("h2", 5, "y"),
        ("h2", 6, "<START>z"),
    ]
    spark.createDataFrame(pieces, "key string, seq long, content string").orderBy(
        "seq"
    ).coalesce(1).write.parquet(str(d / "src"))
    stream = src.file_stream(
        spark, str(d / "src"), "key string, seq long, content string", "parquet"
    ).select("key", "content")
    frag = st.defragment_text_stream(
        stream, message_start_pattern=r"<START>", max_buffer_age_ms=None
    )
    view = f"mx_df_{uuid.uuid4().hex[:8]}"
    with _with_provider(spark, provider):
        q = (
            frag.writeStream.format("memory")
            .queryName(view)
            .outputMode("append")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(90)
        out = _canon(spark.sql(f"SELECT key, content, n_pieces FROM {view}").collect())
    finally:
        q.stop()
    return out


def _run_ewma(spark, tmp_path, provider: str) -> list[tuple]:
    d = tmp_path / f"ew-{uuid.uuid4().hex[:6]}"
    rows = [
        (uid, i, f"2024-01-01 00:{i:02d}:00", float(v))
        for uid, series in ((1, [10, 10, 500, 10]), (2, [5, 6, 7, 8]))
        for i, v in enumerate(series)
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, value double"
    ).selectExpr(
        "user_id", "event_id", "CAST(ts_s AS timestamp) AS ts", "value"
    ).coalesce(1).write.parquet(str(d / "src"))
    stream = src.file_stream(
        spark,
        str(d / "src"),
        "user_id long, event_id long, ts timestamp, value double",
        "parquet",
    )
    scored = st.ewma_scores_stream(stream, key_col="user_id", alpha=0.25, threshold=100.0)
    view = f"mx_ew_{uuid.uuid4().hex[:8]}"
    with _with_provider(spark, provider):
        q = (
            scored.writeStream.format("memory")
            .queryName(view)
            .outputMode("update")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(90)
        out = _canon(
            spark.sql(
                f"SELECT user_id, n_events, n_anomalies, round(final_ewma, 6) FROM {view}"
            ).collect()
        )
    finally:
        q.stop()
    return out


def _run_dedup_agg(spark, tmp_path, provider: str) -> list[tuple]:
    d = tmp_path / f"dd-{uuid.uuid4().hex[:6]}"
    rows = [
        (i, f"2024-01-01 0{i % 3}:00:00", "a" if i % 2 else "b") for i in range(12)
    ]
    spark.createDataFrame(rows, "event_id long, ts_s string, t string").selectExpr(
        "event_id", "CAST(ts_s AS timestamp) AS ts", "t"
    ).coalesce(1).write.parquet(str(d / "src"))
    schema = "event_id long, ts timestamp, t string"

    def leg():
        return spark.readStream.schema(schema).parquet(str(d / "src"))

    deduped = (
        leg()
        .unionAll(leg())
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    view = f"mx_dd_{uuid.uuid4().hex[:8]}"
    with _with_provider(spark, provider):
        q = (
            agg.writeStream.format("memory")
            .queryName(view)
            .outputMode("complete")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(90)
        out = _canon(spark.sql(f"SELECT t, n FROM {view}").collect())
    finally:
        q.stop()
    return out


def _run_outer_join_timeout(spark, tmp_path, provider: str) -> list[tuple]:
    d = tmp_path / f"oj-{uuid.uuid4().hex[:6]}"
    stage = d / "stage"
    stage.mkdir(parents=True)
    # batch 0: click for user 1; batch 1: purchases for users 1 and 2
    # (u1 matches the click within 30m, u2 never matches); batch 2+3:
    # far-future rows on BOTH streams push the global watermark past
    # u2's purchase so its join state expires and the timeout null row
    # flushes. Deterministic file order via mtimes + maxFilesPerTrigger=1.
    batches = [
        [(100, "2024-01-01 00:00:00", 1, "click")],
        [(1, "2024-01-01 00:10:00", 1, "purchase"), (2, "2024-01-01 00:05:00", 2, "purchase")],
        [(900, "2024-01-01 09:00:00", 9, "click"), (901, "2024-01-01 09:00:00", 9, "purchase")],
        [(910, "2024-01-01 10:00:00", 9, "click"), (911, "2024-01-01 10:00:00", 9, "purchase")],
    ]
    now = time.time()
    for k, rows in enumerate(batches):
        tmp = str(d / f"_b{k}")
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string"
        ).selectExpr(
            "event_id", "CAST(ts_s AS timestamp) AS ts", "user_id", "event_type"
        ).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = str(stage / f"batch-{k:02d}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (now + k, now + k))
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    raw1 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(stage))
    )
    raw2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(stage))
    )
    purch = (
        raw1.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("pu"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", "1 hour")
    )
    clicks = (
        raw2.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("cid"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    j = purch.join(
        clicks,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("cts") <= F.col("pts")),
        "left_outer",
    )
    view = f"mx_oj_{uuid.uuid4().hex[:8]}"
    with _with_provider(spark, provider):
        q = (
            j.select("pid", "cid")
            .writeStream.format("memory")
            .queryName(view)
            .outputMode("append")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(120)
        out = _canon(spark.sql(f"SELECT pid, cid FROM {view}").collect())
    finally:
        q.stop()
    return out


def _run_reservoir(spark, tmp_path, provider: str) -> list[tuple]:
    """r15 (VERDICT r14 #5): the streaming reservoir's O(k) bottom-k
    state rides the same provider matrix as the packer/EWMA — the
    deterministic selection must be byte-identical under RocksDB and
    HDFS state stores. Two source files force a multi-batch run so the
    state actually round-trips through the store between batches."""
    d = tmp_path / f"rs-{uuid.uuid4().hex[:6]}"
    rows = [(f"s{i % 2}", i) for i in range(40)]
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], "source string, doc_id long").coalesce(1).write.parquet(
        str(d / "src")
    )
    spark.createDataFrame(rows[half:], "source string, doc_id long").coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "src"))
    stream = (
        spark.readStream.schema("source string, doc_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "src"))
    )
    sampled = st.reservoir_sample_stream(stream, "source", "doc_id", k=5)
    view = f"mx_rs_{uuid.uuid4().hex[:8]}"
    with _with_provider(spark, provider):
        q = (
            sampled.writeStream.format("memory")
            .queryName(view)
            .outputMode("update")
            .option("checkpointLocation", str(d / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(90)
        # each key's FINAL emission (max n_seen) is the reservoir
        out = _canon(
            spark.sql(
                f"""
                SELECT key, member, rk FROM (
                  SELECT *, max(n_seen) OVER (PARTITION BY key) AS mx
                  FROM {view}) WHERE n_seen = mx
                """
            ).collect()
        )
    finally:
        q.stop()
    return out


_SHAPES = {
    "bin_packer": _run_bin_packer,
    "defragmenter": _run_defragmenter,
    "ewma": _run_ewma,
    "dedup_agg": _run_dedup_agg,
    "outer_join_timeout": _run_outer_join_timeout,
    "reservoir": _run_reservoir,
}


@pytest.mark.parametrize("shape", sorted(_SHAPES))
def test_provider_independence(spark, tmp_path, shape):
    runner = _SHAPES[shape]
    results = {
        name: runner(spark, tmp_path, provider)
        for name, provider in PROVIDERS.items()
    }
    assert results["rocksdb"], f"{shape}: empty result under rocksdb"
    assert results["rocksdb"] == results["hdfs"], (
        f"{shape}: provider-dependent results\nrocksdb={results['rocksdb']}\n"
        f"hdfs={results['hdfs']}"
    )
    # shape-level sanity so an all-empty-but-equal pair can't pass
    if shape == "bin_packer":
        assert len(results["rocksdb"]) == 4  # 4 full entries-flushes
        assert all(r[2] == 4 and r[3] == "entries" for r in results["rocksdb"])
    elif shape == "defragmenter":
        # h1 completes one message (<START>a + b) when <START>c opens
        # the next buffer; h2 likewise
        contents = {r[1] for r in results["rocksdb"]}
        assert "<START>a\nb" in "".join(contents) or any(
            "a" in c and "b" in c for c in contents
        )
    elif shape == "ewma":
        by_user = {r[0]: r for r in results["rocksdb"]}
        assert by_user[1][2] >= 1  # the 500 spike is an anomaly
        assert by_user[2][2] == 0
    elif shape == "dedup_agg":
        assert dict(results["rocksdb"]) == {"a": 6, "b": 6}
    elif shape == "outer_join_timeout":
        by_pid = {}
        for pid, cid in results["rocksdb"]:
            by_pid.setdefault(pid, []).append(cid)
        assert by_pid.get(1) == [100]  # matched pair
        assert by_pid.get(2) == [None]  # timeout null emitted
    elif shape == "reservoir":
        import hashlib

        by_key = {}
        for key, member, rk in results["rocksdb"]:
            by_key.setdefault(key, []).append((rk, member))
        # exactly k=5 per key, and the selection is the batch/SQL
        # bottom-k over md5(member) — not an arbitrary 5
        for key in ("s0", "s1"):
            members = [i for i in range(40) if f"s{i % 2}" == key]
            expect = sorted(
                (hashlib.md5(str(m).encode()).hexdigest(), str(m)) for m in members
            )[:5]
            assert sorted(by_key[key]) == expect, key
