"""Temporal join operators: as-of join (union trick) and binned range
join — verified against DuckDB's native ASOF JOIN / inequality join."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nifi_minifi_cpp_spark.operators import asof_join, range_join
from nifi_minifi_cpp_spark.session import load_table


def test_asof_join_matches_duckdb(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(errors, clicks, on="user_id", right_prefix="prior_")
    got = sorted(
        (r["event_id"], r["prior_click_id"]) for r in out.collect()
    )

    con = duckdb.connect()
    con.execute(f"create view events as select * from read_parquet('{sf_dir}/events.parquet')")
    oracle = con.execute("""
        SELECT e.event_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
        """).fetchall()
    assert got == sorted((a, b) for a, b in oracle)


def test_asof_join_tolerance_and_strict(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10), "L1")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [
            (1, t0, "old"),
            (1, t0 + dt.timedelta(minutes=10), "tie"),
        ],
        "k int, ts timestamp, rv string",
    )
    # non-strict: the equal-timestamp row wins
    assert asof_join(left, right, on="k").first()["right_rv"] == "tie"
    # strict: ties excluded -> previous row
    assert asof_join(left, right, on="k", strict=True).first()["right_rv"] == "old"
    # tolerance tighter than the gap -> no match
    assert (
        asof_join(left, right, on="k", strict=True, tolerance="5 minutes").first()["right_rv"]
        is None
    )


def test_asof_join_plan_single_shuffle_no_nested_loop(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    l = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    r = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    plan = asof_join(l, r, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    # the union trick is window-based: exactly one hash-partitioning exchange on the key
    assert plan.count("hashpartitioning(user_id") == 1


def test_range_join_matches_inequality_join(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        F.col("event_id").alias("error_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    out = range_join(purchases, errors, "ts", "start_ts", "end_ts", on="user_id")
    got = sorted((r["purchase_id"], r["error_id"]) for r in out.collect())

    con = duckdb.connect()
    con.execute(f"create view events as select * from read_parquet('{sf_dir}/events.parquet')")
    oracle = con.execute("""
        SELECT p.event_id, e.event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON p.user_id = e.user_id
         AND e.ts <= p.ts AND p.ts < e.ts + INTERVAL 30 MINUTE
        """).fetchall()
    assert got == sorted((a, b) for a, b in oracle)
    assert len(got) > 0


def test_range_join_numeric_and_plan(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(100)], "pid int, x double")
    ranges = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 15.0, 16.0), (3, 90.0, 200.0)], "rid int, lo double, hi double"
    )
    out = range_join(points, ranges, "x", "lo", "hi")
    counts = {r["rid"]: 0 for r in ranges.collect()}
    for r in out.collect():
        counts[r["rid"]] += 1
    assert counts == {1: 10, 2: 1, 3: 10}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # narrow path: explode + equi-join (no cartesian anywhere). The
    # oversized-range branch legitimately plans a BroadcastNestedLoop,
    # but its build side is the capped `wide` subset — and when that
    # subset is empty AQE's empty-relation propagation removes the
    # branch (and its second points scan) at runtime.
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    n_bnl = plan.count("BroadcastNestedLoopJoin")
    assert n_bnl <= 1  # only the capped wide-range branch


# -- property-based: agree with a brute-force Python model --------------------


def _brute_asof(left_rows, right_rows, strict=False):
    """O(n*m) reference model: latest right (ts', v) with ts' <= ts
    (< when strict), ties broken toward the largest ts'."""
    out = {}
    for k, lts, lid in left_rows:
        best = None
        for rk, rts, rid in right_rows:
            if rk != k:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if best is None or rts > best[0] or (rts == best[0] and rid > best[1]):
                    best = (rts, rid)
        out[lid] = best[1] if best else None
    return out


def test_asof_join_property_random(spark):
    import random

    rng = random.Random(1234)
    for trial in range(3):
        n_keys = rng.randint(1, 4)
        left_rows = [
            (rng.randrange(n_keys), rng.randrange(50), i) for i in range(rng.randint(1, 30))
        ]
        right_rows = [
            (rng.randrange(n_keys), rng.randrange(50), 1000 + i)
            for i in range(rng.randint(0, 30))
        ]
        # unique (key, ts) on the right so the model's tie-break is well-defined
        seen = set()
        right_rows = [r for r in right_rows if not (r[:2] in seen or seen.add(r[:2]))]
        for strict in (False, True):
            left = spark.createDataFrame(left_rows, "k int, ts int, lid int")
            right = spark.createDataFrame(right_rows, "k int, ts int, rid int")
            got = {
                r["lid"]: r["right_rid"]
                for r in asof_join(left, right, on="k", strict=strict).collect()
            }
            assert got == _brute_asof(left_rows, right_rows, strict), (trial, strict)


def test_range_join_property_random(spark):
    import random

    rng = random.Random(99)
    for trial in range(3):
        points = [(rng.randrange(3), float(rng.randrange(100)), i) for i in range(25)]
        ranges = []
        for i in range(10):
            lo = float(rng.randrange(100))
            ranges.append((rng.randrange(3), lo, lo + rng.randrange(1, 40), 1000 + i))
        expected = sorted(
            (pid, rid)
            for pk, x, pid in points
            for rk, lo, hi, rid in ranges
            if pk == rk and lo <= x < hi
        )
        p = spark.createDataFrame(points, "k int, x double, pid int")
        r = spark.createDataFrame(ranges, "k int, lo double, hi double, rid int")
        got = sorted(
            (row["pid"], row["rid"])
            for row in range_join(p, r, "x", "lo", "hi", on="k").collect()
        )
        assert got == expected, trial


def test_stream_interval_join_matches_batch_range_join(spark, sf_dir, tmp_path):
    """Stream-stream interval join produces the same pairs as the
    batch binned range join over the same data, with bounded state
    (both sides watermarked)."""
    import os

    from nifi_minifi_cpp_spark.operators import stream_interval_join
    from nifi_minifi_cpp_spark.streaming.sources import file_stream

    ev = load_table(spark, "events", sf_dir)
    err_dir, pur_dir = str(tmp_path / "err"), str(tmp_path / "pur")
    ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    ).write.parquet(err_dir)
    ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    ).write.parquet(pur_dir)

    purchases = file_stream(spark, pur_dir, "user_id long, ts timestamp, purchase_id long", "parquet")
    errors = file_stream(spark, err_dir, "user_id long, ts timestamp, error_id long", "parquet")
    joined = stream_interval_join(purchases, errors, on="user_id", upper="30 minutes")
    q = (
        joined.select("purchase_id", "right_error_id")
        .writeStream.format("memory").queryName("interval_out").outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["purchase_id"], r["right_error_id"])
        for r in spark.sql("SELECT * FROM interval_out").collect()
    )

    # batch reference: the binned range join over the same frames
    errors_b = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        F.col("event_id").alias("error_id"),
    )
    purchases_b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    expected = sorted(
        (r["purchase_id"], r["error_id"])
        for r in range_join(purchases_b, errors_b, "ts", "start_ts", "end_ts", on="user_id").collect()
    )
    assert got == expected and len(got) > 0


def test_range_join_empty_ranges(spark):
    points = spark.createDataFrame([(1, 5.0, 1)], "k int, x double, pid int")
    ranges = spark.createDataFrame([], "k int, lo double, hi double, rid int")
    assert range_join(points, ranges, "x", "lo", "hi", on="k").count() == 0


def test_asof_join_null_keys_match_nothing(spark):
    """SQL equi-join semantics: NULL keys never match (the window
    formulation would otherwise pair NULL-keyed rows of both sides)."""
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(None, t0 + _dt.timedelta(minutes=5), "L-null"), (1, t0 + _dt.timedelta(minutes=5), "L-1")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(None, t0, "R-null"), (1, t0, "R-1")], "k int, ts timestamp, rv string"
    )
    got = {r["lv"]: r["right_rv"] for r in asof_join(left, right, on="k").collect()}
    assert got == {"L-null": None, "L-1": "R-1"}


def test_stream_interval_join_multi_key_no_duplicate_columns(spark):
    """Multi-key joins must drop every right-side key copy."""
    from nifi_minifi_cpp_spark.operators import stream_interval_join

    left = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS k1", "value AS k2", "timestamp AS ts", "value AS lv")
    )
    right = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS k1", "value AS k2", "timestamp AS ts", "value AS rv")
    )
    joined = stream_interval_join(left, right, on=["k1", "k2"])
    assert joined.columns.count("k1") == 1 and joined.columns.count("k2") == 1
    assert "right_rv" in joined.columns and "right_ts" in joined.columns


def test_range_join_heavy_tailed_widths(spark):
    """Skew guard: one range 1000x wider than the rest must not blow up
    the explode — auto bin width is p90-based and per-range fan-out is
    capped, with oversized ranges routed through the broadcast path.
    Results verified against a DuckDB inequality join."""
    import random

    rng = random.Random(7)
    points = [(rng.randrange(5), float(rng.randrange(120_000)), i) for i in range(300)]
    ranges = []
    for i in range(40):  # typical ranges: width 1..10
        lo = float(rng.randrange(100_000))
        ranges.append((rng.randrange(5), lo, lo + rng.randrange(1, 10), 1000 + i))
    # the heavy tail: one range ~1000x the typical width per key
    for k in range(3):
        ranges.append((k, 0.0, 110_000.0, 2000 + k))

    p = spark.createDataFrame(points, "k int, x double, pid int")
    r = spark.createDataFrame(ranges, "k int, lo double, hi double, rid int")
    out = range_join(p, r, "x", "lo", "hi", on="k", max_bins_per_range=64)

    con = duckdb.connect()
    con.execute("CREATE TABLE p(k INT, x DOUBLE, pid INT)")
    con.execute("CREATE TABLE r(k INT, lo DOUBLE, hi DOUBLE, rid INT)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", points)
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", ranges)
    oracle = sorted(
        con.sql(
            "SELECT pid, rid FROM p JOIN r ON p.k = r.k AND r.lo <= p.x AND p.x < r.hi"
        ).fetchall()
    )
    got = sorted((row["pid"], row["rid"]) for row in out.collect())
    assert got == oracle
    assert len(got) > 0


def test_range_join_wide_only_ranges(spark):
    """All ranges oversized -> pure broadcast path, still exact."""
    points = spark.createDataFrame(
        [(float(i), i) for i in range(0, 1000, 7)], "x double, pid int"
    )
    ranges = spark.createDataFrame(
        [(0.0, 900.0, 1), (100.0, 999.0, 2)], "lo double, hi double, rid int"
    )
    out = range_join(points, ranges, "x", "lo", "hi", bin_width=1.0, max_bins_per_range=8)
    got = sorted((r["pid"], r["rid"]) for r in out.collect())
    expected = sorted(
        (pid, rid)
        for x, pid in [(float(i), i) for i in range(0, 1000, 7)]
        for lo, hi, rid in [(0.0, 900.0, 1), (100.0, 999.0, 2)]
        if lo <= x < hi
    )
    assert got == expected


def test_range_join_explicit_width_broadcast_guard(spark, monkeypatch):
    """Review r5: a user-supplied bin_width that classifies (almost)
    every range as wide must refuse instead of broadcasting the whole
    ranges table."""
    from nifi_minifi_cpp_spark.operators import temporal

    monkeypatch.setattr(temporal, "MAX_BROADCAST_WIDE_RANGES", 1)
    points = spark.createDataFrame([(5.0, 1)], "x double, pid int")
    ranges = spark.createDataFrame(
        [(0.0, 5000.0, 1), (1.0, 6000.0, 2)], "lo double, hi double, rid int"
    )
    with pytest.raises(ValueError, match="raise bin_width"):
        temporal.range_join(points, ranges, "x", "lo", "hi", bin_width=1.0, max_bins_per_range=8)
    # auto width stays lazy and fine on the same data
    assert temporal.range_join(points, ranges, "x", "lo", "hi").count() == 2


def test_ewma_anomaly_scores_hand_computed(spark):
    """x = [10, 10, 200, 10] with alpha=0.25, threshold=50: s1=10,
    s2=10, dev3=|200-10|=190 -> anomaly, s3=57.5, dev4=|10-57.5|=47.5
    -> not; final s4 = 0.25*10 + 0.75*57.5 = 45.625."""
    import datetime as dt

    from nifi_minifi_cpp_spark.operators.temporal import ewma_anomaly_scores

    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=i), i, x)
        for i, x in enumerate([10.0, 10.0, 200.0, 10.0])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = ewma_anomaly_scores(df, threshold=50.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_events"], r["n_anomalies"], r["final_ewma"]) == (4, 1, 45.625)

    # order invariance: shuffled input, same totals
    df2 = spark.createDataFrame(list(reversed(rows)), df.schema).repartition(5)
    r2 = ewma_anomaly_scores(df2, threshold=50.0).collect()[0]
    assert (r2["n_events"], r2["n_anomalies"], r2["final_ewma"]) == (4, 1, 45.625)


def test_m4_downsample_hand_computed(spark):
    import datetime as dt

    from nifi_minifi_cpp_spark.operators.window import m4_downsample

    b = dt.datetime(2026, 1, 1, 10, 0)
    rows = [
        (1, b + dt.timedelta(minutes=1), 1, 5.0),
        (2, b + dt.timedelta(minutes=2), 2, 1.0),
        (3, b + dt.timedelta(minutes=3), 3, 9.0),
        (4, b + dt.timedelta(minutes=50), 4, 3.0),
        (5, b + dt.timedelta(minutes=70), 5, 7.0),  # next hour
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    got = {
        r["bucket_start"]: (r["v_min"], r["v_max"], r["v_first"], r["v_last"], r["n_points"])
        for r in m4_downsample(df).collect()
    }
    assert got[b] == (1.0, 9.0, 5.0, 3.0, 4)
    assert got[b + dt.timedelta(hours=1)] == (7.0, 7.0, 7.0, 7.0, 1)


def test_hour_bucketing_matches_duckdb_pre_epoch(spark):
    """r14 advice fix (reverting the r13 floor-form change): DuckDB
    1.0.0 integer ``//`` TRUNCATES TOWARD ZERO for bigints — verified
    live below, not assumed — so the oracles' ``epoch_us(ts) //
    3600000000`` puts 1969-12-31 23:30 in hour 0, not hour -1. Spark's
    ``DIV`` also truncates toward zero, so the plain ``unix_micros(ts)
    DIV d`` form agrees with every oracle on pre-epoch timestamps; the
    r13 ``(x - pmod(x, d)) DIV d`` floor form yielded -1 and CREATED a
    divergence. Cross-check both engines on the same pre-epoch input so
    a semantics drift in either engine fails here, not in the driver."""
    import duckdb
    from pyspark.sql import functions as F

    from nifi_minifi_cpp_spark.operators.temporal import acf_by_key

    df = spark.createDataFrame(
        [
            ("x", "1969-12-31 23:30:00", 1.0),  # pre-epoch: hour 0 under trunc
            ("x", "1969-12-31 22:30:00", 3.0),  # pre-epoch: hour -1
            ("x", "1970-01-01 00:30:00", 2.0),  # post-epoch: hour 0
            ("x", "1970-01-01 01:30:00", 4.0),  # post-epoch: hour 1
        ],
        "event_type string, ts_s string, value double",
    ).selectExpr("event_type", "CAST(ts_s AS timestamp) AS ts", "value")
    spark_hours = sorted(
        r["t"]
        for r in df.select(
            F.expr("unix_micros(ts) DIV 3600000000").alias("t")
        ).collect()
    )
    duck_hours = sorted(
        r[0]
        for r in duckdb.sql(
            """
            SELECT epoch_us(ts) // 3600000000
            FROM (VALUES (TIMESTAMP '1969-12-31 23:30:00'),
                         (TIMESTAMP '1969-12-31 22:30:00'),
                         (TIMESTAMP '1970-01-01 00:30:00'),
                         (TIMESTAMP '1970-01-01 01:30:00')) v(ts)
            """
        ).fetchall()
    )
    assert spark_hours == duck_hours == [-1, 0, 0, 1]
    # and an operator built on the bucketing still sees adjacent hours
    rows = {r["lag"]: r for r in acf_by_key(df, lags=(1,)).collect()}
    assert rows[1]["n_pairs"] >= 1
