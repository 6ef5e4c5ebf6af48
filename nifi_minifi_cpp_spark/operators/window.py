"""AttributeRollingWindow (SURVEY §2.7) + tumbling/sliding upgrades.

The reference's only aggregation operator
(/root/reference/extensions/standard-processors/processors/AttributeRollingWindow.cpp:91-120)
keeps a rolling per-record window over an EL-computed numeric value
and stamps count/sum/mean/median/variance/stddev/min/max on every
FlowFile. Variance is population variance (avg-of-squares − mean²) and
median is the midpoint rule — i.e. ``var_pop``/``percentile(0.5)``.

Spark-first this is a window frame: rangeBetween(-T, 0) for the time
window, rowsBetween(-N+1, 0) for the count window. Partition by a key
column — the reference runs one instance per flow; at 100 TB you want
per-key windows or the single partition serializes everything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROLLING_AGGS = ("count", "value", "mean", "median", "variance", "stddev", "min", "max")


def _agg_columns(value: Column, w) -> list[tuple[str, Column]]:
    return [
        ("rolling.window.count", F.count(value).over(w).cast("double")),
        ("rolling.window.value", F.sum(value).over(w)),
        ("rolling.window.mean", F.avg(value).over(w)),
        ("rolling.window.median", F.percentile(value, F.lit(0.5)).over(w)),
        ("rolling.window.variance", F.var_pop(value).over(w)),
        ("rolling.window.stddev", F.stddev_pop(value).over(w)),
        ("rolling.window.min", F.min(value).over(w)),
        ("rolling.window.max", F.max(value).over(w)),
    ]


def attribute_rolling_window_time(
    df: DataFrame,
    value_col: str | Column,
    ts_col: str = "ts",
    window_seconds: int = 3600,
    partition_by: str | None = None,
) -> DataFrame:
    """Time-window flavor ('Time window' property): stats over rows in
    (ts - window_seconds, ts] per partition key.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = [partition_by] if partition_by else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-(window_seconds - 1), 0)
    )
    out = df
    for name, c in _agg_columns(value.cast("double"), w):
        out = out.withColumn(name, c)
    return out


def attribute_rolling_window_count(
    df: DataFrame,
    value_col: str | Column,
    order_col: str = "ts",
    window_length: int = 10,
    partition_by: str | None = None,
) -> DataFrame:
    """Count-window flavor ('Window length' property): stats over the
    last N rows per partition key.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = [partition_by] if partition_by else []
    w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(-(window_length - 1), 0)
    out = df
    for name, c in _agg_columns(value.cast("double"), w):
        out = out.withColumn(name, c)
    return out


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Catalyst-native tumbling window aggregation (the reference has
    no event-time windows — this is the Spark upgrade path, SURVEY
    §2.10). Usable identically in batch and streaming.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(F.window(F.col(ts_col), duration), *(group_by or [])).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
    group_by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding event-time windows — ``window(ts, duration, slide)``:
    each event lands in duration/slide overlapping windows (SURVEY
    §2.10's sliding upgrade over AttributeRollingWindow's per-record
    rolling). Same call works on a stream with a watermark.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(F.window(F.col(ts_col), duration, slide), *(group_by or [])).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    group_by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows with an inactivity gap —
    ``session_window(ts, gap)``: the engine-native form of the
    sessionization that DefragmentText/sessionize_users express
    manually (SURVEY §2.10 session windows row)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(F.session_window(F.col(ts_col), gap), *(group_by or [])).agg(*aggs)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Cohort retention matrix (r10 continuation): users grouped by the
    period of their FIRST event; for each later period offset, how many
    of that cohort came back — the standard engagement rollup every
    product-analytics stack ships (Mixpanel/Amplitude shape).

    Scale shape: first-seen is a slim (user, min ts) aggregate; the
    activity set is distinct (user, period) pairs; one equi-join on
    user (AQE broadcasts the cohort side when it fits) and a final
    count per (cohort, offset) cell. Everything is timestamps and
    integer counts — no float aggregation anywhere. At 100 TB the
    (user, period) distinct is the only wide shuffle, and it's the
    minimal one: the matrix itself is bounded by periods^2."""
    first_seen = df.groupBy(user_col).agg(
        F.date_trunc(bucket, F.min(ts_col)).alias("_cohort")
    )
    active = df.select(
        F.col(user_col), F.date_trunc(bucket, F.col(ts_col)).alias("_period")
    ).distinct()
    unit = {"day": 86400, "hour": 3600, "week": 604800}[bucket]
    return (
        active.join(first_seen, user_col)
        .select(
            "_cohort",
            ((F.unix_timestamp("_period") - F.unix_timestamp("_cohort")) / unit)
            .cast("long")
            .alias("day_offset"),
            F.col(user_col),
        )
        .groupBy("_cohort", "day_offset")
        .agg(F.count_distinct(user_col).cast("long").alias("n_users"))
        .select(F.col("_cohort").alias("cohort"), "day_offset", "n_users")
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion (r10 continuation): how many users
    performed step1, then step2 STRICTLY AFTER their first step1, then
    step3 after that, ... — the product-analytics sequence query
    (first-touch semantics: each step anchors at the EARLIEST
    qualifying occurrence, the standard funnel definition).

    Scale shape: one slim (user, ts) min-aggregate per step, chained by
    equi-joins on user — len(steps) skinny shuffles, never a per-user
    event array in memory (the HOF-over-collect_list alternative holds
    a user's whole history in one row; power users break that at
    100 TB). Returns (step_index, step, n_users)."""
    slim = df.select(F.col(user_col).alias("_u"), F.col(type_col).alias("_t"), F.col(ts_col).alias("_ts"))
    reached = None
    counts = []
    for i, step in enumerate(steps):
        ev = slim.where(F.col("_t") == step)
        if reached is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_anchor"))
        else:
            cur = (
                ev.join(reached, "_u")
                .where(F.col("_ts") > F.col("_anchor"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_next"))
                .withColumnRenamed("_next", "_anchor")
            )
        reached = cur
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(i + 1).cast("long").alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def m4_downsample(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    bucket: str = "1 hour",
    keys: list[str] | None = None,
) -> DataFrame:
    """M4 time-series downsampling (Jugel et al. 2014, "M4: A
    Visualization-Oriented Time Series Data Aggregation", VLDB) — per
    time bucket keep exactly the four values a pixel column can show:
    min, max, first, last (plus the point count). The canonical
    lossless-for-rendering reduction of an arbitrarily dense series
    before it leaves the cluster (the reference's rolling-window
    attribute family feeds dashboards the same way).

    first/last tie-break deterministically on (ts, order_col) via
    min_by/max_by over a struct ordering key. One hash aggregate —
    map-side partial, no sort, no window function; output is
    4+1 values per bucket per key regardless of input density."""
    ks = list(keys or [])
    ordk = F.struct(F.col(ts_col).alias("t"), F.col(order_col).alias("o"))
    agg = df.groupBy(F.window(ts_col, bucket).alias("_w"), *ks).agg(
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.min_by(F.col(value_col), ordk).alias("v_first"),
        F.max_by(F.col(value_col), ordk).alias("v_last"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    return agg.select(
        F.col("_w.start").alias("bucket_start"),
        *ks,
        "v_min",
        "v_max",
        "v_first",
        "v_last",
        "n_points",
    )


def lttb_downsample(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "event_type",
    n_out: int = 12,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (r12; Steinarsson
    2013, the standard shape-preserving series reduction next to M4's
    pixel-exact one — Grafana/Influx default): keep the first and last
    point, split the interior into ``n_out - 2`` buckets, and in each
    bucket keep the point forming the LARGEST triangle with the
    previously kept point and the NEXT bucket's centroid.

    Exactness: the series is the per-hour integer-cent sum (per-value
    round to cents, then integer sums), and the triangle comparison is
    the cross-product area scaled by the next-bucket count — pure
    int64 arithmetic, so the argmax is bit-deterministic on any
    engine; ties break toward the earlier point.

    100 TB shape: ONE hash aggregate to the hourly rollup, ONE
    per-group sorted-array agg (bounded by hours-in-retention, not by
    input rows), then the whole sequential LTTB loop is a single
    Catalyst fold (``F.aggregate`` over the bucket index) — map-side,
    zero extra shuffles, no Python. The series/bounds arrays are
    staged as columns BEFORE the lambdas index them (the HOF-inlining
    rule: inlined array-building expressions get re-expanded per
    lambda reference).
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    k = n_out - 2
    hourly = (
        df.select(
            F.col(group_col).alias("g"),
            F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("t"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("g", "t")
        .agg(F.sum("cents").alias("y"))
    )
    ser = (
        hourly.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("t", "y"))).alias("arr"))
        .select("g", "arr", F.size("arr").cast("long").alias("L"))
        .where(F.col("L") >= n_out)
    )
    # stage bucket boundaries: bounds[i] = 1 + floor(i*(L-2)/k) for
    # i in 0..k (bounds[k] = L-1), plus the sentinel L so the "next
    # anchor" of the last interior bucket is exactly the last point
    staged = ser.select(
        "g",
        "arr",
        "L",
        F.concat(
            F.transform(
                F.sequence(F.lit(0), F.lit(k)),
                lambda i: (
                    F.lit(1)
                    + F.floor(i.cast("long") * (F.col("L") - 2) / F.lit(k)).cast("long")
                ),
            ),
            F.array(F.col("L")),
        ).alias("bounds"),
    )

    def _step(acc, i):
        arr, bounds = F.col("arr"), F.col("bounds")
        lo = F.element_at(bounds, i + 1)
        hi = F.element_at(bounds, i + 2)
        hi2 = F.element_at(bounds, i + 3)
        cur = F.slice(arr, lo + 1, hi - lo)
        nxt = F.slice(arr, hi + 1, hi2 - hi)
        c = F.size(nxt).cast("long")
        nts = F.aggregate(nxt, F.lit(0).cast("long"), lambda a, x: a + x["t"])
        nys = F.aggregate(nxt, F.lit(0).cast("long"), lambda a, x: a + x["y"])
        prev = F.element_at(acc, -1)
        pt, py = prev["t"], prev["y"]
        best = F.array_max(
            F.transform(
                cur,
                lambda p: F.struct(
                    F.abs(
                        pt * (p["y"] * c - nys)
                        + p["t"] * (nys - py * c)
                        + nts * (py - p["y"])
                    ).alias("a"),
                    (-p["t"]).alias("negt"),
                    p["y"].alias("y"),
                ),
            )
        )
        chosen = F.struct((-best["negt"]).alias("t"), best["y"].alias("y"))
        return F.concat(acc, F.array(chosen))

    picked = staged.select(
        "g",
        F.concat(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(k - 1)),
                F.array(F.element_at(F.col("arr"), 1)),
                _step,
            ),
            F.array(F.element_at(F.col("arr"), F.col("L").cast("int"))),
        ).alias("sel"),
    )
    return picked.select(
        F.col("g").alias(group_col), F.posexplode("sel").alias("pick_order", "p")
    ).select(
        group_col,
        F.col("pick_order").cast("long").alias("pick_order"),
        F.col("p.t").alias("t_hour"),
        F.col("p.y").alias("y_cents"),
    )
