"""Temporal joins Spark lacks as built-ins: as-of join and binned
range join.

The reference has no temporal-join processor; these extend the engine
for event-stream analytics (the pattern behind kdb's aj / DuckDB's
ASOF JOIN / Flink's temporal table join). Both are pure-Catalyst
compositions — no UDFs, no cross joins:

- **as-of join**: the union trick. Tag both sides, union on
  (keys, ts), and take the last non-null right payload ordered by
  time per key — ONE shuffle + sort per key, each row touched once,
  instead of the naive per-left-row range scan (quadratic) or a
  non-equi join (BroadcastNestedLoop at scale).
- **range join**: bin the ranges. Explode each [start, end) interval
  into fixed-width bins, equi-join points on (keys, bin), then filter
  exact containment. Shuffle cost scales with range-width/bin-width
  fan-out, never |left| x |right|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: explicit-bin_width safety valve: more wide ranges than this would
#: be broadcast -> refuse with guidance (auto p90 width bounds the
#: wide tail by construction; a user width does not)
MAX_BROADCAST_WIDE_RANGES = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str | None = None,
    right_prefix: str = "right_",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) sharing the join
    keys; right columns come back ``right_``-prefixed, NULL when no
    prior right row exists. ``tolerance`` (an INTERVAL string like
    ``'10 minutes'``) additionally requires
    ``left.ts - right.ts <= tolerance``.

    Implementation: union both sides tagged, sort per key by
    (ts, side) with the right side FIRST on ties so an equal-timestamp
    right row is visible to the left row (ties lose under ``strict``),
    then ``last(payload, ignorenulls)`` over the preceding window.
    One hash shuffle on the keys + one sort — the plan a hand-written
    merge-as-of would want, with no per-row lookups.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # SQL equi-join semantics: a NULL key matches nothing. Window
    # partitionBy would group NULL-keyed rows of both sides together,
    # so drop NULL-keyed RIGHT rows up front — NULL-keyed left rows
    # then sit in a partition with no right rows and come back
    # unmatched (left-join behavior, same as the DuckDB ASOF oracle).
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    # ts columns ride separately (as _ts / the matched struct's _rts);
    # including them in the payload lists would emit them twice
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rcols = [c for c in right.columns if c not in keys and c != right_ts]

    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    unioned = tagged_l.unionByName(tagged_r)

    # right rows sort before left at equal _ts (side 0 < 1) => a tie is
    # matchable; strict mode instead orders left first so ties are NOT
    # visible in the preceding window
    order = [F.col("_ts"), F.col("_side").asc() if not strict else F.col("_side").desc()]
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    matched = unioned.withColumn(
        "_match",
        F.last(
            F.when(F.col("_side") == 0, F.struct(F.col("_ts").alias("_rts"), *[F.col(f"_r_{c}") for c in rcols])),
            ignorenulls=True,
        ).over(w),
    )
    out = matched.filter(F.col("_side") == 1)
    if tolerance is not None:
        within = F.col("_match._rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn("_match", F.when(within, F.col("_match")))
    sel: list[Column] = [F.col(k) for k in keys]
    sel.append(F.col("_ts").alias(left_ts))
    sel += [F.col(f"_l_{c}").alias(c) for c in lcols]
    sel.append(F.col("_match._rts").alias(f"{right_prefix}{right_ts}"))
    sel += [F.col(f"_match._r_{c}").alias(f"{right_prefix}{c}") for c in rcols]
    return out.select(*sel)


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | list[str] | None = None,
    bin_width: float | None = None,
    how: str = "inner",
    max_bins_per_range: int = 256,
) -> DataFrame:
    """Join each point row to every range row with
    ``start <= point < end`` (plus optional equi-keys ``on``).

    Scale path: ranges explode into ``bin_width``-sized bins, points
    map to their bin, and the join is a plain equi-join on
    (keys, bin) with an exact containment filter after — Catalyst
    gets a hash join instead of the BroadcastNestedLoop a raw
    inequality join would produce. Numeric or timestamp columns both
    work (timestamps bin via epoch seconds).

    Skew guards (heavy-tailed range widths):

    - ``bin_width`` defaults to the p90 range width (one cheap
      ``percentile_approx``), not the mean — a single huge range can
      drag the mean down-up arbitrarily, and a mean-sized bin makes
      that range fan out ``width/mean`` rows.
    - Any range still spanning more than ``max_bins_per_range`` bins is
      EXCLUDED from the explode and routed through a broadcast
      inequality join instead: per-row fan-out is hard-capped, and the
      oversized stragglers (by construction a vanishing fraction: wider
      than ``max_bins_per_range x p90``) ship to every executor as a
      small broadcast table. The union of both paths is exact.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    is_ts = str(points.schema[point_col].dataType).lower().startswith("timestamp")
    if how != "inner":
        raise ValueError("range_join supports how='inner' (outer semantics don't compose with binning)")

    def scalar(c: Column) -> Column:
        return F.unix_micros(c) / 1_000_000.0 if is_ts else c.cast("double")

    explicit_width = bin_width is not None
    if bin_width is None:
        row = ranges.agg(
            F.percentile_approx(scalar(F.col(end_col)) - scalar(F.col(start_col)), 0.9)
        ).first()
        # empty ranges frame -> percentile NULL -> any width works
        # (join is empty); all-zero widths -> fall back to 1.0
        bin_width = float(row[0]) if row is not None and row[0] else 1.0

    n_bins = (
        F.floor(scalar(F.col(end_col)) / bin_width)
        - F.floor(scalar(F.col(start_col)) / bin_width)
        + 1
    )
    narrow = ranges.filter(n_bins <= max_bins_per_range)
    wide = ranges.filter(n_bins > max_bins_per_range)
    if explicit_width:
        # With the AUTO p90 width, "wide" is by construction the
        # extreme tail (wider than max_bins_per_range x p90). A
        # user-supplied width has no such bound — an hour-wide range
        # set with bin_width=1.0 would classify EVERYTHING wide and
        # broadcast the whole ranges table (OOM). One cheap count
        # (slim projection over the smaller input) guards that; the
        # auto path stays lazy-after-the-percentile.
        n_wide = wide.select(start_col).limit(MAX_BROADCAST_WIDE_RANGES + 1).count()
        if n_wide > MAX_BROADCAST_WIDE_RANGES:
            raise ValueError(
                f"range_join: over {MAX_BROADCAST_WIDE_RANGES} ranges exceed max_bins_per_range="
                f"{max_bins_per_range} at bin_width={bin_width} and would all "
                "be broadcast — raise bin_width (or max_bins_per_range), or "
                "pass bin_width=None for the p90 auto width"
            )

    rb = narrow.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(scalar(F.col(start_col)) / bin_width),
                F.floor(scalar(F.col(end_col)) / bin_width),
            )
        ),
    )
    pb = points.withColumn("_bin", F.floor(scalar(F.col(point_col)) / bin_width))
    cond = pb["_bin"] == rb["_bin"]
    for k in keys:
        cond = cond & (pb[k] == rb[k])
    contain = (rb[start_col] <= pb[point_col]) & (pb[point_col] < rb[end_col])
    joined = pb.join(rb, cond, "inner").filter(contain)
    for c in [pb["_bin"], rb["_bin"]] + [rb[k] for k in keys]:
        joined = joined.drop(c)

    # oversized-range path: broadcast the (rare) stragglers and join on
    # keys + containment — a broadcast hash join when equi-keys exist,
    # else a BroadcastNestedLoop over a deliberately tiny build side
    wcond = (wide[start_col] <= points[point_col]) & (points[point_col] < wide[end_col])
    for k in keys:
        wcond = wcond & (points[k] == wide[k])
    wjoined = points.join(F.broadcast(wide), wcond, "inner")
    for k in keys:
        wjoined = wjoined.drop(wide[k])
    return joined.unionByName(wjoined.select(*joined.columns))


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    right_prefix: str = "right_",
) -> DataFrame:
    """Stream-stream interval join — the streaming form of
    :func:`range_join`: pair each left row with right rows satisfying
    ``right.ts <= left.ts < right.ts + upper`` on the equi-keys.

    Structured Streaming executes this natively when BOTH sides carry
    watermarks and the join condition bounds both event-time columns —
    the watermarks let the engine drop right-side state older than
    ``left watermark + upper``, so state stays bounded at any scale
    (the cross-stream analog of the reference's bounded
    correlation/merge windows). Right columns come back prefixed to
    avoid collisions.
    """
    keys = [on] if isinstance(on, str) else list(on)
    r = right
    for c in right.columns:
        if c not in keys:
            r = r.withColumnRenamed(c, f"{right_prefix}{c}")
    rts = f"{right_prefix}{right_ts}"
    lw = left.withWatermark(left_ts, left_watermark)
    rw = r.withWatermark(rts, right_watermark)
    cond = None
    for k in keys:
        eq = lw[k] == rw[k]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (F.col(left_ts) >= F.col(rts))
        & (F.col(left_ts) < F.col(rts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, "inner")
    for k in keys:  # drop EVERY right-side key copy, not just the first
        joined = joined.drop(rw[k])
    return joined


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    lookback: int = 20,
    threshold: float = 3.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rolling z-score anomaly detection: per key, each value is scored
    against the mean/sample-stddev of the ``lookback`` PRECEDING
    observations (the current row excluded — no self-masking), and rows
    with |z| > ``threshold`` are flagged. The classic streaming
    outlier rule (control-chart / 3-sigma), expressed as ONE window
    pass.

    Returns the anomalous rows with ``zscore`` (rounded to 4 places)
    attached. Rows whose history has fewer than 2 points or zero
    variance are never flagged (z undefined).

    100 TB shape: one shuffle on the key, one sort per partition, each
    row touched once — the window frame is size-bounded so state is
    O(lookback) per key regardless of history length. Deterministic
    total order: pass ``tiebreak_col`` (e.g. the event id) when ts can
    tie, otherwise equal-ts rows make the frame engine-dependent."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    mu = F.mean(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = (F.col(value_col) - mu) / sd
    return (
        df.withColumn("_z", F.when((n >= 2) & (sd > 0), z))
        .where(F.abs(F.col("_z")) > threshold)
        .withColumn("zscore", F.round("_z", 4))
        .drop("_z")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tracked_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build (Kimball): from a
    raw change feed, keep only rows where any tracked attribute
    DIFFERS from the key's previous observation, then stamp each
    surviving version with ``valid_from`` (its own ts), ``valid_to``
    (the next version's ts, null while current) and ``is_current``.
    The CDC-compaction step every incremental lakehouse table needs.

    100 TB shape: two window passes over the SAME (key, ts) sort —
    Catalyst reuses one shuffle+sort for both lag and lead (same
    partitioning and ordering), so the whole build is one exchange.
    Change detection uses null-safe equality (``eqNullSafe``) so
    NULL -> value and value -> NULL transitions count as changes."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    versions = df.withColumn("_chg", first | changed).where(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def ewma_anomaly_scores(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.25,
    threshold: float = 100.0,
) -> DataFrame:
    """Per-key EWMA smoothing with deviation flags (r11) — the
    recursive sibling of ``rolling_zscore_anomalies``: windowed stats
    look back a fixed count, an exponentially weighted moving average
    folds the WHOLE history (s_i = a*x_i + (1-a)*s_{i-1}, s_0 = x_0),
    the standard low-cost smoother for telemetry/queue-depth streams
    (reference parity: the rolling-window mean family of
    AttributeRollingWindow,
    /root/reference/extensions/standard-processors/processors/
    AttributeRollingWindow.cpp — EWMA is its unbounded-memory-free
    upgrade). An event is anomalous when |x_i - s_{i-1}| > threshold
    (deviation from the smoothed PRIOR, so a level shift flags once
    and re-converges).

    Determinism: the per-key sequence is totally ordered by
    (ts, order_col) via array_sort on structs, and the fold is a
    single left-to-right ``aggregate`` — with ``alpha`` an exact
    binary fraction (0.25 default) every intermediate double is
    bit-identical on any engine or partitioning.

    Returns (key, n_events, n_anomalies, final_ewma). 100 TB shape:
    one groupBy collecting each key's timeline (same per-key-bounded
    contract as the sessionizer; keys are independent and the fold is
    whole-stage codegen — no Python, no window sort)."""
    seq = (
        df.select(
            F.col(key_col),
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_e"),
        )
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list("_e")).alias("_seq"))
    )
    vals = seq.select(
        key_col, F.transform("_seq", lambda e: e["v"]).alias("_vals")
    )
    a = F.lit(float(alpha))
    one_minus = F.lit(1.0 - float(alpha))
    thr = F.lit(float(threshold))
    folded = F.aggregate(
        F.col("_vals"),
        F.struct(
            F.lit(None).cast("double").alias("s"),
            F.lit(0).cast("long").alias("anom"),
        ),
        lambda acc, x: F.struct(
            F.when(acc["s"].isNull(), x)
            .otherwise(a * x + one_minus * acc["s"])
            .alias("s"),
            (
                acc["anom"]
                + F.when(
                    acc["s"].isNotNull() & (F.abs(x - acc["s"]) > thr), 1
                )
                .otherwise(0)
                .cast("long")
            ).alias("anom"),
        ),
    )
    return vals.select(
        key_col,
        F.size("_vals").cast("long").alias("n_events"),
        folded["anom"].alias("n_anomalies"),
        F.round(folded["s"], 6).alias("final_ewma"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Two-sided CUSUM level-shift detection over hourly series (r12;
    Page 1954 — the classic sequential changepoint statistic, the
    sustained-shift complement of the point-outlier flags in
    ``seasonal_anomaly_flags`` / ``rolling_zscore_anomalies``): per
    key, accumulate deviations of the hourly cent-sum from the
    series mean and flag hours where the positive (upward shift) or
    negative (downward shift) accumulator exceeds four mean-hours of
    excess. Slack k = 25% of the mean absorbs noise; everything is
    integer (floor) arithmetic, so both engines agree bit-exactly.

    The recursion ``S_t = max(0, S_{t-1} + d_t)`` is ELIMINATED into
    two window scans via the prefix-min identity

        S_t = P_t - min(0, P_1, ..., P_t),   P_t = sum_{i<=t} d_i

    (running sum minus running min) — so the whole detector is
    hash-agg + two per-key window passes, no fold, no Python, and it
    parallelizes per key at any scale. Returns one summary row per
    key: hours observed, flag counts and maxima both directions, and
    the first flagged hour each way (detection delay), NULL when the
    direction never fires."""
    hourly = (
        df.select(
            F.col(key_col).alias("g"),
            F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("t"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("g", "t")
        .agg(F.sum("cents").alias("y"))
    )
    stats = hourly.groupBy("g").agg(
        F.floor(F.sum("y") / F.count(F.lit(1))).cast("long").alias("tgt"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    j = hourly.join(F.broadcast(stats), "g")
    k = F.floor(F.col("tgt") / 4).cast("long")  # 25% slack, floor (matches // for negative means too)
    h = 4 * F.col("tgt")  # four average hours of cumulative excess
    d_up = F.col("y") - F.col("tgt") - k
    d_dn = F.col("tgt") - F.col("y") - k
    w = Window.partitionBy("g").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # nesting window-over-window is not allowed; stage the prefix sums
    # P first, then take the running min of the staged column
    scored = (
        j.withColumn("p_up", F.sum(d_up).over(w))
        .withColumn("p_dn", F.sum(d_dn).over(w))
        .select(
            "g",
            "t",
            "n_hours",
            h.alias("h"),
            (F.col("p_up") - F.least(F.lit(0), F.min("p_up").over(w))).alias("s_up"),
            (F.col("p_dn") - F.least(F.lit(0), F.min("p_dn").over(w))).alias("s_dn"),
        )
    )
    return scored.groupBy("g", "n_hours").agg(
        F.count(F.when(F.col("s_up") > F.col("h"), 1)).alias("n_up_flags"),
        F.count(F.when(F.col("s_dn") > F.col("h"), 1)).alias("n_dn_flags"),
        F.max("s_up").alias("max_s_up"),
        F.max("s_dn").alias("max_s_dn"),
        F.min(F.when(F.col("s_up") > F.col("h"), F.col("t"))).alias("first_up_hour"),
        F.min(F.when(F.col("s_dn") > F.col("h"), F.col("t"))).alias("first_dn_hour"),
    ).select(
        F.col("g").alias(key_col),
        "n_hours",
        "n_up_flags",
        "n_dn_flags",
        "max_s_up",
        "max_s_dn",
        "first_up_hour",
        "first_dn_hour",
    )


def holt_forecast_errors(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    horizon: int = 6,
) -> DataFrame:
    """Holt double-exponential smoothing backtest (r12; Holt 1957 —
    level + trend, the simplest forecast that beats the seasonal-naive
    baselines in ``forecast_baseline_wape`` on trending series): per
    key, train on the hourly cent-sum series minus the last
    ``horizon`` hours, then score the held-out tail.

    Exactness: alpha = beta = 1/2 with explicit floor after each
    halving, so the recursion

        l_t = floor((y_t + l_{t-1} + b_{t-1}) / 2)
        b_t = floor((l_t - l_{t-1} + b_{t-1}) / 2)

    (init l_1 = y_1, b_1 = y_2 - y_1) stays in exact integers —
    division by 2 of a < 2^52 integer is exact in binary, and floor
    matches floor on any engine. Forecast at horizon s is
    l_T + s * b_T.

    100 TB shape: one hash aggregate to the hourly rollup, one
    per-key bounded array (hours in retention, not input rows), and
    the whole training recursion is ONE Catalyst fold
    (``F.aggregate``) — map-side, zero extra shuffles, no Python.
    The oracle runs the identical recursion as a DuckDB recursive
    CTE. Returns per (key, horizon step): forecast, actual, error."""
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    hourly = (
        df.select(
            F.col(key_col).alias("g"),
            F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("t"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("g", "t")
        .agg(F.sum("cents").alias("y"))
    )
    ser = (
        hourly.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("t", "y"))).alias("arr"))
        .select(
            "g",
            F.transform("arr", lambda e: e["y"]).alias("ys"),
            (F.size("arr") - F.lit(horizon)).cast("int").alias("T"),
        )
        .where(F.col("T") >= 2)
    )
    # stage the training slice BEFORE the fold indexes it (HOF rule)
    ser = ser.select("g", "ys", "T", F.slice("ys", 1, F.col("T")).alias("train"))

    def _upd(acc, y):
        l2 = F.floor((y + acc["l"] + acc["b"]) / 2).cast("long")
        return F.struct(
            l2.alias("l"),
            F.floor((l2 - acc["l"] + acc["b"]) / 2).cast("long").alias("b"),
        )

    init = F.struct(
        F.element_at("train", 1).alias("l"),
        (F.element_at("train", 2) - F.element_at("train", 1)).alias("b"),
    )
    fitted = ser.select(
        "g",
        "ys",
        "T",
        F.aggregate(
            F.slice("train", 2, F.col("T") - 1), init, _upd
        ).alias("st"),
    )
    steps = fitted.select(
        "g",
        "ys",
        "T",
        F.col("st.l").alias("l"),
        F.col("st.b").alias("b"),
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("s"),
    )
    return steps.select(
        F.col("g").alias(key_col),
        F.col("s").cast("long").alias("step"),
        (F.col("l") + F.col("s") * F.col("b")).alias("forecast_cents"),
        F.element_at("ys", (F.col("T") + F.col("s")).cast("int")).alias(
            "actual_cents"
        ),
        (
            F.col("l")
            + F.col("s") * F.col("b")
            - F.element_at("ys", (F.col("T") + F.col("s")).cast("int"))
        ).alias("err_cents"),
    )


def kaplan_meier_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_of_interest: str = "purchase",
) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring (r12; Kaplan &
    Meier 1958 — the product-limit estimator, the correct way to
    measure time-to-conversion when many subjects have NOT converted
    yet): each user enrolls at their first event (cohort = that
    event's type), "dies" at their first ``event_of_interest``
    strictly after enrollment, and is right-CENSORED at the global end
    of observation otherwise — dropping the unconverted (what naive
    conversion-delay averages do) biases the curve optimistic; KM
    keeps them in the risk set exactly as long as they were observed.

    Exactness: durations are integer hours; the risk set n_i at each
    distinct death time is a per-cohort running count (one window
    scan, descending); survival is the integer recursion

        S_i = (S_{i-1} * (n_i - d_i)) DIV n_i,   S_0 = 1_000_000

    in exact parts-per-million (integral DIV keeps it exact where a
    double product would lose bits past 2^52 at n ~ 1e9). The
    censored-at-t convention is the standard one: censoring happens
    AFTER deaths at t, so duration >= t keeps the subject at risk.

    100 TB shape: two hash aggregates to per-user rows, one per-cohort
    window over distinct durations (bounded by the observation window
    in hours, not by users), and the product-limit fold runs over the
    bounded per-cohort death-time array. Returns one row per (cohort,
    death time): n_at_risk, d_deaths, survival_ppm."""
    hour = F.expr(f"unix_micros({ts_col}) DIV 3600000000")
    us = F.expr(f"unix_micros({ts_col})")
    base = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        hour.alias("h"),
        us.alias("t_us"),
    )
    first = base.groupBy("u").agg(
        F.min(F.struct("t_us", "h", "et")).alias("f"),
    )
    first = first.select(
        "u",
        F.col("f.et").alias("cohort"),
        F.col("f.h").alias("h0"),
        F.col("f.t_us").alias("t0_us"),
    )
    deaths = (
        base.where(F.col("et") == event_of_interest)
        .join(first, "u")
        .where(F.col("t_us") > F.col("t0_us"))
        .groupBy("u")
        .agg(F.min("h").alias("hd"))
    )
    cmax = base.agg(F.max("h").alias("hmax"))
    subj = (
        first.join(deaths, "u", "left")
        .crossJoin(F.broadcast(cmax))
        .select(
            "cohort",
            F.coalesce(F.col("hd") - F.col("h0"), F.col("hmax") - F.col("h0")).alias(
                "dur"
            ),
            F.col("hd").isNotNull().cast("long").alias("died"),
        )
    )
    per_dur = subj.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("died").alias("d")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = per_dur.withColumn("n", F.sum("cnt").over(w)).where(F.col("d") > 0)
    ser = risk.groupBy("cohort").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dur").alias("t"), F.col("n"), F.col("d")))
        ).alias("arr")
    )
    def _step(acc, e):
        x = acc["s"] * (e["n"] - e["d"])
        # exact integral division: x is a long, x - x % n is an exact
        # multiple of n <= ~1e15 < 2^53, so the double division is
        # exact where a raw floor(x / n) could mis-round past 2^52
        s2 = ((x - x % e["n"]) / e["n"]).cast("long")
        return F.struct(
            s2.alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        e["t"].cast("long").alias("t"),
                        e["n"].cast("long").alias("n"),
                        e["d"].cast("long").alias("d"),
                        s2.alias("surv"),
                    )
                ),
            ).alias("out"),
        )

    folded = ser.select(
        "cohort",
        F.aggregate(
            F.col("arr"),
            F.struct(
                F.lit(1_000_000).cast("long").alias("s"),
                F.expr(
                    "CAST(array() AS ARRAY<STRUCT<t BIGINT, n BIGINT,"
                    " d BIGINT, surv BIGINT>>)"
                ).alias("out"),
            ),
            _step,
        )["out"].alias("km"),
    )
    return folded.select("cohort", F.explode("km").alias("e")).select(
        "cohort",
        F.col("e.t").alias("t_hours"),
        F.col("e.n").alias("n_at_risk"),
        F.col("e.d").alias("d_deaths"),
        F.col("e.surv").alias("survival_ppm"),
    )


def acf_by_key(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    lags: tuple[int, ...] = (1, 2, 3, 6, 12, 24),
    escalate: bool | None = None,
) -> DataFrame:
    """Autocorrelation function of the hourly series per key (r13;
    Box & Jenkins — the lag-structure diagnostic the seasonal/trend
    entries assume: seasonal_dow_profile fixes a 24h/7d cycle,
    holt_forecast_backtest fixes level+trend; the ACF is what tells a
    user WHICH lags carry signal). Per key: hourly cent-sums on the
    DENSE hour grid [min_hour, max_hour] with silent hours as 0 (the
    signal-processing semantics for event series — a missing hour is
    a zero observation, not a gap to skip), then Pearson r between the
    series and its L-hour shift for each requested lag.

    100 TB shape: the dense grid is |keys| x hours — slim regardless
    of row count (the raw scan reduces map-side to hourly sums
    first); ONE window pass per key materializes all lags via literal
    lag() offsets (no self-join per lag), and each (key, lag)
    correlation folds to six integer sufficient sums in one hash
    aggregate — the mergeable-sums discipline of hourly_trend_by_type.
    Sums run through ``scale.exact_sum``: exact int64 at driver scale,
    DECIMAL(38,0) when ``SPARK_GRAFT_EXPECTED_ROWS`` (or ``escalate``)
    marks the deployment as past the overflow threshold for squared
    hourly cent-sums — bit-equal either way (property-tested), oracle
    unchanged. The float tail (one quotient of square roots, operands
    cast to double explicitly so decimal scale rules never apply) is
    the identical expression in both engines; constant series yield
    NULL via nullif, not a division error."""
    hourly = (
        df.select(
            F.col(key_col).alias("g"),
            F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("t"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .groupBy("g", "t")
        .agg(F.sum("cents").alias("y"))
    )
    bounds = hourly.groupBy("g").agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
    dense = (
        bounds.select("g", F.explode(F.sequence("mn", "mx")).alias("t"))
        .join(hourly, ["g", "t"], "left")
        .select("g", "t", F.coalesce("y", F.lit(0)).alias("y"))
    )
    w = Window.partitionBy("g").orderBy("t")
    # window expressions may not appear inside a generator: stage the
    # lag columns in one window pass, then explode plain references
    lagged = dense.select(
        "g",
        "y",
        *[F.lag("y", lag).over(w).alias(f"_x{lag}") for lag in lags],
    )
    pairs = lagged.select(
        "g",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(lag).alias("lag"), F.col(f"_x{lag}").alias("x"))
                    for lag in lags
                ]
            )
        ).alias("p"),
    ).select("g", F.col("p.lag").alias("lag"), F.col("p.x").alias("x"), "y").where(
        F.col("x").isNotNull()
    )
    from ..scale import exact_sum

    agg = pairs.groupBy("g", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("x"), escalate).alias("sx"),
        exact_sum(F.col("y"), escalate).alias("sy"),
        exact_sum(F.col("x") * F.col("x"), escalate).alias("sxx"),
        exact_sum(F.col("y") * F.col("y"), escalate).alias("syy"),
        exact_sum(F.col("x") * F.col("y"), escalate).alias("sxy"),
    )
    # Pearson-numerator PRODUCTS always in DECIMAL(38,0): sx*sy and
    # n*sxx overflow int64 long before the sums themselves do (r14
    # review finding); this runs on the per-(key,lag) aggregate rows,
    # so the decimal cost is O(groups). Cast to double only AFTER the
    # exact subtraction.
    dec = "decimal(38,0)"

    def _d(c: str):
        return F.col(c).cast(dec)

    num = (_d("n") * _d("sxy") - _d("sx") * _d("sy")).cast("double")
    den = F.sqrt((_d("n") * _d("sxx") - _d("sx") * _d("sx")).cast("double")) * F.sqrt(
        (_d("n") * _d("syy") - _d("sy") * _d("sy")).cast("double")
    )
    return agg.select(
        F.col("g").alias(key_col),
        "lag",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("acf_r"),
    )
