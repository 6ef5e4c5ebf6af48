"""Layout, mining, windows, streaming joins, data-quality relational pack.

Mechanical split of entry_queries.py (r13): registrations 175..201
in original definition order; no semantic change.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import (  # noqa: F401
    _register,
    _t,
    _REGISTRY,
    _REGISTRATION_ORDER,
    _cents,
    _PROCFS_FIXTURE,
    _FakeOpcServer,
    _FakeKvStore,
    _FakeRemoteFs,
    _FakeModbusDevice,
    _stage_text_atomic,
    _stream_events_stage,
    _pinned_shuffle,
    _poll_stream_rows,
    _await_self_termination,
    _INJECT_N,
    _INJECT_OFFSET,
    _with_injected_dups,
    _dedup_invariant_report,
    _DEDUP_INVARIANT_ORACLE,
    _EMBEDDING_DEDUP_ORACLE,
    _append_host_info_oracle,
    _language_id_oracle_sql,
    _GOPHER_STOPWORDS_SQL,
    _messy_urls,
    _ZORDER_ORACLE_KEY,
    _PROFILE_COLS,
    _PROFILE_ORACLE,
    _supplier_part_edges,
    _bpe_oracle_sql,
    _kmeans_oracle_sql,
    _kmeans_quality_oracle_sql,
    _bpe_tokenize_oracle_sql,
    _hilbert_oracle_sql,
    _minhash_seed_constants,
    _minhash_eval_oracle,
    _lttb_oracle_sql,
    _holt_oracle_sql,
    _zorder_key,
    _zorder_key_sql,
)



@_register(
    "zorder_layout_buckets",
    rf"""
    WITH k AS (
      SELECT ({_ZORDER_ORACLE_KEY}) AS zkey, user_id FROM events)
    SELECT CAST(zkey >> 26 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(zkey) AS BIGINT) AS min_z,
           CAST(max(zkey) AS BIGINT) AS max_z
    FROM k GROUP BY 1
    """,
)
def zorder_layout_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout keys (r10): the lakehouse OPTIMIZE ZORDER
    primitive — a Morton bit-interleave of (user_id, event-time
    seconds) so range-partitioned files cluster BOTH dimensions and
    min/max stats prune scans on either (plans/layout.py). Graded on
    per-z-range bucket stats; the oracle recomputes the identical
    32-term interleave via zorder_key_sql, so the two
    implementations must agree bit-for-bit on every key. The full
    write-side pass (zorder_repartition: repartitionByRange + sorted
    files) is exercised in tests — pure bucket stats grade here."""
    configure(spark)
    ev = _t(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = F.unix_timestamp("ts").bitwiseAND(F.lit(65535))
    keyed = ev.select(_zorder_key(x, y).alias("zkey"), "user_id")
    return keyed.groupBy(F.shiftright("zkey", 26).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("zkey").cast("long").alias("min_z"),
        F.max("zkey").cast("long").alias("max_z"),
    )


@_register(
    "embedding_gram_upper",
    r"""
    WITH e AS (
      SELECT vec_id, unnest(embedding) AS v, unnest(range(len(embedding))) AS i
      FROM embeddings),
    q AS (
      SELECT vec_id, CAST(i AS INT) AS i,
             CAST(floor(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
      FROM e)
    SELECT a.i AS i, b.i AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    """,
)
def embedding_gram_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix X^T X over the embeddings table (r10):
    the one-pass sufficient statistic behind PCA/whitening at corpus
    scale, computed as ONE quantized numpy matmul per partition +
    a d^2-bounded groupBy sum (tree-aggregated gramian — shuffle
    volume independent of row count). Quantization (floor(v*1000+0.5),
    round-half-up) makes every sum exact int64 arithmetic, so the
    engines match bit-for-bit with no float-order traps. The oracle
    pays the naive n*d^2 unnest join — the distributed plan must
    reproduce it exactly."""
    from ..analytics.similarity import gram_matrix_quantized

    emb = _t(spark, sf_dir, "embeddings")
    return gram_matrix_quantized(emb, "embedding", scale=1000)


@_register(
    "scd2_event_type_history",
    r"""
    WITH s AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events WHERE user_id < 300
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (SELECT * FROM s WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
    SELECT user_id, event_id, event_type, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build (r10): per-user event_type change feed
    compacted to validity-stamped versions (valid_from/valid_to/
    is_current) — the CDC-compaction step every incremental lakehouse
    dimension needs (operators/temporal.scd2_history). Both window
    passes share one (user_id, ts, event_id) sort, so the whole build
    is a single exchange. Null-safe change detection; deterministic
    tie-break on event_id."""
    from ..operators.temporal import scd2_history

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 300)
        .select("user_id", "event_id", "ts", "event_type")
    )
    out = scd2_history(ev, ["user_id"], "ts", ["event_type"], tiebreak_col="event_id")
    return out.select(
        "user_id", "event_id", "event_type", "valid_from", "valid_to", "is_current"
    )


@_register(
    "rolling_zscore_flags",
    r"""
    WITH s AS (
      SELECT user_id, event_id, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd,
             count(value) OVER w AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id, round((value - mu) / sd, 4) AS zscore
    FROM s
    WHERE n >= 2 AND sd > 0 AND abs((value - mu) / sd) > 3
    """,
)
def rolling_zscore_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags (r10): each event scored against
    the mean/sample-stddev of its user's 20 PRECEDING events (current
    row excluded), |z| > 3 flagged — the control-chart outlier rule as
    one bounded window pass (operators/temporal.
    rolling_zscore_anomalies). One shuffle on the key, O(lookback)
    state per key, deterministic event_id tie-break."""
    from ..operators.temporal import rolling_zscore_anomalies

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = rolling_zscore_anomalies(
        ev, ["user_id"], "ts", "value", lookback=20, threshold=3.0,
        tiebreak_col="event_id",
    )
    return out.select("user_id", "event_id", "zscore")


@_register(
    "window_function_pack",
    r"""
    SELECT user_id, event_id,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           nth_value(value, 3) OVER wfull AS nth3,
           min(value) OVER wrun AS run_min,
           max(value) OVER wrun AS run_max
    FROM events WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           wfull AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wrun AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function surface in one pass (r10): ntile,
    percent_rank, cume_dist, nth_value over the full-partition frame,
    and running min/max — all six share ONE (user_id, ts, event_id)
    sort, so Catalyst plans a single exchange + sort. percent_rank /
    cume_dist are exact rank ratios (deterministic doubles); the
    event_id tie-break makes every frame engine-stable."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("value", 3).over(wfull).alias("nth3"),
        F.min("value").over(wrun).alias("run_min"),
        F.max("value").over(wrun).alias("run_max"),
    )


@_register(
    "resample_forward_fill",
    r"""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS mn,
             date_trunc('hour', max(ts)) AS mx
      FROM events WHERE user_id < 20 GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS ts
      FROM bounds),
    obs AS (SELECT user_id, ts, value FROM events WHERE user_id < 20)
    SELECT g.user_id, g.ts, o.value AS filled_value
    FROM grid g ASOF LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.ts >= o.ts
    """,
)
def resample_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill (r10): each user's
    irregular event stream is projected onto an hourly grid, every grid
    point carrying the LATEST observation at or before it — the
    gap-filling step before any fixed-step model. Built as the existing
    asof_join operator (union + sort + last-non-null: one shuffle, one
    sort, no per-row scans) over an exploded per-user
    sequence() grid; the oracle uses DuckDB's NATIVE ASOF JOIN, so two
    independent as-of implementations must agree on every boundary
    (equal-timestamp ties included)."""
    from ..operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("_mn"),
        F.date_trunc("hour", F.max("ts")).alias("_mx"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr("interval 1 hour"))
        ).alias("ts"),
    )
    obs = ev.select("user_id", "ts", "value")
    out = asof_join(grid, obs, on="user_id", right_prefix="right_")
    return out.select("user_id", "ts", F.col("right_value").alias("filled_value"))


@_register(
    "quality_percentile_by_source",
    r"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6) AS pr
      FROM documents)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, pr
    FROM ranked WHERE pr >= 0.75
    """,
)
def quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality calibration (r10): rank documents WITHIN
    their source and keep the top quartile — the mixture-balancing
    selection rule (a global threshold over-prunes weak sources;
    per-source percentiles keep every source represented). percent_rank
    ties collapse identically in both engines (rank-based, exact
    rational), so the >= 0.75 gate is deterministic. One window pass,
    one shuffle on source."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars")
    ranked = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )
    return ranked.where(F.col("pr") >= 0.75)


@_register(
    "pagerank_supplier_parts",
    r"""
    WITH e AS (
      SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem
      UNION
      SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM lineitem),
    nodes AS (SELECT DISTINCT src AS n FROM e),
    nn AS (SELECT count(*) AS total FROM nodes),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT n, 1.0::DOUBLE / total AS r FROM nodes CROSS JOIN nn),
    it1 AS (SELECT e.dst AS n, sum(r0.r / deg.d) AS s
            FROM e JOIN r0 ON r0.n = e.src JOIN deg ON deg.src = e.src
            GROUP BY e.dst),
    r1 AS (SELECT nodes.n, 0.15::DOUBLE / nn.total + 0.85::DOUBLE * coalesce(it1.s, 0) AS r
           FROM nodes CROSS JOIN nn LEFT JOIN it1 ON it1.n = nodes.n),
    it2 AS (SELECT e.dst AS n, sum(r1.r / deg.d) AS s
            FROM e JOIN r1 ON r1.n = e.src JOIN deg ON deg.src = e.src
            GROUP BY e.dst),
    r2 AS (SELECT nodes.n, 0.15::DOUBLE / nn.total + 0.85::DOUBLE * coalesce(it2.s, 0) AS r
           FROM nodes CROSS JOIN nn LEFT JOIN it2 ON it2.n = nodes.n),
    it3 AS (SELECT e.dst AS n, sum(r2.r / deg.d) AS s
            FROM e JOIN r2 ON r2.n = e.src JOIN deg ON deg.src = e.src
            GROUP BY e.dst),
    r3 AS (SELECT nodes.n, 0.15::DOUBLE / nn.total + 0.85::DOUBLE * coalesce(it3.s, 0) AS r
           FROM nodes CROSS JOIN nn LEFT JOIN it3 ON it3.n = nodes.n)
    SELECT n AS node, round(r, 6) AS rank FROM r3
    """,
)
def pagerank_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the supplier-part bipartite graph
    (r10): the second iterative-algorithm class next to connected
    components (analytics/graph.pagerank — slim (node, rank) joins,
    one shuffle per iteration, lineage cut every few rounds). Three
    synchronous iterations, damping 0.85, symmetrized edges (no
    dangling mass). The oracle unrolls the same three iterations as
    chained CTEs — both engines must agree on every node's rank to 6
    places.

    Node ids travel as PACKED LONGS (supplier -> 2k, part -> 2k+1)
    through every distinct/join/groupBy — hashing and shuffling 8-byte
    keys instead of variable-length strings halves the iteration cost
    at sf0.1 — and decode to the oracle's 's…'/'p…' labels only in the
    final projection (rank is id-agnostic arithmetic, so the encoding
    cannot change any value)."""
    from ..analytics.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    # symmetric=True: _supplier_part_edges emits both orientations of
    # every edge, so pagerank may take the nodes-from-degrees /
    # no-zero-fill fast path (r17; bit-identical ranks)
    out = pagerank(_supplier_part_edges(li), iterations=3, damping=0.85, symmetric=True)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string"))
    )
    return out.select(label.alias("node"), F.round("rank", 6).alias("rank"))


@_register("table_profile_orders", _PROFILE_ORACLE)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pack (r10): the ANALYZE-TABLE statistics sweep —
    per column: row count, null count, exact distinct count, numeric
    min/max (timestamps as floored epoch seconds, strings numeric-
    null) — in ONE aggregate pass (Catalyst plans the multi-distinct
    via a single expand + partial aggregation; no per-column scans).
    The profile every ingestion pipeline runs before schema-on-read
    commitments."""
    orders = _t(spark, sf_dir, "orders")
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if kind == "ts":
            aggs.append(F.floor(F.min(c).cast("double")).cast("double").alias(f"mn_{c}"))
            aggs.append(F.floor(F.max(c).cast("double")).cast("double").alias(f"mx_{c}"))
        elif kind:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    one = orders.agg(F.count(F.lit(1)).alias("nr"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("nr").cast("long").alias("n_rows"),
                F.col(f"nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                (
                    F.col(f"mn_{c}") if kind else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"mx_{c}") if kind else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c, kind in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select(
        "_r.column_name", "_r.n_rows", "_r.n_nulls", "_r.n_distinct",
        "_r.min_num", "_r.max_num",
    )


@_register(
    "grouping_sets_revenue",
    r"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS + grouping_id (r10): the last multi-dimensional
    aggregation surface next to the graded cube/rollup — explicit set
    lists with the grouping bit-vector disambiguating NULL-as-subtotal
    from NULL-as-value, via the Spark 4 DataFrame groupingSets API
    (one expand + one aggregation, same plan shape as cube)."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum(revenue), 2).alias("revenue"),
    )


@_register(
    "streaming_dedup_counts",
    r"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-scoped streaming deduplication (r10): the events file
    replayed through TWO unioned file streams (every event arrives
    twice) -> withWatermark + dropDuplicatesWithinWatermark on
    event_id -> complete-mode counts. The final state must equal the
    batch per-type counts of the ORIGINAL table — every duplicate
    dropped, no original lost. This is the Structured Streaming dedup
    operator the reference's DetectDuplicate maps to in stream mode
    (hash-cache TTL == watermark horizon); state is bounded by the
    watermark, so a 100 TB/day stream holds only the horizon's ids."""
    import shutil as _shutil
    import uuid as _uuid

    configure(spark)
    stage = _stream_events_stage(spark, sf_dir)
    # the parquet ts is plain timestamp[us]: read it as event time
    # directly, so the 1-hour watermark horizon is real event time
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def leg():
        raw = spark.readStream.schema(schema).parquet(stage)
        return raw.select("event_id", "event_type", F.col("ts").alias("ts_ts"))

    doubled = leg().unionAll(leg())
    deduped = doubled.withWatermark("ts_ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    view = f"stream_dedup_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 4):
        q = (
            agg.writeStream.format("memory")
            .queryName(view)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        _shutil.rmtree(stage, ignore_errors=True)  # memory sink owns the rows now
    return spark.sql(f"SELECT event_type, n FROM {view}")


@_register(
    "sliding_window_counts",
    r"""
    SELECT wstart, event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM (SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS wstart,
                 event_type, value
          FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o))
    GROUP BY wstart, event_type
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (r10): window(ts, '2 hours',
    '1 hour') — every event lands in duration/slide = 2 overlapping
    hour-aligned windows (SURVEY §2.10's sliding upgrade over
    AttributeRollingWindow's per-record window). Catalyst plans the
    window expansion as one generator + one aggregation; the oracle
    materializes the same two window memberships per event with an
    explicit 2-row offset cross join."""
    ev = _t(spark, sf_dir, "events")
    agg = sliding_window_agg(
        ev,
        ts_col="ts",
        duration="2 hours",
        slide="1 hour",
        group_by=["event_type"],
        aggs=[
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        ],
    )
    return agg.select(F.col("window.start").alias("wstart"), "event_type", "n", "total")


@_register(
    "stream_interval_join_pairs",
    r"""
    SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
    GROUP BY c.user_id
    """,
)
def stream_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (r10): purchases paired with the
    same user's clicks at most one hour older, executed NATIVELY by
    Structured Streaming — two watermarked file streams over the same
    events file, inner-joined on the equi-key plus the event-time
    bound (operators/temporal.stream_interval_join). Watermarks on
    BOTH sides let the engine evict click state older than the join
    horizon, so state stays bounded on an unbounded stream; inner
    matches emit as they arrive (no flush wait). The emitted pairs are
    then aggregated in batch from the sink — the final per-user pair
    counts must equal the batch range-join the oracle runs."""
    import shutil as _shutil
    import uuid as _uuid

    configure(spark)
    stage = _stream_events_stage(spark, sf_dir)
    # the parquet ts is plain timestamp[us]: read it as event time
    # directly — exact µs on both engines at the 1-hour join boundary
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def leg(event_type: str, ts_name: str):
        raw = spark.readStream.schema(schema).parquet(stage)
        return raw.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").alias(ts_name)
        )

    from ..operators import stream_interval_join

    purchases = leg("purchase", "ts")
    clicks = leg("click", "ts").withColumnRenamed("ts", "c_ts")
    joined = stream_interval_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="c_ts",
        upper="1 hour",
        left_watermark="1 hour",
        right_watermark="1 hour",
    )
    view = f"stream_ij_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 4):
        q = (
            joined.writeStream.format("memory")
            .queryName(view)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        _shutil.rmtree(stage, ignore_errors=True)  # memory sink owns the rows now
    return spark.sql(
        f"SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs FROM {view} GROUP BY user_id"
    )


@_register(
    "label_propagation_communities",
    r"""
    WITH f AS (SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
               FROM lineitem),
    e AS (SELECT src AS a, dst AS b FROM f UNION SELECT dst, src FROM f),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e),
    c1 AS (SELECT e.a AS node, l0.label, count(*) AS c
           FROM e JOIN l0 ON l0.node = e.b GROUP BY 1, 2),
    l1 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY c DESC, label ASC) AS rn
             FROM c1) WHERE rn = 1),
    c2 AS (SELECT e.a AS node, l1.label, count(*) AS c
           FROM e JOIN l1 ON l1.node = e.b GROUP BY 1, 2),
    l2 AS (SELECT node, label FROM (
             SELECT node, label,
                    row_number() OVER (PARTITION BY node
                                       ORDER BY c DESC, label ASC) AS rn
             FROM c2) WHERE rn = 1)
    SELECT CASE WHEN node % 2 = 0 THEN 's' || (node // 2)
                ELSE 'p' || ((node - 1) // 2) END AS node,
           CASE WHEN label % 2 = 0 THEN 's' || (label // 2)
                ELSE 'p' || ((label - 1) // 2) END AS label
    FROM l2
    """,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label propagation communities (r10): the third
    iterative-algorithm class next to connected components and
    PageRank (analytics/graph.label_propagation — Raghavan et al.
    2007, deterministic min-label tie-break). Two synchronous rounds
    over the supplier-part bipartite graph; unlike min-label
    propagation, mode-label updates only spread a label while it keeps
    winning local majorities, so communities — not components — come
    out. The oracle unrolls both rounds as chained CTEs with the same
    (count DESC, label ASC) top-1 rule.

    Node ids travel as PACKED LONGS (supplier -> 2k, part -> 2k+1)
    through every join/aggregation/window — 8-byte keys instead of
    strings — and BOTH engines break label ties in the same numeric
    order, decoding to the 's…'/'p…' labels only in the final
    projection."""
    from ..analytics.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    out = label_propagation(_supplier_part_edges(li, symmetric=False), iterations=2)

    def _decode(c: str):
        return F.when(
            F.col(c) % 2 == 0,
            F.concat(F.lit("s"), (F.col(c) / 2).cast("long").cast("string")),
        ).otherwise(
            F.concat(F.lit("p"), ((F.col(c) - 1) / 2).cast("long").cast("string"))
        )

    return out.select(_decode("node").alias("node"), _decode("label").alias("label"))


@_register(
    "orders_reconciliation_diff",
    r"""
    WITH r AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT -o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT CASE WHEN r.o_orderkey IS NULL THEN 'only_left'
                WHEN l.o_orderkey IS NULL THEN 'only_right'
                WHEN (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
                  OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice)
                THEN 'changed' ELSE 'equal' END AS status,
           CAST(count(*) AS BIGINT) AS n
    FROM orders l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
    GROUP BY 1
    """,
)
def orders_reconciliation_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (r10): the post-migration/backfill
    data-validation sweep — orders vs a deterministically mutated
    second snapshot (keys % 97 deleted, totalprice bumped on % 101,
    negated-key inserts on % 89), classified per key as equal /
    changed / only_left / only_right with NULL-safe column compares
    (operators/reconcile.reconcile_summary). ONE full-outer equi-join
    on the key plus a codegen projection; the 4-row summary is
    map-side combined. Pre-bucketed snapshots co-locate and skip the
    exchange at 100 TB."""
    from ..operators.reconcile import reconcile_summary

    o = _t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    right = (
        o.filter(key % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(key % 101 == 0, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(o.filter(key % 89 == 0).withColumn("o_orderkey", -key))
    )
    return reconcile_summary(
        o, right, keys=["o_orderkey"], compare_cols=["o_orderstatus", "o_totalprice"]
    )


@_register(
    "salted_join_segment_revenue",
    r"""
    SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (r10): events enriched with the customer
    market segment through scale.salted_join — the big side salted
    into 16 buckets, the dimension replicated per bucket, the join key
    widened to (user_id, salt) so a hot user's rows spread over 16
    reducers instead of one straggler task (the explicit fallback for
    when AQE's skew split can't fire). Row semantics are provably
    identical to the plain join — the oracle IS the plain join."""
    from ..scale import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev.select("user_id", "value"), dim, on="user_id", salt_buckets=16)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@_register(
    "stream_static_enrichment_counts",
    r"""
    SELECT e.event_type, c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrichment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (r10): the canonical streaming
    lookup — an unbounded event stream inner-joined per micro-batch to
    a BROADCAST static dimension (customer segment), then aggregated
    in complete mode. No watermark needed on a stream-static inner
    join (no cross-stream state); the dimension re-broadcasts per
    batch, so at 100 TB/day the stream side never shuffles for the
    join at all."""
    import shutil as _shutil
    import uuid as _uuid

    configure(spark)
    stage = _stream_events_stage(spark, sf_dir)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(stage).select("user_id", "event_type")
    dim = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment"))
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "inner")
    agg = enriched.groupBy("event_type", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    view = f"stream_enrich_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 4):
        q = (
            agg.writeStream.format("memory")
            .queryName(view)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        _shutil.rmtree(stage, ignore_errors=True)  # memory sink owns the rows now
    return spark.sql(f"SELECT event_type, segment, n FROM {view}")


@_register(
    "winsorized_value_stats",
    r"""
    WITH p AS (SELECT event_type,
                      quantile_cont(value, 0.05) AS lo,
                      quantile_cont(value, 0.95) AS hi
               FROM events GROUP BY 1),
    c AS (SELECT e.event_type, least(greatest(e.value, p.lo), p.hi) AS v
          FROM events e JOIN p USING (event_type))
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(avg(v), 4) AS mean_w, round(stddev_samp(v), 4) AS std_w
    FROM c GROUP BY event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics (r10): per-type p05/p95 clamping
    before the mean/stddev — the outlier-trimming pass quality
    pipelines run before thresholding on distribution stats. EXACT
    percentiles (R-7 interpolation, same on both engines — approx
    sketches differ per engine); the per-group bounds come back as ONE
    tiny broadcast joined map-side, so the events table is scanned
    twice but never shuffled for the clamp itself."""
    ev = _t(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clamped = ev.join(F.broadcast(pct), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("v"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("v"), 4).alias("mean_w"),
        F.round(F.stddev_samp("v"), 4).alias("std_w"),
    )


@_register(
    "triangle_count_coorder_parts",
    r"""
    WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (SELECT DISTINCT a.p AS a, b.p AS b
          FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p)
    SELECT (SELECT count(*) FROM (SELECT a FROM e UNION SELECT b FROM e)) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*) FROM e e1
              JOIN e e2 ON e2.a = e1.b
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
)
def triangle_count_coorder_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-order part graph (r10): parts are
    linked when some order contains both; triangles are cliques of
    three mutually co-ordered parts — the clustering-structure metric
    (analytics/graph.triangle_count, compact-forward wedge-join-close,
    every triangle counted once via a<b<c). Per-order pair explosion
    is basket-size-bounded (TPC-H orders hold ≤7 lines; heavy baskets
    get the association-rules cap). The oracle runs the identical
    wedge closure in SQL."""
    from ..analytics.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    pp = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    edges = (
        pp.alias("x")
        .join(pp.alias("y"), "o")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        .distinct()
    )
    out = triangle_count(edges)
    return out.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


@_register(
    "data_quality_checks",
    r"""
    SELECT 'completeness:o_custkey' AS check_name,
           round(CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS metric,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'uniqueness:o_orderkey',
           round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6),
           count(DISTINCT o_orderkey) = count(*)
    FROM orders
    UNION ALL
    SELECT 'domain:o_orderstatus',
           CAST(sum(CASE WHEN o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END) AS DOUBLE),
           sum(CASE WHEN o_orderstatus IS NULL
                    OR o_orderstatus NOT IN ('O', 'F', 'P')
               THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'non_negative:o_totalprice',
           CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                    THEN 1 ELSE 0 END) AS DOUBLE),
           sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
               THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'referential:o_custkey', CAST(count(*) AS DOUBLE), count(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion suite (r10): the Deequ-style validation
    pass before promoting a snapshot (operators/dq.dq_report) —
    completeness, key uniqueness, accepted domain, non-negativity, and
    referential integrity against the customer dimension. The four
    local checks compile into ONE aggregation pass (stack-melted to
    audit rows — a single scan however many checks); the referential
    check is one broadcast-able left-anti join. Output is the long
    (check, metric, passed) audit form the oracle mirrors with
    per-check aggregates."""
    from ..operators.dq import dq_report

    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rep = dq_report(
        o,
        completeness=["o_custkey"],
        unique=["o_orderkey"],
        domain={"o_orderstatus": ["O", "F", "P"]},
        non_negative=["o_totalprice"],
        references=[("o_custkey", cust, "c_custkey")],
    )
    return rep.select(F.col("check").alias("check_name"), "metric", "passed")


@_register(
    "term_distribution_divergence",
    r"""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents),
    sc AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, sum(c) AS t FROM sc GROUP BY 1),
    gl AS (SELECT term, sum(c) AS g FROM sc GROUP BY 1),
    gtot AS (SELECT sum(g) AS gt FROM gl)
    SELECT sc.source,
           round(sum((sc.c / stot.t) * ln((sc.c / stot.t) / (gl.g / gtot.gt))), 6)
             AS kl_vs_global,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM sc JOIN stot USING (source) JOIN gl USING (term) CROSS JOIN gtot
    GROUP BY 1
    """,
)
def term_distribution_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus drift (r10): KL(source term distribution ||
    global term distribution) — the distribution-shift monitor a
    training pipeline runs per feed to catch a source going off-topic
    or degenerate (high KL = the source's unigram mix diverges from
    the pool). Every source term appears in the global distribution by
    construction, so the divergence is finite without smoothing.

    One tokenize pass -> (source, term) counts; source totals come
    back as a tiny broadcast; the global term marginal is one
    re-aggregation of the SAME counts frame (no second scan of the
    text). All log/ratio arithmetic is double on both engines, rounded
    to 6 places."""
    from ..analytics.text_analysis import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    counts = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    stot = counts.groupBy("source").agg(F.sum("c").alias("t"))
    gl = counts.groupBy("term").agg(F.sum("c").alias("g"))
    gtot = gl.agg(F.sum("g").alias("gt"))
    p = F.col("c") / F.col("t")
    q = F.col("g") / F.col("gt")
    return (
        counts.join(F.broadcast(stot), "source")
        .join(gl, "term")
        .crossJoin(F.broadcast(gtot))
        .groupBy("source")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_global"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )


@_register(
    "streaming_upsert_totals",
    r"""
    SELECT event_type, CAST(2 * count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def streaming_upsert_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert sink (r10; r11 partition-pruned per VERDICT
    r10 #6): the CDC-apply pattern — an UPDATE-mode streaming
    aggregation feeding a foreachBatch handler that MERGES each
    micro-batch's changed keys into a KEY-BUCKET-PARTITIONED parquet
    snapshot via ``streaming.upsert.merge_upsert_partitioned``: the
    anti-join reads only the partitions the batch's keys hash into
    (PartitionFilters), and dynamic partition overwrite rewrites only
    those directories — untouched partitions are physically untouched
    (pinned by mtime in tests/test_streaming.py). The fixture forces
    TWO real micro-batches (the events file staged twice,
    maxFilesPerTrigger=1), so the second batch genuinely overwrites
    the first's totals; the final snapshot must equal the doubled
    batch counts. Update mode emits only changed groups per batch —
    at 100 TB/day the sink writes ~batch-sized state, not the world;
    swap the partition rewrite for MERGE INTO on a transactional
    lake table."""
    import shutil
    import tempfile
    import uuid as _uuid

    from ..streaming.upsert import merge_upsert_partitioned, partition_bucket

    configure(spark)
    stage = tempfile.mkdtemp(prefix="stream-upsert-")
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    if os.path.isdir(src):
        names = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        for i, f in enumerate(names):
            os.symlink(os.path.join(src, f), f"{stage}/a-{i:05d}.parquet")
            os.symlink(os.path.join(src, f), f"{stage}/b-{i:05d}.parquet")
        per_trigger = max(1, len(names))
    else:
        os.symlink(src, f"{stage}/a.parquet")
        os.symlink(src, f"{stage}/b.parquet")
        per_trigger = 1
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(stage)
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))

    state_dir = os.path.join(tempfile.mkdtemp(prefix="upsert-state-"), "snapshot")

    def upsert(batch_df, batch_id):
        # update-mode rows are RUNNING totals for keys that changed
        # this batch: override those keys' partitions, leave the rest
        # of the snapshot physically untouched
        merge_upsert_partitioned(
            batch_df.withColumn(
                "part", partition_bucket(F.col("event_type"), 8)
            ),
            state_dir,
            ["event_type"],
            "part",
        )

    ckpt = tempfile.mkdtemp(prefix="upsert-ckpt-")
    with _pinned_shuffle(spark, 4):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .queryName(f"upsert_{_uuid.uuid4().hex[:8]}")
            .start()
        )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    # materialize the (type-cardinality-bounded) snapshot so every
    # fixture dir can be removed before returning
    snap = spark.read.parquet(state_dir).select("event_type", "n")
    rows = snap.collect()
    out = spark.createDataFrame(rows, snap.schema)
    for d in (stage, os.path.dirname(state_dir), ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return out


@_register(
    "benford_digit_profile",
    r"""
    WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                               1, 1) AS BIGINT) AS digit
               FROM orders WHERE o_totalprice >= 1)
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / (SELECT count(*) FROM d), 6) AS observed,
           round(log10(1.0 + 1.0 / digit), 6) AS benford
    FROM d GROUP BY digit
    """,
)
def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit forensics (r10): the fraud/synthetic-data
    screen — observed leading-digit frequencies of o_totalprice next
    to the Benford expectation log10(1 + 1/d). (On TPC-H's uniform
    price model digits 1-4 dominate — exactly the deviation the check
    exists to surface.) floor() before the integer cast on BOTH
    engines: Spark's double->long truncates while DuckDB's CAST
    rounds, and a 9999.5 rounding up would flip its leading digit.
    One aggregation plus a broadcast 1-row total; at 100 TB this is a
    map-side digit histogram."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1).cast("long").alias("digit")
    )
    total = d.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("observed"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford"),
        )
    )


@_register(
    "event_transition_matrix",
    r"""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events)
    SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY event_type), 6) AS p
    FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix (r10): for every user
    timeline, the next-event estimate P(dst | src) from consecutive
    event pairs — the sequence-mining primitive behind next-action
    prediction and anomalous-flow detection (funnels fix the pattern;
    association rules ignore order; this is the full empirical chain).
    ONE sort per user partition (lead window), one aggregation, one
    25-row normalizing window — the timeline sort shuffles each user's
    rows to one partition, the same per-key locality every sessionizer
    here uses. Ties broken by event_id so both engines see one
    deterministic sequence."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    counts = s.groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    norm = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n", F.round(F.col("n") / F.sum("n").over(norm), 6).alias("p")
    )


@_register(
    "time_weighted_value_avg",
    r"""
    WITH s AS (SELECT user_id, value,
                      epoch_us(lead(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id))
                        - epoch_us(ts) AS dt
               FROM events WHERE value IS NOT NULL)
    SELECT user_id, round(sum(value * dt) / sum(dt), 6) AS twa,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM s WHERE dt IS NOT NULL AND dt > 0 GROUP BY 1
    """,
)
def time_weighted_value_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (r10): the TSDB primitive for irregularly
    sampled series — each reading weighted by how long it was current
    (value_i × Δt to the next reading, over the per-user timeline), so
    a burst of samples can't drown a long-held value the way a plain
    mean does. One lead-window sort per user partition; Δt computed as
    EXACT integer µs on both engines (no interval->float conversion),
    deterministic event_id tie-break."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dt"),
    ).filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
    return s.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias("twa"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


@_register(
    "chi2_type_segment_independence",
    r"""
    WITH j AS (SELECT e.event_type AS et, c.c_mktsegment AS seg
               FROM events e JOIN customer c ON e.user_id = c.c_custkey),
    o AS (SELECT et, seg, count(*) AS obs FROM j GROUP BY 1, 2),
    r AS (SELECT et, sum(obs) AS rt FROM o GROUP BY 1),
    cc AS (SELECT seg, sum(obs) AS ct FROM o GROUP BY 1),
    t AS (SELECT sum(obs) AS tt FROM o)
    SELECT round(sum(pow(obs - rt * ct / tt, 2) / (rt * ct / tt)), 6) AS chi2,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM o JOIN r USING (et) JOIN cc USING (seg) CROSS JOIN t
    """,
)
def chi2_type_segment_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (r10): is event type independent
    of the customer's market segment? — the categorical-drift test a
    feature pipeline runs before trusting a segmentation. Observed
    contingency cells vs the rank-1 expectation (row total × column
    total / grand total), summed into the chi-square statistic. The
    cells frame is tiny after the first aggregation, so the marginals
    are broadcast joins; everything upstream is one enrichment join +
    one count aggregation."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("seg")
    )
    o = (
        ev.join(cust, "user_id")
        .groupBy(F.col("event_type").alias("et"), "seg")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    r = o.groupBy("et").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("seg").agg(F.sum("obs").alias("ct"))
    t = o.agg(F.sum("obs").alias("tt"))
    exp = F.col("rt") * F.col("ct") / F.col("tt")
    return (
        o.join(F.broadcast(r), "et")
        .join(F.broadcast(c), "seg")
        .crossJoin(F.broadcast(t))
        .agg(
            F.round(F.sum(F.pow(F.col("obs") - exp, F.lit(2)) / exp), 6).alias("chi2"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
    )


@_register(
    "session_window_stats",
    r"""
    WITH s AS (SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                 THEN 1 ELSE 0 END AS brk
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM s)
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM g GROUP BY user_id, sid
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst-native session windows (r10): session_window(ts, gap)
    — the dynamic-gap sibling of the fixed tumbling/sliding windows
    and the streaming-capable upgrade of the lag/cumsum sessionizer
    (sessionize_users): state merges sessions incrementally instead of
    re-sorting timelines, so an unbounded stream sessionizes with
    watermark-bounded state. Spark's session end is EXCLUSIVE
    (last_event + gap; an event landing exactly on the boundary starts
    a NEW session), so the oracle's break condition is dt >= gap, not
    dt > gap. Batch-mode plan: one aggregation keyed by the session
    window expression — no window-function sort."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "total_value",
    )
