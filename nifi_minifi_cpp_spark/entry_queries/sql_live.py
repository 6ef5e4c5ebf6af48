"""r14 registrations: QueryDatabaseTable incremental scans against a
REAL PostgreSQL server (the v3-wire-protocol loop VERDICT r13 #2 asked
to close) and the reservoir / time-decay sampling operators (r13 #7's
capability-class gaps).

New registrations live in a NEW module imported LAST from
``entry_queries/__init__`` — the rotation contract treats the
registration order as append-only (tests/test_registry_contract.py
derives the never-graded queue from it), so mid-list insertions into
the thematic modules would reorder the queue.

Reference parity targets:
- /root/reference/extensions/sql/processors/QueryDatabaseTable.cpp:35-166
  (max-value watermark polls; the rendered ``WHERE maxcol > :state``)
- /root/reference/extensions/sql/data/MaxCollector.h (per-column maxima
  collected from the fetched rowset, persisted as processor state)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import configure, load_table
from ._shared import (
    _cents,
    _pinned_shuffle,
    _poll_stream_rows,
    _register,
    _stream_events_stage,
    _t,
)


def _pg_poll_summary(df: DataFrame, poll: int, watermark_col: str) -> DataFrame:
    """One summary row per poll: row count, id/type stats, exact-cent
    value sum, and the stamped ``maxvalue.<col>`` watermark attribute
    (cast back to bigint — proving the MaxCollector state landed on
    the batch, QueryDatabaseTable.cpp:150-166)."""
    return df.agg(
        F.lit(poll).cast("long").alias("poll"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("event_id").alias("max_id"),
        F.max(F.col(f"`maxvalue.{watermark_col}`").cast("long")).alias("watermark"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(_cents(F.col("value"))).alias("sum_cents"),
    )


@_register(
    "pg_incremental_two_polls",
    """
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS poll,
             count(*) AS n_rows,
             max(event_id) AS max_id,
             max(event_id) AS watermark,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events WHERE event_id < 2000
      HAVING count(*) > 0
      UNION ALL
      SELECT CAST(2 AS BIGINT),
             count(*),
             max(event_id),
             max(event_id),
             CAST(count(DISTINCT event_type) AS BIGINT),
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      FROM events WHERE event_id >= 2000 AND event_id < 4000
      HAVING count(*) > 0
    ) ORDER BY poll
    """,
)
def pg_incremental_two_polls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryDatabaseTable against a REAL PostgreSQL the entry boots
    (QueryDatabaseTable.cpp:35-166): two max-value watermark polls over
    a growing table. Poll 1 sees the first batch (event_id < 2000) in
    full and persists max(event_id); more rows are INSERTed; poll 2's
    watermark predicate is rendered into the SERVER's WHERE clause
    (``"event_id" > 1999`` — only new rows cross the wire, the O(new)
    incremental contract) and returns exactly the second batch. Both
    batches are stamped with the ``maxvalue.event_id`` attribute the
    reference's MaxCollector writes; the oracle pins counts, maxima,
    watermarks, type cardinality and exact cent sums per poll. The
    writes land via executor-side per-partition wire connections
    (put_sql_pg); the polls are driver-edge rowset fetches, the
    reference's single-SOCI-session model."""
    import tempfile

    from ..sources.pg_wire import EphemeralPostgres, PgWireClient, pg_incremental_scan, put_sql_pg

    configure(spark)
    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    state = os.path.join(tempfile.mkdtemp(prefix="pgincrq_"), "state.json")
    with EphemeralPostgres() as pg:
        c = pg.client()
        c.execute(
            "CREATE TABLE events_inc "
            "(event_id bigint, event_type text, value double precision)"
        )
        c.close()
        port, user = pg.port, pg.user
        factory = lambda: PgWireClient(port=port, user=user)  # noqa: E731
        scan = pg_incremental_scan(factory, "events_inc", ["event_id"], state)

        # poll() returns None for an empty batch (either poll can be
        # empty at exotic SFs) — mirror the oracle's HAVING count(*)>0
        summaries = []
        put_sql_pg(ev.filter(F.col("event_id") < 2000).repartition(4), factory, "events_inc")
        p1 = scan.poll(spark)
        if p1 is not None:
            summaries.append(_pg_poll_summary(p1, 1, "event_id"))

        put_sql_pg(
            ev.filter((F.col("event_id") >= 2000) & (F.col("event_id") < 4000)).repartition(4),
            factory,
            "events_inc",
        )
        p2 = scan.poll(spark)
        if p2 is not None:
            summaries.append(_pg_poll_summary(p2, 2, "event_id"))
    if not summaries:
        return spark.createDataFrame(
            [], "poll long, n_rows long, max_id long, watermark long, n_types long, sum_cents long"
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.orderBy("poll")


@_register(
    "pg_cdc_updated_rows",
    """
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS poll,
             count(*) AS n_rows,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(1 AS BIGINT) AS watermark
      FROM events WHERE event_id < 1500
      HAVING count(*) > 0
      UNION ALL
      SELECT CAST(2 AS BIGINT),
             count(*),
             CAST(sum(CAST(round((value + 1) * 100) AS BIGINT)) AS BIGINT),
             CAST(2 AS BIGINT)
      FROM events WHERE event_id < 1500 AND event_id % 5 = 0
      HAVING count(*) > 0
    ) ORDER BY poll
    """,
)
def pg_cdc_updated_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poll-based CDC against the real PostgreSQL: the change-capture
    shape QueryDatabaseTable supports when the watermark column is a
    VERSION/updated_at column instead of an append-only id — UPDATEs
    bump the version, so the next poll captures exactly the changed
    rows (the reference's max-value semantics are column-agnostic,
    QueryDatabaseTable.cpp:80-116). Poll 1 snapshots the table at
    version 1; the server then UPDATEs every 5th row (version -> 2,
    value -> value + 1, computed server-side in float8 — bit-identical
    to the oracle's DuckDB double arithmetic); poll 2's server-side
    ``WHERE "version" > 1`` fetches only the updated rows. The oracle
    pins both poll summaries including the post-update cent sums."""
    import tempfile

    from ..sources.pg_wire import EphemeralPostgres, PgWireClient, pg_incremental_scan, put_sql_pg

    configure(spark)
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_id", "event_type", "value")
        .filter(F.col("event_id") < 1500)
        .withColumn("version", F.lit(1).cast("long"))
    )
    state = os.path.join(tempfile.mkdtemp(prefix="pgcdcq_"), "state.json")
    with EphemeralPostgres() as pg:
        c = pg.client()
        c.execute(
            "CREATE TABLE cdc_src (event_id bigint, event_type text, "
            "value double precision, version bigint)"
        )
        c.close()
        port, user = pg.port, pg.user
        factory = lambda: PgWireClient(port=port, user=user)  # noqa: E731
        put_sql_pg(ev.repartition(4), factory, "cdc_src")
        scan = pg_incremental_scan(factory, "cdc_src", ["version"], state)

        def summary(df: DataFrame, poll: int) -> DataFrame:
            # the shared poll summary, projected to the CDC columns
            return _pg_poll_summary(df, poll, "version").select(
                "poll", "n_rows", "sum_cents", "watermark"
            )

        # either poll can be empty at exotic SFs (oracle: HAVING)
        summaries = []
        p1 = scan.poll(spark)
        if p1 is not None:
            summaries.append(summary(p1, 1))
        c = pg.client()
        c.execute("UPDATE cdc_src SET version = 2, value = value + 1 WHERE event_id % 5 = 0")
        c.close()
        p2 = scan.poll(spark)
        if p2 is not None:
            summaries.append(summary(p2, 2))
    if not summaries:
        return spark.createDataFrame(
            [], "poll long, n_rows long, sum_cents long, watermark long"
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.orderBy("poll")


@_register(
    "reservoir_sample_events",
    """
    WITH r AS (
      SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS rk
      FROM events WHERE event_id IS NOT NULL
      ORDER BY rk, event_id LIMIT 200)
    SELECT CAST(row_number() OVER (ORDER BY rk, event_id) AS BIGINT) AS pick_order,
           event_id, rk
    FROM r
    """,
)
def reservoir_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reservoir sampling (r14): exactly k = 200 events, each equally
    likely, as a deterministic bottom-k sketch over md5(event_id) —
    the GLOBAL-k complement to the per-stratum quota sampler
    (fixed_size_stratified_sample). Spark's physical plan is
    TakeOrderedAndProject: each partition keeps its local 200 smallest
    ranks and the driver merges — the mergeable-reservoir property,
    no shuffle at any scale. pick_order makes the sample prefix-stable
    (growing k later keeps these rows and their order)."""
    from ..analytics import reservoir_sample

    ev = _t(spark, sf_dir, "events").select("event_id")
    picked = reservoir_sample(ev, F.col("event_id"), 200)
    return picked.select(
        F.row_number().over(Window.orderBy("_rk", "event_id")).cast("long").alias("pick_order"),
        "event_id",
        F.col("_rk").alias("rk"),
    )


@_register(
    "decay_weighted_sample_events",
    """
    WITH d AS (
      SELECT event_id,
             (SELECT max(epoch_us(ts)) // 86400000000 FROM events)
               - epoch_us(ts) // 86400000000 AS age_days
      FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL),
    p AS (
      SELECT event_id, age_days,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
               * (1 + age_days) AS priority
      FROM d ORDER BY priority, event_id LIMIT 200)
    SELECT event_id, CAST(age_days AS BIGINT) AS age_days,
           CAST(priority AS BIGINT) AS priority
    FROM p
    """,
)
def decay_weighted_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed fixed-size sampling (r14): k = 200 events under
    recency weight w = 1/(1 + age_days) via exact-integer weighted
    bottom-k (priority = h48 * (1 + age)) — newer events survive the
    cut proportionally more often, and the all-integer priority makes
    the selection engine-portable where Efraimidis-Spirakis float
    u^(1/w) priorities would flap on pow/ln ulps. age is days behind
    the corpus max day (one broadcast scalar); the bottom-k runs as
    TakeOrderedAndProject — no shuffle at any scale."""
    from ..analytics import decay_weighted_sample

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    )
    max_day = ev.agg(F.max("day").alias("mx"))
    aged = ev.crossJoin(F.broadcast(max_day)).select(
        "event_id", (F.col("mx") - F.col("day")).alias("age_days")
    )
    picked = decay_weighted_sample(aged, F.col("event_id"), F.col("age_days"), 200)
    return picked.select(
        "event_id",
        F.col("age_days").cast("long").alias("age_days"),
        F.col("_prio").cast("long").alias("priority"),
    )


@_register(
    "kafka_group_consume",
    """
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS phase, event_type, count(*) AS n
      FROM events WHERE event_id < 300 GROUP BY event_type
      UNION ALL
      SELECT CAST(2 AS BIGINT), event_type, count(*)
      FROM events WHERE event_id >= 300 AND event_id < 360 GROUP BY event_type
    ) ORDER BY phase, event_type
    """,
)
def kafka_group_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConsumeKafka with a GROUP ID (r14, the consumer-group protocol
    parity row — ConsumeKafka.h:129-241): phase 1, a single member
    joins the group over the wire (FindCoordinator/JoinGroup/SyncGroup),
    is assigned all 3 partitions by the RangeAssignor, consumes 300
    seeded records and COMMITS (CommitAfterBatch). A second member then
    joins: the first member's heartbeat reports the rebalance, both
    rejoin, and the partitions split disjointly. Phase 2 seeds 60 more
    records; each member polls ONLY its assigned partitions, resuming
    from the group's committed offsets — so phase 2 counts are exact
    iff every record is consumed exactly once across the group (a
    double-assigned or double-replayed partition doubles a count and
    the oracle goes red)."""
    from ..sources.kafka_wire import KafkaGroupConsumer, MiniKafkaBroker

    configure(spark)
    rows = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_id") < 360)
        .select("event_id", "event_type")
        .collect()
    )

    def seed(broker, lo: int, hi: int) -> None:
        by_part: dict[int, list] = {0: [], 1: [], 2: []}
        for r in rows:
            if lo <= r["event_id"] < hi:
                by_part[r["event_id"] % 3].append(
                    (1_700_000_000_000 + r["event_id"], None, r["event_type"].encode(), [])
                )
        for p, items in by_part.items():
            if items:
                broker.append("events_g", p, items)

    broker = MiniKafkaBroker().start()
    out_rows: list[tuple[int, str, int]] = []
    try:
        broker.create_topic("events_g", 3)
        seed(broker, 0, 300)
        a = KafkaGroupConsumer(broker.bootstrap, "g_entry", ["events_g"])
        if a.join() != {"events_g": [0, 1, 2]}:
            raise RuntimeError(f"solo member must own every partition: {a.assignment}")
        phase1 = a.poll()
        a.commit()

        b = KafkaGroupConsumer(broker.bootstrap, "g_entry", ["events_g"])
        b.join()
        if not a.ensure_active():  # heartbeat must detect the rebalance
            raise RuntimeError("rebalance not detected by the incumbent")
        pa = set(a.assignment.get("events_g", []))
        pb = set(b.assignment.get("events_g", []))
        if pa | pb != {0, 1, 2} or pa & pb:
            raise RuntimeError(f"assignment not a disjoint cover: {pa} / {pb}")

        seed(broker, 300, 360)
        phase2 = a.poll() + b.poll()
        a.close()
        b.close()
        counts1: dict[str, int] = {}
        for rec in phase1:
            t = rec["value"].decode()
            counts1[t] = counts1.get(t, 0) + 1
        counts2: dict[str, int] = {}
        for rec in phase2:
            t = rec["value"].decode()
            counts2[t] = counts2.get(t, 0) + 1
        out_rows = [(1, t, n) for t, n in counts1.items()] + [
            (2, t, n) for t, n in counts2.items()
        ]
    finally:
        broker.stop()
    return spark.createDataFrame(out_rows, "phase long, event_type string, n long").orderBy(
        "phase", "event_type"
    )


@_register(
    "streaming_reservoir_by_source",
    r"""
    WITH r AS (
      SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS rk,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT source, doc_id, rk FROM r WHERE rn <= 5
    """,
)
def streaming_reservoir_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING reservoir sampling (r14): exactly k = 5 documents per
    source maintained across an unbounded stream by a custom stateful
    operator (applyInPandasWithState, O(k) bottom-k state per key —
    next to the EWMA scorer's numeric state and the bin packer's list
    state). The deterministic bottom-k selection makes streaming and
    batch agree on the EXACT rows — the oracle is plain batch SQL over
    the same table, so this grades the streaming engine's state
    handling, not a weaker rows-only check. Update-mode re-emits each
    key's reservoir every micro-batch; the monotonic n_seen counter
    picks each key's final emission."""
    import shutil as _shutil
    import uuid as _uuid

    from ..streaming.stateful import reservoir_sample_stream

    configure(spark)
    stage = _stream_events_stage(spark, sf_dir, table="documents")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    raw = spark.readStream.schema(schema).parquet(stage)
    sampled = reservoir_sample_stream(raw, "source", "doc_id", k=5)
    view = f"stream_rsv_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 4):
        q = (
            sampled.writeStream.format("memory")
            .queryName(view)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    try:
        if not q.awaitTermination(120):  # timeout => PARTIAL reservoir: fail loudly
            raise RuntimeError("streaming reservoir did not finish within 120s")
    finally:
        q.stop()
        _shutil.rmtree(stage, ignore_errors=True)
    emitted = spark.table(view)
    # keep each key's final emission: the one with the max n_seen
    w = Window.partitionBy("key")
    final = emitted.withColumn("_mx", F.max("n_seen").over(w)).where(
        F.col("n_seen") == F.col("_mx")
    )
    return final.select(
        F.col("key").alias("source"),
        F.col("member").cast("long").alias("doc_id"),
        "rk",
    )


@_register(
    "pg_cdc_stream_counts",
    """
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events WHERE event_id < 1200
      HAVING count(*) > 0
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*),
             CAST(sum(CAST(round((value + 2) * 100) AS BIGINT)) AS BIGINT)
      FROM events WHERE event_id < 1200 AND event_id % 7 = 0
      HAVING count(*) > 0
    ) ORDER BY version
    """,
)
def pg_cdc_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC against the real PostgreSQL (r14, the streaming
    flavor of pg_cdc_updated_rows): ``readStream.format('pgcdc')``
    runs one incremental watermark poll per micro-batch with the
    predicate rendered into the SERVER's WHERE clause. Micro-batch 1
    snapshots the table at version 1 (events with event_id < 1200);
    the server then UPDATEs every 7th row (version -> 2,
    value -> value + 2, float8 server-side — bit-identical to the
    oracle's DuckDB doubles); micro-batch 2 captures exactly the
    updated rows. The streamed union is grouped by version: CDC
    delivers each row once per version it passed through, so a
    re-polled or lost batch skews a count and the oracle goes red."""
    import uuid as _uuid

    from ..sources.pg_wire import EphemeralPostgres, PgWireClient, put_sql_pg, register_pgcdc

    configure(spark)
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_id", "event_type", "value")
        .filter(F.col("event_id") < 1200)
        .withColumn("version", F.lit(1).cast("long"))
    )
    with EphemeralPostgres() as pg:
        c = pg.client()
        c.execute(
            "CREATE TABLE cdc_stream_src (event_id bigint, event_type text, "
            "value double precision, version bigint)"
        )
        c.close()
        port, user = pg.port, pg.user
        put_sql_pg(
            ev.repartition(4), lambda: PgWireClient(port=port, user=user), "cdc_stream_src"
        )
        register_pgcdc(spark)
        view = f"pgcdc_{_uuid.uuid4().hex[:8]}"
        stream = (
            spark.readStream.format("pgcdc")
            .option("port", str(port))
            .option("user", user)
            .option("table", "cdc_stream_src")
            .option("watermark", "version")
            .option("columns", "event_id,event_type,value,version")
            .option("schema", "event_id long, event_type string, value double, version long")
            .load()
        )
        with _pinned_shuffle(spark, 2):
            q = (
                stream.writeStream.format("memory")
                .queryName(view)
                .outputMode("append")
                .start()
            )
        try:
            q.processAllAvailable()  # micro-batch 1: the v1 snapshot
            c = pg.client()
            c.execute(
                "UPDATE cdc_stream_src SET version = 2, value = value + 2 "
                "WHERE event_id % 7 = 0"
            )
            c.close()
            q.processAllAvailable()  # micro-batch 2: the updated rows
            out = (
                spark.table(view)
                .groupBy("version")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(_cents(F.col("value"))).alias("sum_cents"),
                )
                .orderBy("version")
                .collect()
            )
        finally:
            q.stop()
    return spark.createDataFrame(
        [(r["version"], r["n_rows"], r["sum_cents"]) for r in out],
        "version long, n_rows long, sum_cents long",
    )


@_register(
    "kafka_stream_group_resume",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events WHERE event_id >= 200 AND event_id < 260
    GROUP BY event_type ORDER BY event_type
    """,
)
def kafka_stream_group_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConsumeKafka STREAM seeded from the consumer group's committed
    offsets (r15, VERDICT r14 #4 — ConsumeKafka.h:129-132 Group ID with
    librdkafka's committed-beats-auto.offset.reset contract): phase A
    seeds 200 records into a 2-partition topic and a wire
    ``KafkaGroupConsumer`` consumes ALL of them and COMMITS
    (generation-fenced OffsetCommit). Phase B seeds 60 more, then a
    STREAM starts via the reference property map (Group ID +
    Offset Reset 'earliest'): ``initialOffset`` fetches the group's
    committed offsets and starts THERE — if the group seed were
    ignored, 'earliest' would replay phase A and every count below
    would inflate ~4x (the oracle counts only event_id 200-259, so the
    grade is red on any replay OR any skip). The stream's own batches
    commit back (CommitAfterBatch); Spark's checkpoint stays the
    restart truth — that precedence is pinned by
    tests/test_kafka_wire.py::test_checkpoint_beats_group_commit."""
    import uuid as _uuid

    from ..sources.kafka_wire import KafkaGroupConsumer, MiniKafkaBroker
    from ..streaming.sources import kafka_wire_source

    configure(spark)
    rows = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_id") < 260)
        .select("event_id", "event_type")
        .collect()
    )

    def seed(broker, topic: str, lo: int, hi: int) -> None:
        by_part: dict[int, list] = {0: [], 1: []}
        for r in rows:
            if lo <= r["event_id"] < hi:
                by_part[r["event_id"] % 2].append(
                    (1_700_000_000_000 + r["event_id"], None, r["event_type"].encode(), [])
                )
        for p, items in by_part.items():
            if items:
                broker.append(topic, p, items)

    group = f"g_resume_{_uuid.uuid4().hex[:8]}"
    broker = MiniKafkaBroker().start()
    try:
        topic = f"events_gr_{_uuid.uuid4().hex[:8]}"
        broker.create_topic(topic, 2)
        seed(broker, topic, 0, 200)
        member = KafkaGroupConsumer(broker.bootstrap, group, [topic])
        member.join()
        consumed = member.poll()
        if len(consumed) != 200:
            raise RuntimeError(f"phase A consumed {len(consumed)} != 200")
        member.commit()
        member.close()

        seed(broker, topic, 200, 260)
        stream = kafka_wire_source(
            spark,
            {
                "Kafka Brokers": broker.bootstrap,
                "Topic Names": topic,
                "Offset Reset": "earliest",
                "Group ID": group,
            },
        )
        view = f"kgr_{_uuid.uuid4().hex[:8]}"
        with _pinned_shuffle(spark, 2):
            q = (
                stream.writeStream.format("memory")
                .queryName(view)
                .outputMode("append")
                .start()
            )
        try:
            _poll_stream_rows(spark, q, view, expected=60, expected_input=60)
        finally:
            q.stop()
        return spark.sql(
            f"""
            SELECT CAST(value AS STRING) AS event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM {view} GROUP BY 1 ORDER BY 1
            """
        )
    finally:
        broker.stop()
