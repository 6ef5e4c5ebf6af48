"""r16 registrations: oracle grades for the r15 post-close additions
(quote-aware getDelimitedField, replaceFirst backrefs/edge semantics,
GetFile DATA_SIZE property matrix, kafkawire Topic Name Format
'Patterns') plus the two strongest remaining ungraded capability
classes (DefragmentText Max Buffer Age flush, flow-compiled TailFile
rotation through the reference config.yml dialect).

New registrations live in a NEW module imported LAST from
``entry_queries/__init__`` — the rotation contract treats the
registration order as append-only.

Reference parity targets:
- /root/reference/libminifi/src/expression-language/Expression.cpp:269-330
  (getDelimitedField CSV quote state machine) and :771-776
  (std::regex_replace format_first_only with capture references)
- /root/reference/extensions/standard-processors/processors/GetFile.h:96-158
  (property matrix; DATA_SIZE sizes per core/TypedValues.h:108-147)
- /root/reference/extensions/kafka/ConsumeKafka.h:100-138
  (Topic Name Format 'Patterns')
- /root/reference/extensions/standard-processors/processors/DefragmentText.h:37-92
  (Max Buffer Age — the processing-time flush half)
- /root/reference/extensions/standard-processors/processors/TailFile.cpp:504-583
  (rolling filename pattern driven through the compiled flow dialect)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure, load_table
from ._shared import (
    _pinned_shuffle,
    _poll_stream_rows,
    _register,
    _stream_events_stage,
    _t,
)


@_register(
    "el_csv_backref_pack",
    """
    WITH src AS (
      SELECT event_id, user_id, event_type,
             event_type || ',"q, u' || CAST(user_id AS VARCHAR) || '",t'
               || CAST(event_id % 7 AS VARCHAR) AS csvline,
             'u' || CAST(user_id AS VARCHAR) || 'x'
               || CAST(user_id AS VARCHAR) AS tag,
             'k' || CAST(event_id % 5 AS VARCHAR) || 'ab9' AS tag2
      FROM events WHERE event_id < 2000)
    SELECT event_id,
           '"q, u' || CAST(user_id AS VARCHAR) || '"' AS f2_quoted,
           'q, u' || CAST(user_id AS VARCHAR)         AS f2_stripped,
           't' || CAST(event_id % 7 AS VARCHAR)       AS f3,
           regexp_replace(event_type, '([aeiou])', '<\\1>') AS rf_backref,
           regexp_replace(event_type, 'z*', 'Q')      AS rf_empty,
           regexp_replace(tag, '\\d+', 'N')           AS rf_digits,
           'k' || CAST(event_id % 5 AS VARCHAR) || 'Xb9' AS rf_lookahead
    FROM src
    """,
)
def el_csv_backref_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 (VERDICT r15 #2): oracle grade for the r15 post-close EL
    fixes. Quote-aware getDelimitedField (Expression.cpp:269-330 — a
    delimiter inside quotes does not split; strip mode drops the
    quote chars), replaceFirst '$1' capture backrefs
    (Expression.cpp:771-776; DuckDB's regexp_replace is first-match
    by default, the exact oracle), the r16 empty-match semantics
    (an empty-matchable pattern replaces ONCE at the leftmost match),
    unknown-escape preservation (the EL literal '\\d+' keeps its
    backslash and matches digit runs), and lookahead past the match
    end (RE2 has no lookahead, so that column's oracle is the
    closed-form spliced string the fixture construction guarantees)."""
    from ..el import el_string

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ff = ev.select(
        "event_id",
        F.create_map(
            F.lit("csvline"),
            F.concat(
                F.col("event_type"),
                F.lit(',"q, u'),
                F.col("user_id").cast("string"),
                F.lit('",t'),
                (F.col("event_id") % 7).cast("string"),
            ),
            F.lit("etype"),
            F.col("event_type"),
            F.lit("tag"),
            F.concat(
                F.lit("u"),
                F.col("user_id").cast("string"),
                F.lit("x"),
                F.col("user_id").cast("string"),
            ),
            F.lit("tag2"),
            F.concat(F.lit("k"), (F.col("event_id") % 5).cast("string"), F.lit("ab9")),
        ).alias("attributes"),
    )
    return ff.select(
        "event_id",
        el_string("${csvline:getDelimitedField(2)}").alias("f2_quoted"),
        el_string(
            "${csvline:getDelimitedField(2, ',', '\\\"', '\\\\', 'true')}"
        ).alias("f2_stripped"),
        el_string("${csvline:getDelimitedField(3)}").alias("f3"),
        el_string("${etype:replaceFirst('([aeiou])', '<$1>')}").alias("rf_backref"),
        el_string("${etype:replaceFirst('z*', 'Q')}").alias("rf_empty"),
        el_string("${tag:replaceFirst('\\d+', 'N')}").alias("rf_digits"),
        el_string("${tag2:replaceFirst('a(?=b)', 'X')}").alias("rf_lookahead"),
    )


@_register(
    "get_file_size_age_matrix",
    """
    WITH d AS (
      SELECT doc_id, regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS line
      FROM documents WHERE doc_id < 300),
    dd AS (
      SELECT doc_id, strlen(line) AS b FROM d WHERE length(line) > 0)
    SELECT 'size_le_1kb' AS run, count(*) AS n_files,
           CAST(sum(b) AS BIGINT) AS sum_bytes
    FROM dd WHERE doc_id % 10 <> 0 AND b <= 1024
    UNION ALL
    SELECT 'size_ge_1kb', count(*), CAST(sum(b) AS BIGINT)
    FROM dd WHERE doc_id % 10 <> 0 AND b >= 1024
    UNION ALL
    SELECT 'hidden_all', count(*), CAST(sum(b) AS BIGINT) FROM dd
    UNION ALL
    SELECT 'old_only', count(*), CAST(sum(b) AS BIGINT)
    FROM dd WHERE doc_id % 10 <> 0 AND doc_id % 2 = 0
    """,
)
def get_file_size_age_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 (VERDICT r15 #2b): GetFile's property matrix driver-graded
    (GetFile.h:96-158). documents rows become real files (newlines
    folded so each file is one text row; doc_id%10==0 dot-hidden;
    doc_id%2==0 aged 2h via utime). Four GetFile runs pin: Maximum
    File Size '1 KB' / Minimum File Size '1 KB' as DATA_SIZE strings
    (binary KB = 1024, TypedValues.h:108-147), hidden files readable
    when Ignore Hidden Files=false (the hard-link read path), and
    Minimum File Age '30 min' selecting only the aged half. The
    oracle recomputes each selection from byte lengths (strlen)."""
    import tempfile
    import time as _time

    from ..plans.pipeline import _PROCESSORS

    configure(spark)
    rows = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.regexp_replace("text", "[\\r\\n]+", " ").alias("line"),
        )
        .filter(F.length("line") > 0)
        .collect()
    )
    d = tempfile.mkdtemp(prefix="getfile_matrix_")
    now = _time.time()
    for r in rows:
        name = f".d{r['doc_id']}.txt" if r["doc_id"] % 10 == 0 else f"d{r['doc_id']}.txt"
        path = os.path.join(d, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(r["line"])
        age = now - 7200 if r["doc_id"] % 2 == 0 else now - 60
        os.utime(path, (age, age))

    get = _PROCESSORS["GetFile"]

    def run(label: str, props: dict) -> DataFrame:
        out = get(spark, None, dict(props, input_directory=d))["success"]
        return out.agg(
            F.lit(label).alias("run"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.octet_length("content")).alias("sum_bytes"),
        )

    a = run("size_le_1kb", {"File Filter": r"d\d+\.txt", "Maximum File Size": "1 KB"})
    b = run("size_ge_1kb", {"File Filter": r"d\d+\.txt", "Minimum File Size": "1 KB"})
    c = run(
        "hidden_all",
        {"File Filter": r"\.?d\d+\.txt", "Ignore Hidden Files": "false"},
    )
    e = run(
        "old_only",
        {"File Filter": r"d\d+\.txt", "Minimum File Age": "30 min"},
    )
    return a.unionByName(b).unionByName(c).unionByName(e)


@_register(
    "kafka_pattern_consume",
    """
    SELECT 'app_logs' AS topic, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_eid
    FROM events WHERE event_id < 150
    UNION ALL
    SELECT 'db_logs', count(*), CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_id >= 150 AND event_id < 300
    """,
)
def kafka_pattern_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 (VERDICT r15 #4): Topic Name Format 'Patterns' end-to-end
    (ConsumeKafka.h:100-138): three topics live on the in-process
    broker; the ``kafkawire`` stream subscribes by regex '.*_logs',
    resolves it client-side against full Metadata (the librdkafka
    contract), consumes BOTH matching topics and must not touch the
    non-matching one. Per-topic counts and id sums pin exactly-once
    delivery and the kafka.topic attribute lift."""
    import uuid as _uuid

    from ..sources.kafka_wire import MiniKafkaBroker
    from ..streaming.records import kafka_records_to_flowfiles
    from ..streaming.sources import kafka_wire_source

    configure(spark)
    rows = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 300)
        .select("event_id", "event_type")
        .collect()
    )
    broker = MiniKafkaBroker().start()
    try:
        for r in rows:
            topic = "app_logs" if r["event_id"] < 150 else "db_logs"
            broker.append(
                topic,
                0,
                [(1_700_000_000_000 + r["event_id"], None, b"%d" % r["event_id"], [])],
            )
        # the decoy topic the pattern must NOT match
        broker.append("metrics", 0, [(1_700_000_000_000, None, b"-1", [])])
        stream = kafka_wire_source(
            spark,
            {
                "Kafka Brokers": broker.bootstrap,
                "Topic Names": r".*_logs",
                "Topic Name Format": "Patterns",
                "Offset Reset": "earliest",
            },
        )
        ff = kafka_records_to_flowfiles(stream)
        view = f"kp_{_uuid.uuid4().hex[:8]}"
        q = ff.writeStream.format("memory").queryName(view).outputMode("append").start()
        try:
            _poll_stream_rows(spark, q, view, expected=len(rows), expected_input=len(rows))
        finally:
            q.stop()
        return spark.sql(
            f"""
            SELECT attributes['kafka.topic'] AS topic,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(content AS BIGINT)) AS BIGINT) AS sum_eid
            FROM {view} GROUP BY 1
            """
        )
    finally:
        broker.stop()


@_register(
    "defragment_age_flush",
    """
    SELECT event_type AS key,
           CAST(1 AS BIGINT) AS n_messages,
           count(*) AS pieces_joined,
           'age' AS flush_reason
    FROM events WHERE event_id < 500 GROUP BY event_type
    """,
)
def defragment_age_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 (VERDICT r15 #5): DefragmentText's Max Buffer Age — the
    processing-time timeout half of DefragmentText.h:37-92 that the
    graded reassembly entries don't cover. Every piece buffers (the
    start pattern never matches, the size cap is never reached), so
    the ONLY flush path is the age timeout: one 'age' message per key
    carrying every buffered piece. Piece counts are order-independent,
    so the oracle is exact despite the wall-clock trigger."""
    import uuid as _uuid

    from ..streaming.stateful import defragment_text_stream

    configure(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_keys = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select("event_type")
        .distinct()
        .count()
    )
    stage = _stream_events_stage(spark, sf_dir)
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .filter(F.col("event_id") < 500)
        .select(
            F.col("event_type").alias("key"),
            F.lpad(F.col("event_id").cast("string"), 20, "0").alias("content"),
        )
    )
    defrag = defragment_text_stream(
        stream,
        message_start_pattern=r"\ANEVERMATCHES\Z",
        key_col="key",
        max_buffer_age_ms=1_000,
        max_buffer_size=1 << 20,
    )
    view = f"age_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle(spark, 8):
        q = (
            defrag.writeStream.format("memory")
            .queryName(view)
            .outputMode("append")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
    try:
        # ProcessingTimeTimeout sweeps keep scheduling batches, so the
        # query never quiesces — poll for the known flush count instead
        _poll_stream_rows(spark, q, view, expected=n_keys)
    finally:
        q.stop()
    return spark.sql(
        f"""
        SELECT key,
               count(*) AS n_messages,
               sum(n_pieces) AS pieces_joined,
               first(flush_reason) AS flush_reason
        FROM {view}
        GROUP BY key
        """
    )


@_register(
    "tailfile_flow_rotation",
    """
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS poll,
             count(*) AS n_lines,
             CAST(1 AS BIGINT) AS n_files,
             min(event_id) AS min_id,
             max(event_id) AS max_id,
             CAST(sum(event_id) AS BIGINT) AS sum_ids
      FROM events WHERE event_id >= 400 AND event_id < 550
      UNION ALL
      SELECT CAST(2 AS BIGINT), count(*), CAST(2 AS BIGINT),
             min(event_id), max(event_id),
             CAST(sum(event_id) AS BIGINT)
      FROM events WHERE event_id >= 550 AND event_id < 700
    ) ORDER BY poll
    """,
)
def tailfile_flow_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 (VERDICT r15 #5b): TailFile rotation recovery driven through
    the COMPILED reference config.yml dialect — 'File to Tail' /
    'State File' / 'Rolling Filename Pattern' spellings land on the
    engine handler (plans/reference_dialect.py _PROPERTY_RENAMES) and
    two compile_flow runs share the persisted state file, so poll 2
    must CRC-resume the renamed sibling and read the fresh main from 0
    (TailFile.cpp:504-583). Same invariants as
    tailfile_rotation_recovery, but through the YAML flow surface."""
    import tempfile

    from ..plans.pipeline import compile_flow

    configure(spark)
    rows = (
        load_table(spark, "events", sf_dir)
        .filter((F.col("event_id") >= 400) & (F.col("event_id") < 700))
        .select("event_id")
        .orderBy("event_id")
        .collect()
    )
    ids = [r["event_id"] for r in rows]
    d = tempfile.mkdtemp(prefix="tailflow_")
    log = os.path.join(d, "app.log")
    flow_yaml = f"""
Flow Controller:
  name: tail-rotation
Processors:
- id: tail
  name: tailer
  class: org.apache.nifi.minifi.processors.TailFile
  Properties:
    File to Tail: {log}
    State File: {os.path.join(d, "state.json")}
    Rolling Filename Pattern: ${{filename}}.*
"""

    def summary(df: DataFrame, poll: int) -> DataFrame:
        parsed = df.select(
            "file", F.col("content").cast("long").alias("event_id")
        )
        return parsed.agg(
            F.lit(poll).cast("long").alias("poll"),
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("file").alias("n_files"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            F.sum("event_id").alias("sum_ids"),
        )

    with open(log, "w") as f:
        f.writelines(f"{i}\n" for i in ids if i < 550)
    p1 = summary(compile_flow(spark, flow_yaml).df("tail"), 1)
    p1 = p1.localCheckpoint(eager=True)  # poll 1 before the rotation mutates files

    # logrotate: append unread lines, rename, fresh main
    with open(log, "a") as f:
        f.writelines(f"{i}\n" for i in ids if 550 <= i < 625)
    os.rename(log, log + ".1")
    with open(log, "w") as f:
        f.writelines(f"{i}\n" for i in ids if i >= 625)
    p2 = summary(compile_flow(spark, flow_yaml).df("tail"), 2)
    return p1.unionByName(p2).orderBy("poll")


@_register(
    "kafka_pattern_new_topic",
    """
    SELECT 'pat_a' AS topic, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_eid
    FROM events WHERE event_id < 120
    UNION ALL
    SELECT 'pat_b', count(*), CAST(sum(event_id) AS BIGINT)
    FROM events WHERE event_id >= 120 AND event_id < 240
    """,
)
def kafka_pattern_new_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16: mid-stream topic discovery under Topic Name Format
    'Patterns' (ConsumeKafka.h:100-138; the Spark Kafka connector's
    new-partition contract): the stream starts with ONE matching topic,
    consumes it, then a SECOND matching topic is created while the
    query runs — the per-batch pattern re-evaluation must admit it at
    its earliest offset and deliver every record exactly once, without
    disturbing the first topic's checkpointed position."""
    import uuid as _uuid

    from ..sources.kafka_wire import MiniKafkaBroker
    from ..streaming.records import kafka_records_to_flowfiles
    from ..streaming.sources import kafka_wire_source

    configure(spark)
    rows = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 240)
        .select("event_id")
        .collect()
    )
    a_ids = [r["event_id"] for r in rows if r["event_id"] < 120]
    b_ids = [r["event_id"] for r in rows if r["event_id"] >= 120]
    broker = MiniKafkaBroker().start()
    try:
        broker.append(
            "pat_a", 0, [(1_700_000_000_000 + i, None, b"%d" % i, []) for i in a_ids]
        )
        stream = kafka_wire_source(
            spark,
            {
                "Kafka Brokers": broker.bootstrap,
                "Topic Names": r"pat_.*",
                "Topic Name Format": "Patterns",
                "Offset Reset": "earliest",
            },
        )
        ff = kafka_records_to_flowfiles(stream)
        view = f"kpn_{_uuid.uuid4().hex[:8]}"
        q = ff.writeStream.format("memory").queryName(view).outputMode("append").start()
        try:
            # phase 1: only pat_a exists; wait until it is fully consumed
            _poll_stream_rows(spark, q, view, expected=len(a_ids), expected_input=len(a_ids))
            # phase 2: pat_b appears MID-STREAM; the running query must
            # discover it via the per-batch pattern refresh
            broker.append(
                "pat_b", 0, [(1_700_000_000_000 + i, None, b"%d" % i, []) for i in b_ids]
            )
            _poll_stream_rows(spark, q, view, expected=len(rows), expected_input=len(rows))
        finally:
            q.stop()
        return spark.sql(
            f"""
            SELECT attributes['kafka.topic'] AS topic,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(content AS BIGINT)) AS BIGINT) AS sum_eid
            FROM {view} GROUP BY 1
            """
        )
    finally:
        broker.stop()


@_register(
    "get_file_batch_oldest",
    """
    WITH d AS (
      SELECT doc_id, regexp_replace(text, '[\\r\\n]+', ' ', 'g') AS line
      FROM documents WHERE doc_id < 400),
    dd AS (
      SELECT doc_id, strlen(line) AS b,
             row_number() OVER (ORDER BY doc_id) AS rn
      FROM d WHERE length(line) > 0)
    SELECT 'batch_100' AS run, count(*) AS n_files,
           CAST(sum(b) AS BIGINT) AS sum_bytes
    FROM dd WHERE rn <= 100
    UNION ALL
    SELECT 'batch_10', count(*), CAST(sum(b) AS BIGINT)
    FROM dd WHERE rn <= 10
    UNION ALL
    SELECT 'no_batch', count(*), CAST(sum(b) AS BIGINT) FROM dd
    """,
)
def get_file_batch_oldest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16: GetFile's Batch Size cap with oldest-mtime-first ordering
    (GetFile.h:106-110 — the reference polls up to Batch Size files
    per onTrigger; this engine selects the OLDEST mtimes first so a
    bounded batch drains a backlog in arrival order). Files get
    strictly increasing mtimes by doc_id, so 'Batch Size N' must pick
    exactly the N lowest doc_ids — the oracle's row_number window."""
    import tempfile
    import time as _time

    from ..plans.pipeline import _PROCESSORS

    configure(spark)
    rows = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(
            "doc_id",
            F.regexp_replace("text", "[\\r\\n]+", " ").alias("line"),
        )
        .filter(F.length("line") > 0)
        .collect()
    )
    d = tempfile.mkdtemp(prefix="getfile_batch_")
    base = _time.time() - 500_000
    for r in rows:
        path = os.path.join(d, f"d{r['doc_id']}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(r["line"])
        os.utime(path, (base + r["doc_id"], base + r["doc_id"]))

    get = _PROCESSORS["GetFile"]

    def run(label: str, props: dict) -> DataFrame:
        out = get(spark, None, dict(props, input_directory=d))["success"]
        return out.agg(
            F.lit(label).alias("run"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.octet_length("content")).alias("sum_bytes"),
        )

    a = run("batch_100", {"Batch Size": "100"})
    b = run("batch_10", {"Batch Size": "10"})
    c = run("no_batch", {})
    return a.unionByName(b).unionByName(c)
