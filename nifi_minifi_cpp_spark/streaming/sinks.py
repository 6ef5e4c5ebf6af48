"""Streaming sinks (SURVEY §2.2) — writeStream + foreachBatch adapters.

Built-in formats cover PutFile (file formats), PublishKafka (kafka),
LogAttribute (console). Everything push-style (HTTP, Splunk, Loki,
MQTT, SQL DML) is a foreachBatch adapter: per micro-batch, partitions
are processed executor-side; the epoch id gives idempotency keys for
the reference's session-commit exactly-once analogue
(ProcessSession.cpp:855-985 -> checkpoint + idempotent sink).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def put_file_sink(df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet", **options):
    """PutFile (PutFile.cpp:75): durable file sink with checkpointing
    (conflict strategy = the format's append semantics)."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .options(**options)
        .start()
    )


def kafka_sink(df: DataFrame, bootstrap_servers: str, checkpoint: str, topic: str | None = None):
    """PublishKafka (PublishKafka.cpp:610): expects key/value[/topic]
    columns (see records.flowfiles_to_kafka_records)."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint)
    )
    if topic:
        writer = writer.option("topic", topic)
    return writer.start()


def console_sink(df: DataFrame, **options):
    """LogAttribute (LogAttribute.cpp:124): debug sink."""
    return df.writeStream.format("console").options(**options).start()


def memory_sink(df: DataFrame, name: str, output_mode: str = "append"):
    """Test sink: query results land in a temp view."""
    return df.writeStream.format("memory").queryName(name).outputMode(output_mode).start()


def foreach_batch_sink(
    df: DataFrame,
    handler: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
):
    """Generic adapter for push-style sinks (InvokeHTTP, PutSplunkHTTP,
    PushGrafanaLoki, PutSQL, PublishMQTT...): ``handler(batch_df,
    epoch_id)`` runs once per micro-batch with exactly-once replay
    protection from the checkpoint."""
    writer = df.writeStream.foreachBatch(handler)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def http_post_handler(
    url: str,
    content_col: str = "content",
    max_batch_rows: int = 10_000,
    session_factory=None,
):
    """InvokeHTTP-style foreachBatch handler (InvokeHTTP.cpp:241):
    POSTs each row's content; retry/no-retry routing is the caller's
    status-code handling. requests import is deferred (not in all
    environments); ``session_factory`` injects a fake for tests.
    """

    def handler(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.select(content_col).limit(max_batch_rows).collect()
        if session_factory is not None:
            session = session_factory()
        else:  # pragma: no cover - requires network
            import requests

            session = requests.Session()
        for row in rows:
            session.post(url, data=row[content_col], headers={"X-Epoch": str(epoch_id)})

    return handler


def put_udp_handler(host: str, port: int, content_col: str = "content"):
    """PutUDP (PutUDP.cpp:54): one datagram per row. Runs
    per-partition on the EXECUTORS (foreachPartition inside
    foreachBatch) — no driver collect, each task opens one socket."""

    def handler(batch_df: DataFrame, epoch_id: int) -> None:
        def send(rows) -> None:
            import socket

            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            try:
                for row in rows:
                    payload = row[content_col]
                    if payload is None:
                        continue
                    data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
                    sock.sendto(data, (host, port))
            finally:
                sock.close()

        batch_df.select(content_col).foreachPartition(send)

    return handler


def put_tcp_handler(
    host: str, port: int, content_col: str = "content", delimiter: str = "\n"
):
    """PutTCP (PutTCP.cpp:83): delimited messages over one connection
    per partition per batch, executor-side."""

    def handler(batch_df: DataFrame, epoch_id: int) -> None:
        def send(rows) -> None:
            import socket

            sock = socket.create_connection((host, port), timeout=30)
            try:
                for row in rows:
                    payload = row[content_col]
                    if payload is None:
                        continue
                    data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
                    sock.sendall(data + delimiter.encode())
            finally:
                sock.close()

        batch_df.select(content_col).foreachPartition(send)

    return handler
