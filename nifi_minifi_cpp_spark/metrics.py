"""Metrics parity: per-operator transfer counters + streaming progress.

The reference tracks per-processor TransferredFlowFiles /
TransferredBytes and onTrigger runtimes
(/root/reference/METRICS.md:238-278, increment site
/root/reference/libminifi/src/core/ProcessSession.cpp:953-960).

Spark-first equivalents:
- batch: the Observation API — metrics piggyback on the job that
  computes the result, zero extra passes;
- streaming: StreamingQueryListener progress events (rows/sec,
  batch durations, state store sizes) — the QueryMetrics /
  RepositoryMetrics analogue.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class TransferMetrics:
    """Handle for one observed operator edge."""

    name: str
    observation: Observation

    @property
    def values(self) -> dict:
        got = dict(self.observation.get)
        return {
            "transferred_flowfiles": got.get("transferred_flowfiles"),
            "transferred_bytes": got.get("transferred_bytes"),
        }


def with_transfer_metrics(
    df: DataFrame, name: str, content_col: str = "content"
) -> tuple[DataFrame, TransferMetrics]:
    """Attach TransferredFlowFiles/TransferredBytes counters to an
    operator output. Returns (df, handle); the handle's values are
    available after any action on the returned frame.
    """
    obs = Observation(name)
    size = (
        F.sum(F.coalesce(F.length(F.col(content_col).cast("string")), F.lit(0)))
        if content_col in df.columns
        else F.lit(0)
    )
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("transferred_flowfiles"),
        size.alias("transferred_bytes"),
    )
    return observed, TransferMetrics(name, obs)


@dataclass
class FlowMetricsLog:
    """Collected streaming progress (LogMetricsPublisher analogue)."""

    progress: list[dict] = field(default_factory=list)

    def totals(self) -> dict:
        rows = sum(p.get("numInputRows", 0) for p in self.progress)
        return {"batches": len(self.progress), "input_rows": rows}


def attach_streaming_metrics(spark: SparkSession) -> FlowMetricsLog:
    """Register a StreamingQueryListener mirroring the reference's
    metrics publishers; returns the live log object."""
    from pyspark.sql.streaming import StreamingQueryListener

    log = FlowMetricsLog()

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            log.progress.append(
                {
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs) if p.durationMs else {},
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_Listener())
    return log
