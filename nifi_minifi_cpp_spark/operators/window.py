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
