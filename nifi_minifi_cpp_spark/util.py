"""Shared plan-shaping utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_cpu(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to the cluster's parallelism before a CPU- or
    I/O-bound Arrow/Python stage.

    A small parquet file scans as ONE partition, so a mapInPandas /
    pandas-UDF / per-row-I/O stage would run on one core no matter how
    many the cluster has. Only widens (never shrinks): at 100 TB the
    scan already yields thousands of partitions and this is a no-op —
    the guard avoids paying a shuffle when the data is already spread.
    Hash-partitions by ``key_cols`` when given (keeps related rows
    together), round-robin otherwise.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df


def reliable_barrier(df: DataFrame) -> DataFrame:
    """Materialize ``df`` eagerly and cut its lineage — the barrier the
    dedup pipelines place between candidate generation and the final
    anti-join (mapInPandas stages are not cached by Catalyst, so three
    downstream aggregates would otherwise re-run the whole LSH lineage).

    Safety dial: when the session has a checkpoint directory configured
    (``spark.sparkContext.setCheckpointDir`` — HDFS/object-store backed),
    use a RELIABLE ``.checkpoint()``: blocks survive executor loss, the
    right default for preemptible/spot fleets. Without one, fall back to
    ``localCheckpoint`` (executor-local, unreplicated — fast, but an
    executor loss before the last action kills the job with no lineage
    to recompute; fine on a stable cluster or local mode).

    Storage hygiene: the engine session sets
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so
    reliable checkpoint files are removed when the barrier RDD is
    garbage-collected — otherwise each dedup call would leak a
    permanent checkpoint directory (default Spark behavior).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
