"""Partition-pruned MERGE-INTO stand-in for plain-parquet snapshots
(r11, VERDICT r10 #6).

The CDC-apply pattern (reference parity: the PutSQL/PutFile "apply the
latest state" sinks, e.g.
/root/reference/extensions/sql/processors/PutSQL.cpp — the reference
applies row-level upserts through a transactional store; on a lake the
equivalent is MERGE INTO, and on a PLAIN parquet directory the honest
stand-in is a partition-scoped rewrite):

- the snapshot is a parquet root partitioned by a bucket of the merge
  key (``partition_col``);
- each micro-batch touches only the partitions its keys hash into, so
  the merge reads and rewrites THOSE directories and physically leaves
  every other partition alone (dynamic partition overwrite);
- at 100 TB that is the difference between "rewrite the world per
  batch" and "rewrite ~batch-sized state per batch": the anti-join
  runs against the pruned subset (PartitionFilters in the scan), and
  the write replaces only the matched directories.

Swap this for a real ``MERGE INTO`` when the table lives in a
transactional lake format; the delta-emitting update-mode aggregation
upstream is unchanged either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_bucket(col, n_buckets: int = 8):
    """Stable key->partition bucket: non-negative hash mod n."""
    return F.pmod(F.hash(col), F.lit(n_buckets)).cast("int")


def merge_upsert_partitioned(
    batch_df: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    partition_col: str = "part",
) -> None:
    """Merge ``batch_df`` (one row per changed key — e.g. an
    update-mode micro-batch) into the partitioned parquet snapshot at
    ``snapshot_dir``: rows in untouched partitions are not read OR
    rewritten.

    ``batch_df`` must already carry ``partition_col`` (use
    ``partition_bucket`` on the key). The touched-partition list is a
    bounded driver collect — at most the snapshot's partition count,
    by construction orders of magnitude below the key count.

    Crash window (plain parquet has no commit protocol): the dynamic
    overwrite deletes each touched partition directory and then writes
    its replacement — a failure between those two steps loses the
    touched partitions, and a concurrent reader can observe them
    missing. That is inherent to the stand-in; a transactional lake
    format's MERGE INTO closes it (snapshot isolation + atomic commit),
    which is exactly the swap the module docstring prescribes. Callers
    that need crash safety on plain parquet should stage the rewrite to
    a temp root and rename over the touched directories.
    """
    if partition_col not in batch_df.columns:
        raise ValueError(
            f"batch_df lacks partition column {partition_col!r}; derive it "
            "with partition_bucket() on the merge key before calling"
        )
    spark = batch_df.sparkSession
    batch_df = batch_df.persist()
    try:
        if not os.path.exists(snapshot_dir):
            (
                batch_df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(snapshot_dir)
            )
            return
        touched = [
            r[0] for r in batch_df.select(partition_col).distinct().collect()
        ]
        cur = (
            spark.read.parquet(snapshot_dir)
            # directory-level partition pruning: only the touched
            # partitions are scanned (PartitionFilters), so the
            # anti-join is batch-sized, not snapshot-sized
            .where(F.col(partition_col).isin(touched))
        )
        kept = cur.join(batch_df.select(keys), keys, "left_anti")
        merged = kept.select(batch_df.columns).unionByName(batch_df)
        (
            merged.write.mode("overwrite")
            # dynamic overwrite: replace ONLY the partition directories
            # present in `merged` (= the touched set); every other
            # partition's files stay physically untouched
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(snapshot_dir)
        )
    finally:
        batch_df.unpersist()
