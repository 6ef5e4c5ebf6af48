"""Table reconciliation — keyed diff of two snapshots of one dataset.

The data-validation primitive every large pipeline needs after a
migration, backfill, or replication pass: given two snapshots keyed by
the same columns, classify every key as ``equal`` / ``changed`` /
``only_left`` / ``only_right`` and roll the verdicts up into a summary
a human (or an alert) can read. The reference ships content-hash
verification per FlowFile (HashContent — reference
extensions/standard-processors/processors/HashContent.h); this is the
dataset-level generalization expressed as one Spark join.

100 TB shape: ONE full-outer equi-join on the key columns (AQE skew
handling applies; pre-bucketed snapshots co-locate and skip the
exchange entirely), then a NULL-safe per-column compare projected in
whole-stage codegen — no UDFs, no second pass. The summary aggregation
is map-side combinable into at most 4 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reconcile_tables(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff: (keys..., status) with status in
    ``equal | changed | only_left | only_right``.

    ``compare_cols`` defaults to every shared non-key column. The
    compare is NULL-safe (``<=>``): a NULL on both sides is equal, a
    NULL on one side is a change — the SQL ``IS DISTINCT FROM``
    semantics, so oracles can mirror it verbatim.
    """
    if not keys:
        raise ValueError("reconcile_tables needs at least one key column")
    reserved = {"_l_present", "_r_present"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"reconcile_tables reserves column names {sorted(clash)}")
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    l = left.select(*keys, *compare_cols, F.lit(True).alias("_l_present"))
    r = right.select(
        *keys,
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
        F.lit(True).alias("_r_present"),
    )
    joined = l.join(r, on=keys, how="full_outer")
    differs: Column = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_r_{c}"))
    status = (
        F.when(F.col("_r_present").isNull(), F.lit("only_left"))
        .when(F.col("_l_present").isNull(), F.lit("only_right"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("equal"))
    )
    return joined.select(*keys, status.alias("status"))


def reconcile_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Roll the per-key diff up to (status, n) — at most four rows,
    map-side combined before the single exchange."""
    per_key = reconcile_tables(left, right, keys, compare_cols)
    return per_key.groupBy("status").agg(F.count(F.lit(1)).cast("long").alias("n"))
