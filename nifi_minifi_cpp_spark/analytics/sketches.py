"""Distributed frequency sketches (r10): a count-min sketch built as a
DataFrame aggregate — the bounded-memory answer to "how often does key
X occur in 100 TB of events" when the exact distinct-key table itself
is too big to keep hot (Cormode & Muthukrishnan 2005).

Design for Spark, engine-portable:
- the d hash rows use md5 prefixes over a salted key
  (``md5(i || ':' || key)``), and the bucket IS the 3-hex-char prefix
  string — width fixed at 16^3 = 4096 per row. Staying in hex-string
  space sidesteps engine-specific hash functions entirely: any engine
  with md5 (DuckDB, Trino, Postgres) reproduces the sketch bit-for-bit,
  which is what makes the oracle able to verify it.
- BUILD is one explode(d) + groupBy (map-side partial aggregation; the
  shuffle carries at most d x 4096 rows per partition, regardless of
  input size). The sketch is MERGEABLE by construction: sketches of
  shards sum cell-wise, the property that lets 1000 executors build it
  without coordination.
- ESTIMATE probes broadcast-join the (bounded, d x 4096 row) sketch
  and take min over the d rows — the classic CMS upper-bound estimate
  (never under-counts; over-counts by collision mass at most).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def countmin_build(
    df: DataFrame, key_col: str, depth: int = 4, prefix_hex: int = 3
) -> DataFrame:
    """-> sketch table (row int, bucket string, n long); at most
    depth * 16^prefix_hex rows, regardless of input size."""
    rows = F.explode(F.sequence(F.lit(1), F.lit(depth))).alias("row")
    return (
        df.select(F.col(key_col).cast("string").alias("_k"))
        .select("_k", rows)
        .select(
            "row",
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_k"))),
                1,
                prefix_hex,
            ).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = 4, prefix_hex: int = 3
) -> DataFrame:
    """Estimate each probe key's frequency: min over the d rows of its
    bucket counts. The sketch side is bounded, so it broadcasts."""
    p = probes.select(F.col(key_col).cast("string").alias("_k")).distinct()
    p = p.select(
        "_k", F.explode(F.sequence(F.lit(1), F.lit(depth))).alias("row")
    ).select(
        "_k",
        "row",
        F.substring(
            F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_k"))),
            1,
            prefix_hex,
        ).alias("bucket"),
    )
    return (
        p.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est"))
        .select(F.col("_k").alias(key_col), "est")
    )
