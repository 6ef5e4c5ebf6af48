"""Data-layout optimization: Z-order (Morton) interleaved sort keys.

The lakehouse ``OPTIMIZE ... ZORDER BY`` primitive (Delta/Iceberg): a
bit-interleaved composite key makes range-partitioned files cluster
BOTH dimensions at once, so min/max file statistics prune scans on
either column — the layout step a 100 TB table needs before heavy
multi-dimension point/range querying. Pure Catalyst bit arithmetic
(shifts/and/or unroll to whole-stage codegen); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """64-bit Morton interleave of the low ``bits`` bits of two
    non-negative integer columns: x occupies even bit positions, y odd.
    Monotone in the interleaved locality sense: keys close in z-value
    are close in BOTH x and y (Morton 1966)."""
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.__or__ is BOOLEAN or in PySpark — bitwiseOR is the
        # integer operator
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical Morton interleave as ANSI-SQL text (for oracles
    and engine-portable DDL)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_repartition(
    df: DataFrame, x: Column, y: Column, num_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-repartition by the Morton key and sort within partitions —
    the write-side layout pass. Each output file then holds a compact
    z-range, giving tight min/max stats on BOTH source columns."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits))
    return keyed.repartitionByRange(num_partitions, "_zkey").sortWithinPartitions("_zkey")
