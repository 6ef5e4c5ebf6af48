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


def hilbert_key_frame(
    df: DataFrame, x: Column, y: Column, bits: int = 8, out: str = "hkey"
) -> DataFrame:
    """Hilbert-curve index of (x, y) — the better-locality sibling of
    ``zorder_key`` (Hilbert 1891; xy2d formulation as in Warren,
    Hacker's Delight §16): unlike Morton order, consecutive Hilbert
    keys are ALWAYS adjacent cells, so range-partitioned files get
    strictly tighter per-file bounding boxes — fewer false-positive
    file reads under min/max pruning (what Delta/Iceberg OPTIMIZE
    switched to for multi-dim layout).

    The per-level reflect+swap rotation is state-carrying, so the
    unroll STAGES (_hx, _hy, _hd) as named columns per level via
    ``withColumns`` (simultaneous assignment against the previous
    projection) — attribute references keep the expression tree
    linear in ``bits`` where naive nesting would double per level.
    Pure integer Catalyst ops; whole-stage codegen; deterministic."""
    d = (
        df.withColumn("_hx", x.cast("long"))
        .withColumn("_hy", y.cast("long"))
        .withColumn("_hd", F.lit(0).cast("long"))
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        d = d.withColumns(
            {
                "_hd": F.col("_hd")
                + F.lit(s * s).cast("long") * (F.lit(3) * rx).bitwiseXOR(ry),
                "_hx": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                        F.col("_hy")
                    ),
                ).otherwise(F.col("_hx")),
                "_hy": F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                        F.col("_hx")
                    ),
                ).otherwise(F.col("_hy")),
            }
        )
    return d.withColumn(out, F.col("_hd")).drop("_hx", "_hy", "_hd")


def hilbert_key_sql_ctes(
    base_cte: str, carry_cols: list[str], x_expr: str, y_expr: str, bits: int = 8
) -> str:
    """The identical staged xy2d unroll as chained SQL CTEs (for
    oracles): each level consumes the previous level's (hx, hy, hd)
    columns — the same simultaneous-assignment discipline as the
    DataFrame version."""
    carries = ", ".join(carry_cols)
    parts = [
        f"h_in AS (SELECT {carries}, CAST({x_expr} AS BIGINT) AS hx,"
        f" CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {base_cte})"
    ]
    prev = "h_in"
    for step, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        rx = f"((hx >> {i}) & 1)"
        ry = f"((hy >> {i}) & 1)"
        parts.append(
            f"""h_{step} AS (
      SELECT {carries},
        CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END
             ELSE hx END AS hx,
        CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END
             ELSE hy END AS hy,
        hd + {s * s} * xor(3 * {rx}, {ry}) AS hd
      FROM {prev})"""
        )
        prev = f"h_{step}"
    return ",\n    ".join(parts) + f"\n    , h_out AS (SELECT {carries}, hd FROM {prev})"
