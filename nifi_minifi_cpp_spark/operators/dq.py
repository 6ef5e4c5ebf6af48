"""Data-quality assertion suite — the Deequ-style validation pass a
large pipeline runs before promoting a snapshot.

Four local check families (completeness, uniqueness, accepted domain,
non-negativity) compile into ONE aggregation over the table — a single
scan no matter how many checks — plus one anti-join per referential
constraint. Output is the audit-friendly long form:
(check, metric, passed), one row per check.

The reference validates per-record content (schema/format processors);
this is the dataset-level generalization the reference's users run
downstream of ingest.

100 TB shape: the local checks are algebraic aggregates (map-side
combined; the count-distinct rides Catalyst's expand in the same
pass); each referential check is a LEFT ANTI equi-join that AQE can
broadcast when the dimension is small. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    completeness: list[str] | None = None,
    unique: list[str] | None = None,
    domain: dict[str, list] | None = None,
    non_negative: list[str] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run the configured checks; return (check, metric, passed).

    - completeness: metric = NULL fraction, passes at exactly 0.
    - unique: metric = distinct/total ratio, passes at exactly 1.
    - domain: metric = count of values outside the allowed list
      (NULL counts as outside), passes at 0.
    - non_negative: metric = count of values <= 0 or NULL, passes at 0.
    - references: (col, dim_df, dim_col) — metric = orphan row count
      from a left-anti join, passes at 0.
    """
    n = F.count(F.lit(1))
    aggs = []
    metas: list[tuple[str, str]] = []  # (check name, agg alias)

    def add(name: str, col):
        alias = f"_m{len(metas)}"
        metas.append((name, alias))
        aggs.append(col.alias(alias))

    # coalesce(sum, 0) and nullif(n, 0): an EMPTY table has no
    # violations and passes every check (ratio checks read as 0/1
    # rather than NULL)
    for c in completeness or []:
        add(
            f"completeness:{c}",
            F.coalesce(
                F.round(
                    F.sum(F.col(c).isNull().cast("int")).cast("double")
                    / F.nullif(n, F.lit(0)),
                    6,
                ),
                F.lit(0.0),
            ),
        )
    for c in unique or []:
        add(
            f"uniqueness:{c}",
            F.coalesce(
                F.round(
                    F.count_distinct(F.col(c)).cast("double") / F.nullif(n, F.lit(0)), 6
                ),
                F.lit(1.0),
            ),
        )
    for c, allowed in (domain or {}).items():
        bad = ~F.col(c).isin(allowed) | F.col(c).isNull()
        add(f"domain:{c}", F.coalesce(F.sum(bad.cast("int")).cast("double"), F.lit(0.0)))
    for c in non_negative or []:
        bad = (F.col(c) <= 0) | F.col(c).isNull()
        add(
            f"non_negative:{c}",
            F.coalesce(F.sum(bad.cast("int")).cast("double"), F.lit(0.0)),
        )

    parts: list[DataFrame] = []
    if metas:
        wide = df.agg(*aggs)
        # melt the single wide row with stack() — one generator over ONE
        # aggregate, not one union branch (and one re-aggregation!) per
        # check
        stack_args: list = []
        for name, alias in metas:
            stack_args.extend([F.lit(name), F.col(alias)])
        long = wide.select(
            F.stack(F.lit(len(metas)), *stack_args).alias("check", "metric")
        )
        passed = F.when(
            F.col("check").startswith("uniqueness:"), F.col("metric") == 1.0
        ).otherwise(F.col("metric") == 0.0)
        parts.append(long.select("check", "metric", passed.alias("passed")))
    for col, dim, dim_col in references or []:
        orphans = (
            df.select(F.col(col))
            .join(dim.select(F.col(dim_col).alias(col)), col, "left_anti")
            .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        )
        parts.append(
            orphans.select(
                F.lit(f"referential:{col}").alias("check"),
                "metric",
                (F.col("metric") == 0.0).alias("passed"),
            )
        )
    if not parts:
        raise ValueError("dq_report needs at least one check")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
