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


def referential_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table foreign-key sweep: one row per FK edge with child
    volume and orphan accounting — the promotion gate a warehouse runs
    over a whole snapshot (vs ``dq_report``'s per-table checks).

    ``edges`` is ``(name, child_df, fk_col, parent_df, pk_col)``.
    Returns ``(edge, n_child, n_orphan_keys, n_orphan_rows)``.

    100 TB shape: each edge first collapses the child to a slim
    (key, cnt) aggregate — the per-key count table is bounded by key
    cardinality, not child volume, and the count is map-side combined
    — then LEFT-joins the parent's distinct keys; AQE broadcasts the
    parent side for dimension tables. The row-level orphan count is
    recovered as sum(cnt) over unmatched keys, so no second scan of
    the child ever happens. NULL fks count as orphans (a NULL FK
    violates the reference)."""
    parts = []
    for name, child, fk, parent, pk in edges:
        keyed = child.groupBy(F.col(fk).alias("_k")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        pkeys = parent.select(F.col(pk).alias("_k")).distinct().withColumn(
            "_hit", F.lit(1)
        )
        j = keyed.join(pkeys, "_k", "left")
        orphan = F.col("_hit").isNull()
        parts.append(
            j.agg(
                F.lit(name).alias("edge"),
                F.sum("_cnt").cast("long").alias("n_child"),
                F.sum(F.when(orphan, 1).otherwise(0)).cast("long").alias(
                    "n_orphan_keys"
                ),
                F.coalesce(
                    F.sum(F.when(orphan, F.col("_cnt"))), F.lit(0)
                )
                .cast("long")
                .alias("n_orphan_rows"),
            )
        )
    if not parts:
        raise ValueError("referential_audit needs at least one edge")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fd_profile(
    candidates: list[tuple[str, DataFrame, list[str], str]],
) -> DataFrame:
    """Functional-dependency candidate profiling: for each candidate
    FD ``antecedent -> consequent``, report how close the data comes
    to satisfying it — the schema-discovery primitive (TANE-style
    single-pass check) a pipeline runs before trusting a column as a
    derivable attribute.

    ``candidates`` is ``(name, df, antecedent_cols, consequent_col)``.
    Returns ``(fd, n_groups, n_violating_groups, max_consequents,
    holds)`` where a violating group has >1 distinct consequent.

    100 TB shape: one hash aggregate per candidate on the antecedent
    (map-side combined count-distinct via Catalyst's expand), then a
    second tiny aggregate over the per-group table — group counts are
    bounded by antecedent cardinality. NULL consequents count as a
    distinct value (NULL != value for FD purposes)."""
    parts = []
    for name, df, ante, cons in candidates:
        # count-distinct rides Catalyst's expand (no value set is ever
        # materialized per group); NULL is folded back in as one extra
        # distinct value via a max flag
        per_group = df.groupBy(*[F.col(c) for c in ante]).agg(
            (
                F.countDistinct(F.col(cons))
                + F.max(F.when(F.col(cons).isNull(), 1).otherwise(0))
            ).alias("_nd")
        )
        parts.append(
            per_group.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_groups"),
                F.max("_nd").cast("long").alias("max_consequents"),
                (F.max("_nd") <= 1).alias("holds"),
            )
        )
    if not parts:
        raise ValueError("fd_profile needs at least one candidate")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
