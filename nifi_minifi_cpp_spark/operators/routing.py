"""Routing / filtering operators (SURVEY §2.3).

Route operators return ``dict[str, DataFrame]`` — one frame per
relationship. Catalyst shares the underlying scan across the filters,
so N routes over one source cost one pass (the reference clones the
FlowFile per matching relationship; here a row simply appears in every
matching frame).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..el import el_bool, promoted_columns

UNMATCHED = "unmatched"


def route_on_attribute(df: DataFrame, routes: dict[str, str]) -> dict[str, DataFrame]:
    """RouteOnAttribute (RouteOnAttribute.cpp:37-77): dynamic
    properties are (relationship -> EL boolean). A row goes to every
    matching relationship; rows matching none go to ``unmatched``.

    EL references to promoted columns resolve typed -> the predicate
    pushes down into the source scan.
    """
    cols = promoted_columns(df)
    compiled: dict[str, Column] = {name: el_bool(expr, columns=cols) for name, expr in routes.items()}
    out: dict[str, DataFrame] = {name: df.filter(cond) for name, cond in compiled.items()}
    none_match = None
    for cond in compiled.values():
        c = F.coalesce(cond, F.lit(False))
        none_match = ~c if none_match is None else none_match & ~c
    out[UNMATCHED] = df.filter(none_match) if none_match is not None else df
    return out


def _line_predicate(line: Column, matching: str, value: str, ignore_case: bool) -> Column:
    """RouteText matching strategies (RouteText.h:37-61)."""
    probe = F.lower(line) if ignore_case else line
    val = value.lower() if ignore_case else value
    if matching == "starts_with":
        return probe.startswith(val)
    if matching == "ends_with":
        return probe.endswith(val)
    if matching == "contains":
        return probe.contains(val)
    if matching == "equals":
        return probe == F.lit(val)
    if matching == "matches_regex":
        return probe.rlike(f"^(?:{value})$" if not ignore_case else f"(?i)^(?:{value})$")
    if matching == "contains_regex":
        return probe.rlike(value if not ignore_case else f"(?i){value}")
    raise ValueError(f"unknown matching strategy {matching}")


def route_text(
    df: DataFrame,
    routes: dict[str, str],
    matching: str = "contains",
    routing: str = "dynamic",
    ignore_case: bool = False,
    trim_whitespace: bool = True,
    grouping_regex: str | None = None,
    id_col: str = "uuid",
) -> dict[str, DataFrame]:
    """RouteText (RouteText.cpp:218): route text *segments* (lines).

    Lines of ``content`` are tested per route; matched lines are
    regrouped per source FlowFile (and optional grouping regex) into
    combined output rows, mirroring the reference's per-route combined
    FlowFiles. routing='dynamic' routes each line to every matching
    route and 'unmatched' otherwise; 'all'/'any' route the whole
    content iff all/any lines match (first route's condition).
    """
    if routing == "dynamic" and grouping_regex is None:
        # shuffle-free fast path (r6): without a grouping regex the
        # per-FlowFile regroup is per-ROW, so it compiles to a pure
        # higher-order filter + array_join — no explode, no groupBy
        # shuffle per route (the explode path shuffles once per route
        # at 100 TB), and streaming-append safe, which the posexplode+
        # groupBy path is not (streaming agg needs watermark/update).
        arr = F.split(F.col("content"), "\n")
        if trim_whitespace:
            arr = F.transform(arr, F.trim)
        def _mk_pred(v: str):
            # NOTE: must stay a 1-arg lambda — F.filter treats a 2-arg
            # callable as (element, index), so the usual `v=v` default
            # capture would bind v to the INDEX column
            return lambda c: _line_predicate(c, matching, v, ignore_case)

        hof_preds = {name: _mk_pred(v) for name, v in routes.items()}

        def _route_frame(pred) -> DataFrame:
            matched = F.filter(arr, pred)
            return (
                df.select(
                    F.col(id_col),
                    F.array_join(matched, "\n").alias("content"),
                    F.col("attributes"),
                )
                .filter(F.size(matched) > 0)
            )

        if not hof_preds:
            # No routes declared: reduce() below would throw on the
            # empty predicate list — every line is unmatched (parity
            # with the explode path, which skips the matched frames).
            return {UNMATCHED: _route_frame(lambda c: F.lit(True))}

        out = {name: _route_frame(p) for name, p in hof_preds.items()}
        out[UNMATCHED] = _route_frame(
            lambda c: ~reduce(lambda a, b: a | b, [p(c) for p in hof_preds.values()])
        )
        return out

    lines = df.select(
        F.col(id_col),
        "attributes",
        F.posexplode(F.split(F.col("content"), "\n")).alias("_idx", "_raw_line"),
    )
    line_val = F.trim(F.col("_raw_line")) if trim_whitespace else F.col("_raw_line")
    lines = lines.withColumn("_line", line_val)

    conds = {name: _line_predicate(F.col("_line"), matching, v, ignore_case) for name, v in routes.items()}

    if routing in ("all", "any"):
        (first_cond,) = list(conds.values())[:1]
        agg = F.min(first_cond.cast("int")) if routing == "all" else F.max(first_cond.cast("int"))
        keyed = lines.groupBy(id_col).agg(agg.alias("_m"))
        matched_ids = keyed.filter(F.col("_m") == 1).select(id_col)
        name = next(iter(routes))
        return {
            name: df.join(matched_ids, id_col, "left_semi"),
            UNMATCHED: df.join(matched_ids, id_col, "left_anti"),
        }

    out: dict[str, DataFrame] = {}
    none_match = None
    for name, cond in conds.items():
        none_match = ~cond if none_match is None else none_match & ~cond
        out[name] = _regroup_lines(lines.filter(cond), grouping_regex, id_col)
    if none_match is not None:
        out[UNMATCHED] = _regroup_lines(lines.filter(none_match), grouping_regex, id_col)
    return out


def _regroup_lines(lines: DataFrame, grouping_regex: str | None, id_col: str) -> DataFrame:
    """Combine matched lines back into one row per (source, group).

    Uses sort_array(collect_list(struct(idx,line))) — a single shuffle,
    order restored without a per-group sort (RouteText's 'Grouping
    Regular Expression', RouteText.h:124-178).
    """
    keys = [F.col(id_col)]
    gcols = [id_col]
    if grouping_regex:
        lines = lines.withColumn("_group", F.regexp_extract(F.col("_line"), grouping_regex, 1))
        keys.append(F.col("_group"))
        gcols.append("_group")
    grouped = (
        lines.groupBy(*gcols)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("_idx"), F.col("_line").alias("_l")))),
                    lambda s: s.getField("_l"),
                ),
                "\n",
            ).alias("content"),
            F.first("attributes").alias("attributes"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return grouped.drop("_n")


def retry_flow_file(
    df: DataFrame,
    max_retries: int = 3,
    attribute: str = "flowfile.retries",
) -> dict[str, DataFrame]:
    """RetryFlowFile (RetryFlowFile.cpp:39): increment a retry counter
    attribute; route to ``retry`` until it exceeds ``max_retries``,
    then ``retries_exceeded``.
    """
    current = F.coalesce(F.col("attributes").getItem(attribute).cast("int"), F.lit(0))
    # Filter FIRST, bump only the retry branch: filtering the bumped
    # frame would re-resolve `current` against the post-increment map
    # (off-by-one routing — a flowfile was exceeded one pass early with
    # a phantom extra retry on it; caught by the
    # retry_flow_file_exhaustion oracle, r5). The exceeded branch keeps
    # its counter untouched, like the reference.
    bumped = df.filter(current < F.lit(max_retries)).withColumn(
        "attributes",
        F.map_concat(
            F.col("attributes"),
            F.create_map(F.lit(attribute), (current + 1).cast("string")),
        ),
    )
    return {
        "retry": bumped,
        "retries_exceeded": df.filter(current >= F.lit(max_retries)),
    }


def funnel(*dfs: DataFrame) -> DataFrame:
    """Funnel (libminifi/include/Funnel.h:27): identity union."""
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other, allowMissingColumns=True)
    return out
