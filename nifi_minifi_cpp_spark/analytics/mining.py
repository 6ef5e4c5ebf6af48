"""Pattern-mining operators: association rules (market-basket) and
blocked entity resolution.

Reference parity: the reference ships no dedicated mining processors —
these are the large-scale training-data/analytics operators the build
brief asks for beyond the reference surface (frequent co-occurrence for
feature engineering; record linkage for entity-level dedup before
content-level dedup).

Scale design notes are on each function: baskets are bounded before any
pair explosion, vocabulary-sized side tables broadcast, and candidate
generation is always block-bounded — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int = 200,
) -> DataFrame:
    """A-priori 2-itemset association rules: for every unordered item
    pair co-occurring in at least ``min_pair_count`` baskets, emit
    support, directional confidences, and lift (Agrawal & Srikant 1994,
    VLDB — the frequent-itemset/association-rule formulation).

    Output: (item_a, item_b, n_pair, support, conf_a_b, conf_b_a,
    lift) with item_a < item_b; ratios are exact long-by-long double
    divisions rounded to 4 places (deterministic across engines).

    100 TB shape: the input collapses to DISTINCT (basket, item) slim
    pairs first (map-side partial distinct); per-basket pair generation
    is a pure HOF explosion bounded by ``max_basket_items`` (a
    pathological mega-basket contributes at most max^2/2 pairs instead
    of unbounded quadratic blowup — the standard basket cap); pair
    counts shuffle as slim (item, item) keys; the single-item count and
    total-basket tables are vocabulary-sized and BROADCAST onto the
    pair frame. Nothing all-pairs, no driver collect."""
    from ..util import reliable_barrier

    # three consumers (basket sets, single counts, basket total) — the
    # barrier scans the raw input once instead of three times
    items = reliable_barrier(
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")).distinct()
    )
    sets = items.groupBy("_b").agg(
        F.slice(F.sort_array(F.collect_set("_i")), 1, max_basket_items).alias("_s")
    )
    # single-item baskets contribute no pairs — and MUST be filtered
    # before the HOF: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather
    # than returning empty, which would index past the array
    sets = sets.where(F.size("_s") >= 2)
    n = F.size("_s")
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, n),
                        lambda j: F.struct(
                            F.element_at("_s", i).alias("a"),
                            F.element_at("_s", j).alias("b"),
                        ),
                    ),
                )
            )
        ).alias("_p")
    ).select(F.col("_p.a").alias("_ia"), F.col("_p.b").alias("_ib"))
    pair_counts = (
        pairs.groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).alias("_np"))
        .where(F.col("_np") >= min_pair_count)
    )
    singles = items.groupBy("_i").agg(F.count(F.lit(1)).alias("_ns"))
    totals = items.agg(F.countDistinct("_b").alias("_nb"))
    out = (
        pair_counts.join(
            F.broadcast(singles.select(F.col("_i").alias("_ia"), F.col("_ns").alias("_na"))),
            "_ia",
        )
        .join(
            F.broadcast(singles.select(F.col("_i").alias("_ib"), F.col("_ns").alias("_nb_i"))),
            "_ib",
        )
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        F.col("_ia").alias("item_a"),
        F.col("_ib").alias("item_b"),
        F.col("_np").cast("long").alias("n_pair"),
        F.round(F.col("_np") / F.col("_nb"), 4).alias("support"),
        F.round(F.col("_np") / F.col("_na"), 4).alias("conf_a_b"),
        F.round(F.col("_np") / F.col("_nb_i"), 4).alias("conf_b_a"),
        F.round(
            (F.col("_np") * F.col("_nb")) / (F.col("_na") * F.col("_nb_i")), 4
        ).alias("lift"),
    )


def entity_resolution_blocked(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_edit_distance: int = 2,
    block_prefix: int = 12,
    block_suffix: int = 6,
    max_block: int = 512,
) -> DataFrame:
    """Blocked record linkage (Fellegi & Sunter 1969 shape; the
    standard multi-pass blocking of Hernandez & Stolfo 1995): candidate
    pairs come from the UNION of two blocking keys — name prefix and
    name suffix — so a typo anywhere outside one of the two zones still
    pairs; survivors are verified with exact Levenshtein distance
    <= ``max_edit_distance``. Returns matched (id_a, id_b, name_a,
    name_b, edit_distance) with id_a < id_b.

    100 TB shape: only slim (block_key, id, name) rows shuffle; each
    block self-joins independently (an equi-join on the key, never a
    cartesian) and a deterministic per-block cap of ``max_block`` rows
    bounds a degenerate hot block (the skew dial shared with the LSH
    dedups); the pair set is distinct-ed BEFORE the O(len^2) edit
    distance runs, so each surviving pair pays Levenshtein exactly
    once. Levenshtein stays JVM-side codegen (built-in levenshtein)."""
    from pyspark.sql import Window

    slim = df.select(F.col(id_col).alias("_id"), F.col(name_col).alias("_n"))
    keyed = slim.select(
        "_id", "_n", F.substring("_n", 1, block_prefix).alias("_k")
    ).unionAll(
        slim.select(
            "_id",
            "_n",
            F.concat(F.lit("$sfx:"), F.substring("_n", -block_suffix, block_suffix)).alias(
                "_k"
            ),
        )
    )
    keyed = (
        keyed.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("_k").orderBy("_id"))
        )
        .where(F.col("_rn") <= max_block)
        .drop("_rn")
    )
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), "_k")
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("name_a"),
            F.col("b._n").alias("name_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("edit_distance"),
    ).where(F.col("edit_distance") <= max_edit_distance)
