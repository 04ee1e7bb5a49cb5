"""Driver-contract and check-off-map consistency pins (no Spark session).

COVERAGE.md is the check-off map future rounds trust; its §2C headline
count drifted once (said 282 while the registry held 298), so the count
is now structural: this test recomputes it from `core.all_queries()`.
"""
import re
import os

import __spark_entry__ as entry
from process_nwb_spark.relational.core import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_count_matches_registry():
    reg = all_queries()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"(\d+) queries, \*\*(\d+) SQL-oracled", text)
    assert m, "COVERAGE.md lost its '<N> queries, **<N> SQL-oracled' line"
    assert int(m.group(1)) == len(reg), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(reg)}")
    n_oracled = sum(1 for s in reg.values() if s.oracle is not None)
    assert int(m.group(2)) == n_oracled, (
        f"COVERAGE.md says {m.group(2)} SQL-oracled, registry has {n_oracled}")


def test_driver_priority_names_resolve_and_are_unique():
    reg = all_queries()
    names = entry.DRIVER_PRIORITY
    assert len(set(names)) == len(names), "duplicate in DRIVER_PRIORITY"
    missing = [n for n in names if n not in reg]
    assert not missing, f"DRIVER_PRIORITY names not in registry: {missing}"


def test_r10_window_is_staleness_ordered():
    """With 304/304 driver-proven (r9), the r10 window re-verifies: the
    faces whose Spark implementation changed in r10 lead, and the rest
    of the window is the oldest-driver-sample cohort — every r2-sampled
    face (none driver-checked in 8 rounds) must be in the 50-face head,
    along with any r10-added faces."""
    changed_r10 = ["mix_epoch_shuffle", "dq_psi_drift"]
    added_r10 = {"mix_lang_temperature"}
    r2_cohort = {
        "agg_collect_sorted", "agg_count_distinct", "agg_cube",
        "agg_grouping_sets", "agg_rollup", "agg_stats",
        "basket_lift_pairs", "fn_array", "fn_bitwise_conditional",
        "fn_date", "fn_json_map", "fn_math", "fn_string", "join_cross",
        "join_full_outer", "join_left_coalesce", "join_right",
        "join_semi", "pareto_abc_customers", "rfm_segments",
        "set_intersect", "set_union_all", "set_union_distinct",
        "sort_nulls_limit", "star_large_orders", "star_local_revenue",
        "star_topk_unshipped", "sub_late_sole_supplier",
        "sub_small_qty_revenue", "win_lag_lead", "win_range_frame",
        "win_rank_dense", "win_zscore"}
    head = list(entry.DRIVER_PRIORITY[:50])
    assert set(head[:3]) == set(changed_r10) | added_r10
    assert added_r10 <= set(head)
    assert r2_cohort <= set(head)
