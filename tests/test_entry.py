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


def test_r11_window_is_staleness_ordered():
    """With 305/305 driver-proven cumulatively (r10), the r11 window
    re-verifies: the three faces ADDED in r11 lead, then the staleness
    backfill — every r4-sampled face (7 rounds stale) must be in the
    25-face head, and the whole r5 cohort inside the priority list.
    The cohort sets derive from CORRECTNESS_r{1..10}.json (the per-face
    last-sampled-round fold)."""
    added_r11 = ["mix_pack_epoch_stream", "dedup_ngram_coverage",
                 "mix_token_budget", "mix_doremi_weights",
                 "mix_curriculum_interleave", "rank_ndcg_eval",
                 "quality_survival_curve", "mix_anneal_schedule",
                 "dedup_cluster_stats"]
    r4_cohort = {
        "pivot_qty_by_flag", "proj_filter_case", "retention_cohorts",
        "running_balance_clamped", "scan_range", "scd2_point_in_time",
        "session_funnel", "sig_car_subtract", "sig_zscore_baseline",
        "simhash_fingerprints", "split_train_test",
        "sql_recursive_months", "sub_scalar_correlated",
        "text_tfidf_topterms", "ts_linear_interp",
        "ts_time_weighted_avg", "udf_embed_norms",
        "udf_grouped_map_demean", "win_running_frames", "win_session",
        "win_topk_per_group", "win_tumbling"}
    head = list(entry.DRIVER_PRIORITY)
    assert head[:len(added_r11)] == added_r11
    assert r4_cohort <= set(head[:len(added_r11) + len(r4_cohort)])
    assert len(head) == 9 + 22 + 41   # added + r4 cohort + r5 cohort
