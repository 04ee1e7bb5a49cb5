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


def test_r13_window_is_staleness_ordered():
    """With 323/323 driver-proven cumulatively (r12), the r13 window
    re-verifies: the faces whose implementation the r13 diff touched
    lead (matryoshka zero-norm guard, corpus_source_overlap max_df
    hatch, bucketed_range_rank cuts-validation callers), then staleness
    backfill — the 32 remaining r6 faces (7 rounds stale) must sit in
    the head right after them, then the r7 cohort. The cohort sets
    derive from CORRECTNESS_r{01..12}.json (the per-face
    last-sampled-round fold)."""
    touched_r13 = ["text_unigram_entropy", "corpus_crossentropy_matrix",
                   "mix_perplexity_buckets", "mix_source_caps",
                   "embed_matryoshka_budget",
                   "embed_matryoshka_recall", "corpus_source_overlap",
                   "mix_token_budget", "mix_curriculum_interleave",
                   "rank_ndcg_eval", "mix_anneal_schedule"]
    r6_cohort = {
        "fuzzy_match_blocked", "global_row_index", "langid_confusion",
        "mix_to_target_weights", "mix_upsample_repeat",
        "multimodal_meta", "orders_gap_stats", "scd2_status_history",
        "sig_bad_channels", "sig_band_dim", "sig_coherence_contract",
        "sig_resample_lengths", "sig_stft_energy", "sig_welch_psd",
        "snapshot_diff", "source_json_roundtrip",
        "source_orc_roundtrip", "source_xml_roundtrip",
        "sql_parameterized", "text_lm_score", "text_source_stats",
        "text_vocab_topk", "ts_ewma_daily", "udf_arrow_map_stats",
        "udf_grouped_covar", "udf_python_fallback",
        "user_journey_paths", "vocab_zipf_slope",
        "win_cumulative_users", "win_distribution", "win_mom_growth",
        "win_streaks"}
    head = list(entry.DRIVER_PRIORITY)
    assert head[:len(touched_r13)] == touched_r13
    assert r6_cohort == set(head[len(touched_r13):
                                 len(touched_r13) + len(r6_cohort)])
    assert len(head) == 5 + 6 + 32 + 48  # added+touched, r6+r7 cohorts
