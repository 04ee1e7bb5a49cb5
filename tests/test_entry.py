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


def test_r12_window_is_staleness_ordered():
    """With 314/314 driver-proven cumulatively (r11), the r12 window
    re-verifies: the faces whose implementation the r12 diff touched
    lead (DoReMi guard + bucketed_range_rank refactor callers), then
    staleness backfill — the whole r5 cohort (7 rounds stale) must sit
    in the head right after them, and the r6 cohort inside the list.
    The cohort sets derive from CORRECTNESS_r{01..11}.json (the
    per-face last-sampled-round fold)."""
    touched_r12 = ["quality_gopher_rules", "text_collapse_repeats",
                   "corpus_source_overlap", "dedup_best_of_cluster",
                   "mix_length_buckets", "quality_rule_stats",
                   "vocab_growth_curve", "tokenizer_fertility",
                   "embed_matryoshka_recall",
                   "mix_doremi_weights", "mix_token_budget",
                   "mix_curriculum_interleave", "rank_ndcg_eval",
                   "mix_anneal_schedule"]
    r5_cohort = {
        "merge_upsert_changeset", "minhash_signatures",
        "sample_stratified", "seq_transition_matrix",
        "sig_segmented_parity", "sink_partitioned_prune",
        "source_csv_roundtrip", "split_contamination", "sql_pipe_syntax",
        "stream_dedup_first", "stream_static_join", "stream_stream_join",
        "sub_exists_returned", "text_pii_redact", "text_repetition",
        "ts_ohlc_bars", "ts_rolling_median", "udf_arrow_grouped_scale",
        "udtf_word_positions", "win_gap_fill", "win_sliding",
        "win_trailing_range"}
    head = list(entry.DRIVER_PRIORITY)
    assert head[:len(touched_r12)] == touched_r12
    assert r5_cohort <= set(head[:len(touched_r12) + len(r5_cohort)])
    assert len(head) == 14 + 22 + 46  # added+touched, r5 + r6 cohorts
