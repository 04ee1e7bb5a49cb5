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


def test_r14_window_is_staleness_ordered():
    """With 328/328 driver-proven cumulatively (r13), the r14 window
    re-verifies: (1) the faces whose PHYSICAL PLAN the r14 optimization
    phase rewrote lead (outputs pinned hash-identical before commit —
    these carry the highest re-verification value), then (2) the faces
    the r14 build diff added or touched, then (3) staleness backfill —
    the 41 remaining r7 faces (7 rounds stale; r13's window already
    re-proved the first 7 of the r7 cohort). The cohort sets derive
    from CORRECTNESS_r{01..13}.json (the per-face last-sampled-round
    fold) plus OPTIMIZATION_r14.md's per-operator log."""
    opt_rewritten = ["text_kgram_dup_profile", "dq_psi_drift",
                     "agg_count_min_sketch", "embed_matryoshka_budget",
                     "embed_matryoshka_recall", "corpus_source_overlap",
                     "agg_trimmed_mean", "join_sortmerge_large",
                     "join_asof", "simhash_fingerprints",
                     "simhash_near_pairs", "doc_fingerprint_winnow",
                     "text_token_counts", "jaccard_threshold_sweep",
                     "embed_ivf_topk", "embed_ivf_probe2",
                     "embed_cell_balance", "embed_margin_bitext",
                     "semantic_dedup", "dedup_threshold_sweep",
                     "sig_car_subtract", "embed_ann_lsh",
                     "text_lm_score", "text_tfidf_topterms",
                     "text_bm25_search", "hybrid_search_rrf",
                     "graph_triangles", "text_ngram_containment"]
    touched_r14 = ["mix_dedup_budget", "quality_gate_tradeoff",
                   "tokenizer_vocab_sweep",
                   "quality_lm_agreement", "mix_repeat_budget",
                   "tokenizer_oov_rate", "quality_rule_ablation",
                   "dedup_cluster_cap", "corpus_word_burstiness",
                   "rank_mrr_eval",
                   "corpus_crossentropy_matrix", "mix_perplexity_buckets",
                   "mix_source_caps", "split_contamination",
                   "dedup_embed_cosine", "ngram_jaccard_pairs"]
    r7_remaining = {
        "important_part_value", "line_priority_counts",
        "min_cost_supplier", "minhash_jaccard_est", "ngram_novelty",
        "orders_priority_exists", "pareto_frontier_parts",
        "product_type_profit", "promo_revenue_share",
        "quality_calibration", "returned_top_customers",
        "sig_band_power", "sig_burst_detect", "sig_csd_laplacian",
        "sig_delay_estimate", "sig_electrode_region",
        "sig_envelope_corr", "sig_erp_trialavg", "sig_granger_dir",
        "sig_hjorth", "sig_itc_phase_reset", "sig_line_noise_snr",
        "sig_multitaper_psd", "sig_pac_mi", "sig_peak_detect",
        "sig_plv_pairs", "sig_ppc_nm", "sig_psi_direction",
        "sig_recording_qc", "sig_spectral_features",
        "sig_wpli_contract", "sig_xcorr_lags", "sql_scripting_loop",
        "star_nation_volume", "sub_in_region_suppliers",
        "supplier_cnt_by_part", "surge_part_suppliers",
        "survival_km_churn", "top_revenue_suppliers",
        "ts_seasonal_decompose", "unpivot_part_measures"}
    head = list(entry.DRIVER_PRIORITY)
    assert head[:len(opt_rewritten)] == opt_rewritten
    n0 = len(opt_rewritten)
    assert head[n0:n0 + len(touched_r14)] == touched_r14
    n1 = n0 + len(touched_r14)
    assert r7_remaining == set(head[n1:n1 + len(r7_remaining)])
    # 28 plan-rewritten (22 from the build-phase window + 6 from the
    # optimization session's second pass) + 16 added/touched (4
    # third-batch adds are in the rewritten block) + stale r7 cohort
    assert len(head) == 28 + 16 + 41
