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
# ROTATED each round so cumulative driver coverage grows: rounds 1-5
# driver-checked 137 distinct queries (see CORRECTNESS_r0{1..5}.json); this
# round's prefix is 50 queries never yet driver-checked — the four round-5
# spectral faces + bad-channel screening near the head, then signal/source
# faces, text/embeddings, time-series analytics, DQ/dataprep, scalar fns,
# sources, and the UDF tier. The previously-proven queries follow in
# registry order (still covered by the committed full-registry local gate,
# ORACLE_LOCAL_r*.json / ORACLE_ANSI_r*.json).
DRIVER_PRIORITY = (
    # spectral tier faces (r5 additions) + channel-quality screening
    "sig_stft_energy", "sig_coherence_contract", "sig_welch_psd",
    "sig_band_dim", "sig_bad_channels",
    # remaining signal faces
    "sig_resample_lengths", "sig_electrode_region",
    # text analysis / corpus statistics
    "text_source_stats", "text_vocab_topk", "text_lm_score",
    "langid_confusion", "vocab_zipf_slope", "dsir_importance",
    # embeddings / ANN / semantic dedup
    "embed_centroids", "embed_knn_per_label", "embed_pca_power",
    "dedup_embed_cosine", "embed_ivf_probe2",
    # multimodal metadata
    "multimodal_meta",
    # event-time / time-series analytics
    "funnel_latency", "ts_seasonal_decompose", "user_journey_paths",
    "win_cumulative_users", "ts_ewma_daily", "survival_km_churn",
    "abtest_conversion_z", "win_mom_growth", "win_streaks",
    "orders_gap_stats", "alert_error_rate", "win_distribution",
    # dataprep / data quality / curation
    "global_row_index", "scd2_status_history", "fuzzy_match_blocked",
    "dq_benford_digits", "mix_to_target_weights", "snapshot_diff",
    "agg_entropy_mix", "mix_upsample_repeat", "agg_chi2_independence",
    # scalar-fn surface
    "fn_string_extra", "fn_collation", "fn_array_predicates",
    # SQL surface
    "sql_parameterized",
    # sources
    "source_json_roundtrip", "source_orc_roundtrip", "source_xml_roundtrip",
    # UDF tier
    "udf_grouped_covar", "udf_python_fallback", "udf_arrow_map_stats",
)

# Round-7 rotation worklist: after this round's prefix is driver-checked,
# these 24 registry queries remain never-driver-sampled (cumulative
# coverage then 187/211 — the first fifteen are this round's new signal
# faces: connectivity, epoching, bursts, multitaper, wPLI, PSI, CSD,
# band power, line-noise SNR, recording QC, Hjorth, spectral features).
# Rotate them to the head of the prefix next round; the rest of the
# prefix is free for any new queries' first driver sampling:
#   sig_xcorr_lags sig_pac_mi sig_erp_trialavg sig_plv_pairs
#   sig_burst_detect sig_itc_phase_reset sig_multitaper_psd
#   sig_wpli_contract sig_csd_laplacian sig_band_power
#   sig_line_noise_snr sig_psi_direction sig_recording_qc sig_hjorth
#   sig_spectral_features
#   fn_explode_pos agg_shape_stats pareto_frontier_parts
#   sub_not_exists_customers sub_scalar_threshold sub_in_region_suppliers
#   unpivot_part_measures agg_listagg_nations sql_scripting_loop


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
