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
# ROTATED each round so cumulative driver coverage grows: rounds 1-4
# driver-checked 87 distinct queries (see CORRECTNESS_r0{1..4}.json); this
# round's prefix is 50 queries never yet driver-checked — streaming,
# event/time-series windows, dedup/LSH eval, text analysis, embeddings,
# dataprep/DQ, statistical aggs, scalar-fn surface, SQL surface, sources,
# UDF tier, and signal faces. The previously-proven queries follow in
# registry order (still covered by the committed full-registry local gate,
# ORACLE_LOCAL_r*.json).
DRIVER_PRIORITY = (
    # structured streaming (stream==batch equivalence surfaces)
    "win_sliding", "stream_dedup_first", "stream_static_join",
    "stream_stream_join",
    # event-time / time-series analytics + the segmented-pipeline
    # certification face (new in r5: bounded-memory segmented preprocess
    # vs whole-channel preprocess, contract-boolean oracle)
    "win_gap_fill", "funnel_conversion", "win_trailing_range",
    "anomaly_mad_flags", "ts_ohlc_bars", "ts_rolling_median",
    "seq_transition_matrix", "sig_segmented_parity",
    # dedup / LSH (incl. the precision-recall eval loop)
    "dedup_incremental", "dedup_chunk_exact", "dedup_keep_list",
    "minhash_signatures", "simhash_near_pairs", "lsh_eval_pr",
    # text analysis
    "text_langid", "text_repetition", "text_pii_redact",
    "text_bm25_search", "hybrid_search_rrf",
    # embeddings / ANN
    "embed_cosine_topk", "embed_pq_adc", "embed_quantile_norm",
    "embed_kmeans_lloyd", "embed_mllib_brp_lsh",
    # corpus assembly / data quality
    "sample_stratified", "split_contamination", "merge_upsert_changeset",
    "dq_profile_columns", "dq_ks_drift",
    # statistical aggregates
    "agg_percentiles", "agg_winsorized_mean", "agg_bitmap_distinct",
    "agg_ordered_quantiles", "agg_regression_stats", "agg_hll_sketch",
    # scalar-function surface
    "fn_interval_datetime", "fn_variant", "fn_map_higher_order",
    "fn_try_arith",
    # SQL surface
    "sub_exists_returned", "lateral_topk_orders", "sql_pipe_syntax",
    # sources / sinks
    "source_csv_roundtrip", "sink_partitioned_prune",
    # UDF tier
    "udf_arrow_grouped_scale", "udtf_word_positions",
)

# Round-6 rotation worklist: after this round's prefix is driver-checked,
# these 58 registry queries remain never-driver-sampled (cumulative
# coverage then 137/195). Rotate them in next round, keeping the four new
# spectral faces (sig_stft_energy, sig_coherence_contract, sig_welch_psd,
# sig_band_dim) near the head:
#   text_source_stats embed_centroids embed_knn_per_label multimodal_meta
#   text_vocab_topk text_lm_score embed_pca_power langid_confusion
#   vocab_zipf_slope dsir_importance dedup_embed_cosine embed_ivf_probe2
#   funnel_latency ts_seasonal_decompose user_journey_paths
#   win_cumulative_users ts_ewma_daily survival_km_churn
#   abtest_conversion_z win_mom_growth win_streaks orders_gap_stats
#   alert_error_rate sig_band_dim sig_resample_lengths
#   sig_electrode_region sig_stft_energy sig_coherence_contract
#   sig_welch_psd source_json_roundtrip udf_grouped_covar
#   udf_python_fallback udf_arrow_map_stats global_row_index
#   scd2_status_history fuzzy_match_blocked dq_benford_digits
#   mix_to_target_weights snapshot_diff agg_entropy_mix
#   mix_upsample_repeat agg_chi2_independence fn_string_extra
#   win_distribution source_orc_roundtrip source_xml_roundtrip
#   fn_collation sql_parameterized fn_array_predicates fn_explode_pos
#   agg_shape_stats pareto_frontier_parts sub_not_exists_customers
#   sub_scalar_threshold sub_in_region_suppliers unpivot_part_measures
#   agg_listagg_nations sql_scripting_loop


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
