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
        # AQE inside cached-plan builds (see session.py for the r15
        # cold-JVM adjudication; env override keeps it parameterised)
        ("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
         "false" if os.environ.get("SPARK_GRAFT_CACHED_PLAN_AQE",
                                   "1") == "0" else "true"),
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
# ROTATED each round so cumulative driver coverage grows. STATE AFTER r14:
# cumulative driver coverage is 342/342 of the 342-face registry, 0 red,
# 0 never-sampled (CORRECTNESS_r{01..14}.json) — builder-claimed and
# driver-proven coincide for the sixth consecutive round. The r15 window
# (an OPTIMIZATION round; see OPTIMIZATION_r15.md) leads with the faces
# whose plans this round rewrote — pointing the driver AT the riskiest
# changes — then the faces whose broadcast hints became size-gated
# (outputs identical at benched SFs by construction), then the stalest
# backfill (the r7 tier). The ENTIRE registry remains green under the
# committed full-registry exact gate in BOTH default and ANSI modes plus
# the shuffle-partition hash-stability probe (ORACLE_{LOCAL,ANSI}_r15,
# HASHSTAB_r15, re-run at end of round after the last plan rewrite).
DRIVER_PRIORITY = (
    # ---- (a-opt) faces whose PLAN was rewritten in the r15
    # OPTIMIZATION phase (outputs pinned hash-identical at
    # sf0.001/0.01/0.1 + ANSI + 7/64-partition hash stability before
    # commit; re-sample first): ----
    "ngram_jaccard_pairs",     # r15: df<=100 shingle self-join folded
    #   into ONE per-shingle collect_set riding the window's sh
    #   partitioning; pairs + per-doc sizes are row-local explodes of
    #   the folded set (SMJ + second cache scan gone)
    "jaccard_threshold_sweep",  # shares the folded candidate generator
    "graph_triangles",         # r15: edge construction folded into one
    #   groupBy(orderkey) basket collect_set + row-local (u<v) pair
    #   emission (distinct lines table + ok-keyed SMJ self-join gone)
    # ---- (a) faces whose broadcast hints became size-gated
    # (dim_broadcast: hint only under SPARK_GRAFT_BCAST_GATE_MB on-disk
    # footprint, else AQE decides — outputs identical at benched SFs,
    # 24 tpch_core + 6 event_windows sites; re-proven oracle-exact at
    # sf0.01 on change day). Many double as the r7-stale backfill: ----
    "join_inner_broadcast",
    "basket_lift_pairs",
    "star_topk_unshipped",
    "star_market_share",
    "sub_small_qty_revenue",
    "sub_late_sole_supplier",
    "star_nation_volume",      # also last driver r7
    "promo_revenue_share",     # also last driver r7
    "top_revenue_suppliers",   # also last driver r7
    "disjunctive_revenue",
    "min_cost_supplier",
    "product_type_profit",     # also last driver r7
    "returned_top_customers",  # also last driver r7
    "important_part_value",
    "supplier_cnt_by_part",    # also last driver r7
    "surge_part_suppliers",    # also last driver r7
    "mv_incremental_merge",
    "agg_weighted_median",
    "stream_static_join",
    "orders_gap_stats",
    "abtest_welch_t",
    "agg_revenue_concentration",
    "abtest_mann_whitney",
    "agg_gini_coefficient",
    # ---- (b) staleness backfill, oldest last-sample first: the
    # remaining r7 faces (recomputed from CORRECTNESS_r{01..14}.json;
    # cumulative driver coverage stands at 342/342, 0 never-sampled) ----
    "pareto_frontier_parts",  # last driver r7
    "quality_calibration",  # last driver r7
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
    "sub_in_region_suppliers",  # last driver r7
    "survival_km_churn",  # last driver r7
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
