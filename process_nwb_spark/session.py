"""SparkSession factory with the engine's tuned defaults.

Local testing runs on local[N]; the confs below are the ones that matter at
cluster scale too (AQE, Arrow batching, shuffle partition sizing) — see
SURVEY.md §4 for the rationale.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "process-nwb-spark", master: str | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # r14 optimization: let cached (persisted) plans RETAIN their
        # output partitioning/ordering under AQE (default false wraps
        # every InMemoryRelation in an AQE plan whose partitioning is
        # opaque, so every join/agg over a cached frame re-exchanges it
        # even when the cache is already partitioned on the join key).
        # The engine persists self-joined intermediates everywhere
        # (tiles, shingles, LSH bands — core.fresh_persist), and this
        # removes whole cached-frame re-shuffles at ANY scale: measured
        # at sf0.1 minhash_lsh_candidates 0.83 -> 0.50 s,
        # ngram_jaccard_pairs 1.27 -> 1.10 s, dedup_embed_cosine
        # 1.54 -> 1.36 s; hash-stability re-proven at 7/64 shuffle
        # partitions after the change.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        # Arrow is the JVM<->Python interchange for every kernel.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Reference semantics are non-ANSI (e.g. silent casts); pin it.
        # SPARK_GRAFT_ANSI=1 flips it on for the ANSI audit gate
        # (tests/run_oracle_check.py run under Spark 4's default mode;
        # results + irreducible non-ANSI dependencies in SCALE.md).
        .config("spark.sql.ansi.enabled",
                "true" if os.environ.get("SPARK_GRAFT_ANSI") == "1"
                else "false")
        # guard: if a source ever carries parquet TIMESTAMP(NANOS), read it as
        # int64 ns instead of erroring; relational/core.py T() converts. The
        # driver testdata events.ts is timestamp[us] (reads as TIMESTAMP_NTZ,
        # also handled in T()) so this conf is inert there.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # let custom Python data sources (sources/ecog_datasource.py)
        # receive pushed filters for partition pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
