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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from process_nwb_spark.relational.core import all_queries

    out = {}
    for name, spec in all_queries().items():
        # bind via default arg to avoid late-binding closures
        def run(spark, sf_dir, _spec=spec):
            return _spec.fn(_configure(spark), sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    from process_nwb_spark.relational.core import all_queries

    return {name: spec.oracle for name, spec in all_queries().items()
            if spec.oracle is not None}
