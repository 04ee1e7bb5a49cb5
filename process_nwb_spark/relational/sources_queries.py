"""Source/sink coverage as checkable queries (SURVEY.md §2C Scans/sources):
`spark.range` generator scan, exact percentiles, and CSV/JSON round-trips
(write a projection of `documents` to a scratch dir, read it back through
the text source, aggregate — the oracle replays the aggregate on the
original parquet, so a lossy round-trip would hash-mismatch).

Round-trip scratch space is /tmp (driver-local). At scale the same
write/read is a distributed partitioned write — the queries here pin
a single output partition only to keep the smoke-sized round-trip cheap.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .core import T, query


@query(
    "scan_range",
    """
    SELECT i AS n,
           CAST(i * i AS BIGINT) AS n_sq,
           CAST(i % 7 AS BIGINT) AS n_mod7
    FROM RANGE(0, 1000) t(i)
    """,
    doc="generator scan: spark.range is a zero-I/O distributed source "
        "(splits the [start,end) interval across partitions); DuckDB RANGE() "
        "replays it",
)
def scan_range(spark, sf_dir):
    return spark.range(0, 1000).select(
        F.col("id").alias("n"),
        (F.col("id") * F.col("id")).alias("n_sq"),
        (F.col("id") % 7).alias("n_mod7"),
    )


@query(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE), 0.5), 4)
             AS p50_price,
           ROUND(QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE), 0.9), 4)
             AS p90_price,
           ROUND(QUANTILE_CONT(CAST(l_quantity AS DOUBLE), 0.25), 4)
             AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact interpolated percentiles per group (Spark `percentile` == "
        "DuckDB QUANTILE_CONT, both linear interpolation). The approximate "
        "sketch variant (percentile_approx/KLL) is the 100 TB path — "
        "mergeable partial sketches, no global sort — covered rows-only by "
        "agg_approx_count_distinct's pattern",
)
def agg_percentiles(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    qty = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(price, F.lit(0.5)), 4).alias("p50_price"),
        F.round(F.percentile(price, F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile(qty, F.lit(0.25)), 4).alias("p25_qty"),
    )


def _scratch(sf_dir: str, fmt: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(),
                        f"pnwb_spark_roundtrip_{fmt}_{tag}")


_ROUNDTRIP_ORACLE = """
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM documents
    GROUP BY lang, source
"""


def _roundtrip_agg(df):
    return df.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "source_csv_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="CSV sink + source: documents (numeric/categorical projection) -> "
        "csv with header -> read back with explicit schema -> aggregate. "
        "Hash-matches the same aggregate on the original parquet, proving "
        "the round-trip is lossless",
)
def source_csv_roundtrip(spark, sf_dir):
    out = _scratch(sf_dir, "csv")
    (T(spark, sf_dir, "documents")
     .select("doc_id", "lang", "source", "n_chars")
     .coalesce(1)
     .write.mode("overwrite").option("header", True).csv(out))
    back = spark.read.option("header", True).schema(
        "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT").csv(out)
    return _roundtrip_agg(back)


@query(
    "source_json_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="JSON-lines sink + source: same round-trip through the json reader "
        "(schema given explicitly; inference would widen types)",
)
def source_json_roundtrip(spark, sf_dir):
    out = _scratch(sf_dir, "json")
    (T(spark, sf_dir, "documents")
     .select("doc_id", "lang", "source", "n_chars")
     .coalesce(1)
     .write.mode("overwrite").json(out))
    back = spark.read.schema(
        "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT").json(out)
    return _roundtrip_agg(back)
