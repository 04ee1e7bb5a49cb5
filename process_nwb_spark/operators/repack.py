"""Long <-> packed layout conversion for signal DataFrames.

Long (canonical, relational): (series_id, channel, sample_idx, value)
Packed (kernel carrier):      (series_id, channel, values ARRAY<DOUBLE>)

Every spectral kernel needs a channel's full time axis in one task, so the
engine packs once per kernel *stage group* (one shuffle), runs any number of
fused kernels on the packed rows via narrow `mapInPandas` passes, and
unpacks with `posexplode` (narrow). This keeps the default pipeline at 3
repacking shuffles total (SURVEY.md §3/§7).

Packing is pure Catalyst: collect_list of (sample_idx, value) structs +
array_sort + transform — no Python crossing, stays in the JVM.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ("series_id", "channel")


def pack(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Long -> packed. One shuffle on (series_id, channel).

    Time order comes from an explicit repartition on the group keys +
    sortWithinPartitions on (keys, sample_idx): the aggregation then sees
    each group's rows contiguous and time-ordered, so collect_list of the
    bare value column is already in order. This packs primitive doubles
    directly — the earlier collect_list-of-(idx, value)-structs +
    array_sort formulation built n_time tiny JVM structs per channel and
    re-sorted them inside the aggregate, which dominated pack time at
    10^7-row inputs (~10 s for 64 ch x 192k samples vs ~3 s this way;
    Spark's shuffle sort is radix/codegen, the struct comparator is not).
    Ordering contract: rows are hash-partitioned by exactly the groupBy
    keys, so the aggregation adds no exchange, and collect_list appends in
    partition iteration order == the sorted order. Verified bitwise against
    the dense oracle in tests/test_pipeline.py.
    """
    return (
        df.repartition(*KEYS)
        .sortWithinPartitions(*KEYS, "sample_idx")
        .groupBy(*KEYS)
        .agg(F.collect_list(value_col).alias("values"))
    )


def unpack(df: DataFrame, values_col: str = "values",
           value_col: str = "value", extra_keys=()) -> DataFrame:
    """Packed -> long via posexplode (narrow, JVM-side)."""
    keys = [k for k in (*KEYS, *extra_keys) if k in df.columns]
    return df.select(
        *keys, F.posexplode(values_col).alias("sample_idx", value_col)
    ).withColumn("sample_idx", F.col("sample_idx").cast("bigint"))
