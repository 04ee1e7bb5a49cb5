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

    Sorting is by sample_idx via array_sort on (sample_idx, value) structs
    (struct comparison is lexicographic, sample_idx first), so the packed
    array is in time order regardless of shuffle arrival order.
    """
    return (
        df.groupBy(*KEYS)
        .agg(F.array_sort(F.collect_list(F.struct("sample_idx", value_col))).alias("_sv"))
        .select(*KEYS, F.transform("_sv", lambda s: s[value_col]).alias("values"))
    )


def unpack(df: DataFrame, values_col: str = "values",
           value_col: str = "value", extra_keys=()) -> DataFrame:
    """Packed -> long via posexplode (narrow, JVM-side)."""
    keys = [k for k in (*KEYS, *extra_keys) if k in df.columns]
    return df.select(
        *keys, F.posexplode(values_col).alias("sample_idx", value_col)
    ).withColumn("sample_idx", F.col("sample_idx").cast("bigint"))
