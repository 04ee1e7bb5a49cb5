"""Baseline z-score normalization + band averaging — pure Catalyst.

The reference tutorial's final stage (SURVEY.md §2A #28;
examples/plot_ECoG_preprocessing_tutorial.py:164-167): per (channel, band),
compute mean/std over a baseline window (first `n_baseline` samples),
normalize the whole trace, then average the bands into one "high gamma"
trace per channel.

Plan shape: conditional window aggregates over (series, channel, band) —
ONE pass, one shuffle. The agg+broadcast-join-back formulation would be two
references to the upstream DataFrame, and since the upstream here is a
non-reusable kernel chain (pack -> mapInPandas kernels -> wavelet), Spark
would execute the whole pipeline twice — a silent 2x. (That formulation
remains the right one when the facts are a re-scannable table; the oracled
query `sig_zscore_baseline` states it that way in SQL.)
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_baseline(tf: DataFrame, n_baseline: int,
                    value_col: str = "amp") -> DataFrame:
    """(x - mean_baseline) / std_baseline per (series_id, channel, band).

    std is the population std (numpy's default ddof=0, as in the tutorial).
    Baseline stats are conditional aggregates over an unordered window, so
    the upstream plan is evaluated once (no self-join).
    """
    w = Window.partitionBy("series_id", "channel", "band")
    in_base = F.when(F.col("sample_idx") < n_baseline, F.col(value_col))
    mu = F.avg(in_base).over(w)
    sigma = F.stddev_pop(in_base).over(w)
    return tf.withColumn(value_col, (F.col(value_col) - mu) / sigma)


def band_mean(tf: DataFrame, value_col: str = "amp") -> DataFrame:
    """Average over bands -> one trace per (series_id, channel, sample_idx)."""
    return (
        tf.groupBy("series_id", "channel", "sample_idx")
        .agg(F.avg(value_col).alias(value_col))
    )
