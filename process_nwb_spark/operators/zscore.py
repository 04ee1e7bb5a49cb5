"""Baseline z-score normalization + band averaging — pure Catalyst.

The reference tutorial's final stage (SURVEY.md §2A #28;
examples/plot_ECoG_preprocessing_tutorial.py:164-167): per (channel, band),
compute mean/std over a baseline window (first `n_baseline` samples),
normalize the whole trace, then average the bands into one "high gamma"
trace per channel.

Plan shape: filtered aggregate (map-side partial agg) -> broadcast join of
the tiny stats table back onto the facts -> projection -> band-average
aggregate. The stats table has n_channels x n_bands rows, always broadcast.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_baseline(tf: DataFrame, n_baseline: int,
                    value_col: str = "amp") -> DataFrame:
    """(x - mean_baseline) / std_baseline per (series_id, channel, band).

    std is the population std (numpy's default ddof=0, as in the tutorial).
    """
    keys = ["series_id", "channel", "band"]
    stats = (
        tf.filter(F.col("sample_idx") < n_baseline)
        .groupBy(*keys)
        .agg(F.avg(value_col).alias("_mu"),
             F.stddev_pop(value_col).alias("_sigma"))
    )
    return (
        tf.join(F.broadcast(stats), keys)
        .withColumn(value_col, (F.col(value_col) - F.col("_mu")) / F.col("_sigma"))
        .drop("_mu", "_sigma")
    )


def band_mean(tf: DataFrame, value_col: str = "amp") -> DataFrame:
    """Average over bands -> one trace per (series_id, channel, sample_idx)."""
    return (
        tf.groupBy("series_id", "channel", "sample_idx")
        .agg(F.avg(value_col).alias(value_col))
    )
