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


def high_gamma_packed(wv: DataFrame, n_baseline: int,
                      values_col: str = "amp") -> DataFrame:
    """zscore_baseline + band_mean fused on the PACKED wavelet rows
    (series_id, channel, band, amp ARRAY) — the pipeline's physical fast
    path: baseline stats and normalization are per-row array folds (pure
    Catalyst higher-order functions, no Python), the band average is an
    element-wise zip over the n_bands arrays of a channel (one shuffle of
    n_channels x n_bands ARRAY rows), and the long explode happens ONCE on
    the final per-channel trace. The long-format formulation (above) pays
    the explode first and then shuffles n_time x n_channels x n_bands rows
    twice (window + groupBy); at 64 ch x 60 s that is 9.2M-row shuffles vs
    384 array rows here (~24 s -> ~2 s measured). Same math: population
    std over the first n_baseline samples, mean across bands."""
    nb = int(n_baseline)
    base = F.slice(values_col, 1, nb)
    # divide by the ACTUAL baseline count: a trace shorter than n_baseline
    # yields a short slice, and dividing by the literal nb would deflate
    # mean/std — silently diverging from the zscore_baseline long path
    # (which averages over the real count). least() is nb for every
    # normal-length trace, so the fast path stays bitwise-identical there.
    bn = F.least(F.lit(nb), F.size(values_col)).cast("double")
    mu = F.aggregate(base, F.lit(0.0), lambda a, x: a + x) / bn
    sd = F.sqrt(F.aggregate(base, F.lit(0.0),
                            lambda a, x: a + (x - mu) * (x - mu)) / bn)
    # Bind (mu, sd) ONCE per row via the single-element-transform idiom:
    # naming them with withColumn and referencing the names inside the
    # per-element lambda lets CollapseProject inline the baseline FOLDS
    # into the lambda body — the O(nb) aggregate then re-runs for every
    # one of the n_time elements (measured 114 s vs 6 s on 64 ch x 6
    # bands x 24k samples). A lambda variable cannot be inlined through.
    zarr = F.element_at(
        F.transform(
            F.array(F.struct(mu.alias("m"), sd.alias("s"))),
            lambda st: F.transform(
                values_col, lambda x: (x - st["m"]) / st["s"])),
        1)
    z = wv.withColumn("_z", zarr)
    # collect (band, z) structs and sort by band before the element-wise
    # fold: collect_list arrival order is not a contract, and summing the
    # band arrays in arrival order makes the float result depend on task
    # scheduling / upstream operator choice (~1e-7 relative). Sorting 6
    # structs is free and pins the sum order -> deterministic output.
    per_ch = (z.groupBy("series_id", "channel")
              .agg(F.array_sort(
                   F.collect_list(F.struct("band", "_z"))).alias("_bz"))
              .withColumn("_arrs", F.expr("transform(_bz, s -> s._z)"))
              .withColumn("_hg", F.expr(
                  "transform(aggregate(_arrs,"
                  " array_repeat(cast(0.0 as double), size(_arrs[0])),"
                  " (acc, a) -> zip_with(acc, a, (p, q) -> p + q)),"
                  " s -> s / size(_arrs))")))
    return per_ch.select(
        "series_id", "channel",
        F.posexplode("_hg").alias("sample_idx", values_col)
    ).withColumn("sample_idx", F.col("sample_idx").cast("bigint"))
