"""Trial epoching and event-related averaging (ERP) — the first analysis
every ECoG/EEG experiment runs on the engine's preprocessed output:
cut a window around each stimulus marker and average across trials.

Scale design (the classic bounded-range-join problem, solved the
bucketized way rather than with a broadcast nested-loop):

1. each signal sample maps to time bucket floor(sample_idx / W) where
   W = pre + post + 1 (the epoch width) — a narrow projection;
2. each marker EXPLODES to the (at most 2) buckets its window can span
   — markers are the small side, so the fan-out is on the cheap side;
3. equi-join on (series_id, bucket) — a real hash/SMJ equi-join whose
   shuffle is linear in samples + 2x markers, NEVER samples x markers
   (the nested-loop a naive `between` join would plan);
4. residual filter to the exact window, project
   rel_idx = sample_idx - onset in [-pre, +post].

Overlapping epochs are handled naturally (a sample lands in every
window that covers it). ERP averaging is then one partial-aggregable
groupBy (channel, rel_idx).

Reference analog: none — the reference stops at preprocessed arrays
(pipelines.py:15-111) and its tutorial does epoch averaging manually in
NumPy (examples/plot_ECoG_preprocessing_tutorial.py's z-score window is
the same shape); this is that step made distributed.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epoch_trials(signals: DataFrame, markers: DataFrame,
                 pre: int, post: int,
                 value_col: str = "value",
                 extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """Cut [-pre, +post] sample windows around each marker.

    signals: long (series_id, channel, sample_idx, <value_col>).
    markers: (series_id, trial_id, onset_sample) — one row per stimulus.
    Returns (series_id, trial_id, channel[, *extra_keys], rel_idx,
    <value_col>) with rel_idx in [-pre, +post]; windows running off the
    recording edge simply contribute their existing samples (no padding
    — trial counts per rel_idx are surfaced by erp_average for
    transparency).

    `extra_keys` names additional identity columns to carry through
    (e.g. ("band",) to epoch the pipeline's banded wavelet amplitude —
    the ERSP workflow: epoch amp per band, then erp_average/
    inter_trial_coherence with the same extra_keys).
    """
    if pre < 0 or post < 0:
        raise ValueError(f"need pre >= 0 and post >= 0, got {pre}/{post}")
    w = int(pre) + int(post) + 1
    s = signals.withColumn("_bkt", F.floor(F.col("sample_idx") / w))
    # a window [onset-pre, onset+post] spans at most 2 width-w buckets
    lo = F.floor((F.col("onset_sample") - pre) / w)
    hi = F.floor((F.col("onset_sample") + post) / w)
    m = (markers
         .withColumn("_bkt", F.explode(F.array_distinct(F.array(lo, hi))))
         .select("series_id", "trial_id", "onset_sample", "_bkt"))
    j = s.join(m, ["series_id", "_bkt"])
    rel = F.col("sample_idx") - F.col("onset_sample")
    return (j.filter(rel.between(-pre, post))
            .select("series_id", "trial_id", "channel", *extra_keys,
                    rel.cast("int").alias("rel_idx"), value_col))


def erp_average(epochs: DataFrame, value_col: str = "value",
                extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """Average epoched samples across trials: one partial-aggregable
    aggregate -> (series_id, channel[, *extra_keys], rel_idx, erp,
    n_trials). `n_trials` exposes edge-truncated windows (fewer
    contributing trials at a given rel_idx than markers); pass the same
    `extra_keys` used for epoch_trials (e.g. ("band",) for ERSP)."""
    return (epochs.groupBy("series_id", "channel", *extra_keys, "rel_idx")
            .agg(F.avg(value_col).alias("erp"),
                 F.count(F.lit(1)).alias("n_trials")))


def inter_trial_coherence(epochs: DataFrame,
                          phase_col: str = "phase",
                          extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """Inter-trial coherence (phase-locking across TRIALS at each
    latency):

        ITC(ch, rel) = | mean_trials( exp(i * phi[trial, ch, rel]) ) |

    1 when every trial lands at the same phase `rel` samples after the
    stimulus (a phase-reset response), ~1/sqrt(n_trials) for random
    phase. Input is `epoch_trials` applied to a PHASE stream (the
    preprocess(abs_only=False) output), value_col renamed to `phase`.
    Same single partial-aggregable aggregate shape as erp_average —
    the ERP's circular-statistics sibling."""
    p = F.col(phase_col)
    agg = epochs.groupBy("series_id", "channel", *extra_keys,
                         "rel_idx").agg(
        F.avg(F.cos(p)).alias("_re"), F.avg(F.sin(p)).alias("_im"),
        F.count(F.lit(1)).alias("n_trials"))
    return agg.select(
        "series_id", "channel", *extra_keys, "rel_idx",
        F.sqrt(F.col("_re") ** 2 + F.col("_im") ** 2).alias("itc"),
        "n_trials")
