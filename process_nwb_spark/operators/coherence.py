"""Cross-channel spectral connectivity: Welch-averaged cross-spectra and
magnitude-squared coherence — the downstream analysis ECoG pipelines run
on preprocessed recordings (connectivity matrices per frequency band).

Spark shape: ONE bounded-frame shuffle produces per-frame complex
spectra (same batched-frame layout as operators/stft.py, ~1x data
volume at any overlap), then channel pairing is an ordinary self-JOIN on
(series, frame, bin) and the Welch average is a partial-aggregable
groupBy — connectivity becomes relational algebra, no whole-recording
state anywhere. Output cardinality is tiny (n_ch^2/2 x n_bins rows per
series), so downstream band rollups are trivial.

    coh_xy(f) = |avg_frames(X_f * conj(Y_f))|^2
                / (avg|X_f|^2 * avg|Y_f|^2)

Properties pinned in tests/test_coherence.py: coh(x,x) == 1 exactly;
independent noise decays like ~1/n_frames; a shared tone buried in
independent noise lights up ONLY its own bin.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stft import _window

SPEC_SCHEMA = ("series_id STRING, channel INT, frame BIGINT, "
               "bin INT, re DOUBLE, im DOUBLE")


def stft_complex(signals: DataFrame, frame_len: int, hop: int | None = None,
                 window: str = "hann",
                 frames_per_task: int = 256) -> DataFrame:
    """Per-frame one-sided complex spectra (re, im), FULL frames only —
    the batched-frame kernel of operators/stft.stft_power_batched with
    the phase kept (cross-spectra need it; power-only folding loses it)."""
    L = int(frame_len)
    H = int(hop) if hop is not None else max(1, L // 2)
    FT = int(frames_per_task)
    if L <= 0 or H <= 0 or H > L:
        raise ValueError(f"need 0 < hop <= frame_len, got hop={H} "
                         f"frame_len={L}")
    if FT <= 0:
        raise ValueError(f"need frames_per_task > 0, got {FT}")
    _window(window, L)
    win_name = window
    B = FT * H
    tail = L - H

    i = F.col("sample_idx")
    s0 = F.floor(i / B).cast("bigint")
    k_back = -(-tail // B) if tail > 0 else 0
    cand = F.sequence(F.greatest(s0 - k_back, F.lit(0)), s0)
    segs = F.filter(
        cand, lambda s: (s >= 0) & (i >= s * B) & (i < (s + 1) * B + tail))
    exploded = signals.select(
        "series_id", "channel", F.explode(segs).alias("batch"),
        "sample_idx", "value")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx")
        idx = pdf["sample_idx"].to_numpy()
        batch = int(pdf["batch"].iloc[0])
        if int(idx[-1] - idx[0]) + 1 != len(idx):
            raise ValueError(
                f"stft_complex: sample_idx gap inside batch {batch} of "
                f"{pdf['series_id'].iloc[0]!r}/"
                f"ch{int(pdf['channel'].iloc[0])}")
        if int(idx[0]) != batch * B:
            raise ValueError(
                f"stft_complex: batch {batch} starts at sample "
                f"{int(idx[0])}, expected {batch * B}")
        x = pdf["value"].to_numpy(dtype=np.float64)
        w = _window(win_name, L)
        frames, res, ims = [], [], []
        for j in range(FT):
            lo = j * H
            if lo + L > len(x):
                break
            X = np.fft.rfft(x[lo:lo + L] * w)
            frames.append(batch * FT + j)
            res.append(X.real)
            ims.append(X.imag)
        if not frames:
            return pd.DataFrame({"series_id": [], "channel": [],
                                 "frame": [], "bin": [], "re": [], "im": []})
        n_bins = L // 2 + 1
        return pd.DataFrame({
            "series_id": pdf["series_id"].iloc[0],
            "channel": int(pdf["channel"].iloc[0]),
            "frame": np.repeat(frames, n_bins),
            "bin": np.tile(np.arange(n_bins, dtype=np.int32), len(frames)),
            "re": np.concatenate(res),
            "im": np.concatenate(ims),
        })

    return (exploded.groupBy("series_id", "channel", "batch")
            .applyInPandas(run, SPEC_SCHEMA))


def coherence_matrix(signals: DataFrame, rate: float, frame_len: int,
                     hop: int | None = None, window: str = "hann",
                     include_self: bool = False) -> DataFrame:
    """Magnitude-squared coherence per channel pair and frequency bin:
    (series_id, ch_a, ch_b, bin, freq_hz, n_frames, coherence), ch_a <
    ch_b (or <= with include_self, where coherence is identically 1 — a
    useful invariant check).

    Plan: stft_complex (one bounded shuffle) -> self-join on
    (series, frame, bin) -> partial-aggregable Welch averages. The join's
    build side is the same spectra relation, so AQE plans it as a
    shuffle join on the (series, frame, bin) key — at 100 TB both sides
    are frame-partitioned identically and co-partitioning makes the join
    local."""
    L = int(frame_len)
    spec = stft_complex(signals, L, hop, window=window)
    a = spec.alias("a")
    b = spec.alias("b")
    pair_cond = (F.col("a.channel") <= F.col("b.channel")) if include_self \
        else (F.col("a.channel") < F.col("b.channel"))
    j = a.join(b, (F.col("a.series_id") == F.col("b.series_id"))
               & (F.col("a.frame") == F.col("b.frame"))
               & (F.col("a.bin") == F.col("b.bin")) & pair_cond)
    # X * conj(Y) per frame, then Welch averages — all partial-aggregable
    sxy_re = F.col("a.re") * F.col("b.re") + F.col("a.im") * F.col("b.im")
    sxy_im = F.col("a.im") * F.col("b.re") - F.col("a.re") * F.col("b.im")
    sxx = F.col("a.re") * F.col("a.re") + F.col("a.im") * F.col("a.im")
    syy = F.col("b.re") * F.col("b.re") + F.col("b.im") * F.col("b.im")
    g = (j.groupBy(F.col("a.series_id").alias("series_id"),
                   F.col("a.channel").alias("ch_a"),
                   F.col("b.channel").alias("ch_b"),
                   F.col("a.bin").alias("bin"))
         .agg(F.avg(sxy_re).alias("cre"), F.avg(sxy_im).alias("cim"),
              F.avg(sxx).alias("sxx"), F.avg(syy).alias("syy"),
              F.count("*").alias("n_frames")))
    coh = ((F.col("cre") * F.col("cre") + F.col("cim") * F.col("cim"))
           / (F.col("sxx") * F.col("syy")))
    return g.select(
        "series_id", "ch_a", "ch_b", "bin",
        (F.col("bin") * F.lit(float(rate)) / F.lit(L)).alias("freq_hz"),
        "n_frames", coh.alias("coherence"))
