"""Overlap-segmented spectral kernels — the 100 TB path for recordings too
long for one task (SURVEY.md §7 "whole-axis FFT vs partitioned data").

The whole-channel operators (kernel_ops.py) need a channel's full time axis
in one task. For arbitrarily long recordings this operator instead:

1. assigns every long-layout sample to its core segment plus any segment
   whose overlap window covers it (pure Catalyst: a small candidate array,
   filter, explode — narrow);
2. groups by (series_id, channel, seg) — ONE shuffle whose groups are
   bounded at seg_len + 2*overlap samples regardless of recording length;
3. runs the dense kernel per segment inside `applyInPandas`, trims each
   segment's overlap from the output, and emits long rows with exact
   global sample indices (no second shuffle, no reconcatenation pass).

Numerics: each segment is padded/filtered on its own frequency grid, so
the result is equivalent-but-not-bitwise vs the whole-channel op —
boundary error < ~1% of signal scale with a 1 s overlap, the same
tolerance the reference itself accepts between its chunked and unchunked
wavelet paths (tests/test_pipeline.py:154, rtol=0.01). Exactness rules:
`(seg_len * new) % old == 0` is required so segment output offsets are
integral (validated eagerly).

Reference analog: the pad/trim machinery (utils.py:106-167) is reused
unchanged inside each segment; the chunked writer
(wavelet_transform.py:142-235) bounded memory the same way — one bounded
block in flight per worker.
"""
from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dsp import kernels as K

LONG_SCHEMA = ("series_id STRING, channel INT, sample_idx BIGINT, "
               "value DOUBLE")


def _validate(seg_len: int, overlap: int, new_freq: float, old_freq: float):
    if seg_len <= 0 or overlap < 0 or overlap >= seg_len:
        raise ValueError(f"need 0 <= overlap < seg_len, got "
                         f"overlap={overlap} seg_len={seg_len}")
    if (seg_len * new_freq) % old_freq != 0:
        raise ValueError(
            f"seg_len * new_freq must be divisible by old_freq so segment "
            f"output offsets are integral; got seg_len={seg_len}, "
            f"ratio={new_freq}/{old_freq}")


def segmented_kernel(signals: DataFrame, fn: Callable[[np.ndarray], np.ndarray],
                     seg_len: int, overlap: int,
                     ratio: float = 1.0) -> DataFrame:
    """Apply `fn` (1-D ndarray -> 1-D ndarray of len*ratio) per bounded
    segment of each channel; long layout in, long layout out."""
    L, V = int(seg_len), int(overlap)
    r = float(ratio)

    i = F.col("sample_idx")
    s0 = F.floor(i / L).cast("bigint")
    cand = F.array(s0 - 1, s0, s0 + 1)
    segs = F.filter(
        cand, lambda s: (s >= 0) & (i >= s * L - V) & (i < (s + 1) * L + V))
    exploded = signals.select(
        "series_id", "channel", F.explode(segs).alias("seg"),
        "sample_idx", "value")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx")
        seg = int(pdf["seg"].iloc[0])
        idx = pdf["sample_idx"].to_numpy()
        x = pdf["value"].to_numpy(dtype=np.float64)
        left_ov = int(seg * L - idx[0])
        core = int(((idx >= seg * L) & (idx < (seg + 1) * L)).sum())
        out = np.asarray(fn(x), dtype=np.float64)
        k0 = int(round(left_ov * r))
        n_out = int(np.ceil(core * r))
        kept = out[k0:k0 + n_out]
        g0 = int(round(seg * L * r))
        return pd.DataFrame({
            "series_id": pdf["series_id"].iloc[0],
            "channel": pdf["channel"].iloc[0],
            "sample_idx": g0 + np.arange(len(kept), dtype=np.int64),
            "value": kept,
        })

    return (exploded.groupBy("series_id", "channel", "seg")
            .applyInPandas(run, LONG_SCHEMA))


BAND_SCHEMA = ("series_id STRING, channel INT, band INT, "
               "sample_idx BIGINT, amp DOUBLE")


def segmented_band_kernel(signals: DataFrame,
                          fn: Callable[[np.ndarray], np.ndarray],
                          seg_len: int, overlap: int,
                          ratio: float = 1.0) -> DataFrame:
    """Fan-out variant of `segmented_kernel`: `fn` maps a 1-D segment to a
    2-D (n_out, n_bands) block (e.g. wavelet amplitudes); output is long
    over (band, sample_idx). Same bounded-group/one-shuffle layout."""
    L, V = int(seg_len), int(overlap)
    r = float(ratio)

    i = F.col("sample_idx")
    s0 = F.floor(i / L).cast("bigint")
    cand = F.array(s0 - 1, s0, s0 + 1)
    segs = F.filter(
        cand, lambda s: (s >= 0) & (i >= s * L - V) & (i < (s + 1) * L + V))
    exploded = signals.select(
        "series_id", "channel", F.explode(segs).alias("seg"),
        "sample_idx", "value")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx")
        seg = int(pdf["seg"].iloc[0])
        idx = pdf["sample_idx"].to_numpy()
        x = pdf["value"].to_numpy(dtype=np.float64)
        left_ov = int(seg * L - idx[0])
        core = int(((idx >= seg * L) & (idx < (seg + 1) * L)).sum())
        out = np.asarray(fn(x), dtype=np.float64)  # (n_out, n_bands)
        k0 = int(round(left_ov * r))
        n_out = int(np.ceil(core * r))
        kept = out[k0:k0 + n_out]  # (n_kept, n_bands)
        g0 = int(round(seg * L * r))
        n_kept, n_bands = kept.shape
        return pd.DataFrame({
            "series_id": pdf["series_id"].iloc[0],
            "channel": pdf["channel"].iloc[0],
            "band": np.repeat(np.arange(n_bands, dtype=np.int32), n_kept),
            "sample_idx": np.tile(g0 + np.arange(n_kept, dtype=np.int64),
                                  n_bands),
            "amp": kept.T.ravel(),
        })

    return (exploded.groupBy("series_id", "channel", "seg")
            .applyInPandas(run, BAND_SCHEMA))


def segmented_wavelet_amp(signals: DataFrame, rate: float,
                          filters: str = "rat", hg_only: bool = True,
                          seg_len: int = 2 ** 16, overlap: int = 8192,
                          precision: str = "single") -> DataFrame:
    """Morlet amplitude decomposition with bounded per-task memory: each
    segment computes all its bands in one kernel call (forward FFT shared,
    like the whole-channel path). Overlap should cover the widest wavelet's
    effective support (low-cf bands have sd ~= cf/8, so IR length ~ rate*8/cf
    samples; hg_only bands at 70+ Hz need well under the default 8192 @
    3.2 kHz). Long (band, sample) rows out — same schema as the unpacked
    whole-channel wavelet stage."""
    _validate(seg_len, overlap, rate, rate)

    def fn(x: np.ndarray) -> np.ndarray:
        Xh, _, _, _ = K.wavelet_transform(
            x[:, None], rate, filters=filters, hg_only=hg_only,
            precision=precision)
        return np.abs(Xh[:, 0, :])

    return segmented_band_kernel(signals, fn, seg_len, overlap, ratio=1.0)


def segmented_resample(signals: DataFrame, new_freq: float, old_freq: float,
                       seg_len: int = 2 ** 16, overlap: int = 4096,
                       precision: str = "single") -> DataFrame:
    """FFT rational resample with bounded per-task memory (long -> long)."""
    _validate(seg_len, overlap, new_freq, old_freq)
    return segmented_kernel(
        signals,
        lambda x: K.resample(x, new_freq, old_freq, precision=precision),
        seg_len, overlap, ratio=new_freq / old_freq)


def segmented_notch(signals: DataFrame, rate: float, noise_hz: float = 60.0,
                    seg_len: int = 2 ** 16, overlap: int = 4096,
                    precision: str = "single") -> DataFrame:
    """60 Hz + harmonics notch with bounded per-task memory."""
    _validate(seg_len, overlap, rate, rate)
    return segmented_kernel(
        signals,
        lambda x: K.apply_linenoise_notch(
            x[:, None], rate, noise_hz=noise_hz, precision=precision)[:, 0],
        seg_len, overlap, ratio=1.0)
