"""Multitaper (Thomson/DPSS) power spectral density — the
variance-reduced top of the engine's spectral-estimation ladder
(periodogram -> Welch -> multitaper). Neuroscience pipelines default to
it for short-window PSDs: K orthogonal Slepian tapers give K nearly
independent spectral estimates of the SAME frame, cutting estimator
variance ~K-fold without Welch's time-averaging (which needs a long
stationary stretch).

DPSS tapers without scipy: the Slepian sequences are the eigenvectors
of a symmetric TRIDIAGONAL matrix (Slepian 1978; the same recipe
scipy.signal.windows.dpss uses):

    diag[t]  = ((N-1-2t)/2)^2 * cos(2*pi*W),   t = 0..N-1
    offd[t]  = t*(N-t)/2,                      t = 1..N-1

whose top-K eigenvectors are the tapers (unit-energy by eigh's
orthonormality). The N x N eigendecomposition runs ONCE on the driver
(frame_len is a few hundred to a few thousand samples) and the taper
matrix is shipped to executors inside the kernel closure — model-sized,
like the wavelet filterbank literals.

Plan shape: identical to stft_power at hop == frame_len — a 1x-volume
frame explode, one shuffle into bounded per-frame groups, K rffts per
frame inside the kernel, then a partial-aggregable per-bin average.
Scaling: unit-energy tapers + /fs puts white noise of variance s^2 back
at s^2 when the one-sided PSD is integrated over [0, fs/2] — the same
contract sig_welch_psd pins for Welch.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stft import _explode_frames, _fold_onesided, _require_contiguous

_MAX_FRAME = 4096   # dense eigh is O(N^3); 4096^3 is already ~seconds


def dpss_tapers(n: int, nw: float = 4.0, k: int | None = None) -> np.ndarray:
    """Top-k discrete prolate spheroidal sequences, shape (k, n),
    unit-energy rows. `nw` is the time-half-bandwidth product; the
    standard usable taper count is k = 2*nw - 1 (default)."""
    n = int(n)
    if n > _MAX_FRAME:
        raise ValueError(
            f"dpss_tapers: frame_len {n} > {_MAX_FRAME} (dense "
            f"eigendecomposition); use shorter frames — multitaper wants "
            f"short windows, that is its point")
    if not 0 < 2 * nw < n:
        raise ValueError(f"need 0 < 2*nw < frame_len, got nw={nw}, n={n}")
    k = int(k) if k is not None else max(1, int(2 * nw - 1))
    if not 1 <= k <= n:
        raise ValueError(f"need 1 <= k <= {n}, got k={k}")
    w = float(nw) / n
    t = np.arange(n, dtype=np.float64)
    m = np.zeros((n, n))
    m[np.arange(n), np.arange(n)] = ((n - 1 - 2 * t) / 2.0) ** 2 \
        * np.cos(2 * np.pi * w)
    off = t[1:] * (n - t[1:]) / 2.0
    m[np.arange(n - 1), np.arange(1, n)] = off
    m[np.arange(1, n), np.arange(n - 1)] = off
    vals, vecs = np.linalg.eigh(m)
    tapers = vecs[:, np.argsort(vals)[::-1][:k]].T   # (k, n), unit L2
    # deterministic sign: each taper's largest-|.| element positive
    # (eigenvector sign is otherwise arbitrary; irrelevant for |FFT|^2
    # but keeps the taper matrix itself reproducible for tests)
    flip = np.sign(tapers[np.arange(k), np.abs(tapers).argmax(axis=1)])
    return tapers * flip[:, None]


MT_SCHEMA = ("series_id STRING, channel INT, frame BIGINT, "
             "bin INT, power DOUBLE")


def multitaper_psd(signals: DataFrame, rate: float, frame_len: int,
                   nw: float = 4.0, k: int | None = None) -> DataFrame:
    """Multitaper PSD per (series, channel, bin): non-overlapping
    full frames (hop == frame_len — tapers already use the frame edges
    efficiently, overlap buys little), K tapered periodograms averaged
    per frame, then averaged across frames.

    Returns (series_id, channel, bin, freq_hz, psd, n_frames, n_tapers);
    integral of `psd` over [0, fs/2] recovers the signal variance.
    Trailing partial frames are dropped (they would need their own
    taper family on a different grid)."""
    L = int(frame_len)
    tapers = dpss_tapers(L, nw=nw, k=k)
    n_tapers = tapers.shape[0]
    fs = float(rate)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx")
        idx = pdf["sample_idx"].to_numpy()
        frame = int(pdf["frame"].iloc[0])
        _require_contiguous(
            idx, "multitaper",
            f"frame {frame} of {pdf['series_id'].iloc[0]!r}"
            f"/ch{int(pdf['channel'].iloc[0])}")
        if int(idx[0]) != frame * L:
            raise ValueError(
                f"multitaper: frame {frame} starts at sample "
                f"{int(idx[0])}, expected {frame * L}; series must start "
                f"at sample_idx 0")
        if len(idx) < L:          # trailing partial: different grid, drop
            return pd.DataFrame({"series_id": [], "channel": [],
                                 "frame": [], "bin": [], "power": []})
        x = pdf["value"].to_numpy(dtype=np.float64)
        spec = np.fft.rfft(tapers * x[None, :], axis=1)   # (k, L//2+1)
        two_sided = (np.abs(spec) ** 2).mean(axis=0)
        power = _fold_onesided(two_sided, L)
        return pd.DataFrame({
            "series_id": pdf["series_id"].iloc[0],
            "channel": int(pdf["channel"].iloc[0]),
            "frame": frame,
            "bin": np.arange(len(power), dtype=np.int32),
            "power": power,
        })

    st = (_explode_frames(signals, L, L)
          .groupBy("series_id", "channel", "frame")
          .applyInPandas(run, MT_SCHEMA))
    return (st.groupBy("series_id", "channel", "bin")
            .agg((F.avg("power") / F.lit(fs)).alias("psd"),
                 F.count("*").alias("n_frames"))
            .withColumn("freq_hz", F.col("bin") * F.lit(fs) / F.lit(L))
            .withColumn("n_tapers", F.lit(n_tapers)))
