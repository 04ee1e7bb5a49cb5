"""Short-time Fourier transform over the long signal layout — the
frame-parallel complement to the whole-axis wavelet pipeline.

Unlike the Morlet path (which needs a channel's full time axis per task,
or the overlap-segmented escape hatch), the STFT is bounded-memory BY
CONSTRUCTION: a frame is the unit of work, every frame is `frame_len`
samples, and frames parallelize perfectly. The plan is the segmented
operators' shape specialized to analysis frames:

1. assign every sample to the frames whose window covers it (pure
   Catalyst: bounded candidate array -> filter -> explode; a sample sits
   in at most ceil(frame_len/hop) frames);
2. ONE shuffle groups (series_id, channel, frame) — group size capped at
   frame_len regardless of recording length;
3. an `applyInPandas` kernel windows the frame, runs one rfft, and emits
   long (bin, power) rows.

At 100 TB this is embarrassingly parallel: n_series x n_channels x
n_frames tasks, no whole-channel state anywhere, and the output is
immediately relational (spectrogram queries are GROUP BYs over
(channel, frame, bin)).

Correctness anchor: with the rectangular window and hop == frame_len the
one-sided power spectrum obeys Parseval exactly —
    sum_bins(power) == frame_len * sum_frame(x^2)
with the one-sided doubling undone by construction (`power` keeps the
two-sided convention: |X_k|^2 + |X_{N-k}|^2 folded into bin k, DC and
Nyquist unfolded). That identity is plain SQL over the raw samples, so
the registry face `sig_stft_energy` hash-matches a DuckDB oracle that
never runs an FFT — an exact relational oracle for a spectral operator.
"""
from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STFT_SCHEMA = ("series_id STRING, channel INT, frame BIGINT, "
               "bin INT, power DOUBLE")

_WINDOWS = ("rect", "hann", "hamming")


def _window(name: str, n: int) -> np.ndarray:
    if name == "rect":
        return np.ones(n)
    if name == "hann":
        return np.hanning(n)
    if name == "hamming":
        return np.hamming(n)
    raise ValueError(f"unknown window {name!r}; pick one of {_WINDOWS}")


def _fold_onesided(p: np.ndarray, n: int) -> np.ndarray:
    """Fold the conjugate-symmetric half into the one-sided spectrum:
    bins 1..N/2-1 doubled, DC (and Nyquist for even n) kept single — so
    the folded sum equals the TWO-sided total and Parseval reads
    sum(power) == n * sum(x^2). `n` is the analysis length the rfft ran
    at (it decides whether the last bin is a true Nyquist bin)."""
    power = np.empty(len(p))
    power[0] = p[0]
    if n % 2 == 0:
        power[1:-1] = 2.0 * p[1:-1]
        power[-1] = p[-1]
    else:
        power[1:] = 2.0 * p[1:]
    return power


def _check_args(frame_len, hop, window):
    """Shared eager validation for every STFT shape (per-frame, batched,
    complex) — the hop rule and window-name check exist exactly once."""
    L, H = int(frame_len), int(hop)
    if L <= 0 or H <= 0 or H > L:
        raise ValueError(f"need 0 < hop <= frame_len, got hop={H} "
                         f"frame_len={L}")
    _window(window, L)       # validate the name eagerly, not per task
    return L, H


def _check_batched_args(frame_len, hop, frames_per_task, window):
    L, H = _check_args(frame_len, hop, window)
    FT = int(frames_per_task)
    if FT <= 0:
        raise ValueError(f"need frames_per_task > 0, got {FT}")
    return L, H, FT


def _require_contiguous(idx: np.ndarray, what: str, who: str):
    """Strictly consecutive sample indices — span==count alone would let
    a duplicated index mask a missing one and the FFT would silently run
    over a misaligned buffer."""
    if not np.array_equal(idx, np.arange(idx[0], idx[0] + len(idx))):
        raise ValueError(
            f"{what}: sample_idx not contiguous inside {who} "
            f"(span {int(idx[-1] - idx[0]) + 1}, {len(idx)} rows, "
            f"dups or gaps present)")


def _explode_batches(signals: DataFrame, B: int, tail: int) -> DataFrame:
    """Assign each sample to the frame-batches whose buffer
    [batch*B, (batch+1)*B + tail) covers it. The buffer extends `tail`
    past its core, so a sample can be needed by up to ceil(tail/B)
    earlier batches (tail > B whenever frame_len - hop >
    frames_per_task*hop, i.e. tiny batches of very overlapped frames) —
    the subtle candidate-range logic lives exactly once, here."""
    i = F.col("sample_idx")
    s0 = F.floor(i / B).cast("bigint")
    k_back = -(-tail // B) if tail > 0 else 0
    cand = F.sequence(F.greatest(s0 - k_back, F.lit(0)), s0)
    segs = F.filter(
        cand, lambda s: (s >= 0) & (i >= s * B) & (i < (s + 1) * B + tail))
    return signals.select(
        "series_id", "channel", F.explode(segs).alias("batch"),
        "sample_idx", "value")


def _batch_buffer(pdf: pd.DataFrame, B: int, op: str):
    """Validate one batch group (gapless, starts on its batch boundary)
    and return (series_id, channel, batch, contiguous value buffer)."""
    pdf = pdf.sort_values("sample_idx")
    idx = pdf["sample_idx"].to_numpy()
    batch = int(pdf["batch"].iloc[0])
    _require_contiguous(
        idx, op, f"batch {batch} of {pdf['series_id'].iloc[0]!r}"
        f"/ch{int(pdf['channel'].iloc[0])}")
    if int(idx[0]) != batch * B:
        raise ValueError(
            f"{op}: batch {batch} starts at sample {int(idx[0])}, "
            f"expected {batch * B}; series must start at sample_idx 0")
    return (pdf["series_id"].iloc[0], int(pdf["channel"].iloc[0]), batch,
            pdf["value"].to_numpy(dtype=np.float64))


def _full_frame_ffts(x: np.ndarray, L: int, H: int, FT: int,
                     w: np.ndarray):
    """Yield (j, rfft of windowed full frame j) for every frame that fits
    entirely in this batch buffer."""
    for j in range(FT):
        lo = j * H
        if lo + L > len(x):
            break                    # frame extends past available data
        yield j, np.fft.rfft(x[lo:lo + L] * w)


def _explode_frames(signals: DataFrame, frame_len: int, hop: int) -> DataFrame:
    """Assign each sample to every frame whose [f*hop, f*hop+frame_len)
    span covers it. Candidate frames are the bounded arithmetic range
    ceil((i-frame_len+1)/hop) .. i//hop — at most ceil(frame_len/hop)
    values — so this stays a narrow projection."""
    i = F.col("sample_idx")
    lo = F.ceil((i - F.lit(frame_len - 1)) / F.lit(hop)).cast("bigint")
    hi = F.floor(i / F.lit(hop)).cast("bigint")
    frames = F.filter(
        F.sequence(F.greatest(lo, F.lit(0)), hi),
        lambda f: (i >= f * hop) & (i < f * hop + frame_len))
    return signals.select(
        "series_id", "channel", F.explode(frames).alias("frame"),
        "sample_idx", "value")


def stft_power(signals: DataFrame, frame_len: int, hop: int | None = None,
               window: str = "hann",
               include_partial: bool = True) -> DataFrame:
    """One-sided STFT power per (series, channel, frame, bin) from the
    long layout. `power` folds the conjugate-symmetric half into bins
    1..N/2-1 (|X_k|^2 + |X_{N-k}|^2); DC and (for even frames) Nyquist
    carry their single |X|^2 — so sum_bins(power) is the frame's total
    two-sided spectral energy and Parseval holds exactly:
    sum_bins(power) == frame_len * sum(window*x)^2-energy.

    `include_partial=False` drops a trailing frame shorter than
    frame_len; with True (default) it is analyzed at its natural length
    (its own rfft grid), which keeps Parseval exact per frame."""
    L, H = _check_args(frame_len,
                       hop if hop is not None else frame_len, window)
    win_name = window

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sample_idx")
        idx = pdf["sample_idx"].to_numpy()
        frame = int(pdf["frame"].iloc[0])
        _require_contiguous(
            idx, "stft", f"frame {frame} of {pdf['series_id'].iloc[0]!r}"
            f"/ch{int(pdf['channel'].iloc[0])}")
        if int(idx[0]) != frame * H:
            raise ValueError(
                f"stft: frame {frame} starts at sample {int(idx[0])}, "
                f"expected {frame * H}; series must start at sample_idx 0")
        n = len(idx)
        if n < L and not include_partial:
            return pd.DataFrame(
                {"series_id": [], "channel": [], "frame": [],
                 "bin": [], "power": []})
        x = pdf["value"].to_numpy(dtype=np.float64) * _window(win_name, n)
        X = np.fft.rfft(x)
        power = _fold_onesided(np.abs(X) ** 2, n)
        return pd.DataFrame({
            "series_id": pdf["series_id"].iloc[0],
            "channel": int(pdf["channel"].iloc[0]),
            "frame": frame,
            "bin": np.arange(len(power), dtype=np.int32),
            "power": power,
        })

    return (_explode_frames(signals, L, H)
            .groupBy("series_id", "channel", "frame")
            .applyInPandas(run, STFT_SCHEMA))


def stft_power_batched(signals: DataFrame, frame_len: int, hop: int,
                       window: str = "hann",
                       frames_per_task: int = 256) -> DataFrame:
    """Dense-overlap STFT without the per-frame shuffle blow-up.

    `stft_power` assigns every sample to each covering frame, so its
    shuffle carries ceil(frame_len/hop) copies of the data — fine at
    hop == frame_len (1x) or 50% overlap (2x), wasteful at hop <<
    frame_len (a 75%-overlap 1024/256 STFT would shuffle 4x). This
    variant groups `frames_per_task` consecutive frames into one task:
    samples join their batch plus (for the first frame_len - hop samples
    of a batch) the previous batch, so shuffle volume is
    1 + (frame_len-hop)/(frames_per_task*hop) ~ 1x regardless of
    overlap, and each task runs its frames off one contiguous buffer.

    Emits FULL frames only (a trailing partial frame needs its own rfft
    grid; use stft_power for that edge). Output is bitwise-identical to
    stft_power(..., include_partial=False) — pinned in tests."""
    L, H, FT = _check_batched_args(frame_len, hop, frames_per_task, window)
    win_name = window

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        sid, ch, batch, x = _batch_buffer(pdf, FT * H, "stft")
        w = _window(win_name, L)
        outs = [(batch * FT + j, _fold_onesided(np.abs(X) ** 2, L))
                for j, X in _full_frame_ffts(x, L, H, FT, w)]
        if not outs:
            return pd.DataFrame({"series_id": [], "channel": [],
                                 "frame": [], "bin": [], "power": []})
        n_bins = L // 2 + 1
        return pd.DataFrame({
            "series_id": sid,
            "channel": ch,
            "frame": np.repeat([f for f, _ in outs], n_bins),
            "bin": np.tile(np.arange(n_bins, dtype=np.int32), len(outs)),
            "power": np.concatenate([p for _, p in outs]),
        })

    return (_explode_batches(signals, FT * H, L - H)
            .groupBy("series_id", "channel", "batch")
            .applyInPandas(run, STFT_SCHEMA))


def welch_psd(signals: DataFrame, rate: float, frame_len: int,
              hop: int | None = None, window: str = "hann") -> DataFrame:
    """Welch power spectral density per (series, channel):
    averaged one-sided modified periodograms over (by default 50%-)
    overlapping full frames, normalized by fs * sum(w^2) so white noise
    of variance s^2 integrates back to s^2 over [0, fs/2].

    Pure composition: the BATCHED stft (one shuffle at ~1x data volume
    despite the 50% overlap) followed by a partial-aggregable groupBy
    mean over frames — at 100 TB the frame fan-out and the per-bin
    average are both embarrassingly parallel and the output is tiny
    (n_channels x (frame_len/2+1) rows). Partial trailing frames are
    excluded (standard Welch; they would sit on a different frequency
    grid — and the batched op emits full frames only)."""
    L = int(frame_len)
    H = int(hop) if hop is not None else max(1, L // 2)
    u = float(np.sum(_window(window, L) ** 2)) * float(rate)
    st = stft_power_batched(signals, L, H, window=window)
    return (st.groupBy("series_id", "channel", "bin")
            .agg((F.avg("power") / F.lit(u)).alias("psd"),
                 F.count("*").alias("n_frames"))
            .withColumn("freq_hz",
                        F.col("bin") * F.lit(float(rate)) / F.lit(L)))


def spectrogram_db(signals: DataFrame, rate: float, frame_len: int,
                   hop: int | None = None, window: str = "hann",
                   floor_db: float = -120.0) -> DataFrame:
    """Relational spectrogram: stft_power + physical coordinates —
    (series_id, channel, t_sec, freq_hz, power_db). Pure projection on
    top of the STFT rows; every downstream op (band aggregation,
    thresholding, time-bucketing) is ordinary DataFrame algebra.

    Full frames only: a trailing partial frame is analyzed on its own
    shorter rfft grid, so labeling its bins with bin*rate/frame_len would
    put every one of them at the wrong frequency (bin k of an n-sample
    frame sits at k*rate/n) — it is dropped rather than mislabeled."""
    H = int(hop) if hop is not None else int(frame_len)
    st = stft_power(signals, frame_len, H, window=window,
                    include_partial=False)
    db = F.greatest(
        F.lit(10.0) * F.log10(F.col("power") + F.lit(1e-300)),
        F.lit(floor_db))
    return st.select(
        "series_id", "channel",
        (F.col("frame") * H / F.lit(float(rate))).alias("t_sec"),
        (F.col("bin") * F.lit(float(rate)) / F.lit(int(frame_len)))
        .alias("freq_hz"),
        db.alias("power_db"))
