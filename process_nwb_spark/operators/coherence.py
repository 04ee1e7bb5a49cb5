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

from .stft import (_batch_buffer, _check_batched_args, _explode_batches,
                   _full_frame_ffts, _window)

SPEC_SCHEMA = ("series_id STRING, channel INT, frame BIGINT, "
               "bin INT, re DOUBLE, im DOUBLE")


def stft_complex(signals: DataFrame, frame_len: int, hop: int | None = None,
                 window: str = "hann",
                 frames_per_task: int = 256) -> DataFrame:
    """Per-frame one-sided complex spectra (re, im), FULL frames only —
    the batched-frame kernel of operators/stft.stft_power_batched with
    the phase kept (cross-spectra need it; power-only folding loses it).
    Shares the explode/validation/frame-iteration machinery with the
    power path so the two can never drift."""
    H = int(hop) if hop is not None else max(1, int(frame_len) // 2)
    L, H, FT = _check_batched_args(frame_len, H, frames_per_task, window)
    win_name = window

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        sid, ch, batch, x = _batch_buffer(pdf, FT * H, "stft_complex")
        w = _window(win_name, L)
        outs = [(batch * FT + j, X)
                for j, X in _full_frame_ffts(x, L, H, FT, w)]
        if not outs:
            return pd.DataFrame({"series_id": [], "channel": [],
                                 "frame": [], "bin": [], "re": [], "im": []})
        n_bins = L // 2 + 1
        return pd.DataFrame({
            "series_id": sid,
            "channel": ch,
            "frame": np.repeat([f for f, _ in outs], n_bins),
            "bin": np.tile(np.arange(n_bins, dtype=np.int32), len(outs)),
            "re": np.concatenate([X.real for _, X in outs]),
            "im": np.concatenate([X.imag for _, X in outs]),
        })

    return (_explode_batches(signals, FT * H, L - H)
            .groupBy("series_id", "channel", "batch")
            .applyInPandas(run, SPEC_SCHEMA))


def _paired_spectra(spec: DataFrame, include_self: bool):
    """Self-join the per-frame spectra on (series, frame, bin) and return
    (joined, sxy_re, sxy_im, sxx, syy) — the shared channel-pairing step
    of every spectral-connectivity estimator here."""
    a, b = spec.alias("a"), spec.alias("b")
    pair_cond = (F.col("a.channel") <= F.col("b.channel")) if include_self \
        else (F.col("a.channel") < F.col("b.channel"))
    j = a.join(b, (F.col("a.series_id") == F.col("b.series_id"))
               & (F.col("a.frame") == F.col("b.frame"))
               & (F.col("a.bin") == F.col("b.bin")) & pair_cond)
    sxy_re = F.col("a.re") * F.col("b.re") + F.col("a.im") * F.col("b.im")
    sxy_im = F.col("a.im") * F.col("b.re") - F.col("a.re") * F.col("b.im")
    sxx = F.col("a.re") * F.col("a.re") + F.col("a.im") * F.col("a.im")
    syy = F.col("b.re") * F.col("b.re") + F.col("b.im") * F.col("b.im")
    return j, sxy_re, sxy_im, sxx, syy


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
    # X * conj(Y) per frame, then Welch averages — all partial-aggregable
    j, sxy_re, sxy_im, sxx, syy = _paired_spectra(spec, include_self)
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


def wpli_matrix(signals: DataFrame, rate: float, frame_len: int,
                hop: int | None = None, window: str = "hann") -> DataFrame:
    """Weighted phase-lag index (Vinck 2011) per channel pair and bin:

        wPLI_xy(f) = | avg_frames( imag(X_f * conj(Y_f)) ) |
                     / avg_frames( |imag(X_f * conj(Y_f))| )

    The field's volume-conduction fix: a zero-lag mixture (two
    electrodes seeing the SAME source through tissue) has a purely REAL
    cross-spectrum, so it inflates coherence but contributes nothing to
    wPLI — only genuinely lagged coupling scores. Identically-shaped
    plan as coherence_matrix (shared _paired_spectra join, two
    partial-aggregable averages); by convention a pair whose
    cross-spectrum is purely real in every frame (avg|imag| == 0)
    returns 0, not NULL — zero lag IS the 'no lagged coupling' verdict.
    Self-pairs are excluded (imag(Sxx) == 0 identically)."""
    L = int(frame_len)
    spec = stft_complex(signals, L, hop, window=window)
    j, _, sxy_im, _, _ = _paired_spectra(spec, include_self=False)
    g = (j.groupBy(F.col("a.series_id").alias("series_id"),
                   F.col("a.channel").alias("ch_a"),
                   F.col("b.channel").alias("ch_b"),
                   F.col("a.bin").alias("bin"))
         .agg(F.avg(sxy_im).alias("num"),
              F.avg(F.abs(sxy_im)).alias("den"),
              F.count("*").alias("n_frames")))
    wpli = F.when(F.col("den") > 0,
                  F.abs(F.col("num")) / F.col("den")).otherwise(F.lit(0.0))
    return g.select(
        "series_id", "ch_a", "ch_b", "bin",
        (F.col("bin") * F.lit(float(rate)) / F.lit(L)).alias("freq_hz"),
        "n_frames", wpli.alias("wpli"))


def phase_slope_index(signals: DataFrame, rate: float, frame_len: int,
                      hop: int | None = None, window: str = "hann",
                      f_lo: float | None = None,
                      f_hi: float | None = None) -> DataFrame:
    """Phase-slope index (Nolte 2008) per channel pair — DIRECTIONALITY:

        PSI_xy = sum_f Im( conj(C_xy(f)) * C_xy(f + df) ),
        C_xy = S_xy / sqrt(S_xx * S_yy)   (complex coherency)

    A consistent phase slope across frequencies means a consistent time
    LAG: PSI > 0 when ch_a leads ch_b, < 0 when ch_b leads, ~0 for
    zero-lag (volume-conducted) or un-coupled channels — the question
    wPLI cannot answer (it detects lag but not its sign). Optional
    [f_lo, f_hi] restricts the sum to a band (both f and f+df inside).

    Plan: the coherence aggregates (one bounded-frame shuffle + the
    _paired_spectra join), then a bin-shift self-join over the TINY
    per-pair spectra (n_pairs x n_bins rows) and one sum. Returns
    (series_id, ch_a, ch_b, psi, n_bins_used).
    """
    L = int(frame_len)
    spec = stft_complex(signals, L, hop, window=window)
    j, sxy_re, sxy_im, sxx, syy = _paired_spectra(spec, include_self=False)
    g = (j.groupBy(F.col("a.series_id").alias("series_id"),
                   F.col("a.channel").alias("ch_a"),
                   F.col("b.channel").alias("ch_b"),
                   F.col("a.bin").alias("bin"))
         .agg(F.avg(sxy_re).alias("cre"), F.avg(sxy_im).alias("cim"),
              F.avg(sxx).alias("sxx"), F.avg(syy).alias("syy")))
    if f_lo is not None:
        g = g.filter(F.col("bin") >= int(np.ceil(f_lo * L / rate)))
    if f_hi is not None:
        g = g.filter(F.col("bin") <= int(np.floor(f_hi * L / rate)))
    den = F.sqrt(F.col("sxx") * F.col("syy"))
    base = g.select("series_id", "ch_a", "ch_b", "bin",
                    (F.col("cre") / den).alias("cr"),
                    (F.col("cim") / den).alias("ci"))
    nxt = base.select(F.col("series_id").alias("_s"),
                      F.col("ch_a").alias("_a"), F.col("ch_b").alias("_b"),
                      (F.col("bin") - 1).alias("_bin"),
                      F.col("cr").alias("cr1"), F.col("ci").alias("ci1"))
    jj = base.join(nxt, (F.col("series_id") == F.col("_s"))
                   & (F.col("ch_a") == F.col("_a"))
                   & (F.col("ch_b") == F.col("_b"))
                   & (F.col("bin") == F.col("_bin")))
    # Im(conj(C_f) * C_{f+1}) = cr_f * ci_{f+1} - ci_f * cr_{f+1}
    return (jj.groupBy("series_id", "ch_a", "ch_b")
            .agg(F.sum(F.col("cr") * F.col("ci1")
                       - F.col("ci") * F.col("cr1")).alias("psi"),
                 F.count(F.lit(1)).alias("n_bins_used")))


def envelope_correlation(signals: DataFrame, rate: float, frame_len: int,
                         lo_hz: float, hi_hz: float,
                         hop: int | None = None,
                         window: str = "hann",
                         log_power: bool = True) -> DataFrame:
    """Amplitude-envelope correlation (AEC, Hipp 2012-family) per channel
    pair: Pearson correlation of the per-frame band power time courses
    in [lo_hz, hi_hz) — the slow co-modulation measure that survives
    when signals are not phase-locked (coherence/PLV read ~0 on
    amplitude-coupled but phase-scrambled carriers; AEC reads high).

    -> (series_id, ch_a, ch_b, aec, n_frames), ch_a < ch_b.

    Plan: stft_power (one bounded per-frame shuffle) -> band power per
    (series, channel, frame) via a partial agg over the band's bins ->
    self-join on (series, frame) with ch_b > ch_a -> F.corr. The
    envelope relation has n_frames rows per channel (hop-decimated —
    tiny next to samples), so the pairwise join fans out over FRAMES,
    not raw samples. `log_power=True` correlates log envelopes (the
    field convention; tames the chi-square tail of band power).
    """
    from .stft import stft_power

    L = int(frame_len)
    if not 0 <= lo_hz < hi_hz:
        raise ValueError(f"need 0 <= lo_hz < hi_hz, got [{lo_hz}, {hi_hz})")
    bin_hz = float(rate) / L
    p = stft_power(signals, L, hop, window=window, include_partial=False)
    env = (p.filter((F.col("bin") * bin_hz >= float(lo_hz))
                    & (F.col("bin") * bin_hz < float(hi_hz)))
           .groupBy("series_id", "channel", "frame")
           .agg(F.sum("power").alias("_bp")))
    e = F.log(F.col("_bp") + F.lit(1e-300)) if log_power else F.col("_bp")
    env = env.select("series_id", "channel", "frame", e.alias("_env"))
    a = env.select("series_id", F.col("channel").alias("ch_a"),
                   "frame", F.col("_env").alias("_ea"))
    b = env.select(F.col("series_id").alias("_sid"),
                   F.col("channel").alias("ch_b"),
                   F.col("frame").alias("_frm"), F.col("_env").alias("_eb"))
    j = a.join(b, (F.col("series_id") == F.col("_sid"))
               & (F.col("frame") == F.col("_frm"))
               & (F.col("ch_b") > F.col("ch_a")))
    return (j.groupBy("series_id", "ch_a", "ch_b")
            .agg(F.corr("_ea", "_eb").alias("aec"),
                 F.count(F.lit(1)).alias("n_frames")))
