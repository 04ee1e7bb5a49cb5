"""Clinical spectral summaries on top of the Welch PSD: named-band power
(delta/theta/alpha/beta/gamma tables) and a line-noise SNR screen — the
two numbers every recording's QC report leads with.

Both are pure relational projections over `welch_psd`'s tiny output
(n_channels x n_bins rows), so their cost at 100 TB is the PSD's one
bounded-frame shuffle; the band dimension is a literal handful of rows
joined broadcast (a range predicate over ~5 rows — the textbook
dimension join, same shape as the reference's wavelet band table,
SURVEY.md §1.2).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stft import welch_psd

#: the standard clinical EEG bands (Hz), half-open [lo, hi)
EEG_BANDS = {"delta": (0.5, 4.0), "theta": (4.0, 8.0),
             "alpha": (8.0, 13.0), "beta": (13.0, 30.0),
             "gamma": (30.0, 100.0)}


def band_power(signals: DataFrame, rate: float, frame_len: int,
               bands: dict | None = None,
               relative: bool = False) -> DataFrame:
    """Per-channel power in named frequency bands:
    (series_id, channel, band_name, lo_hz, hi_hz, power[, rel_power]).

    `power` integrates the one-sided Welch PSD over [lo, hi) (so the
    sum over non-overlapping bands covering [0, fs/2) recovers the
    signal variance); `relative=True` adds each band's share of the
    total integrated power — the form clinical reports use."""
    b = bands if bands is not None else EEG_BANDS
    nyq = float(rate) / 2.0
    for name, (lo, hi) in b.items():
        if not 0 <= lo < hi:
            raise ValueError(f"band {name!r}: need 0 <= lo < hi, "
                             f"got ({lo}, {hi})")
        if lo >= nyq:
            raise ValueError(f"band {name!r} starts at {lo} Hz, at or "
                             f"above the {nyq} Hz Nyquist")
    df_hz = float(rate) / int(frame_len)
    psd = welch_psd(signals, rate, frame_len)
    dim = psd.sparkSession.createDataFrame(
        [(n, float(lo), float(hi)) for n, (lo, hi) in b.items()],
        "band_name STRING, lo_hz DOUBLE, hi_hz DOUBLE")
    j = psd.join(F.broadcast(dim),
                 (psd.freq_hz >= dim.lo_hz) & (psd.freq_hz < dim.hi_hz))
    g = (j.groupBy("series_id", "channel", "band_name", "lo_hz", "hi_hz")
         .agg((F.sum("psd") * F.lit(df_hz)).alias("power")))
    if not relative:
        return g
    tot = (psd.groupBy(F.col("series_id").alias("_sid"),
                       F.col("channel").alias("_ch"))
           .agg((F.sum("psd") * F.lit(df_hz)).alias("_total")))
    return (g.join(tot, (g.series_id == tot._sid) & (g.channel == tot._ch))
            .select("series_id", "channel", "band_name", "lo_hz", "hi_hz",
                    "power",
                    F.when(F.col("_total") > 0,
                           F.col("power") / F.col("_total"))
                    .otherwise(F.lit(0.0)).alias("rel_power")))


def line_noise_snr(signals: DataFrame, rate: float, frame_len: int,
                   noise_hz: float = 60.0, n_harmonics: int | None = None,
                   flank: tuple[int, int] = (3, 8)) -> DataFrame:
    """Per-channel line-noise contamination screen:
    (series_id, channel, snr, n_harmonics) where `snr` is the mean PSD
    within +-1 bin of each line harmonic divided by the mean PSD in the
    flanking bins `flank[0]..flank[1]` away (both sides, all harmonics
    below Nyquist). ~1 for a clean channel, >> 1 when mains leaks in —
    the go/no-go number for apply_linenoise_notch, and the after-notch
    re-run is the notch's acceptance test."""
    L = int(frame_len)
    df_hz = float(rate) / L
    lo_f, hi_f = int(flank[0]), int(flank[1])
    if not 1 < lo_f <= hi_f:
        raise ValueError(f"need 1 < flank_lo <= flank_hi, got {flank}")
    nyq_bin = L // 2
    harmonics = []
    h = 1
    while (h * noise_hz) / df_hz < nyq_bin - hi_f \
            and (n_harmonics is None or h <= n_harmonics):
        harmonics.append(int(round(h * noise_hz / df_hz)))
        h += 1
    if not harmonics:
        raise ValueError(
            f"no {noise_hz} Hz harmonic fits below Nyquist with frame_len "
            f"{L} at rate {rate}; use a longer frame")
    psd = welch_psd(signals, rate, L)
    sig_bins = sorted({b + d for b in harmonics for d in (-1, 0, 1)})
    flk_bins = sorted({b + s * d for b in harmonics
                       for d in range(lo_f, hi_f + 1) for s in (-1, 1)}
                      - set(sig_bins))
    is_sig = F.col("bin").isin(sig_bins)
    is_flk = F.col("bin").isin(flk_bins)
    g = (psd.filter(is_sig | is_flk)
         .groupBy("series_id", "channel")
         .agg(F.avg(F.when(is_sig, F.col("psd"))).alias("_s"),
              F.avg(F.when(is_flk, F.col("psd"))).alias("_f")))
    return g.select(
        "series_id", "channel",
        F.when(F.col("_f") > 0, F.col("_s") / F.col("_f"))
        .otherwise(F.lit(None)).alias("snr"),
        F.lit(len(harmonics)).alias("n_harmonics"))
