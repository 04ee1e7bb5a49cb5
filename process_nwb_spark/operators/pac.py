"""Phase-amplitude coupling (PAC) — the canonical downstream analysis of
the engine's own wavelet outputs: does the amplitude envelope of a fast
band (e.g. high gamma) ride the phase of a slow band (e.g. theta)?

Measure: the Canolty-style mean-vector-length modulation index,
    MI = | mean( a[t] * exp(i * phi[t]) ) | / mean(a[t])
computed per (series, channel) from two long streams the preprocess
pipeline already emits — `phase` rows (a slow band from
preprocess(abs_only=False)) and `amp` rows (a fast band's amplitude).
The normalization by mean amplitude makes MI scale-free in [0, 1]:
~0 when amplitude is independent of phase, ~1 when amplitude
concentrates at one phase.

Pure Catalyst: an equi-join of the two streams on
(series, channel, sample_idx), then ONE partial-aggregable aggregate of
a*cos(phi), a*sin(phi), a — map-side combined, one row per channel out.
No window over the time axis, no Python crossing, so recording length
only affects scan+join volume (linear). The join co-partitions on the
same keys every signal shuffle here uses; when both inputs come from the
same preprocess result the shuffle is already in place.

The reference stops at stored wavelet amplitude/phase
(wavelet_transform.py:389-436); PAC is what its users compute next from
exactly those arrays.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phase_amplitude_coupling(phase_df: DataFrame, amp_df: DataFrame,
                             phase_col: str = "phase",
                             amp_col: str = "amp") -> DataFrame:
    """Modulation index per (series_id, channel).

    phase_df: long (series_id, channel, sample_idx, <phase_col>) — phase
              of the slow band, radians.
    amp_df:   long (series_id, channel, sample_idx, <amp_col>) — the
              fast band's amplitude envelope (non-negative).
    Returns (series_id, channel, mi, n_samples): MI in [0, 1] over the
    samples present in BOTH streams (inner join — a resampled phase
    stream pairs only where grids align, by construction of the
    pipeline's shared final_resample_rate).
    """
    p = phase_df.select("series_id", "channel", "sample_idx",
                        F.col(phase_col).alias("_phi"))
    a = amp_df.select("series_id", "channel", "sample_idx",
                      F.col(amp_col).alias("_a"))
    j = p.join(a, ["series_id", "channel", "sample_idx"])
    agg = j.groupBy("series_id", "channel").agg(
        F.avg(F.col("_a") * F.cos("_phi")).alias("_re"),
        F.avg(F.col("_a") * F.sin("_phi")).alias("_im"),
        F.avg("_a").alias("_abar"),
        F.count(F.lit(1)).alias("n_samples"))
    mi = (F.sqrt(F.col("_re") ** 2 + F.col("_im") ** 2)
          / F.col("_abar"))
    return agg.select(
        "series_id", "channel",
        # mean amplitude 0 (an all-zero envelope) carries no coupling
        # information: emit MI 0, not a division error / NULL
        F.when(F.col("_abar") > 0, mi).otherwise(F.lit(0.0)).alias("mi"),
        "n_samples")


def phase_locking_value(phase_df: DataFrame,
                        phase_col: str = "phase",
                        include_self: bool = False) -> DataFrame:
    """Inter-channel phase-locking value (Lachaux 1999) per channel pair:

        PLV(a, b) = | mean_t( exp(i * (phi_a[t] - phi_b[t])) ) |

    1 when the phase difference is constant over time (locked), ~0 when
    it drifts uniformly. The spectral-phase sibling of cross_correlation
    (which sees amplitude too) and the pairwise sibling of
    phase_amplitude_coupling.

    Pure Catalyst: self equi-join on (series_id, sample_idx) — the same
    per-timepoint channel-gather shape as the CAR window, shuffle linear
    in samples with a bounded n_channels^2/2 pair fan-out — then ONE
    partial-aggregable aggregate of cos/sin of the phase difference.

    phase_df: long (series_id, channel, sample_idx, <phase_col>), phase
    in radians (e.g. the preprocess(abs_only=False) phase stream of one
    band). Returns (series_id, ch_a, ch_b, plv, n_samples).
    """
    p = F.col(phase_col)
    a = phase_df.select("series_id", F.col("channel").alias("ch_a"),
                        "sample_idx", p.alias("_pa"))
    b = phase_df.select(F.col("series_id").alias("_sid"),
                        F.col("channel").alias("ch_b"),
                        F.col("sample_idx").alias("_idx"), p.alias("_pb"))
    pair_pred = (F.col("ch_b") >= F.col("ch_a") if include_self
                 else F.col("ch_b") > F.col("ch_a"))
    j = a.join(b, (F.col("series_id") == F.col("_sid"))
               & (F.col("sample_idx") == F.col("_idx")) & pair_pred)
    d = F.col("_pa") - F.col("_pb")
    agg = j.groupBy("series_id", "ch_a", "ch_b").agg(
        F.avg(F.cos(d)).alias("_re"), F.avg(F.sin(d)).alias("_im"),
        F.count(F.lit(1)).alias("n_samples"))
    return agg.select(
        "series_id", "ch_a", "ch_b",
        F.sqrt(F.col("_re") ** 2 + F.col("_im") ** 2).alias("plv"),
        "n_samples")


def phase_phase_coupling(phase_slow_df: DataFrame, phase_fast_df: DataFrame,
                         n: int, m: int,
                         phase_col: str = "phase") -> DataFrame:
    """n:m phase-phase coupling (Tass 1998) per (series_id, channel):

        R_nm = | mean_t( exp(i * (n*phi_slow[t] - m*phi_fast[t])) ) |

    1 when the fast rhythm completes exactly n cycles per m slow cycles
    at a fixed phase relation (e.g. theta-gamma 4:1 locking), ~0 when
    the rhythms are incommensurate. The cross-frequency sibling of
    phase_locking_value (same mean-resultant-vector aggregate, phases
    from two different bands of the SAME channel).

    Pure Catalyst: inner equi-join of the two phase streams on
    (series_id, channel, sample_idx) — aligned by construction when both
    come out of the pipeline's shared final grid — then ONE
    partial-aggregable cos/sin mean. Scale: shuffle linear in samples,
    state one row per channel.

    Reference context: the reference pipeline ends at wavelet
    amplitudes/phases (pipelines.py:15-111); this consumes two of its
    per-band phase streams.
    """
    if n < 1 or m < 1:
        raise ValueError(f"need n, m >= 1, got n={n} m={m}")
    p = phase_slow_df.select("series_id", "channel", "sample_idx",
                             F.col(phase_col).alias("_ps"))
    q = phase_fast_df.select("series_id", "channel", "sample_idx",
                             F.col(phase_col).alias("_pf"))
    j = p.join(q, ["series_id", "channel", "sample_idx"])
    d = F.lit(float(n)) * F.col("_ps") - F.lit(float(m)) * F.col("_pf")
    agg = j.groupBy("series_id", "channel").agg(
        F.avg(F.cos(d)).alias("_re"), F.avg(F.sin(d)).alias("_im"),
        F.count(F.lit(1)).alias("n_samples"))
    return agg.select(
        "series_id", "channel",
        F.sqrt(F.col("_re") ** 2 + F.col("_im") ** 2).alias("r_nm"),
        "n_samples")
