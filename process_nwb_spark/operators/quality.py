"""Channel quality screening — the manual step every ECoG pipeline runs
before the reference's preprocess chain: flag channels whose variance is
a robust outlier against the rest of the array (broken electrodes read
near-zero or rail-to-rail; both ends are bad).

Pure Catalyst: one partial-aggregable groupBy for per-channel moments,
one tiny cross-channel robust-stats aggregate (n_channels rows —
broadcast back as a scalar subquery), one projection for the flags. No
Python, no window over samples, exactly SQL-replayable — so the driver
face (`sig_bad_channels`) is a full hash-match oracle, not a contract
boolean.

The robust score is the classic log-variance MAD rule: a channel is bad
when |log10(var_c) - median(log10(var))| > k * MAD(log10(var)),
k = 3 by default (log-variance makes the rule symmetric between dead
and saturated channels; MAD survives up to half the array being bad).
The MAD is floored at the log-variance SAMPLING error
log10(e)*sqrt(2/n) — on a strongly homogeneous array the raw MAD
shrinks to estimator noise and k-MAD rules then flag ~1% of good
channels spuriously; deviations below the sampling error are
statistically meaningless and must not flag."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def channel_quality(signals: DataFrame, mad_thresh: float = 3.0,
                    value_col: str = "value") -> DataFrame:
    """(series_id, channel, n_samples, variance, log_var, dev, is_bad)
    per channel; `dev` is the |log-variance deviation| in MAD units.
    The MAD is floored at the log-variance sampling error
    (log10(e)*sqrt(2/n)), so `dev` is never NULL: when all channels are
    statistically identical the floor dominates, dev stays ~0, and
    nothing is flagged (tests/test_quality.py pins dev == 0 there)."""
    v = F.col(value_col)
    per_ch = (signals.groupBy("series_id", "channel")
              .agg(F.count("*").alias("n_samples"),
                   F.var_pop(v).alias("variance")))
    lv = F.log10(F.greatest(F.col("variance"), F.lit(1e-300)))
    per_ch = per_ch.withColumn("log_var", lv)
    med = (per_ch.groupBy("series_id")
           .agg(F.percentile("log_var", 0.5).alias("_med")))
    with_med = per_ch.join(F.broadcast(med), "series_id")
    mad = (with_med.groupBy("series_id")
           .agg(F.percentile(F.abs(F.col("log_var") - F.col("_med")), 0.5)
                .alias("_mad")))
    j = with_med.join(F.broadcast(mad), "series_id")
    # 0.434294... = log10(e); sqrt(2/n) is the sampling std of a
    # variance estimate from n samples, mapped onto the log10 scale
    floor = F.lit(0.4342944819032518) * F.sqrt(2.0 / F.col("n_samples"))
    mad_eff = F.greatest(F.col("_mad"), floor)
    dev = F.abs(F.col("log_var") - F.col("_med")) / mad_eff
    return j.select(
        "series_id", "channel", "n_samples", "variance", "log_var",
        dev.alias("dev"),
        (dev > float(mad_thresh)).alias("is_bad"))


def drop_bad_channels(signals: DataFrame, mad_thresh: float = 3.0,
                      value_col: str = "value") -> DataFrame:
    """Filter the long signal down to good channels (anti-join on the
    flagged set — the flagged set is n_channels rows, always broadcast)."""
    bad = (channel_quality(signals, mad_thresh, value_col)
           .filter("is_bad").select("series_id", "channel"))
    return signals.join(F.broadcast(bad), ["series_id", "channel"],
                        "left_anti")


def recording_qc(signals: DataFrame, rate: float, frame_len: int = 512,
                 mad_thresh: float = 3.0, snr_thresh: float = 3.0,
                 value_col: str = "value") -> DataFrame:
    """The one-call QC report a lab runs before the preprocess chain:
    per channel, the robust-variance screen (dead/saturated electrodes,
    `channel_quality`) joined with the line-noise SNR screen
    (`spectral_summary.line_noise_snr`), and a combined verdict.

    Returns (series_id, channel, n_samples, variance, dev,
    is_bad_variance, line_snr, is_line_noisy, is_bad) — `is_bad` is the
    OR of both screens. Both inputs are channel-sized aggregates of the
    same scan (the PSD pays its one bounded-frame shuffle; the variance
    screen is a pure hash agg), and the final join is dimension-sized.
    `drop_bad_channels` remains the filter form; this is the REPORT
    form — keep it, inspect it, store it next to the recording.
    """
    from .spectral_summary import line_noise_snr

    q = channel_quality(signals, mad_thresh=mad_thresh,
                        value_col=value_col)
    # line_noise_snr reads the canonical `value` column
    s = signals if value_col == "value" else signals.select(
        "series_id", "channel", "sample_idx",
        F.col(value_col).alias("value"))
    snr = (line_noise_snr(s, rate, frame_len)
           .select(F.col("series_id").alias("_sid"),
                   F.col("channel").alias("_ch"),
                   F.col("snr").alias("line_snr")))
    j = q.join(snr, (q.series_id == F.col("_sid"))
               & (q.channel == F.col("_ch")), "left")
    noisy = F.coalesce(F.col("line_snr") > float(snr_thresh), F.lit(False))
    return j.select(
        "series_id", "channel", "n_samples", "variance", "dev",
        F.col("is_bad").alias("is_bad_variance"),
        "line_snr", noisy.alias("is_line_noisy"),
        (F.col("is_bad") | noisy).alias("is_bad"))
