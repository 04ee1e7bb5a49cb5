"""Per-channel scalar feature extraction — the classic EEG descriptors
(Hjorth 1970 time-domain parameters; spectral entropy and edge
frequency) that feed downstream classifiers: sleep staging, anesthesia
depth, artifact triage. This is the bridge from the signal tier to the
engine's ML/data-prep tier — each operator reduces a channel to a few
numbers with plain partial-aggregable plans.

- `hjorth_parameters`: activity/mobility/complexity from the variances
  of the signal and its first two discrete differences — ONE window
  shuffle (per-channel lag) + one hash aggregate, exactly SQL-replayable
  (full-hash driver face).
- `spectral_entropy`: Shannon entropy of the normalized Welch PSD,
  optionally normalized to [0, 1] by log(n_bins) — white noise ~1, a
  pure tone ~0.
- `spectral_edge`: the frequency below which `fraction` of total power
  lies (SEF95 by default) — a per-channel running-sum window over the
  tiny PSD relation.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .stft import welch_psd


def hjorth_parameters(signals: DataFrame,
                      value_col: str = "value") -> DataFrame:
    """(series_id, channel, n_samples, activity, mobility, complexity).

    activity = var(x); mobility = sqrt(var(dx)/var(x));
    complexity = sqrt(var(d2x)/var(dx)) / mobility — with dx the
    first-order difference over the sample grid (population variances,
    matching the reference's np.var default). A flat channel
    (var(x) = 0) returns NULL mobility/complexity rather than a
    division error."""
    v = F.col(value_col)
    w = Window.partitionBy("series_id", "channel").orderBy("sample_idx")
    d1 = v - F.lag(v).over(w)
    with_d = signals.select(
        "series_id", "channel", "sample_idx", v.alias("_x"),
        d1.alias("_d1"))
    d2 = F.col("_d1") - F.lag("_d1").over(w)
    with_d2 = with_d.withColumn("_d2", d2)
    g = (with_d2.groupBy("series_id", "channel")
         .agg(F.count(F.lit(1)).alias("n_samples"),
              F.var_pop("_x").alias("activity"),
              F.var_pop("_d1").alias("_v1"),
              F.var_pop("_d2").alias("_v2")))
    mob = F.when(F.col("activity") > 0,
                 F.sqrt(F.col("_v1") / F.col("activity")))
    cpx = F.when((F.col("_v1") > 0) & (F.col("activity") > 0),
                 F.sqrt(F.col("_v2") / F.col("_v1"))
                 / F.sqrt(F.col("_v1") / F.col("activity")))
    return g.select("series_id", "channel", "n_samples", "activity",
                    mob.alias("mobility"), cpx.alias("complexity"))


def spectral_entropy(signals: DataFrame, rate: float, frame_len: int,
                     normalized: bool = True) -> DataFrame:
    """(series_id, channel, entropy, n_bins): Shannon entropy of the
    Welch PSD as a probability distribution over bins; `normalized`
    divides by ln(n_bins) so white noise reads ~1 and a pure tone ~0.
    Zero-power bins contribute 0 (the 0*ln(0) limit)."""
    if normalized and frame_len < 4:
        # frame_len=2 gives a single one-sided bin -> ln(1)=0 divisor
        raise ValueError(
            f"normalized spectral entropy needs frame_len >= 4 "
            f"(>= 2 PSD bins), got {frame_len}")
    psd = welch_psd(signals, rate, frame_len)
    tot = Window.partitionBy("series_id", "channel")
    p = F.col("psd") / F.sum("psd").over(tot)
    term = F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0))
    g = (psd.select("series_id", "channel", term.alias("_t"))
         .groupBy("series_id", "channel")
         .agg(F.sum("_t").alias("_h"), F.count(F.lit(1)).alias("n_bins")))
    h = (F.col("_h") / F.log(F.col("n_bins").cast("double"))
         if normalized else F.col("_h"))
    return g.select("series_id", "channel", h.alias("entropy"), "n_bins")


def spectral_edge(signals: DataFrame, rate: float, frame_len: int,
                  fraction: float = 0.95) -> DataFrame:
    """(series_id, channel, sef_hz): the lowest frequency at which the
    cumulative one-sided PSD reaches `fraction` of the channel's total
    power (SEF95 by default — the anesthesia-depth staple)."""
    if not 0 < fraction <= 1:
        raise ValueError(f"need 0 < fraction <= 1, got {fraction}")
    psd = welch_psd(signals, rate, frame_len)
    ch = Window.partitionBy("series_id", "channel")
    run = (Window.partitionBy("series_id", "channel").orderBy("bin")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("psd").over(run) / F.sum("psd").over(ch)
    # the windowed cumulative sum and the partition total fold in
    # different orders, so the last bin's ratio can land a hair below
    # 1.0 — treat the partition's last bin as cum==1 so fractions at or
    # near 1.0 cannot silently drop a channel from the output
    is_last = F.col("bin") == F.max("bin").over(ch)
    return (psd.withColumn("_cum", F.when(is_last, F.lit(1.0))
                           .otherwise(cum))
            .filter(F.col("_cum") >= float(fraction))
            .groupBy("series_id", "channel")
            .agg(F.min("freq_hz").alias("sef_hz")))


def aperiodic_fit(signals: DataFrame, rate: float, frame_len: int,
                  fmin: float, fmax: float,
                  robust_sigma: float = 2.0,
                  bins=None) -> DataFrame:
    """FOOOF-lite aperiodic (1/f) parameterization of the Welch PSD
    (Donoghue et al. 2020's aperiodic component, without the Gaussian
    peak model): per channel, an ordinary-least-squares line through
    (log10 f, log10 PSD) over [fmin, fmax], then a robust refit that
    drops bins whose residual exceeds `robust_sigma` residual-stddevs —
    oscillatory peaks ride ABOVE the 1/f trend, so the refit recovers
    the aperiodic slope a narrowband oscillation would otherwise bias.

    Returns (series_id, channel, n_fit, slope, intercept, r2,
    slope_robust, intercept_robust, n_excluded).

    Scale shape: the regression runs on the PSD — n_channels x n_bins
    rows, orders of magnitude smaller than samples — and both passes are
    single partial-aggregable groupBys (covar/var/avg are commutative
    monoids); the residual screen is a broadcast join of the per-channel
    line back onto the bins. No window functions, no Python."""
    if not 0 < fmin < fmax:
        raise ValueError(f"need 0 < fmin < fmax, got ({fmin}, {fmax})")
    psd = (welch_psd(signals, rate, frame_len)
           .filter((F.col("freq_hz") >= float(fmin))
                   & (F.col("freq_hz") <= float(fmax))
                   & (F.col("psd") > 0)))
    if bins is not None:
        # fit a known comb / exclude a noise floor: restrict to named bins
        psd = psd.filter(F.col("bin").isin(*[int(b) for b in bins]))
    psd = psd.select("series_id", "channel",
                     F.log10("freq_hz").alias("lf"),
                     F.log10("psd").alias("lp"))

    def ols(df):
        return df.groupBy("series_id", "channel").agg(
            F.count("*").alias("n_fit"),
            (F.covar_pop("lf", "lp") / F.var_pop("lf")).alias("slope"),
            F.avg("lp").alias("mlp"), F.avg("lf").alias("mlf"),
            (F.covar_pop("lf", "lp") * F.covar_pop("lf", "lp")
             / (F.var_pop("lf") * F.var_pop("lp"))).alias("r2"),
            F.var_pop("lp").alias("vlp"))

    f1 = (ols(psd)
          .withColumn("intercept",
                      F.col("mlp") - F.col("slope") * F.col("mlf")))
    line = f1.select(F.col("series_id").alias("sid"),
                     F.col("channel").alias("chl"),
                     "slope", "intercept", "n_fit", "r2")
    resid = (psd.join(F.broadcast(line),
                      (psd.series_id == F.col("sid"))
                      & (psd.channel == F.col("chl")))
             .withColumn("res", F.col("lp") - (F.col("intercept")
                                               + F.col("slope")
                                               * F.col("lf"))))
    sig = (resid.groupBy("sid", "chl")
           .agg(F.stddev_pop("res").alias("s_res")))
    kept = (resid.join(F.broadcast(sig), ["sid", "chl"])
            .filter(F.abs(F.col("res"))
                    <= F.lit(float(robust_sigma)) * F.col("s_res")))
    f2 = (ols(kept)
          .withColumnRenamed("n_fit", "n_kept")
          .withColumnRenamed("slope", "slope_robust")
          .withColumn("intercept_robust",
                      F.col("mlp") - F.col("slope_robust") * F.col("mlf"))
          .select("series_id", "channel", "n_kept", "slope_robust",
                  "intercept_robust"))
    return (f1.select("series_id", "channel", "n_fit", "slope",
                      "intercept", "r2")
            .join(f2, ["series_id", "channel"])
            .withColumn("n_excluded", F.col("n_fit") - F.col("n_kept"))
            .drop("n_kept"))
