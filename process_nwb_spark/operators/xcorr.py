"""Time-domain cross-correlation between channel pairs at bounded lags —
the lagged-connectivity sibling of the spectral coherence operator
(operators/coherence.py). Classic ECoG/LFP functional-connectivity
measure: the cross-correlogram r(ch_a, ch_b, lag) locates the lag at
which one electrode's signal best predicts another's.

Pure Catalyst, no Python crossing:

1. explode the (small, bounded) lag set onto side A — a narrow fan-out
   of |lags| rows per sample;
2. equi-join side B on (series, sample_idx == a.sample_idx + lag) — an
   expression equi-join Catalyst plans as a regular shuffled hash/SMJ
   join, NOT a theta join; the `ch_b >= ch_a` dedup predicate rides as a
   join residual;
3. groupBy (series, ch_a, ch_b, lag) -> F.corr — a partial-aggregable
   Pearson correlation (map-side combine; one value per group out).

Scale: shuffle volume is |lags| * n_rows on side A plus n_rows on side B
— linear in input for a bounded lag set; no window over the whole time
axis, no per-channel materialization, so an arbitrarily long recording
streams through. Per-pair blowup is bounded by n_channels^2 GROUPS (one
output row each), not rows. Edge samples where t+lag runs off the
recording drop out of the inner join, so each lag's correlation is over
exactly the overlapping window (the standard unpadded estimator).

The reference has no connectivity stage (its pipeline ends at wavelet
amplitudes, pipelines.py:15-111); this extends the engine's spectral
tier the way its users' downstream analyses do.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cross_correlation(signals: DataFrame, lags: Sequence[int],
                      value_col: str = "value",
                      include_self: bool = False,
                      max_lags: int = 256,
                      exact_scale: int | None = None) -> DataFrame:
    """Pearson cross-correlogram over channel pairs: strictly
    ch_b > ch_a by default, ch_b >= ch_a with include_self=True.

    signals: long layout (series_id, channel, sample_idx, value).
    lags:    bounded set of integer sample offsets (b leads a by `lag`).
    Returns (series_id, ch_a, ch_b, lag, r, n_overlap) — `r` is
    corr(a[t], b[t+lag]) over the overlapping window, `n_overlap` the
    count of overlapping pairs where BOTH values are non-null (matching
    the rows F.corr actually uses; estimator transparency: a lag near
    the recording length correlates almost nothing and should be read
    accordingly).

    `max_lags` guards the explode fan-out: the shuffle grows by a factor
    of |lags|, so an unbounded lag sweep on a 100 TB input must be run
    as several bounded sweeps, not one unbounded plan.

    `exact_scale`: for fixed-point data (values on a 1/exact_scale
    grid), compute r from exact BIGINT moment sums instead of F.corr —
    the result is then independent of partitioning/summation order
    (bit-identical across runs and engines), and integer partial sums
    are cheaper than float corr's. Scale factors cancel in r. Guard
    rails: |value*exact_scale| must stay < ~1e6 and n per group < ~4e6
    so n*Sxx fits int64; with 6-dp signals in [-2, 2] that allows
    million-sample windows.
    """
    lag_list = sorted({int(l) for l in lags})
    if not lag_list:
        raise ValueError("cross_correlation: empty lag set")
    if len(lag_list) > max_lags:
        raise ValueError(
            f"cross_correlation: {len(lag_list)} lags would multiply the "
            f"shuffle {len(lag_list)}x (cap {max_lags}); run bounded "
            f"sweeps or raise max_lags deliberately")

    v = F.col(value_col)
    a = signals.select(
        "series_id", F.col("channel").alias("ch_a"),
        F.col("sample_idx").alias("idx_a"), v.alias("va"),
        F.explode(F.array(*[F.lit(l) for l in lag_list])).alias("lag"))
    b = signals.select(
        F.col("series_id").alias("_sid_b"), F.col("channel").alias("ch_b"),
        F.col("sample_idx").alias("idx_b"), v.alias("vb"))
    pair_pred = (F.col("ch_b") >= F.col("ch_a") if include_self
                 else F.col("ch_b") > F.col("ch_a"))
    j = a.join(
        b,
        (F.col("series_id") == F.col("_sid_b"))
        & (F.col("idx_b") == F.col("idx_a") + F.col("lag"))
        & pair_pred)
    both = F.col("va").isNotNull() & F.col("vb").isNotNull()
    grp = j.groupBy("series_id", "ch_a", "ch_b", "lag")
    if exact_scale is None:
        return grp.agg(F.corr("va", "vb").alias("r"),
                       F.sum(both.cast("long")).alias("n_overlap"))
    s = F.lit(float(exact_scale))
    xa = F.when(both, F.round(F.col("va") * s).cast("bigint"))
    xb = F.when(both, F.round(F.col("vb") * s).cast("bigint"))
    g = grp.agg(F.sum(both.cast("long")).alias("n"),
                F.sum(xa).alias("sx"), F.sum(xb).alias("sy"),
                F.sum(xa * xa).alias("sxx"), F.sum(xb * xb).alias("syy"),
                F.sum(xa * xb).alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    da = (n * F.col("sxx") - sx * sx).cast("double")
    db = (n * F.col("syy") - sy * sy).cast("double")
    r = F.when((da > 0) & (db > 0), num / (F.sqrt(da) * F.sqrt(db)))
    return g.select("series_id", "ch_a", "ch_b", "lag", r.alias("r"),
                    F.col("n").alias("n_overlap"))


def estimate_delays(signals: DataFrame, max_lag: int,
                    value_col: str = "value",
                    exact_scale: int | None = None,
                    min_abs_r: float = 0.0) -> DataFrame:
    """Per-pair delay estimation: the lag in [-max_lag, max_lag] that
    maximizes |r| of the cross-correlogram (ch_b leads ch_a by
    `best_lag` samples when positive). Ties break toward the smaller
    lag, so the argmax is deterministic whenever r values are (pass
    `exact_scale` for fixed-point data to make them bit-deterministic).

    `min_abs_r` drops pairs whose best correlation is below a floor —
    at scale most pairs are unrelated and their argmax is noise; the
    floor keeps the output proportional to genuinely-coupled pairs.

    One window over the (pairs x lags)-sized correlogram — rows are
    bounded by n_channels^2 * (2*max_lag+1), never by samples.
    """
    from pyspark.sql.window import Window

    lags = list(range(-int(max_lag), int(max_lag) + 1))
    xc = cross_correlation(signals, lags, value_col=value_col,
                           exact_scale=exact_scale)
    w = (Window.partitionBy("series_id", "ch_a", "ch_b")
         .orderBy(F.abs(F.col("r")).desc(), F.col("lag").asc()))
    return (xc.filter(F.col("r").isNotNull())
            .withColumn("_rk", F.row_number().over(w))
            .filter((F.col("_rk") == 1)
                    & (F.abs(F.col("r")) >= float(min_abs_r)))
            .select("series_id", "ch_a", "ch_b",
                    F.col("lag").alias("best_lag"), "r", "n_overlap"))
