"""Pairwise lag-1 Granger-style causality as a pure Catalyst plan.

For every ordered channel pair (src -> dst): does src's PAST improve a
linear prediction of dst beyond dst's own past?

    restricted:  dst[t] ~ a*dst[t-1] + c
    full:        dst[t] ~ a*dst[t-1] + b*src[t-1] + c
    var_ratio  = RSS_restricted / RSS_full   (>= 1; ln of it is the
                 Geweke causality measure — left to the caller so the
                 operator output involves NO libm call)

Everything is closed-form OLS from second moments, so the whole
estimator is: one per-channel lag window -> one (series, t)-keyed
pair join (the CAR-gather shape) -> ONE partial-aggregable sum of 10
moments -> scalar expressions. No iteration, no Python, no matrix
library: the 2-regressor normal equations are solved by Cramer's rule
in the projection.

Determinism: with `exact_scale` (fixed-point data), the 10 moment sums
are exact BIGINTs and all centered moments (n*Sxy - Sx*Sy etc.) are
computed IN INTEGER ARITHMETIC before a single deterministic cast to
double — the final ratio is then bit-identical across partitionings,
runs, and engines evaluating the same expression tree. Guard rail:
n * max|value*exact_scale| must stay below ~3e9 so n*Sxx and Sx^2 fit
int64 (6-dp values |v| <= 1 allow n <= 2000 samples; 4-dp values allow
n <= 300k — pick the scale to match the data's true precision).

Scale: shuffle = 2x samples for the join (src side + dst side), moments
partial-aggregate map-side, output is one row per ordered pair. For a
wide-channel montage the pair fan-out is n_channels^2 GROUPS, not rows.

Reference context: the reference pipeline ends at wavelet amplitudes
(pipelines.py:15-111); directed-influence estimation over its outputs is
the standard next analysis (cf. phase_slope_index for the spectral
sibling)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def granger_pairwise(signals: DataFrame,
                     value_col: str = "value",
                     exact_scale: int | None = None) -> DataFrame:
    """-> (series_id, ch_src, ch_dst, var_ratio, n) for every ordered
    pair ch_src != ch_dst.

    var_ratio = RSS of the dst-only AR(1) model over RSS of the model
    that adds src[t-1]; ratio ~ 1 means src adds nothing, ratio >> 1
    means src's past linearly predicts dst. NULL when a model is
    degenerate (zero-variance regressors / singular normal matrix).
    """
    v = F.col(value_col)
    w = Window.partitionBy("series_id", "channel").orderBy("sample_idx")
    lagged = signals.select(
        "series_id", "channel", "sample_idx", v.alias("_v"),
        F.lag(v).over(w).alias("_v1"))

    dst = lagged.filter(F.col("_v1").isNotNull()).select(
        "series_id", F.col("channel").alias("ch_dst"),
        "sample_idx", F.col("_v").alias("y"), F.col("_v1").alias("y1"))
    src = lagged.filter(F.col("_v1").isNotNull()).select(
        F.col("series_id").alias("_sid"), F.col("channel").alias("ch_src"),
        F.col("sample_idx").alias("_idx"), F.col("_v1").alias("x1"))
    j = dst.join(src, (F.col("series_id") == F.col("_sid"))
                 & (F.col("sample_idx") == F.col("_idx"))
                 & (F.col("ch_src") != F.col("ch_dst")))

    if exact_scale is None:
        y, y1, x1 = F.col("y"), F.col("y1"), F.col("x1")
        cast = (lambda c: c)
    else:
        s = F.lit(float(exact_scale))
        y = F.round(F.col("y") * s).cast("bigint")
        y1 = F.round(F.col("y1") * s).cast("bigint")
        x1 = F.round(F.col("x1") * s).cast("bigint")
        cast = (lambda c: c.cast("double"))

    g = j.groupBy("series_id", "ch_src", "ch_dst").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("sy"), F.sum(y1).alias("s1"), F.sum(x1).alias("s2"),
        F.sum(y * y).alias("syy"), F.sum(y1 * y1).alias("s11"),
        F.sum(x1 * x1).alias("s22"), F.sum(y * y1).alias("s1y"),
        F.sum(y * x1).alias("s2y"), F.sum(y1 * x1).alias("s12"))

    n = F.col("n")
    # centered moments scaled by n (exact integers under exact_scale)
    cyy = cast(n * F.col("syy") - F.col("sy") * F.col("sy"))
    c11 = cast(n * F.col("s11") - F.col("s1") * F.col("s1"))
    c22 = cast(n * F.col("s22") - F.col("s2") * F.col("s2"))
    c1y = cast(n * F.col("s1y") - F.col("sy") * F.col("s1"))
    c2y = cast(n * F.col("s2y") - F.col("sy") * F.col("s2"))
    c12 = cast(n * F.col("s12") - F.col("s1") * F.col("s2"))
    rss_r = cyy - c1y * c1y / c11
    det = c11 * c22 - c12 * c12
    rss_f = cyy - (c22 * c1y * c1y - 2 * c12 * c1y * c2y
                   + c11 * c2y * c2y) / det
    ratio = F.when((c11 > 0) & (det > 0) & (rss_f > 0), rss_r / rss_f)
    return g.select("series_id", "ch_src", "ch_dst",
                    ratio.alias("var_ratio"), "n")
