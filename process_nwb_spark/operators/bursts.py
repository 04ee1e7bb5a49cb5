"""Burst / high-frequency-oscillation detection over a long signal
stream — the event-detection step ECoG analyses run on the pipeline's
high-gamma trace (find intervals where the envelope stays above a
threshold long enough to count as a burst, then report each burst's
extent, peak and area).

Pure Catalyst gaps-and-islands: filter to supra-threshold samples, give
each one an island id `sample_idx - row_number()` within its channel
(consecutive samples share the id; any gap starts a new island), then
one partial-aggregable groupBy per island. Two narrow window passes +
one aggregate; no Python crossing, no self-join.

Scale: the row_number window shuffles once on (series_id, channel) and
sort-spills for channels longer than a partition budget; the island
aggregate is map-side combinable. For 1e8+-sample channels route the
ENVELOPE through the segmented pipeline first (operators/segmented.py)
— bursts are local structures, so per-channel windowing is the right
physical shape; only the upstream spectral stages need segmenting.

Reference analog: none (the reference stops at stored amplitudes);
this is the standard downstream detection its users script in NumPy.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def detect_bursts(signals: DataFrame, threshold: float,
                  min_duration: int = 1,
                  value_col: str = "value") -> DataFrame:
    """Supra-threshold islands per (series_id, channel).

    signals: long (series_id, channel, sample_idx, <value_col>),
    gapless per channel (the engine's canonical layout; a gap in
    sample_idx conservatively splits a burst, it never merges two).
    Returns (series_id, channel, start_idx, end_idx, duration, peak,
    area) with duration >= min_duration; `area` integrates the excess
    over threshold (sum of value - threshold), `peak` is the island max.
    """
    if min_duration < 1:
        raise ValueError(f"need min_duration >= 1, got {min_duration}")
    v = F.col(value_col)
    # Spark orders NaN ABOVE every double, so `v >= threshold` would pull
    # NaN samples into islands and poison their peak/area; an unmeasured
    # sample instead SPLITS the island (conservative, like a gap)
    above = signals.filter((v >= float(threshold)) & ~F.isnan(v))
    w = Window.partitionBy("series_id", "channel").orderBy("sample_idx")
    isl = above.withColumn(
        "_isl", F.col("sample_idx") - F.row_number().over(w))
    return (isl.groupBy("series_id", "channel", "_isl")
            .agg(F.min("sample_idx").alias("start_idx"),
                 F.max("sample_idx").alias("end_idx"),
                 F.count(F.lit(1)).alias("duration"),
                 F.max(v).alias("peak"),
                 F.sum(v - float(threshold)).alias("area"))
            .filter(F.col("duration") >= int(min_duration))
            .drop("_isl"))
