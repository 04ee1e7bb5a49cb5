"""Local-maxima peak detection with a refractory separation — the
event-extraction stage between raw traces and trial analysis (spike /
artifact / heartbeat peak picking). Pure Catalyst:

1. candidate peaks: strict local maxima above `threshold`
   (v > prev AND v >= next AND v >= threshold) via one per-channel
   ordered window — a 3-tap stencil, state O(1) per row;
2. refractory grouping: consecutive candidates closer than
   `min_separation` samples merge into one refractory ISLAND
   (gaps-and-islands: cumulative sum of gap >= min_separation flags —
   the same construction as operators/bursts.py);
3. per island keep the highest-amplitude candidate (ties -> earliest
   sample), via one windowed rank over candidates only.

The island rule is the order-free (transitive-closure) variant of the
sequential greedy "drop peaks within N samples of a kept peak" scan:
a run of candidates chained by sub-min_separation gaps collapses to ONE
representative (greedy could keep two ends of a long chain), and any
two REPORTED peaks are always >= min_separation apart — the invariant
users actually rely on — while staying a pure windowed aggregate with
no sequential recurrence. Scale: windows key on (series, channel);
candidates are sparse (threshold-gated), so the island/rank windows run
on rows proportional to PEAKS, not samples.

Reference context: the reference pipeline ends at wavelet amplitudes
(pipelines.py:15-111); peak extraction over those amplitude envelopes
is the canonical downstream step (HFO/spike counting).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def detect_peaks(signals: DataFrame, threshold: float,
                 min_separation: int = 1,
                 value_col: str = "value") -> DataFrame:
    """-> (series_id, channel, sample_idx, peak_value, island_size).

    signals: long (series_id, channel, sample_idx, <value_col>).
    threshold: minimum peak amplitude (inclusive).
    min_separation: two reported peaks are always >= this many samples
      apart; candidates closer than it merge (max amplitude wins,
      earliest sample on ties).

    NaN guard: Spark orders NaN greatest, so a NaN sample would both
    pass the threshold and win every island — NaNs are dropped up front
    (same policy as operators/bursts.py).
    """
    if min_separation < 1:
        raise ValueError(
            f"need min_separation >= 1, got {min_separation}")
    v = F.col(value_col)
    w = Window.partitionBy("series_id", "channel").orderBy("sample_idx")
    clean = signals.filter(~F.isnan(v) & v.isNotNull())
    cand = (clean
            .withColumn("_prev", F.lag(v).over(w))
            .withColumn("_next", F.lead(v).over(w))
            # strict rise on the left, non-strict on the right: a flat
            # two-sample summit reports its FIRST sample exactly once
            .filter((v >= float(threshold))
                    & F.col("_prev").isNotNull() & (v > F.col("_prev"))
                    & F.col("_next").isNotNull() & (v >= F.col("_next"))))
    wc = Window.partitionBy("series_id", "channel").orderBy("sample_idx")
    gap = F.col("sample_idx") - F.lag("sample_idx").over(wc)
    cand = cand.withColumn(
        "_new", F.when(gap.isNull()
                       | (gap >= int(min_separation)), 1).otherwise(0))
    cand = cand.withColumn(
        "island", F.sum("_new").over(
            wc.rowsBetween(Window.unboundedPreceding, 0)))
    wi = (Window.partitionBy("series_id", "channel", "island")
          .orderBy(v.desc(), F.col("sample_idx").asc()))
    return (cand
            .withColumn("_rk", F.row_number().over(wi))
            .withColumn("island_size",
                        F.count(F.lit(1)).over(
                            Window.partitionBy("series_id", "channel",
                                               "island")))
            .filter(F.col("_rk") == 1)
            .select("series_id", "channel", "sample_idx",
                    v.alias("peak_value"), "island_size"))
