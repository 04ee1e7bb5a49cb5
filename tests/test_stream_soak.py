"""Randomized micro-batch-cut soak for the six stateful streaming twins.

Each per-face parity test in test_streaming.py pins ONE hand-placed cut
pattern; this soak pins the CLASS: the same six twins (burst, peak,
CUSUM, rolling-OLS, sessionize, hysteresis) driven through a single run
whose cut points are drawn from a SEEDED rng, asserting bit-exact batch
parity on every one. A failure prints the seed-derived cut list, so any
counterexample is replayable verbatim.
"""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

SEED = 20260815


def _drain(spark, tmp_path, name, segments, schema, twin):
    """Write `segments` (ordered list of DataFrames) as one file each,
    stream them back one file per micro-batch through `twin`, return the
    drained memory table."""
    in_dir = str(tmp_path / f"in_{name}")
    for seg in segments:
        seg.coalesce(1).write.mode("append").parquet(in_dir)
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (twin(sdf).writeStream.format("memory").queryName(f"soak_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(f"soak_{name}").toPandas()


def _random_cuts(rng, axis, n_segs):
    """n_segs-1 distinct interior cut points over the sorted axis."""
    idx = sorted(rng.choice(range(1, len(axis)), size=n_segs - 1,
                            replace=False))
    return [axis[i] for i in idx]


def _segments(df, col, cuts):
    bounds = [None, *cuts, None]
    segs = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        p = F.lit(True)
        if lo is not None:
            p = p & (F.col(col) >= lo)
        if hi is not None:
            p = p & (F.col(col) < hi)
        segs.append(df.filter(p))
    return segs


def _eq(got, want, cols, keys, ctx):
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want) > 0, (ctx, len(got), len(want))
    pd.testing.assert_frame_equal(got[cols], want[cols],
                                  check_dtype=False, check_exact=True,
                                  obj=str(ctx))


def test_stateful_twins_soak_random_cuts(spark, tmp_path):
    from process_nwb_spark.operators.bursts import detect_bursts
    from process_nwb_spark.operators.peaks import detect_peaks
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.relational.event_windows import (
        ts_cusum_shift, win_rolling_regression)
    from process_nwb_spark.streaming.ops import (
        SIGNALS_SCHEMA, stream_alert_hysteresis, stream_burst_detect,
        stream_cusum_shift, stream_peak_detect, stream_rolling_slope,
        stream_sessionize)

    rng = np.random.default_rng(SEED)
    qs = all_queries()
    ev = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))

    # --- CUSUM + rolling OLS: random cuts on the shared day axis ---
    daily_x = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
               .agg(F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
                    .cast("bigint").alias("xc")))
    days = sorted(r.d for r in daily_x.select("d").distinct().collect())
    for name, vcol, twin, batch, cols in [
        ("cusum", "xc", stream_cusum_shift,
         lambda: ts_cusum_shift(spark, SF_CORRECT),
         ["event_type", "day", "x", "cusum_hi", "cusum_lo", "shift_flag"]),
        ("slope", "yc", stream_rolling_slope,
         lambda: win_rolling_regression(spark, SF_CORRECT),
         ["event_type", "day", "slope_cents", "rising"]),
    ]:
        cuts = _random_cuts(rng, days, int(rng.integers(3, 7)))
        daily = daily_x.withColumnRenamed("xc", vcol) if vcol != "xc" \
            else daily_x
        got = _drain(spark, tmp_path, name,
                     _segments(daily, "d", cuts),
                     f"event_type string, d date, {vcol} long", twin)
        want = batch().toPandas()
        _eq(got, want, cols, ["event_type", "day"], (name, cuts))

    # --- sessionize: random cuts on event time; open sessions dropped
    # from the batch expectation (a stream cannot know they ended) ---
    sess_ev = ev.select("user_id", "event_id", "event_type",
                        F.unix_micros("ts").alias("us"))
    lo, hi = sess_ev.agg(F.min("us"), F.max("us")).first()
    fracs = sorted(rng.uniform(0.05, 0.95, size=int(rng.integers(2, 5))))
    cuts = [int(lo + f * (hi - lo)) for f in fracs]
    got = _drain(spark, tmp_path, "sess", _segments(sess_ev, "us", cuts),
                 "user_id long, event_id long, event_type string, us long",
                 stream_sessionize)
    want_all = qs["event_sessionize"].fn(spark, SF_CORRECT).toPandas()
    last = want_all.groupby("user_id")["session_no"].transform("max")
    want = want_all[want_all.session_no < last]
    _eq(got, want, ["user_id", "session_no", "n_events", "n_types",
                    "duration_s"], ["user_id", "session_no"],
        ("sess", cuts))

    # --- hysteresis: random cuts on the hour axis ---
    hourly = (qs["alert_hysteresis_state"].fn(spark, SF_CORRECT)
              .select("hour", "n_events", "n_errors")
              .withColumn("series", F.lit("all")))
    hrs = sorted(r.hour for r in hourly.select("hour").collect())
    cuts = _random_cuts(rng, hrs, int(rng.integers(3, 7)))
    got = _drain(spark, tmp_path, "hyst", _segments(hourly, "hour", cuts),
                 "hour string, n_events long, n_errors long, series string",
                 stream_alert_hysteresis)
    want = qs["alert_hysteresis_state"].fn(spark, SF_CORRECT).toPandas()
    _eq(got, want, ["hour", "n_events", "n_errors", "state", "fired"],
        ["hour"], ("hyst", cuts))
    assert got.state.nunique() == 2      # the soak exercised both states

    # --- burst + peak: random cuts on the sample axis of the fixture
    # signals (same signal content as the per-face tests, so bursts and
    # peak islands land at KNOWN offsets; the rng moves the cuts) ---
    n = 3000
    sig_rng = np.random.default_rng(23)
    x = sig_rng.standard_normal(n) * 0.3
    x[980:1060] += 2.0
    x[1990:2015] += 2.0
    x[300:303] += 3.0
    x[500:520] += 2.5
    x[-1] = 0.0
    burst_df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.int32(0),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))
    cuts = _random_cuts(rng, list(range(n)), int(rng.integers(3, 7)))
    got = _drain(spark, tmp_path, "bursts",
                 _segments(burst_df, "sample_idx", cuts), SIGNALS_SCHEMA,
                 lambda s: stream_burst_detect(s, threshold=1.0,
                                               min_duration=5))
    want = detect_bursts(burst_df, 1.0, min_duration=5).toPandas()
    _eq(got, want, ["start_idx", "end_idx", "duration", "peak"],
        ["start_idx"], ("bursts", cuts))

    sig_rng = np.random.default_rng(31)
    x = sig_rng.random(n) * 0.3
    x[999] += 1.5
    x[1030] += 1.2
    x[500] += 2.0
    x[503] += 1.6
    x[1995] += 1.8
    x[2500] += 1.4
    x[-1] = 0.0
    peak_df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.int32(0),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))
    cuts = _random_cuts(rng, list(range(n)), int(rng.integers(3, 7)))
    got = _drain(spark, tmp_path, "peaks",
                 _segments(peak_df, "sample_idx", cuts), SIGNALS_SCHEMA,
                 lambda s: stream_peak_detect(s, threshold=0.8,
                                              min_separation=50))
    want = detect_peaks(peak_df, threshold=0.8,
                        min_separation=50).toPandas()
    _eq(got, want, ["sample_idx", "island_size", "peak_value"],
        ["sample_idx"], ("peaks", cuts))
