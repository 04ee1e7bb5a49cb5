"""Channel-quality screening (operators/quality.py)."""
import numpy as np
from pyspark.sql import functions as F

from process_nwb_spark.operators.quality import (channel_quality,
                                                 drop_bad_channels)
from process_nwb_spark.synth import to_long_df


def _array(rng, n=4000, n_ch=8):
    X = rng.normal(size=(n, n_ch))
    X[:, 0] *= 0.001          # dead electrode
    X[:, 5] *= 200.0          # saturated electrode
    return X


def test_flags_dead_and_saturated_only(spark):
    X = _array(np.random.default_rng(0))
    q = channel_quality(to_long_df(spark, X)).toPandas()
    flagged = set(q[q.is_bad].channel)
    assert flagged == {0, 5}
    assert (q.n_samples == 4000).all()
    # both ends flag: the log-variance rule is symmetric
    devs = q.set_index("channel").dev
    assert devs[0] > 3 and devs[5] > 3
    assert all(devs[c] <= 3 for c in (1, 2, 3, 4, 6, 7))


def test_drop_bad_channels_filters(spark):
    X = _array(np.random.default_rng(1))
    kept = drop_bad_channels(to_long_df(spark, X))
    chs = {r.channel for r in kept.select("channel").distinct().collect()}
    assert chs == {1, 2, 3, 4, 6, 7}
    assert kept.count() == 6 * 4000


def test_identical_channels_flag_nothing(spark):
    """MAD == 0 (all channels identical): the rule must not divide by
    zero or flag anything."""
    x = np.random.default_rng(2).normal(size=4000)
    X = np.stack([x] * 4, axis=1)
    q = channel_quality(to_long_df(spark, X)).toPandas()
    assert not q.is_bad.any()
    # MAD floors at the sampling error, so dev is defined (and zero here)
    assert (q.dev == 0).all()


def test_multi_series_independent(spark):
    """Robust stats are per series: a channel ordinary in its own array
    must not be flagged because ANOTHER series has wild channels."""
    rng = np.random.default_rng(3)
    a = to_long_df(spark, _array(rng), "A")          # has bad channels
    b = to_long_df(spark, rng.normal(size=(4000, 8)), "B")   # all fine
    q = channel_quality(a.unionByName(b)).toPandas()
    assert set(q[(q.series_id == "A") & q.is_bad].channel) == {0, 5}
    assert not q[q.series_id == "B"].is_bad.any()


def test_recording_qc_flags_for_the_right_reason(spark):
    """Dead/saturated flag on variance only; a mains-contaminated
    channel flags on line noise only; clean channels pass both."""
    import numpy as np
    import pandas as pd
    from process_nwb_spark.operators.quality import recording_qc

    rng = np.random.default_rng(3)
    rate, n = 1000.0, 16384
    t = np.arange(n) / rate
    base = np.sin(2 * np.pi * 7.0 * t)
    X = np.stack([
        base + 0.3 * rng.standard_normal(n),
        0.001 * (base + 0.3 * rng.standard_normal(n)),       # dead
        100.0 * (base + 0.3 * rng.standard_normal(n)),       # saturated
        base + 2.0 * np.sin(2 * np.pi * 60.0 * t)
        + 0.3 * rng.standard_normal(n),                       # mains
        base + 0.3 * rng.standard_normal(n),
    ], axis=1)
    n_t, n_ch = X.shape
    df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel()}))
    got = {r.channel: r for r in recording_qc(df, rate).collect()}
    assert [got[c].is_bad_variance for c in range(5)] == \
        [False, True, True, False, False]
    assert [got[c].is_line_noisy for c in range(5)] == \
        [False, False, False, True, False]
    assert [got[c].is_bad for c in range(5)] == \
        [False, True, True, True, False]
    assert got[3].line_snr > 3.0 and 0.3 < got[0].line_snr < 3.0
