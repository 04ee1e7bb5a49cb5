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
