"""detect_bursts (operators/bursts.py) vs a direct NumPy island replay."""
import numpy as np
import pandas as pd
import pytest

from process_nwb_spark.operators.bursts import detect_bursts


def _df(spark, x):
    n = len(x)
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.zeros(n, dtype=np.int32),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))


def _np_islands(x, thr, min_dur):
    out, i, n = [], 0, len(x)
    while i < n:
        if x[i] >= thr:
            j = i
            while j < n and x[j] >= thr:
                j += 1
            if j - i >= min_dur:
                seg = x[i:j]
                out.append((i, j - 1, j - i, seg.max(),
                            float((seg - thr).sum())))
            i = j
        else:
            i += 1
    return out


def test_bursts_match_numpy_islands(spark):
    rng = np.random.default_rng(13)
    x = rng.standard_normal(2000) * 0.4
    x[100:140] += 2.5
    x[500:503] += 3.0          # 3-long: passes min_dur=3 exactly
    x[900:901] += 5.0          # 1-long spike: rejected
    got = sorted((r.start_idx, r.end_idx, r.duration, r.peak, r.area)
                 for r in detect_bursts(_df(spark, x), 1.0,
                                        min_duration=3).collect())
    want = _np_islands(x, 1.0, 3)
    assert len(got) == len(want)
    for g, w in zip(got, sorted(want)):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], abs=1e-12)
        assert g[4] == pytest.approx(w[4], abs=1e-9)


def test_bursts_threshold_touch_and_guard(spark):
    x = np.zeros(50)
    x[10:13] = 1.0             # exactly at threshold: inclusive
    out = detect_bursts(_df(spark, x), 1.0, min_duration=3).collect()
    assert len(out) == 1 and out[0].duration == 3 and out[0].area == 0.0
    with pytest.raises(ValueError, match="min_duration"):
        detect_bursts(_df(spark, x), 1.0, min_duration=0)


def test_bursts_gap_splits_island(spark):
    x = np.zeros(30)
    x[5:15] = 2.0
    df = _df(spark, x).filter("sample_idx != 9")   # hole inside the burst
    got = sorted((r.start_idx, r.end_idx)
                 for r in detect_bursts(df, 1.0).collect())
    assert got == [(5, 8), (10, 14)]   # split, never merged


def test_bursts_nan_splits_island_never_poisons(spark):
    """Spark orders NaN above all doubles, so an unguarded threshold
    filter would pull a NaN sample INTO an island and poison its
    peak/area; the guard makes NaN split the island instead — matching
    the NumPy semantics of the streaming twin."""
    x = np.zeros(30)
    x[5:15] = 2.0
    x[9] = np.nan
    got = sorted((r.start_idx, r.end_idx, r.peak)
                 for r in detect_bursts(_df(spark, x), 1.0).collect())
    assert [(s, e) for s, e, _ in got] == [(5, 8), (10, 14)]
    assert all(np.isfinite(p) for _, _, p in got)
