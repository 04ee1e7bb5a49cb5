"""Edge-case sweeps for the trial/burst index math: epoch windows
clipped at both recording edges for many (pre, post, onset) shapes, and
burst islands touching the array boundaries — each case checked against
a direct NumPy slice replay."""
import numpy as np
import pandas as pd
import pytest

from process_nwb_spark.operators.bursts import detect_bursts
from process_nwb_spark.operators.epochs import epoch_trials


def _sig(spark, x):
    n = len(x)
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.zeros(n, dtype=np.int32),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))


def _mk(spark, onsets):
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "trial_id": np.arange(len(onsets), dtype=np.int32),
        "onset_sample": np.asarray(onsets, dtype=np.int64)}))


@pytest.mark.parametrize("pre,post,onsets", [
    (0, 0, [0, 5, 59]),          # single-sample windows at both edges
    (5, 0, [0, 3, 59]),          # pre-only, clipped at start
    (0, 7, [0, 55, 59]),         # post-only, clipped at end
    (10, 10, [0, 59]),           # both edges clipped
    (30, 30, [29]),              # window == whole recording
    (3, 4, [7, 8, 9]),           # overlapping windows
    (59, 59, [0, 59]),           # maximal window, heavy clipping
])
def test_epoch_windows_match_numpy_slices(spark, pre, post, onsets):
    n = 60
    x = np.arange(n, dtype=np.float64) * 1.5   # value == 1.5 * sample_idx
    got = {}
    for r in epoch_trials(_sig(spark, x), _mk(spark, onsets),
                          pre, post).collect():
        got.setdefault(r.trial_id, {})[r.rel_idx] = r.value
    for ti, on in enumerate(onsets):
        want = {rel: x[on + rel] for rel in range(-pre, post + 1)
                if 0 <= on + rel < n}
        assert got.get(ti, {}) == want, (ti, on)


@pytest.mark.parametrize("spans,min_dur", [
    ([(0, 5)], 1),               # island starts at sample 0
    ([(55, 60)], 1),             # island runs to the last sample
    ([(0, 60)], 1),              # the whole recording is one island
    ([(0, 2), (58, 60)], 2),     # both edges at the duration gate
    ([(10, 11)], 2),             # singleton killed by the gate
    ([(5, 10), (10, 15)], 1),    # adjacent spans merge into one island
])
def test_burst_boundaries_match_numpy(spark, spans, min_dur):
    n = 60
    x = np.zeros(n)
    for lo, hi in spans:
        x[lo:hi] = 2.0
    got = sorted((r.start_idx, r.end_idx, r.duration)
                 for r in detect_bursts(_sig(spark, x), 1.0,
                                        min_duration=min_dur).collect())
    # NumPy replay
    want, i = [], 0
    while i < n:
        if x[i] >= 1.0:
            j = i
            while j < n and x[j] >= 1.0:
                j += 1
            if j - i >= min_dur:
                want.append((i, j - 1, j - i))
            i = j
        else:
            i += 1
    assert got == want
