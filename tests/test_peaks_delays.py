"""Differential tests for the round-7 signal additions: detect_peaks
(operators/peaks.py), estimate_delays (operators/xcorr.py),
phase_phase_coupling (operators/pac.py), envelope_correlation
(operators/coherence.py) — each against direct NumPy evaluation of the
same estimator on the same arrays."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.coherence import envelope_correlation
from process_nwb_spark.operators.pac import phase_phase_coupling
from process_nwb_spark.operators.peaks import detect_peaks
from process_nwb_spark.operators.xcorr import estimate_delays


def _long_df(spark, X):
    n_t, n_ch = X.shape
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel(),
    }))


def _np_peaks(x, thr, min_sep):
    """The operator's contract replayed imperatively: stencil candidates,
    chain sub-min_sep gaps into islands, keep the island argmax."""
    cand = [i for i in range(1, len(x) - 1)
            if x[i] >= thr and x[i] > x[i - 1] and x[i] >= x[i + 1]]
    out = []
    cur = []
    for i in cand:
        if cur and i - cur[-1] < min_sep:
            cur.append(i)
        else:
            if cur:
                out.append(cur)
            cur = [i]
    if cur:
        out.append(cur)
    return [(max(g, key=lambda i: (x[i], -i)), len(g)) for g in out]


def test_detect_peaks_matches_numpy(spark):
    rng = np.random.default_rng(2)
    x = rng.random(1200) * 0.3
    for p, amp in [(100, 1.0), (104, 0.9), (400, 1.2), (401, 0.95),
                   (700, 2.0), (760, 1.5), (1100, 0.85)]:
        x[p] += amp
    X = x[:, None]
    got = {r.sample_idx: (r.peak_value, r.island_size)
           for r in detect_peaks(_long_df(spark, X), threshold=0.8,
                                 min_separation=50).collect()}
    want = _np_peaks(x, 0.8, 50)
    assert sorted(got) == sorted(i for i, _ in want)
    for i, size in want:
        assert got[i][0] == pytest.approx(x[i])
        assert got[i][1] == size
    # reported peaks honor the separation invariant
    idx = sorted(got)
    assert all(b - a >= 50 for a, b in zip(idx, idx[1:]))


def test_detect_peaks_guards_and_nan(spark):
    X = np.zeros((50, 1))
    X[10, 0] = np.nan
    X[25, 0] = 2.0
    out = detect_peaks(_long_df(spark, X), threshold=1.0).collect()
    assert [(r.sample_idx, r.peak_value) for r in out] == [(25, 2.0)]
    with pytest.raises(ValueError, match="min_separation"):
        detect_peaks(_long_df(spark, X), threshold=1.0, min_separation=0)


def test_estimate_delays_recovers_planted_shift(spark):
    rng = np.random.default_rng(4)
    base = rng.standard_normal(3000)
    X = np.stack([base,
                  np.roll(base, 7),      # ch1 lags ch0 by 7
                  rng.standard_normal(3000)], axis=1)
    out = {(r.ch_a, r.ch_b): (r.best_lag, r.r)
           for r in estimate_delays(_long_df(spark, X), max_lag=10).collect()}
    # b[t] = a[t-7] -> corr(a[t], b[t+lag]) peaks at lag=+7
    lag01, r01 = out[(0, 1)]
    assert lag01 == 7 and r01 > 0.99
    # the min_abs_r floor drops noise pairs
    floored = estimate_delays(_long_df(spark, X), max_lag=10,
                              min_abs_r=0.5).collect()
    assert {(r.ch_a, r.ch_b) for r in floored} == {(0, 1)}


def test_phase_phase_coupling_analytic_limits(spark):
    n = 4000
    idx = np.arange(n)
    ps = 2 * np.pi * ((idx % 80) / 80.0) - np.pi
    locked = 2 * np.pi * (((idx * 4) % 80) / 80.0) + 0.7 - np.pi
    free = 2 * np.pi * (((idx * 13) % 97) / 97.0) - np.pi
    base = pd.DataFrame({"series_id": "s0",
                         "channel": np.repeat([0, 1], n).astype(np.int32),
                         "sample_idx": np.tile(idx, 2)})
    slow = spark.createDataFrame(base.assign(phase=np.tile(ps, 2)))
    fast = spark.createDataFrame(
        base.assign(phase=np.concatenate([locked, free])))
    out = {r.channel: r.r_nm
           for r in phase_phase_coupling(slow, fast, n=4, m=1).collect()}
    # ch0: 4*ps - locked == pi - 0.7 everywhere -> R exactly 1
    assert out[0] == pytest.approx(1.0, abs=1e-12)
    d = 4 * ps - free
    want = abs(np.mean(np.cos(d)) + 1j * np.mean(np.sin(d)))
    assert out[1] == pytest.approx(want, abs=1e-9)
    assert out[1] < 0.05
    with pytest.raises(ValueError, match="n, m >= 1"):
        phase_phase_coupling(slow, fast, n=0, m=1)


def test_envelope_correlation_shared_vs_free_envelope(spark):
    fs, n = 1000.0, 8192
    t = np.arange(n) / fs
    env = 1 + 0.8 * np.sin(2 * np.pi * 1.5 * t)
    env2 = 1 + 0.8 * np.sin(2 * np.pi * 2.3 * t + 1.0)
    X = np.stack([env * np.sin(2 * np.pi * 80 * t),
                  env * np.sin(2 * np.pi * 120 * t),
                  env2 * np.sin(2 * np.pi * 100 * t)], axis=1)
    out = {(r.ch_a, r.ch_b): r.aec
           for r in envelope_correlation(_long_df(spark, X), fs, 256,
                                         60.0, 140.0).collect()}
    assert out[(0, 1)] > 0.95          # shared envelope, unrelated carriers
    assert abs(out[(0, 2)]) < 0.4 and abs(out[(1, 2)]) < 0.4
    # NumPy replay of the (0,1) band-energy correlation
    L = 256
    from process_nwb_spark.operators.stft import _window
    w = _window("hann", L)
    bins = np.fft.rfftfreq(L, 1 / fs)
    sel = (bins >= 60.0) & (bins < 140.0)

    def band_env(x):
        frames = x[: (n // L) * L].reshape(-1, L) * w
        P = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        # one-sided fold: interior bins double
        P[:, 1:-1 if L % 2 == 0 else None] *= 2
        return np.log(P[:, sel].sum(axis=1) + 1e-300)

    ea, eb = band_env(X[:, 0]), band_env(X[:, 1])
    want = np.corrcoef(ea, eb)[0, 1]
    assert out[(0, 1)] == pytest.approx(want, abs=1e-6)
    with pytest.raises(ValueError, match="lo_hz < hi_hz"):
        envelope_correlation(_long_df(spark, X), fs, 256, 100.0, 50.0)


def _np_granger_ratio(x_src, y_dst):
    """Closed-form lag-1 OLS variance ratio, replayed with lstsq."""
    y, y1, x1 = y_dst[1:], y_dst[:-1], x_src[:-1]
    A_r = np.stack([y1, np.ones_like(y1)], axis=1)
    A_f = np.stack([y1, x1, np.ones_like(y1)], axis=1)
    rss = lambda A: np.sum(  # noqa: E731
        (y - A @ np.linalg.lstsq(A, y, rcond=None)[0]) ** 2)
    return rss(A_r) / rss(A_f)


def test_granger_pairwise_matches_lstsq_and_finds_direction(spark):
    from process_nwb_spark.operators.granger import granger_pairwise

    rng = np.random.default_rng(9)
    x = rng.standard_normal(1500)
    e = rng.standard_normal(1500)
    y = np.empty(1500)
    y[0] = 0.0
    y[1:] = 0.8 * x[:-1] + 0.3 * e[1:]
    X = np.stack([x, y], axis=1)
    out = {(r.ch_src, r.ch_dst): r.var_ratio
           for r in granger_pairwise(_long_df(spark, X)).collect()}
    assert out[(0, 1)] == pytest.approx(_np_granger_ratio(x, y), rel=1e-9)
    assert out[(1, 0)] == pytest.approx(_np_granger_ratio(y, x), rel=1e-9)
    assert out[(0, 1)] > 5.0 and out[(1, 0)] < 1.1


def test_granger_exact_scale_is_partition_stable(spark):
    from process_nwb_spark.operators.granger import granger_pairwise

    rng = np.random.default_rng(10)
    X = np.round(rng.standard_normal((800, 2)) * 0.4, 6)
    X[1:, 1] = np.round(0.7 * X[:-1, 0] + 0.2 * X[1:, 1], 6)
    base = _long_df(spark, X)
    outs = []
    for nparts in (1, 7, 32):
        outs.append({(r.ch_src, r.ch_dst): r.var_ratio
                     for r in granger_pairwise(
                         base.repartition(nparts),
                         exact_scale=1_000_000).collect()})
    for other in outs[1:]:
        for k, v in outs[0].items():
            assert other[k].hex() == v.hex()
    # and the exact path agrees with the float path numerically
    flt = {(r.ch_src, r.ch_dst): r.var_ratio
           for r in granger_pairwise(base).collect()}
    for k, v in outs[0].items():
        assert v == pytest.approx(flt[k], rel=1e-9)
