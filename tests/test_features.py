"""Per-channel feature extraction (operators/features.py) vs NumPy
replays and analytic limits."""
import numpy as np
import pandas as pd
import pytest

from process_nwb_spark.operators.features import (hjorth_parameters,
                                                  spectral_edge,
                                                  spectral_entropy)

RATE = 1000.0


def _df(spark, X):
    n_t, n_ch = X.shape
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel()}))


def test_hjorth_matches_numpy_and_theory(spark):
    rng = np.random.default_rng(23)
    n = 8192
    t = np.arange(n) / RATE
    X = np.stack([rng.standard_normal(n),
                  np.sin(2 * np.pi * 50.0 * t),
                  np.full(n, 3.14)], axis=1)     # flat channel
    got = {r.channel: r for r in hjorth_parameters(_df(spark, X)).collect()}
    for c in (0, 1):
        x = X[:, c]
        d1, d2 = np.diff(x), np.diff(x, 2)
        act, v1, v2 = x.var(), d1.var(), d2.var()
        assert got[c].activity == pytest.approx(act, rel=1e-9)
        assert got[c].mobility == pytest.approx(np.sqrt(v1 / act),
                                                rel=1e-9)
        assert got[c].complexity == pytest.approx(
            np.sqrt(v2 / v1) / np.sqrt(v1 / act), rel=1e-9)
    # theory: white noise mobility -> sqrt(2); tone -> 2 sin(pi f / fs)
    assert got[0].mobility == pytest.approx(np.sqrt(2), rel=0.05)
    assert got[1].mobility == pytest.approx(
        2 * np.sin(np.pi * 50.0 / RATE), rel=1e-3)
    # flat channel: zero variance -> NULL mobility/complexity, no error
    assert got[2].activity == pytest.approx(0.0, abs=1e-18)
    assert got[2].mobility is None and got[2].complexity is None


def test_spectral_entropy_limits_and_replay(spark):
    rng = np.random.default_rng(29)
    n = 16384
    t = np.arange(n) / RATE
    X = np.stack([rng.standard_normal(n),
                  np.sin(2 * np.pi * 123.0 * t)], axis=1)
    got = {r.channel: r.entropy
           for r in spectral_entropy(_df(spark, X), RATE, 512).collect()}
    assert got[0] > 0.9 and got[1] < 0.3
    # un-normalized replay against the op's own PSD
    from process_nwb_spark.operators.stft import welch_psd
    psd = (welch_psd(_df(spark, X[:, :1]), RATE, 512).toPandas()
           .sort_values("bin").psd.to_numpy())
    p = psd / psd.sum()
    want = float(-(p[p > 0] * np.log(p[p > 0])).sum() / np.log(len(p)))
    assert got[0] == pytest.approx(want, rel=1e-9)


def test_spectral_edge_fraction_sweep(spark):
    rng = np.random.default_rng(31)
    x = rng.standard_normal((16384, 1))
    # white noise: SEF_q ~ q * nyquist for any q
    for q in (0.5, 0.75, 0.95):
        sef = spectral_edge(_df(spark, x), RATE, 512,
                            fraction=q).collect()[0].sef_hz
        assert sef == pytest.approx(q * RATE / 2, rel=0.06)
    with pytest.raises(ValueError, match="fraction"):
        spectral_edge(_df(spark, x), RATE, 512, fraction=0.0)


def _np_welch(x, rate, L):
    """NumPy Welch replay matching operators/stft.py: hann window, 50%
    hop, full frames, one-sided, normalized by fs * sum(w^2)."""
    w = np.hanning(L)  # stft._window("hann", L)
    H = L // 2
    frames = [x[s:s + L] for s in range(0, len(x) - L + 1, H)]
    u = rate * np.sum(w ** 2)
    p = np.zeros(L // 2 + 1)
    for fr in frames:
        sp = np.abs(np.fft.rfft(fr * w)) ** 2
        sp[1:-1] *= 2.0
        p += sp
    return p / (len(frames) * u)


def test_aperiodic_fit_matches_numpy_ols(spark):
    from process_nwb_spark.operators.features import aperiodic_fit

    L, n = 512, 16384
    ks = sorted(set(int(round(k))
                    for k in np.logspace(np.log10(8), np.log10(200), 14)))
    t = np.arange(n) / RATE
    x = np.zeros(n)
    for j, k in enumerate(ks):
        f = k * RATE / L
        a = f ** -1.0 * (6.0 if k == 156 else 1.0)
        x += a * np.sin(2 * np.pi * f * t + j)
    got = aperiodic_fit(_df(spark, x[:, None]), RATE, L,
                        fmin=10.0, fmax=420.0, bins=ks).collect()[0]

    psd = _np_welch(x, RATE, L)
    lf = np.log10(np.array(ks) * RATE / L)
    lp = np.log10(psd[np.array(ks)])
    A = np.vstack([lf, np.ones_like(lf)]).T
    slope, intercept = np.linalg.lstsq(A, lp, rcond=None)[0]
    assert got.slope == pytest.approx(slope, rel=1e-6)
    assert got.intercept == pytest.approx(intercept, rel=1e-6)
    # robust refit drops exactly the boosted 156 bin, recovering -2
    res = lp - (intercept + slope * lf)
    keep = np.abs(res) <= 2.0 * res.std()
    s2, _ = np.linalg.lstsq(A[keep], lp[keep], rcond=None)[0]
    assert got.n_excluded == int((~keep).sum()) == 1
    assert got.slope_robust == pytest.approx(s2, rel=1e-6)
    assert got.slope_robust == pytest.approx(-2.0, abs=0.01)


def test_aperiodic_fit_validates_band(spark):
    from process_nwb_spark.operators.features import aperiodic_fit

    with pytest.raises(ValueError, match="fmin"):
        aperiodic_fit(_df(spark, np.zeros((64, 1))), RATE, 32,
                      fmin=50.0, fmax=10.0)
