"""Multitaper PSD (operators/multitaper.py): DPSS taper family
properties, the variance-recovery normalization contract, spectral
concentration, and the variance reduction that justifies the estimator."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.multitaper import dpss_tapers, multitaper_psd

RATE = 1000.0


def _df(spark, x):
    n = len(x)
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.zeros(n, dtype=np.int32),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))


def test_dpss_family_properties():
    n, nw = 256, 4.0
    t = dpss_tapers(n, nw)
    assert t.shape == (7, n)
    # orthonormal rows
    np.testing.assert_allclose(t @ t.T, np.eye(7), atol=1e-10)
    # each taper is a true eigenvector of the Slepian tridiagonal matrix
    w = nw / n
    tt = np.arange(n, dtype=np.float64)
    m = np.diag(((n - 1 - 2 * tt) / 2.0) ** 2 * np.cos(2 * np.pi * w))
    off = tt[1:] * (n - tt[1:]) / 2.0
    m += np.diag(off, 1) + np.diag(off, -1)
    for v in t:
        av = m @ v
        lam = v @ av
        assert np.linalg.norm(av - lam * v) < 1e-8 * abs(lam)
    # spectral concentration: >99% of taper 0's energy within |f| <= W
    spec = np.abs(np.fft.fft(t[0], 8 * n)) ** 2
    freqs = np.fft.fftfreq(8 * n)
    inside = spec[np.abs(freqs) <= w].sum() / spec.sum()
    assert inside > 0.99
    with pytest.raises(ValueError, match="frame_len"):
        dpss_tapers(10000)
    with pytest.raises(ValueError, match="2\\*nw"):
        dpss_tapers(16, nw=9.0)


def test_multitaper_variance_recovery_and_tone(spark):
    rng = np.random.default_rng(3)
    n, L = 16384, 512
    x = rng.uniform(-1, 1, n)        # variance 1/3
    psd = multitaper_psd(_df(spark, x), RATE, L).toPandas()
    assert len(psd) == L // 2 + 1
    assert set(psd.n_frames) == {n // L}
    assert set(psd.n_tapers) == {7}
    integral = psd.psd.sum() * RATE / L
    assert integral == pytest.approx(1 / 3, rel=0.1)
    # a pure tone's power concentrates within +-nw bins of its frequency
    f0 = 125.0
    tone = np.sqrt(2.0) * np.sin(2 * np.pi * f0 * np.arange(n) / RATE)
    p2 = multitaper_psd(_df(spark, tone), RATE, L, nw=4.0).toPandas()
    b0 = int(f0 * L / RATE)
    near = p2[(p2["bin"] - b0).abs() <= 4].psd.sum()
    assert near / p2.psd.sum() > 0.95
    # ... and the tone's total power (variance 1) is recovered too
    assert p2.psd.sum() * RATE / L == pytest.approx(1.0, rel=0.05)


def test_multitaper_beats_single_taper_variance(spark):
    """The estimator's reason to exist: across bins of a white-noise
    PSD from the SAME frames, the K-taper estimate has ~K-fold less
    relative variance than the single-taper (Welch per-frame) one."""
    rng = np.random.default_rng(11)
    n, L = 8192, 256
    x = rng.standard_normal(n)
    mt = multitaper_psd(_df(spark, x), RATE, L, nw=4.0).toPandas()
    st = multitaper_psd(_df(spark, x), RATE, L, nw=4.0, k=1).toPandas()
    interior = lambda d: d[(d["bin"] > 2) & (d["bin"] < L // 2 - 2)].psd
    rv_mt = interior(mt).std() / interior(mt).mean()
    rv_st = interior(st).std() / interior(st).mean()
    assert rv_mt < rv_st / 1.8      # ~sqrt(7) expected, demand >1.8x


def test_multitaper_matches_numpy_replay(spark):
    """Exact per-bin agreement with a direct NumPy evaluation of the
    same estimator (frames, tapers, fold, scaling)."""
    from process_nwb_spark.operators.stft import _fold_onesided

    rng = np.random.default_rng(7)
    n, L = 2048, 256
    x = rng.standard_normal(n)
    got = (multitaper_psd(_df(spark, x), RATE, L).toPandas()
           .sort_values("bin").psd.to_numpy())
    tapers = dpss_tapers(L, 4.0)
    frames = x[:(n // L) * L].reshape(-1, L)
    acc = np.zeros(L // 2 + 1)
    for fr in frames:
        two = (np.abs(np.fft.rfft(tapers * fr[None, :], axis=1)) ** 2
               ).mean(axis=0)
        acc += _fold_onesided(two, L)
    want = acc / len(frames) / RATE
    np.testing.assert_allclose(got, want, rtol=1e-12)
