"""Kernel unit tests with the reference's analytic invariants
(mirrors /root/reference/tests/, SURVEY.md §5)."""
import numpy as np
import pytest

from process_nwb_spark.dsp import (apply_linenoise_notch, band_params, car,
                                   chang_sds, const_q_sds, gaussian_kernel,
                                   hamming_kernel, next_fast_len, pad_plan,
                                   resample, smart_pad, subtract_car, trim,
                                   wavelet_transform)


def _smooth11(x):
    for p in (2, 3, 5, 7, 11):
        while x % p == 0:
            x //= p
    return x == 1


def test_next_fast_len_minimal():
    rng = np.random.default_rng(0)
    for n in [1, 2, 7, 13, 97, 1000, 1001, 5077, 123456,
              *rng.integers(2, 10**6, 50)]:
        got = next_fast_len(int(n))
        assert got >= n and _smooth11(got)
        assert not any(_smooth11(m) for m in range(int(n), got))


def test_pad_plan_modes():
    npads, to_removes, new_len = pad_plan(1000, "fast")
    assert npads.sum() == next_fast_len(1000) - 1000
    npads, _, _ = pad_plan(1000, 10)
    assert (npads == [10, 10]).all()
    with pytest.raises(ValueError):
        pad_plan(1000, "bogus")
    with pytest.raises(ValueError):
        pad_plan(1000, 1.5)
    # ratio-scaled trim: final length == round(ratio * n_time)
    for n, ratio in [(999, 0.5275), (1001, 2.0), (5077, 0.262)]:
        npads, to_removes, new_len = pad_plan(n, "fast", ratio)
        assert new_len - to_removes.sum() == int(round(ratio * n))


def test_smart_pad_reflect_limited():
    X = np.array([[1.0], [2.0], [4.0]])
    out = smart_pad(X, np.array([2, 2]))
    # left: 2*1 - [4, 2] = [-2, 0]; right: 2*4 - [2, 1] = [6, 7]
    np.testing.assert_array_equal(out[:, 0], [-2, 0, 1, 2, 4, 6, 7])
    big = smart_pad(X, np.array([5, 5]))
    assert big.shape[0] == 13 and big[0, 0] == 0.0  # zero-fill beyond length


def test_trim():
    X = np.arange(10.0)[:, None]
    np.testing.assert_array_equal(trim(X, np.array([2, 3]))[:, 0],
                                  [2, 3, 4, 5, 6])
    np.testing.assert_array_equal(trim(X, np.array([0, 0])), X)


@pytest.mark.parametrize("nch", [2, 32])
@pytest.mark.parametrize("nt", [999, 1000, 1001, 5077])
@pytest.mark.parametrize("ratio", [0.5, 1.0, 1.5, 2.0])
def test_resample_ones(nch, nt, ratio):
    """Constant signal stays ~1 through resampling (test_resample.py:22-29)."""
    y = resample(np.ones((nt, nch)), ratio * 200.0, 200.0)
    assert y.shape == (int(np.ceil(nt * ratio)), nch)
    assert np.allclose(y, 1, atol=1e-3)


def test_resample_3d_shape():
    y = resample(np.ones((2000, 32, 2)), 100.0, 200.0)
    assert y.shape == (1000, 32, 2)


def test_resample_low_freqs_preserved():
    """Low-frequency content survives (test_resample.py:32-56)."""
    rate, new_rate = 400.0, 211.0
    t = np.arange(int(40 * rate)) / rate
    rng = np.random.default_rng(0)
    phases = rng.uniform(size=(20, 5))
    freqs = np.linspace(1, 5.33, 20)
    X = sum(np.sin(2 * np.pi * f * t[:, None] + 2 * np.pi * p)
            for f, p in zip(freqs, phases))
    Xds = resample(X, new_rate, rate, precision="double")
    t2 = np.arange(Xds.shape[0]) / new_rate
    X2 = sum(np.sin(2 * np.pi * f * t2[:, None] + 2 * np.pi * p)
             for f, p in zip(freqs, phases))
    sl = slice(int(new_rate), -int(new_rate))
    a, b = Xds[sl], X2[sl]
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
    assert abs(a.mean() - b.mean()) < 1e-2
    assert abs(a.std() - b.std()) / b.std() < 1e-2


def test_notch_attenuates_harmonics():
    """60k Hz lines attenuated >100x; +2 Hz offset passes
    (test_linenoise_notch.py:15-44)."""
    rate = 400.0
    t = np.arange(int(52 * rate)) / rate
    sl = slice(int(rate), -int(rate))
    X = np.stack([np.sin(2 * np.pi * hz * t)
                  for hz in np.arange(60, rate / 2, 60)], axis=1).sum(
        axis=1, keepdims=True) * np.ones((1, 5))
    Xp = apply_linenoise_notch(X, rate, precision="double")
    assert Xp.shape == X.shape
    assert np.linalg.norm(X[sl]) / np.linalg.norm(Xp[sl]) > 100
    X2 = np.stack([np.sin(2 * np.pi * (hz + 2) * t)
                   for hz in np.arange(60, rate / 2 - 2, 60)], axis=1).sum(
        axis=1, keepdims=True) * np.ones((1, 5))
    X2p = apply_linenoise_notch(X2, rate, precision="double")
    assert np.abs(X2p[sl] - X2[sl]).max() < 0.1


def test_notch_identity_below_nyquist():
    X = np.random.default_rng(0).standard_normal((500, 3))
    out = apply_linenoise_notch(X, 100.0)  # nyquist 50 < 60
    np.testing.assert_array_equal(out, X.astype(np.float32))


def test_car_trimmed_outliers():
    """Trimmed CAR ignores injected outliers; exact values from
    test_common_average_referencing.py."""
    X = np.tile(np.arange(100.0)[None], (3, 1))
    np.testing.assert_allclose(car(X, mean_frac=1.0), 49.5)
    X[:, 0] = -100
    X[:, -1] = 111
    np.testing.assert_allclose(car(X), 49.5)
    np.testing.assert_allclose(subtract_car(X).mean(axis=1), -0.88)
    Xs = subtract_car(np.tile(np.arange(100.0)[None], (3, 1)), mean_frac=1.0)
    np.testing.assert_allclose(Xs.mean(axis=1), 0)


def test_car_nan_skipping():
    X = np.tile(np.arange(10.0)[None], (4, 1))
    X[0, 3] = np.nan
    out = car(X, mean_frac=1.0, precision="double")
    assert np.isclose(out[0, 0], np.nanmean(X[0]))


def test_car_guard():
    with pytest.raises(ValueError):
        car(np.ones((3, 4)), mean_frac=0.1)


@pytest.mark.parametrize("filters,hg,want", [("rat", False, 54), ("rat", True, 6),
                                             ("human", False, 40), ("human", True, 8),
                                             ("changlab", True, 8)])
def test_band_counts(filters, hg, want):
    cfs, sds = band_params(filters, hg)
    assert len(cfs) == len(sds) == want


def test_sds_formulas():
    cfs = np.array([8.0, 80.0, 800.0])
    np.testing.assert_allclose(const_q_sds(cfs), cfs / 8)
    np.testing.assert_allclose(
        chang_sds(cfs), 10 ** (np.log10(0.39) + 0.5 * np.log10(cfs)) * np.sqrt(2))


def test_kernels_normalized_nonnegative():
    g = gaussian_kernel(1000, 400.0, 100.0, 10.0, "double")
    h = hamming_kernel(1000, 400.0, 70.0, 150.0, "double")
    for k in (g, h):
        assert np.isclose(np.linalg.norm(k), 1.0)
        assert (k >= 0).all()


def test_wavelet_shapes_dtypes():
    X = np.random.default_rng(0).standard_normal((1000, 4))
    for prec, want in [("single", np.complex64), ("double", np.complex128)]:
        Xh, _, cfs, sds = wavelet_transform(X, 400.0, "rat", True, precision=prec)
        assert Xh.shape == (1000, 4, 6)
        assert Xh.dtype == want


def test_wavelet_nyquist_guard():
    X = np.ones((500, 2))
    with pytest.raises(ValueError):
        wavelet_transform(X, 100.0, "rat", True)
    with pytest.raises(ValueError):
        wavelet_transform(X, 250.0, "human", True)  # max cf 200 -> needs 400


def test_wavelet_isolates_carrier():
    """A 100 Hz carrier shows up in the band whose cf is nearest 100 Hz."""
    rate = 1000.0
    t = np.arange(int(4 * rate)) / rate
    X = np.sin(2 * np.pi * 100.0 * t)[:, None]
    Xh, _, cfs, _ = wavelet_transform(X, rate, "rat", True, precision="double")
    amp = np.abs(Xh[:, 0, :])[int(rate):-int(rate)]
    best = np.argmax(amp.mean(axis=0))
    assert abs(cfs[best] - 100.0) == np.min(np.abs(cfs - 100.0))
