"""Synthetic-data generator determinism (mirrors tests/test_utils.py:6-23)."""
import numpy as np

from process_nwb_spark.synth import generate_synthetic_data


def test_shape():
    X = generate_synthetic_data(100, 4, 400)
    assert X.shape == (40000, 4)


def test_seed_determinism():
    a = generate_synthetic_data(1, 4, 400, seed=7)
    b = generate_synthetic_data(1, 4, 400, seed=7)
    c = generate_synthetic_data(1, 4, 400, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_flags_change_output():
    base = generate_synthetic_data(1, 4, 400)
    no_hg = generate_synthetic_data(1, 4, 400, high_gamma=False)
    no_ln = generate_synthetic_data(1, 4, 400, linenoise=False)
    assert not np.allclose(base, no_hg)
    assert not np.allclose(base, no_ln)


def test_linenoise_has_60hz_power():
    rate = 400.0
    X = generate_synthetic_data(10, 2, rate, high_gamma=False, linenoise=True)
    Y = generate_synthetic_data(10, 2, rate, high_gamma=False, linenoise=False)
    f = np.fft.rfftfreq(X.shape[0], 1 / rate)
    i60 = np.argmin(np.abs(f - 60))
    px = np.abs(np.fft.rfft(X[:, 0]))[i60]
    py = np.abs(np.fft.rfft(Y[:, 0]))[i60]
    assert px > 10 * py
