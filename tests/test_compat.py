"""Compat layer: the reference's module layout / signatures over this
engine's kernels (process_nwb_spark/compat/)."""
import numpy as np
import pytest

from process_nwb_spark.compat import preprocess_block, store_linenoise_notch_CAR
from process_nwb_spark.compat.common_referencing import (CAR, subtract_CAR,
                                                         store_subtract_CAR)
from process_nwb_spark.compat.linenoise_notch import apply_linenoise_notch
from process_nwb_spark.compat.resample import (resample, resample_func,
                                               store_resample)
from process_nwb_spark.compat.utils import (chang_sds, const_Q_sds, dtype,
                                            generate_nwbfile,
                                            generate_synthetic_data,
                                            log_spaced_cfs)
from process_nwb_spark.compat.wavelet_transform import (gaussian,
                                                        get_filterbank,
                                                        hamming,
                                                        store_wavelet_transform,
                                                        wavelet_transform)
from process_nwb_spark.dsp import kernels as K

RATE = 1000.0


@pytest.fixture(scope="module")
def X():
    return generate_synthetic_data(1.0, 4, RATE, seed=7)


def test_resample_matches_engine_and_honors_axis(X):
    a = resample(X, 500.0, RATE, precision="double")
    b = K.resample(X, 500.0, RATE, precision="double")
    assert np.array_equal(a, b)
    # axis=1: transpose in, transpose out — identical values
    c = resample(X.T, 500.0, RATE, axis=1, precision="double")
    assert np.array_equal(c, b.T)
    # loop param accepted (memory knob in the reference, identity here)
    assert np.array_equal(resample(X, 500.0, RATE, loop=False,
                                   precision="double"), b)


def test_resample_func_fixed_num(X):
    out = resample_func(X, 320, precision="double")
    assert out.shape == (320, X.shape[1])


def test_car_shapes_and_subtract(X):
    avg = CAR(X, precision="double")
    assert avg.shape == (X.shape[0], 1)
    got = subtract_CAR(X, precision="double")
    assert np.allclose(got, X - avg)


def test_notch_delegates_and_gates_non_fft(X):
    a = apply_linenoise_notch(X, RATE, precision="double")
    b = K.apply_linenoise_notch(X, RATE, precision="double")
    assert np.array_equal(a, b)
    with pytest.raises(NotImplementedError, match="last-notch-wins"):
        apply_linenoise_notch(X, RATE, fft=False)


def test_wavelet_surface(X):
    Xh, X_fft_h, cfs, sds = wavelet_transform(X, RATE, filters="rat",
                                              hg_only=True,
                                              precision="double")
    assert Xh.shape == (X.shape[0], X.shape[1], len(cfs))
    # X_fft_h reuse contract (the reference's per-channel cache)
    Xh2, _, _, _ = wavelet_transform(X, RATE, X_fft_h=X_fft_h,
                                     to_removes=np.zeros(2, dtype=int),
                                     precision="double")
    kernels, cfs2, sds2 = get_filterbank("rat", 256, RATE, hg_only=True)
    assert len(kernels) == len(cfs2) == len(sds2) == 6
    g = gaussian(256, RATE, 100.0, 10.0)
    h = hamming(256, RATE, 70.0, 150.0)
    assert g.shape == h.shape == (256,)
    assert np.isclose(np.linalg.norm(g), 1.0)


def test_utils_surface(X):
    assert dtype(X, "single") == np.float32
    assert dtype(X.astype(complex), "single") == np.complex64
    with pytest.raises(ValueError):
        dtype(X, "triple")
    cfs = log_spaced_cfs(4.07, 110.0, 40)
    assert len(cfs) == 40
    assert len(const_Q_sds(cfs)) == len(chang_sds(cfs)) == 40


@pytest.mark.parametrize("fn,args", [
    (store_resample, (None, None, 500.0)),
    (store_subtract_CAR, (None, None)),
    (store_wavelet_transform, (None, None)),
    (store_linenoise_notch_CAR, (None, None)),
    (preprocess_block, ("/tmp/x.nwb",)),
    (generate_nwbfile, ()),
])
def test_nwb_entry_points_env_gated(fn, args):
    """Every NWB-object API raises the documented gate naming its
    Spark-native equivalent (pynwb is absent in this environment)."""
    with pytest.raises(NotImplementedError) as e:
        fn(*args)
    msg = str(e.value)
    assert "pynwb" in msg and ("operators" in msg or "pipelines" in msg
                               or "synth" in msg)
