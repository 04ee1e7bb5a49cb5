"""Overlap-segmented kernels (the bounded-memory 100 TB path) vs the
whole-channel dense oracle — the engine's analog of the reference's
chunked == unchunked equivalence test (tests/test_pipeline.py:102-154,
which accepts rtol=0.01 between the two execution strategies)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.dsp import kernels as K
from process_nwb_spark.operators.segmented import (segmented_kernel,
                                                   segmented_notch,
                                                   segmented_resample)
from process_nwb_spark.synth import generate_synthetic_data, to_long_df


@pytest.fixture(scope="module")
def fixture(spark):
    X = generate_synthetic_data(8.0, 3, 2000.0, seed=3)  # 16000 x 3
    return X, to_long_df(spark, X)


def _collect_dense(df, n_ch):
    pdf = df.toPandas().sort_values(["sample_idx", "channel"])
    n_time = pdf["sample_idx"].nunique()
    return pdf["value"].to_numpy().reshape(n_time, n_ch)


def _dense_segmented(X, fn, L, V, r=1.0):
    """Driver-side replay of the exact segmentation strategy (the oracle
    for the distributed mechanics)."""
    n = X.shape[0]
    chans = []
    for c in range(X.shape[1]):
        outs, s = [], 0
        while s * L < n:
            start, end = max(0, s * L - V), min(n, (s + 1) * L + V)
            left_ov, core = s * L - start, min(L, n - s * L)
            out = fn(X[start:end, c])
            k0 = int(round(left_ov * r))
            outs.append(out[k0:k0 + int(np.ceil(core * r))])
            s += 1
        chans.append(np.concatenate(outs))
    return np.stack(chans, axis=1)


def test_segmented_notch_exact_vs_dense_oracle(spark, fixture):
    """Distributed segmentation == identical dense segmentation, bitwise-
    tight: proves the Spark mechanics (assignment, overlap trim, global
    re-indexing) add nothing to the kernel math."""
    X, long_df = fixture
    got = _collect_dense(
        segmented_notch(long_df, 2000.0, seg_len=4096, overlap=1024,
                        precision="double"), 3)
    want = _dense_segmented(
        X, lambda x: K.apply_linenoise_notch(
            x[:, None], 2000.0, precision="double")[:, 0], 4096, 1024)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_segmented_notch_attenuates_line(spark, fixture):
    """Functional equivalence with the whole-channel notch: the 60 Hz line
    is crushed either way. (Numeric equality is not expected — the notch
    dip is built on each segment's frequency grid, so its effective shape
    is length-dependent; the reference accepts the same strategy-dependent
    tolerance between its chunked and unchunked paths.)"""
    X, long_df = fixture
    got = _collect_dense(
        segmented_notch(long_df, 2000.0, seg_len=8192, overlap=2048,
                        precision="double"), 3)
    n = got.shape[0]
    t = np.arange(n) / 2000.0
    probe = np.exp(-2j * np.pi * 60.0 * t)
    for c in range(3):
        before = abs(probe @ X[:n, c]) / n
        after = abs(probe @ got[:, c]) / n
        assert after < 0.1 * before + 1e-6  # >=10x line suppression


def test_segmented_resample_exact_vs_dense_oracle(spark, fixture):
    from process_nwb_spark.operators.segmented import resample_exact

    X, long_df = fixture
    got = _collect_dense(
        segmented_resample(long_df, 1000.0, 2000.0, seg_len=4096,
                           overlap=1024, precision="double"), 3)
    want = _dense_segmented(
        X, lambda x: resample_exact(x, 1000.0, 2000.0, precision="double"),
        4096, 1024, r=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_segmented_resample_close_to_whole(spark, fixture):
    """Strategy equivalence with the whole-channel op: same shape, same
    first/second moments, near-unit cosine similarity (boundary error is
    local; tests/test_resample.py:32-56's spectral-preservation invariant)."""
    X, long_df = fixture
    got = _collect_dense(
        segmented_resample(long_df, 1000.0, 2000.0, seg_len=4096,
                           overlap=1024, precision="double"), 3)
    want = K.resample(X, 1000.0, 2000.0, precision="double")
    assert got.shape == want.shape
    for c in range(3):
        a, b = got[:, c], want[:, c]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.995
        assert abs(a.mean() - b.mean()) < 0.01
        assert abs(a.std() - b.std()) < 0.02 * b.std()


def test_segment_indices_contiguous(spark, fixture):
    _, long_df = fixture
    out = segmented_resample(long_df, 1000.0, 2000.0, seg_len=4096,
                             overlap=512)
    per_ch = (out.groupBy("channel")
              .agg(F.count("*").alias("n"), F.min("sample_idx").alias("lo"),
                   F.max("sample_idx").alias("hi"),
                   F.count_distinct("sample_idx").alias("nd"))
              .collect())
    for r in per_ch:
        assert r.lo == 0 and r.n == r.nd == r.hi + 1  # gapless, no dup


def test_validation_guards():
    with pytest.raises(ValueError):
        segmented_resample(None, 3.0, 7.0, seg_len=100, overlap=10)
    with pytest.raises(ValueError):
        segmented_notch(None, 1000.0, seg_len=100, overlap=100)


def test_bounded_group_size(spark, fixture):
    """No group ever exceeds seg_len + 2*overlap rows — the memory bound."""
    _, long_df = fixture
    L, V = 2048, 256
    i = F.col("sample_idx")
    s0 = F.floor(i / L).cast("bigint")
    segs = F.filter(F.array(s0 - 1, s0, s0 + 1),
                    lambda s: (s >= 0) & (i >= s * L - V) & (i < (s + 1) * L + V))
    counts = (long_df.select("channel", F.explode(segs).alias("seg"))
              .groupBy("channel", "seg").count().agg(F.max("count")).first()[0])
    assert counts <= L + 2 * V


def test_segmented_wavelet_exact_vs_dense_oracle(spark, fixture):
    from process_nwb_spark.operators.segmented import segmented_wavelet_amp

    X, long_df = fixture
    got = (segmented_wavelet_amp(long_df, 2000.0, seg_len=4096, overlap=1024,
                                 precision="double")
           .toPandas().sort_values(["channel", "band", "sample_idx"]))

    def fn(x):
        Xh, _, _, _ = K.wavelet_transform(x[:, None], 2000.0, filters="rat",
                                          hg_only=True, precision="double")
        return np.abs(Xh[:, 0, :])

    n_bands = fn(X[:4096, 0]).shape[1]
    assert set(got.band.unique()) == set(range(n_bands))
    # dense replay of the same segmentation for channel 0, band 0
    def fn_band0(x):
        return fn(x)[:, 0]
    want = _dense_segmented(X[:, [0]], fn_band0, 4096, 1024)[:, 0]
    g0 = got[(got.channel == 0) & (got.band == 0)].amp.to_numpy()
    np.testing.assert_allclose(g0, want, rtol=1e-9, atol=1e-12)


def test_segmented_wavelet_close_to_whole(spark, fixture):
    """Amplitude envelopes from segmented vs whole-channel wavelet agree
    to high cosine similarity (hg bands' support << overlap)."""
    from process_nwb_spark.operators.segmented import segmented_wavelet_amp

    X, long_df = fixture
    got = (segmented_wavelet_amp(long_df, 2000.0, seg_len=8192, overlap=2048,
                                 precision="double")
           .toPandas())
    Xh, _, _, _ = K.wavelet_transform(X, 2000.0, filters="rat", hg_only=True,
                                      precision="double")
    whole = np.abs(Xh)  # (n, ch, band)
    for ch, b in [(0, 0), (1, 3), (2, 5)]:
        a = (got[(got.channel == ch) & (got.band == b)]
             .sort_values("sample_idx").amp.to_numpy())
        w = whole[:, ch, b]
        assert a.shape == w.shape
        cos = float(a @ w / (np.linalg.norm(a) * np.linalg.norm(w)))
        assert cos > 0.99, (ch, b, cos)


def test_resample_exact_no_grid_drift():
    """The parity kernel's pad-rounding (utils.py:131 `round(ratio*len)`)
    sub-sample-stretches the output grid whenever padded_len*ratio is not
    integral — up to ~0.6 samples of drift on the worst-case fixture, i.e.
    tens of percent pointwise on near-Nyquist content. resample_exact must
    hold the exact grid at ANY length, including awkward ones."""
    from process_nwb_spark.operators.segmented import resample_exact

    rate, new = 2000.0, 1000.0
    for n in (10934, 2742, 12288, 123574):   # the lengths that broke
        t = np.arange(n) / rate
        x = np.sin(2 * np.pi * 100.0 * t)
        y = resample_exact(x, new, rate, precision="double")
        assert len(y) == int(np.ceil(n * 0.5))
        want = np.sin(2 * np.pi * 100.0 * np.arange(len(y)) * 2 / rate)
        # interior only: the global edges pay reflect-pad transients.
        # Residual ~7e-4 is finite-window reflect-pad numerics (present at
        # ANY length); the grid drift this test pins produced ~0.5.
        m = slice(64, -64)
        np.testing.assert_allclose(y[m], want[m], atol=5e-3)


def test_resample_exact_2d_and_guards():
    from process_nwb_spark.operators.segmented import resample_exact

    x = np.random.default_rng(0).normal(size=(4096, 3))
    y = resample_exact(x, 1000.0, 2000.0, precision="double")
    assert y.shape == (2048, 3)
    # per-column equals 1-D calls
    for c in range(3):
        np.testing.assert_allclose(y[:, c],
                                   resample_exact(x[:, c], 1000.0, 2000.0,
                                                  precision="double"),
                                   rtol=1e-12, atol=1e-12)
    with pytest.raises(ValueError, match="too short"):
        # den=15625 forces a reflect-extension far beyond 100 samples
        resample_exact(np.ones(100), 3200.0, 12207.03125)


def test_dense_kernel_norms_match_padded_grid():
    """dense_kernel_norms(n) must equal the raw gaussian norms on the
    grid wavelet_transform actually uses for an n-sample input (the
    'fast'-padded one)."""
    from process_nwb_spark.dsp.filterbank import (band_params,
                                                  gaussian_raw_norm)
    from process_nwb_spark.dsp.padding import pad_plan

    n, rate = 16000, 2000.0
    norms = K.dense_kernel_norms(n, rate, filters="rat", hg_only=True)
    npads, _, _ = pad_plan(n, "fast")
    n_pad = n + int(npads.sum())
    cfs, sds = band_params("rat", True)
    want = [gaussian_raw_norm(n_pad, rate, cf, sd)
            for cf, sd in zip(cfs, sds)]
    np.testing.assert_allclose(norms, want, rtol=1e-12)
    # and the norm scales ~sqrt(n): doubling n grows every norm
    norms2 = K.dense_kernel_norms(2 * n, rate, filters="rat",
                                  hg_only=True)
    assert (norms2 > norms * 1.3).all()


def test_segmented_wavelet_dense_convention_interior_exact(spark, fixture):
    """With n_time pinned, the segmented wavelet must match the
    WHOLE-CHANNEL transform to near-machine precision away from the
    global edges — not just cosine-close. (Without n_time each segment
    normalizes on its own grid and amplitudes are ~sqrt(n/segment) off —
    the r5 bug this test pins.)"""
    from process_nwb_spark.operators.segmented import segmented_wavelet_amp

    X, long_df = fixture
    n = X.shape[0]
    got = (segmented_wavelet_amp(long_df, 2000.0, seg_len=4096, overlap=1024,
                                 precision="double", n_time=n)
           .toPandas())
    Xh, _, _, _ = K.wavelet_transform(X, 2000.0, filters="rat", hg_only=True,
                                      precision="double")
    whole = np.abs(Xh)  # (n, ch, band)
    for ch, b in [(0, 0), (1, 3), (2, 5)]:
        a = (got[(got.channel == ch) & (got.band == b)]
             .sort_values("sample_idx").amp.to_numpy())
        w = whole[:, ch, b]
        assert a.shape == w.shape
        m = slice(256, -256)
        # interior boundaries stay in: the residual there is the Hilbert
        # step's 1/t tail beyond the overlap (~1e-4 relative), far below
        # the ~2.24x scale error this test exists to catch
        np.testing.assert_allclose(a[m], w[m], rtol=1e-3,
                                   atol=1e-6 * np.abs(w).max())


def test_snap_overlap_integral_ratio():
    from process_nwb_spark.operators.segmented import snap_overlap

    # 3200/12207.03125 reduces to 4096/15625 -> overlap must be a
    # multiple of 15625
    assert snap_overlap(4096, 3200.0, 12207.03125) == 15625
    assert snap_overlap(15625, 3200.0, 12207.03125) == 15625
    assert snap_overlap(15626, 3200.0, 12207.03125) == 31250
    # already-integral ratios pass through (den | overlap)
    assert snap_overlap(100, 1000.0, 2000.0) == 100
    assert snap_overlap(99, 1000.0, 2000.0) == 100


def test_segmented_resample_worst_case_rates(spark):
    """Regression: at the reference worst-case rates (12207.03125 Hz ->
    3200 Hz) the default overlap made overlap*ratio fractional and every
    interior segment came out sub-sample-shifted (~0.1 abs error on a
    unit tone). With the snapped overlap the interior must match the
    whole-signal resample to FFT-boundary tolerance."""
    rate, new = 12207.03125, 3200.0
    # n chosen so total n*ratio is integral (125000 * 4096/15625 = 32768):
    # the whole-signal resample otherwise ceil-respaces its output grid
    # (resample.py:140 semantics) and no segmentation could match it —
    # that inherent tail-respacing is a property of the reference math,
    # not of the segmentation under test here
    n = 125000                                      # 2 full segments
    t = np.arange(n) / rate
    X = np.sin(2 * np.pi * 150.0 * t)[:, None]      # unit 150 Hz tone
    want = K.resample(X[:, 0], new, rate, precision="double")

    got_df = segmented_resample(to_long_df(spark, X), new, rate,
                                seg_len=62500, precision="double")
    got = _collect_dense(got_df, 1)[:, 0]
    assert len(got) == len(want)
    # interior (segment boundaries padded independently -> small edge
    # error is expected and documented; the old bug was ~0.1 EVERYWHERE
    # in interior segments)
    m = len(got) // 8
    assert np.max(np.abs(got[m:-m] - want[m:-m])) < 5e-3


def test_segmented_rejects_fractional_overlap_ratio(spark, fixture):
    _, df = fixture
    with pytest.raises(ValueError, match="overlap"):
        segmented_kernel(df, lambda x: x, seg_len=62500, overlap=4096,
                         ratio=3200.0 / 12207.03125)


def test_segmented_misaligned_start_raises(spark):
    """A series not starting at sample_idx 0 must fail loudly inside the
    kernel, not silently drop its core samples (the old left_ov<0 path)."""
    X = generate_synthetic_data(2.0, 1, 1000.0, seed=0)
    df = (to_long_df(spark, X)
          .withColumn("sample_idx", F.col("sample_idx") + 5000))
    out = segmented_resample(df, 500.0, 1000.0, seg_len=1024, overlap=128)
    with pytest.raises(Exception, match="segmented kernel"):
        out.collect()
