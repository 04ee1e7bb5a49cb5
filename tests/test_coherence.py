"""Cross-spectral coherence (operators/coherence.py): connectivity as
relational algebra over batched-frame spectra."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.coherence import (coherence_matrix,
                                                   stft_complex)
from process_nwb_spark.synth import to_long_df

RATE = 1000.0


def test_self_coherence_is_one(spark):
    """coh(x, x) == 1 identically (the estimator's exact invariant)."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(4096, 2))
    c = coherence_matrix(to_long_df(spark, X), RATE, frame_len=256,
                         include_self=True).toPandas()
    own = c[c.ch_a == c.ch_b]
    assert len(own) > 0
    np.testing.assert_allclose(own.coherence.to_numpy(), 1.0, rtol=1e-12)


def test_independent_noise_low_coherence(spark):
    """Independent channels: expected coherence ~ 1/n_frames; assert it
    stays well below any 'connected' reading."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(16384, 2))
    c = coherence_matrix(to_long_df(spark, X), RATE,
                         frame_len=256).toPandas()
    pair = c[(c.ch_a == 0) & (c.ch_b == 1)]
    n_frames = pair.n_frames.iloc[0]
    assert pair.coherence.mean() < 3.0 / n_frames
    assert pair.coherence.max() < 0.2


def test_shared_tone_lights_its_bin_only(spark):
    """A common 125 Hz tone buried in independent noise: coherence ~1 at
    bin 32 (125 Hz at frame 256 / rate 1000), low elsewhere."""
    rng = np.random.default_rng(2)
    n = 16384
    t = np.arange(n) / RATE
    tone = np.sin(2 * np.pi * 125.0 * t)
    X = np.stack([tone + 0.5 * rng.normal(size=n),
                  tone + 0.5 * rng.normal(size=n)], axis=1)
    c = coherence_matrix(to_long_df(spark, X), RATE,
                         frame_len=256).toPandas()
    pair = c[(c.ch_a == 0) & (c.ch_b == 1)].set_index("bin")
    assert pair.loc[32, "coherence"] > 0.95
    off = pair.drop(index=[31, 32, 33]).coherence
    assert off.max() < 0.5
    assert pair.loc[32, "freq_hz"] == pytest.approx(125.0)


def test_stft_complex_matches_power(spark):
    """re^2 + im^2 of the complex spectra must equal the (unfolded)
    power path — same kernel family, no drift between them."""
    from process_nwb_spark.operators.stft import stft_power_batched

    rng = np.random.default_rng(3)
    X = rng.normal(size=(2048, 1))
    df = to_long_df(spark, X)
    key = ["channel", "frame", "bin"]
    cx = (stft_complex(df, 256, 128).toPandas().sort_values(key)
          .reset_index(drop=True))
    pw = (stft_power_batched(df, 256, 128).toPandas().sort_values(key)
          .reset_index(drop=True))
    assert len(cx) == len(pw) > 0
    p = cx.re.to_numpy() ** 2 + cx.im.to_numpy() ** 2
    # unfold the one-sided doubling (bins 1..N/2-1 are doubled in power)
    bins = cx.bin.to_numpy()
    fold = np.where((bins == 0) | (bins == 128), 1.0, 2.0)
    np.testing.assert_allclose(fold * p, pw.power.to_numpy(),
                               rtol=1e-12, atol=1e-12)


def test_guards():
    with pytest.raises(ValueError, match="hop"):
        stft_complex(None, frame_len=8, hop=16)


def test_wpli_matches_numpy_replay_and_discriminates(spark):
    """wPLI == direct NumPy evaluation of the same estimator on the same
    frames; quarter-cycle-lagged coupling scores ~1 while a zero-lag
    copy (volume conduction) collapses toward 0 even though coherence
    stays high for both."""
    import numpy as np
    import pandas as pd
    from process_nwb_spark.operators.coherence import wpli_matrix

    rng = np.random.default_rng(31)
    n, L, rate = 32768, 256, 1000.0
    t = np.arange(n)
    tone = np.sin(2 * np.pi * 125.0 * t / rate)
    lagged = np.sin(2 * np.pi * 125.0 * (t - 2) / rate)
    X = np.stack([tone + 0.5 * rng.standard_normal(n),
                  lagged + 0.5 * rng.standard_normal(n),
                  tone + 0.5 * rng.standard_normal(n)], axis=1)
    n_t, n_ch = X.shape
    df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel()}))
    got = {(r.ch_a, r.ch_b): r.wpli
           for r in wpli_matrix(df, rate, L).filter("bin = 32").collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 2)}   # self-pairs excluded

    # NumPy replay: hann frames at hop L//2, full frames only
    H = L // 2
    from process_nwb_spark.operators.stft import _window
    win = _window("hann", L)
    n_frames = (n - L) // H + 1
    spec = np.stack([
        np.stack([np.fft.rfft(X[f * H:f * H + L, c] * win)
                  for f in range(n_frames)])
        for c in range(n_ch)])                      # (ch, frame, bin)
    for (a, b), v in got.items():
        im = (spec[a, :, 32] * np.conj(spec[b, :, 32])).imag
        want = abs(im.mean()) / np.abs(im).mean()
        assert v == pytest.approx(want, abs=1e-12)
    assert got[(0, 1)] > 0.95 and got[(1, 2)] > 0.95
    assert got[(0, 2)] < 0.25


def test_wpli_pure_zero_lag_is_zero_not_null(spark):
    """Two channels that are exact scalar multiples: imag(Sxy) == 0 in
    every frame -> the 0/0 convention must emit 0.0, not NULL/NaN."""
    import numpy as np
    import pandas as pd
    from process_nwb_spark.operators.coherence import wpli_matrix

    n = 2048
    x = np.sin(2 * np.pi * 125.0 * np.arange(n) / 1000.0)
    X = np.stack([x, 2.0 * x], axis=1)
    df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(2, dtype=np.int32), n),
        "sample_idx": np.repeat(np.arange(n, dtype=np.int64), 2),
        "value": X.ravel()}))
    rows = wpli_matrix(df, 1000.0, 256).collect()
    assert rows and all(r.wpli == 0.0 for r in rows)


def test_psi_direction_numpy_replay_and_antisymmetry(spark):
    """PSI == direct NumPy evaluation; sign says who leads (a-leads ->
    positive), zero-lag copy nulls out; swapping the pair roles flips
    the sign (checked via the replay, since the op emits ch_a < ch_b)."""
    import numpy as np
    import pandas as pd
    from process_nwb_spark.operators.coherence import phase_slope_index
    from process_nwb_spark.operators.stft import _window

    rng = np.random.default_rng(41)
    n, L, rate = 16384, 256, 1000.0
    src = rng.standard_normal(n + 8)
    X = np.stack([src[8:], src[3:-5] + 0.2 * rng.standard_normal(n),
                  0.9 * src[8:] + 0.2 * rng.standard_normal(n)], axis=1)
    n_t, n_ch = X.shape
    df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel()}))
    got = {(r.ch_a, r.ch_b): (r.psi, r.n_bins_used)
           for r in phase_slope_index(df, rate, L).collect()}

    H = L // 2
    win = _window("hann", L)
    n_frames = (n - L) // H + 1
    spec = np.stack([
        np.stack([np.fft.rfft(X[f * H:f * H + L, c] * win)
                  for f in range(n_frames)])
        for c in range(n_ch)])
    def np_psi(a, b):
        sxy = (spec[a] * np.conj(spec[b])).mean(axis=0)
        sxx = (np.abs(spec[a]) ** 2).mean(axis=0)
        syy = (np.abs(spec[b]) ** 2).mean(axis=0)
        c = sxy / np.sqrt(sxx * syy)
        return float(np.imag(np.conj(c[:-1]) * c[1:]).sum())
    for (a, b), (psi, nb) in got.items():
        assert nb == L // 2          # bins 0..N/2-1 each pair with +1
        assert psi == pytest.approx(np_psi(a, b), abs=1e-9)
        assert np_psi(b, a) == pytest.approx(-np_psi(a, b), abs=1e-12)
    # ch1 = src delayed 5 relative to ch0 -> ch0 leads -> positive
    assert got[(0, 1)][0] > 3.0
    assert abs(got[(0, 2)][0]) < 0.5          # zero-lag null
    assert got[(1, 2)][0] < -3.0              # ch2 (undelayed) leads ch1
