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
