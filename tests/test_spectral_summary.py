"""band_power / line_noise_snr (operators/spectral_summary.py):
variance partitioning, tone containment, guards, and the notch
acceptance loop."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.spectral_summary import (EEG_BANDS,
                                                          band_power,
                                                          line_noise_snr)

RATE = 1000.0


def _df(spark, x):
    n = len(x)
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.zeros(n, dtype=np.int32),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))


def test_band_power_partitions_variance(spark):
    rng = np.random.default_rng(5)
    x = rng.standard_normal(16384)
    full = {"all": (0.0, RATE / 2)}
    got = band_power(_df(spark, x), RATE, 512, bands=full).collect()[0]
    # integrating the whole one-sided PSD recovers the variance
    assert got.power == pytest.approx(x.var(), rel=0.1)
    # disjoint halves sum to the whole (PSD integration is additive)
    halves = band_power(_df(spark, x), RATE, 512,
                        bands={"lo": (0.0, 250.0), "hi": (250.0, 500.0)}) \
        .collect()
    assert sum(r.power for r in halves) == pytest.approx(got.power,
                                                         rel=1e-9)


def test_band_power_tone_and_relative(spark):
    t = np.arange(16384) / RATE
    x = np.sqrt(2) * np.sin(2 * np.pi * 10.0 * t)
    rows = {r.band_name: r for r in
            band_power(_df(spark, x), RATE, 512, relative=True).collect()}
    assert set(rows) == set(EEG_BANDS)
    assert rows["alpha"].rel_power > 0.8
    assert rows["gamma"].rel_power < 0.01
    total = sum(r.rel_power for r in rows.values())
    assert total <= 1.0 + 1e-9        # bands don't cover [0, 0.5) Hz etc.


def test_band_power_guards(spark):
    df = _df(spark, np.zeros(1024))
    with pytest.raises(ValueError, match="lo < hi"):
        band_power(df, RATE, 256, bands={"bad": (10.0, 5.0)})
    with pytest.raises(ValueError, match="Nyquist"):
        band_power(df, RATE, 256, bands={"bad": (600.0, 700.0)})


def test_line_noise_snr_detects_and_notch_clears(spark):
    from process_nwb_spark.operators.segmented import segmented_notch

    rng = np.random.default_rng(7)
    n = 32768
    t = np.arange(n) / RATE
    clean = rng.uniform(-1, 1, n)
    noisy = clean + 0.5 * np.sin(2 * np.pi * 60.0 * t)
    s_clean = line_noise_snr(_df(spark, clean), RATE, 512).collect()[0]
    s_noisy = line_noise_snr(_df(spark, noisy), RATE, 512).collect()[0]
    assert 0.5 < s_clean.snr < 2.0
    assert s_noisy.snr > 3.0
    assert s_noisy.n_harmonics == 8   # 60..480 Hz fit below 500 - flank
    notched = segmented_notch(_df(spark, noisy), RATE,
                              seg_len=4096, overlap=512)
    s_after = line_noise_snr(notched, RATE, 512).collect()[0]
    assert s_after.snr < 2.0
    with pytest.raises(ValueError, match="flank"):
        line_noise_snr(_df(spark, clean), RATE, 512, flank=(1, 1))
    with pytest.raises(ValueError, match="harmonic"):
        line_noise_snr(_df(spark, clean), RATE, 16)
