"""STFT / spectrogram operator (operators/stft.py): frame-parallel
spectral analysis with exact Parseval accounting."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.stft import spectrogram_db, stft_power
from process_nwb_spark.synth import to_long_df

RATE = 1000.0


def _tone_df(spark, n=2048, freq_bin=32, frame_len=256, n_ch=2):
    """Per-channel tones landing EXACTLY on an rfft bin of a frame."""
    t = np.arange(n)
    X = np.stack([np.sin(2 * np.pi * (freq_bin + c) * t / frame_len)
                  for c in range(n_ch)], axis=1)
    return X, to_long_df(spark, X)


def test_parseval_rect_exact(spark):
    """Rect window, hop == frame_len: folded one-sided power sums to
    n_frame * sum(x^2) per frame to near machine precision — including
    the trailing partial frame."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(1000, 3))          # 3 full frames + partial 232
    _, df = (None, to_long_df(spark, X))
    st = (stft_power(df, frame_len=256, window="rect")
          .groupBy("channel", "frame").agg(F.sum("power").alias("e")))
    got = {(r.channel, r.frame): r.e for r in st.collect()}
    for c in range(3):
        for f in range(4):
            seg = X[f * 256:(f + 1) * 256, c]
            want = len(seg) * float(np.sum(seg ** 2))
            assert got[(c, f)] == pytest.approx(want, rel=1e-9), (c, f)


def test_tone_concentrates_in_bin(spark):
    """A frame-aligned tone puts (essentially) all its energy in its own
    bin: rect window, per-channel bin 32+c."""
    X, df = _tone_df(spark)
    st = stft_power(df, frame_len=256, window="rect").toPandas()
    for c in (0, 1):
        one = st[(st.channel == c) & (st.frame == 0)].set_index("bin").power
        k = 32 + c
        assert one[k] > 0.999 * one.sum()
        assert one[k] == pytest.approx(256 ** 2 / 2, rel=1e-9)


def test_overlap_frames_count_and_coverage(spark):
    """hop < frame_len: every sample joins ceil(frame_len/hop) frames
    (except edges); frame f spans [f*hop, f*hop+frame_len)."""
    X = np.ones((512, 1))
    df = to_long_df(spark, X)
    st = stft_power(df, frame_len=128, hop=64, window="hann")
    frames = sorted(r.frame for r in
                    st.select("frame").distinct().collect())
    # last sample 511 -> frames up to floor(511/64) = 7
    assert frames == list(range(8))
    # full interior frames all have 128//2+1 = 65 bins
    bins = {r.frame: r.n for r in
            st.groupBy("frame").agg(F.count("*").alias("n")).collect()}
    for f in range(6):
        assert bins[f] == 65
    # trailing frames are partial: frame 7 spans [448, 512) -> 64 samples
    assert bins[7] == 64 // 2 + 1


def test_gap_and_misalignment_raise(spark):
    import pandas as pd

    gap = spark.createDataFrame(pd.DataFrame({
        "series_id": ["s"] * 4, "channel": [0] * 4,
        "sample_idx": [0, 1, 3, 4], "value": [1.0] * 4}))
    with pytest.raises(Exception, match="gap"):
        stft_power(gap, frame_len=8, window="rect").collect()
    shifted = spark.createDataFrame(pd.DataFrame({
        "series_id": ["s"] * 4, "channel": [0] * 4,
        "sample_idx": [2, 3, 4, 5], "value": [1.0] * 4}))
    with pytest.raises(Exception, match="starts at"):
        stft_power(shifted, frame_len=8, window="rect").collect()
    # a duplicated index exactly masking a missing one must ALSO raise —
    # span==count alone would let the FFT run over a misaligned buffer
    dup = spark.createDataFrame(pd.DataFrame({
        "series_id": ["s"] * 4, "channel": [0] * 4,
        "sample_idx": [0, 1, 1, 3], "value": [1.0] * 4}))
    with pytest.raises(Exception, match="contiguous"):
        stft_power(dup, frame_len=8, window="rect").collect()


def test_validation_guards():
    with pytest.raises(ValueError, match="hop"):
        stft_power(None, frame_len=8, hop=16)
    with pytest.raises(ValueError, match="window"):
        stft_power(None, frame_len=8, window="kaiser")


def test_spectrogram_physical_coordinates(spark):
    X, df = _tone_df(spark, n=512, freq_bin=32, frame_len=256, n_ch=1)
    sg = spectrogram_db(df, RATE, frame_len=256, window="rect").toPandas()
    # freq axis: bins 0..128 -> 0..500 Hz
    assert sg.freq_hz.min() == 0.0
    assert sg.freq_hz.max() == pytest.approx(RATE / 2)
    # time axis: frames 0,1 -> 0.0 s, 0.256 s
    assert sorted(sg.t_sec.unique()) == pytest.approx([0.0, 256 / RATE])
    # the tone bin dominates in dB too
    f0 = sg[(sg.t_sec == 0.0)].set_index("freq_hz").power_db
    assert f0.idxmax() == pytest.approx(32 * RATE / 256)


def test_stream_stft_equals_batch(spark, tmp_path):
    """Streaming STFT over frame-aligned file cuts == batch STFT of the
    whole signal, EXACTLY (hop == frame_len means no frame ever spans a
    cut; same kernel per frame either way)."""
    import pandas as pd
    from process_nwb_spark.streaming.ops import stream_stft

    rng = np.random.default_rng(3)
    X = rng.normal(size=(1024, 2))
    long_df = to_long_df(spark, X)
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    for lo, hi in [(0, 512), (512, 1024)]:      # cut on a frame boundary
        (long_df.filter((F.col("sample_idx") >= lo)
                        & (F.col("sample_idx") < hi))
         .coalesce(1).write.mode("append").parquet(in_dir))

    q = stream_stft(spark, in_dir, out_dir, frame_len=128, window="hann")
    q.awaitTermination()
    got = (spark.read.parquet(out_dir).toPandas()
           .sort_values(["channel", "frame", "bin"]).reset_index(drop=True))
    assert got._batch.nunique() == 2            # really incremental
    want = (stft_power(long_df, frame_len=128, window="hann").toPandas()
            .sort_values(["channel", "frame", "bin"]).reset_index(drop=True))
    assert len(got) == len(want)
    np.testing.assert_allclose(got.power.to_numpy(), want.power.to_numpy(),
                               rtol=1e-12, atol=1e-12)


def test_welch_psd_white_noise_integrates_to_variance(spark):
    """Welch normalization: integrating the one-sided PSD of white noise
    over [0, fs/2] recovers the signal variance (within estimator noise)."""
    from process_nwb_spark.operators.stft import welch_psd

    rng = np.random.default_rng(5)
    sigma2 = 4.0
    X = rng.normal(scale=np.sqrt(sigma2), size=(16384, 2))
    psd = welch_psd(to_long_df(spark, X), RATE, frame_len=512).toPandas()
    df_hz = RATE / 512
    for c in (0, 1):
        total = psd[psd.channel == c].psd.sum() * df_hz
        assert total == pytest.approx(sigma2, rel=0.1), (c, total)
    # full frames only, 50% overlap: (16384-512)/256 + 1 = 63
    assert set(psd.n_frames) == {63}


def test_welch_psd_tone_peaks_at_bin(spark):
    from process_nwb_spark.operators.stft import welch_psd

    t = np.arange(8192)
    X = np.sin(2 * np.pi * 64 * t / 512)[:, None]   # bin 64 of 512
    psd = welch_psd(to_long_df(spark, X), RATE, frame_len=512,
                    window="hann").toPandas()
    assert int(psd.set_index("bin").psd.idxmax()) == 64


def test_batched_stft_equals_per_frame(spark):
    """stft_power_batched must be bitwise-identical to the per-frame op
    (full frames only) across overlap ratios and batch sizes — same
    kernel math, ~1x shuffle volume instead of frame_len/hop x."""
    from process_nwb_spark.operators.stft import stft_power_batched

    rng = np.random.default_rng(11)
    X = rng.normal(size=(3000, 2))
    df = to_long_df(spark, X)
    key = ["channel", "frame", "bin"]
    for L, H, FT in [(256, 64, 4), (128, 128, 8), (512, 128, 2)]:
        a = (stft_power_batched(df, L, H, window="hann", frames_per_task=FT)
             .toPandas().sort_values(key).reset_index(drop=True))
        b = (stft_power(df, L, H, window="hann", include_partial=False)
             .toPandas().sort_values(key).reset_index(drop=True))
        assert len(a) == len(b) > 0, (L, H, FT, len(a), len(b))
        assert (a[key].values == b[key].values).all()
        np.testing.assert_array_equal(a.power.to_numpy(),
                                      b.power.to_numpy()), (L, H, FT)


def test_batched_stft_guards():
    from process_nwb_spark.operators.stft import stft_power_batched

    with pytest.raises(ValueError, match="hop"):
        stft_power_batched(None, frame_len=8, hop=16)
    with pytest.raises(ValueError, match="frames_per_task"):
        stft_power_batched(None, frame_len=8, hop=4, frames_per_task=0)


def test_stft_matches_numpy_replay(spark):
    """Direct differential: every (frame, bin) equals the NumPy replay
    rfft(window * frame) with one-sided folding — windows included
    (Parseval covers rect only)."""
    rng = np.random.default_rng(21)
    X = rng.normal(size=(700, 2))            # 2 full + 1 partial @ 256
    df = to_long_df(spark, X)
    for L, H, win in [(256, 256, "hann"), (128, 64, "hamming")]:
        got = (stft_power(df, L, H, window=win).toPandas()
               .sort_values(["channel", "frame", "bin"])
               .reset_index(drop=True))
        wfn = {"hann": np.hanning, "hamming": np.hamming}[win]
        rows = []
        for c in range(2):
            f = 0
            while f * H < 700:
                seg = X[f * H:f * H + L, c]
                n = len(seg)
                p = np.abs(np.fft.rfft(seg * wfn(n))) ** 2
                fold = np.ones(len(p))
                fold[1:] = 2.0
                if n % 2 == 0:
                    fold[-1] = 1.0
                for b, v in enumerate(fold * p):
                    rows.append((c, f, b, v))
                f += 1
        import pandas as pd
        want = (pd.DataFrame(rows, columns=["channel", "frame", "bin", "p"])
                .sort_values(["channel", "frame", "bin"])
                .reset_index(drop=True))
        assert len(got) == len(want), (L, H, win, len(got), len(want))
        np.testing.assert_allclose(got.power.to_numpy(),
                                   want.p.to_numpy(), rtol=1e-12), (L, H)


def test_stream_stft_misaligned_cut_fails_without_persisting(spark, tmp_path):
    """A file cut NOT on a frame boundary splits one frame: the split
    frame must never reach the sink (no wrong-grid spectrum persisted)
    and the stream must fail loudly on the second batch's misaligned
    remainder — the exact contract the r5 review pinned down."""
    import pandas as pd
    from process_nwb_spark.streaming.ops import stream_stft

    X = np.random.default_rng(7).normal(size=(1024, 1))
    long_df = to_long_df(spark, X)
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    for lo, hi in [(0, 500), (500, 1024)]:      # 500 splits frame 3
        (long_df.filter((F.col("sample_idx") >= lo)
                        & (F.col("sample_idx") < hi))
         .coalesce(1).write.mode("append").parquet(in_dir))

    q = stream_stft(spark, in_dir, out_dir, frame_len=128, window="rect")
    with pytest.raises(Exception, match="starts at sample"):
        q.awaitTermination()
    # whatever batch 1 persisted must be full frames 0..2 only — the
    # split frame 3 (true spectrum needs samples 384..511) is absent
    try:
        got = spark.read.parquet(out_dir).toPandas()
    except Exception:
        return                      # nothing persisted at all: also fine
    assert set(got.frame.unique()) <= {0, 1, 2}
    assert got.frame.value_counts().le(65).all()   # <= n_bins rows each
