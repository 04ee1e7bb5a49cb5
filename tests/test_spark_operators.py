"""Spark operator layer == NumPy kernel layer (differential tests, the
reference's store_* vs pure-function strategy, tests/test_pipeline.py:25-99)."""
import numpy as np
import pytest

from process_nwb_spark.dsp import kernels as K
from process_nwb_spark.operators.car import car_df, subtract_car
from process_nwb_spark.operators.kernel_ops import (notch_op, resample_op,
                                                    scale_packed, wavelet_op)
from process_nwb_spark.operators.repack import pack, unpack
from process_nwb_spark.operators.zscore import band_mean, zscore_baseline
from process_nwb_spark.synth import (electrodes_df, generate_synthetic_data,
                                     long_to_dense, to_long_df)

RATE = 1000.0


@pytest.fixture(scope="module")
def dense(spark):
    X = generate_synthetic_data(1.5, 6, RATE, seed=3)
    return X


@pytest.fixture(scope="module")
def signals(spark, dense):
    return to_long_df(spark, dense)


def test_pack_unpack_roundtrip(spark, signals, dense):
    rt = long_to_dense(unpack(pack(signals)))
    np.testing.assert_allclose(rt, dense)


def test_pack_sorts_by_sample_idx(spark, dense):
    shuffled = to_long_df(spark, dense).orderBy("value")  # destroy time order
    rt = long_to_dense(unpack(pack(shuffled)))
    np.testing.assert_allclose(rt, dense)


def test_pack_order_survives_sort_based_agg_fallback(spark, dense):
    """pack() relies on collect_list appending in partition-iteration order
    after repartition + sortWithinPartitions. ObjectHashAggregate falls back
    to SORT-based aggregation past
    spark.sql.objectHashAggregate.sortBased.fallbackThreshold (default 128
    in-memory groups per task) — exactly the many-groups-per-task regime a
    large deployment hits — where within-group order instead rests on the
    fallback sort's stability on already-grouped runs. Pin that path
    bitwise by forcing the threshold to 1 so EVERY group takes the
    fallback."""
    conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    old = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "1")
        shuffled = to_long_df(spark, dense).orderBy("value")
        rt = long_to_dense(unpack(pack(shuffled)))
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    assert (rt == dense).all()   # bitwise, not allclose


def test_scale_packed(spark, signals, dense):
    out = long_to_dense(unpack(scale_packed(pack(signals), 1e6)))
    np.testing.assert_allclose(out, dense * 1e6, rtol=1e-12)


def test_resample_op_matches_kernel(spark, signals, dense):
    got = long_to_dense(unpack(resample_op(pack(signals), 400.0, RATE,
                                           precision="double")))
    want = K.resample(dense, 400.0, RATE, precision="double")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_notch_op_matches_kernel(spark, signals, dense):
    got = long_to_dense(unpack(notch_op(pack(signals), RATE, precision="double")))
    want = K.apply_linenoise_notch(dense, RATE, precision="double")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_subtract_car_matches_kernel(spark, signals, dense):
    got = long_to_dense(subtract_car(signals, mean_frac=0.95))
    want = K.subtract_car(dense, 0.95, precision="double")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_subtract_car_mean1(spark, signals, dense):
    got = long_to_dense(subtract_car(signals, mean_frac=1.0))
    want = K.subtract_car(dense, 1.0, precision="double")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_car_df_nan_skipping(spark, dense):
    X = dense.copy()
    X[10, 2] = np.nan
    import pandas as pd

    sdf = to_long_df(spark, X)
    got = (car_df(sdf, mean_frac=0.95).toPandas()
           .sort_values("sample_idx")["car"].to_numpy())
    want = K.car(X, 0.95, precision="double")[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_wavelet_op_matches_kernel(spark, signals, dense):
    wv = wavelet_op(pack(signals), RATE, filters="rat", hg_only=True,
                    abs_only=False, precision="double")
    pdf = wv.toPandas().sort_values(["channel", "band"])
    Xh, _, cfs, sds = K.wavelet_transform(dense, RATE, "rat", True,
                                          precision="double")
    for _, row in pdf.iterrows():
        want = Xh[:, row.channel, row.band]
        np.testing.assert_allclose(np.asarray(row.amp), np.abs(want),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(row.phase), np.angle(want),
                                   rtol=1e-9, atol=1e-9)
        assert np.isclose(row.cf, cfs[row.band]) and np.isclose(row.sd, sds[row.band])


def test_wavelet_op_post_resample(spark, signals, dense):
    wv = wavelet_op(pack(signals), RATE, filters="rat", hg_only=True,
                    abs_only=True, post_resample_rate=250.0, precision="double")
    pdf = wv.toPandas().sort_values(["channel", "band"])
    Xh, _, _, _ = K.wavelet_transform(dense, RATE, "rat", True, precision="double")
    n_new = K.resample_num(dense.shape[0], 250.0, RATE)
    row = pdf.iloc[0]
    want = K.resample(np.abs(Xh[:, row.channel, row.band]), 250.0, RATE,
                      precision="double")
    assert len(row.amp) == n_new
    np.testing.assert_allclose(np.asarray(row.amp), want, rtol=1e-9, atol=1e-12)


def test_wavelet_phase_resample_rejected(spark, signals):
    with pytest.raises(ValueError):
        wavelet_op(pack(signals), RATE, abs_only=False, post_resample_rate=100.0)


def test_zscore_and_band_mean(spark):
    rng = np.random.default_rng(0)
    import pandas as pd

    rows = []
    for ch in range(2):
        for b in range(3):
            vals = rng.standard_normal(50) + b
            for i, v in enumerate(vals):
                rows.append(("s", ch, b, i, v))
    pdf = pd.DataFrame(rows, columns=["series_id", "channel", "band",
                                      "sample_idx", "amp"])
    tf = spark.createDataFrame(pdf)
    z = zscore_baseline(tf, n_baseline=20, value_col="amp").toPandas()
    for (ch, b), g in z.groupby(["channel", "band"]):
        base = pdf[(pdf.channel == ch) & (pdf.band == b) & (pdf.sample_idx < 20)]["amp"]
        want = (pdf[(pdf.channel == ch) & (pdf.band == b)]
                .sort_values("sample_idx")["amp"].to_numpy() - base.mean()) / base.std(ddof=0)
        np.testing.assert_allclose(g.sort_values("sample_idx")["amp"].to_numpy(),
                                   want, rtol=1e-10)
    bm = band_mean(zscore_baseline(tf, 20, "amp"), "amp").toPandas()
    assert len(bm) == 2 * 50


def test_electrodes_df(spark):
    pdf = electrodes_df(spark, 4).toPandas()
    assert len(pdf) == 4
    assert (pdf.imp == [-0.0, -1.0, -2.0, -3.0]).all()
    assert (pdf.location == "cortex").all()


def _rows_map(df, key_cols, val_col):
    return {tuple(r[k] for k in key_cols): np.asarray(r[val_col])
            for r in df.collect()}


def _assert_rows_close(a, b, rtol=1e-12, atol=1e-13):
    """Near-bitwise: the two sides run the IDENTICAL kernel code, but
    pocketfft's SIMD path selection depends on heap-buffer alignment,
    which varies between independent executions — measured 1-2 ULP
    differences on a few hundred values per run, at double precision too.
    1e-12 is ~4 orders above that jitter and ~12 below any semantic
    difference."""
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=rtol, atol=atol,
                                   err_msg=str(k))


def test_fused_ops_arrow_bitwise(spark, signals):
    """Arrow crossing == pandas crossing, near-bitwise, for the fused
    resample+notch kernel map (same fn over the same float64 views)."""
    from process_nwb_spark.operators.kernel_ops import (fused_ops,
                                                        fused_ops_arrow)

    pk = scale_packed(pack(signals), 1e6)
    # precision="double": the float32 FFT is only 1-ULP repeatable across
    # independent executions (alignment-dependent SIMD rounding), so the
    # bitwise crossing-equivalence claim is made at double
    fns = (lambda x: K.resample(x, 500.0, RATE, precision="double"),
           lambda x: K.apply_linenoise_notch(x, 500.0, precision="double"))
    a = _rows_map(fused_ops(pk, *fns), ("series_id", "channel"), "values")
    b = _rows_map(fused_ops_arrow(pk, *fns), ("series_id", "channel"),
                  "values")
    _assert_rows_close(a, b)


def test_car_wavelet_arrow_bitwise(spark, signals):
    """applyInArrow CAR->wavelet == applyInPandas twin, near-bitwise, incl.
    the post-resample of band amplitudes and the null phase column."""
    from process_nwb_spark.operators.kernel_ops import (car_wavelet_arrow,
                                                        car_wavelet_op)

    pk = scale_packed(pack(signals), 1e6)
    kw = dict(mean_frac=0.95, filters="rat", hg_only=True, abs_only=True,
              post_resample_rate=250.0, precision="double")
    keys = ("series_id", "channel", "band")
    a = _rows_map(car_wavelet_op(pk, RATE, **kw), keys, "amp")
    b = _rows_map(car_wavelet_arrow(pk, RATE, **kw), keys, "amp")
    _assert_rows_close(a, b)
    cfs = {tuple(r[k] for k in keys): (r["cf"], r["sd"], r["phase"])
           for r in car_wavelet_arrow(pk, RATE, **kw).collect()}
    for _, (cf, sd, phase) in cfs.items():
        assert cf > 0 and sd > 0 and phase is None


def test_preprocess_arrow_matches_pandas_bitwise(spark, dense):
    """End-to-end: preprocess(arrow=True) == preprocess(arrow=False),
    near-bitwise (1e-12 at double, 1e-5 at single).

    No two independent executions — pandas vs pandas included — can
    promise exact bitwise equality: pocketfft's SIMD kernel choice
    depends on heap-buffer alignment, which varies run-to-run, giving
    1-2 ULP jitter (2^-7 absolute on O(1e3) float32 values; a few
    hundred 1-ULP float64 values per run at double). The band fold in
    high_gamma_packed is sorted by band, so summation order is pinned
    and contributes no extra noise."""
    from process_nwb_spark import high_gamma_trace, preprocess

    df = to_long_df(spark, dense)

    def run(arrow, precision):
        res = preprocess(df, RATE, initial_resample_rate=500.0,
                         final_resample_rate=250.0, filters="rat",
                         hg_only=True, arrow=arrow, precision=precision)
        hg = high_gamma_trace(res, 0.25, 250.0)
        vcol = [c for c in hg.columns
                if c not in ("series_id", "channel", "sample_idx")][0]
        return {(r["series_id"], r["channel"], r["sample_idx"]): r[vcol]
                for r in hg.collect()}

    a, b = run(True, "double"), run(False, "double")
    assert a.keys() == b.keys()
    av = np.array([a[k] for k in sorted(a)])
    bv = np.array([b[k] for k in sorted(a)])
    np.testing.assert_allclose(av, bv, rtol=1e-12, atol=1e-13)

    a, b = run(True, "single"), run(False, "single")
    av = np.array([a[k] for k in sorted(a)])
    bv = np.array([b[k] for k in sorted(a)])
    np.testing.assert_allclose(av, bv, rtol=1e-5, atol=1e-6)
