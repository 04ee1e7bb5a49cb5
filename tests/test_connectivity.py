"""Differential tests for the time-domain connectivity tier:
cross_correlation (operators/xcorr.py) and phase_amplitude_coupling
(operators/pac.py) against direct NumPy evaluation of the same
estimators on the same arrays."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.pac import phase_amplitude_coupling
from process_nwb_spark.operators.xcorr import cross_correlation


def _long_df(spark, X, series_id="s0"):
    """X: (n_time, n_ch) -> long rows."""
    n_t, n_ch = X.shape
    rows = pd.DataFrame({
        "series_id": series_id,
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel(),
    })
    return spark.createDataFrame(rows)


def _np_xcorr(X, ch_a, ch_b, lag):
    """corr(a[t], b[t+lag]) over the overlapping window."""
    n = X.shape[0]
    t = np.arange(n)
    keep = (t + lag >= 0) & (t + lag < n)
    a, b = X[t[keep], ch_a], X[t[keep] + lag, ch_b]
    return np.corrcoef(a, b)[0, 1], keep.sum()


def test_xcorr_matches_numpy_all_pairs_lags(spark):
    rng = np.random.default_rng(7)
    X = rng.standard_normal((400, 3))
    X[:, 1] = np.roll(X[:, 0], 5) + 0.1 * rng.standard_normal(400)
    lags = [-7, -5, 0, 5, 7]
    got = {(r.ch_a, r.ch_b, r.lag): (r.r, r.n_overlap)
           for r in cross_correlation(_long_df(spark, X), lags).collect()}
    assert len(got) == 3 * len(lags)
    for (ca, cb, lag), (r, n) in got.items():
        want_r, want_n = _np_xcorr(X, ca, cb, lag)
        assert n == want_n
        assert r == pytest.approx(want_r, abs=1e-9)
    # ch1 is ch0 delayed 5 samples (X[t,1] = X[t-5,0]), so
    # b[t+lag] = X[t+lag-5, 0] aligns with a[t] = X[t,0] at lag = +5
    pair01 = {lag: r for (ca, cb, lag), (r, _) in got.items()
              if (ca, cb) == (0, 1)}
    assert max(pair01, key=lambda l: abs(pair01[l])) == 5


def test_xcorr_self_pairs_and_lag_zero_identity(spark):
    rng = np.random.default_rng(3)
    X = rng.standard_normal((200, 2))
    out = cross_correlation(_long_df(spark, X), [0, 3],
                            include_self=True).collect()
    by = {(r.ch_a, r.ch_b, r.lag): r.r for r in out}
    for c in (0, 1):
        assert by[(c, c, 0)] == pytest.approx(1.0, abs=1e-12)
        want, _ = _np_xcorr(X, c, c, 3)
        assert by[(c, c, 3)] == pytest.approx(want, abs=1e-9)


def test_xcorr_guards(spark):
    df = _long_df(spark, np.zeros((10, 2)))
    with pytest.raises(ValueError, match="empty lag set"):
        cross_correlation(df, [])
    with pytest.raises(ValueError, match="cap 4"):
        cross_correlation(df, range(10), max_lags=4)


def test_xcorr_exact_scale_matches_corr_and_is_partition_stable(spark):
    """exact_scale: fixed-point moment path agrees with F.corr on
    fixed-point data, and its bits do not move when the input
    partitioning (hence summation order) changes."""
    rng = np.random.default_rng(11)
    X = np.round(rng.standard_normal((500, 2)), 6)   # 6-dp grid
    lags = [-3, 0, 3]
    base = _long_df(spark, X)
    float_r = {(r.ch_a, r.ch_b, r.lag): r.r
               for r in cross_correlation(base, lags).collect()}
    outs = []
    for nparts in (1, 7, 32):
        got = {(r.ch_a, r.ch_b, r.lag): (r.r, r.n_overlap)
               for r in cross_correlation(
                   base.repartition(nparts), lags,
                   exact_scale=1_000_000).collect()}
        outs.append(got)
    for k, (r, n) in outs[0].items():
        assert r == pytest.approx(float_r[k], abs=1e-9)
        want_r, want_n = _np_xcorr(X, *k)
        assert n == want_n and r == pytest.approx(want_r, abs=1e-9)
    for other in outs[1:]:   # bit-identical across partitionings
        for k, (r, n) in outs[0].items():
            assert other[k][0].hex() == r.hex() and other[k][1] == n


def test_xcorr_n_overlap_counts_non_null_pairs_only(spark):
    X = np.random.default_rng(5).standard_normal((50, 2))
    df = _long_df(spark, X).withColumn(
        "value", F.when(F.col("sample_idx") < 10, None)
                  .otherwise(F.col("value")))
    out = {r.lag: r.n_overlap
           for r in cross_correlation(df, [0, 5]).collect()}
    # lag 0: 40 rows where both sides non-null; lag 5: a[t] needs t>=10
    # and b[t+5] needs t+5>=10 -> t in [10, 44] = 35 rows
    assert out[0] == 40 and out[5] == 35


def _pac_dfs(spark, phi, amp):
    n = len(phi)
    base = pd.DataFrame({"series_id": "s0",
                         "channel": np.zeros(n, dtype=np.int32),
                         "sample_idx": np.arange(n, dtype=np.int64)})
    pdf = spark.createDataFrame(base.assign(phase=phi))
    adf = spark.createDataFrame(base.assign(amp=amp))
    return pdf, adf


def test_pac_matches_numpy_and_analytic_limits(spark):
    rng = np.random.default_rng(11)
    n = 5000
    phi = rng.uniform(-np.pi, np.pi, n)
    amp = 1 + 0.6 * np.cos(phi) + 0.05 * rng.random(n)
    pdf, adf = _pac_dfs(spark, phi, amp)
    row = phase_amplitude_coupling(pdf, adf).collect()[0]
    want = np.abs(np.mean(amp * np.exp(1j * phi))) / amp.mean()
    assert row.mi == pytest.approx(want, abs=1e-12)
    assert row.n_samples == n
    # fully phase-locked envelope (amp = delta-like at phi=0) -> mi -> 1;
    # constant envelope over uniform phase -> mi -> 0
    const = phase_amplitude_coupling(
        *_pac_dfs(spark, phi, np.ones(n))).collect()[0]
    assert const.mi < 0.05
    locked = phase_amplitude_coupling(
        *_pac_dfs(spark, phi, np.exp(8 * np.cos(phi)))).collect()[0]
    assert locked.mi > 0.9


def test_pac_zero_envelope_is_zero_not_null(spark):
    phi = np.linspace(-np.pi, np.pi, 100)
    row = phase_amplitude_coupling(
        *_pac_dfs(spark, phi, np.zeros(100))).collect()[0]
    assert row.mi == 0.0


def test_connectivity_joins_plan_as_equi_joins(spark):
    """The lag join and the PLV pair join must plan as hash/SMJ
    equi-joins (expression keys), never nested-loop or cartesian."""
    rng = np.random.default_rng(1)
    X = rng.standard_normal((100, 2))
    for df in (cross_correlation(_long_df(spark, X), [0, 1]),):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
    from process_nwb_spark.operators.pac import phase_locking_value
    ph = _long_df(spark, X).withColumnRenamed("value", "phase")
    plan = phase_locking_value(ph)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
