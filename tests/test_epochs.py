"""epoch_trials / erp_average (operators/epochs.py) against a direct
NumPy replay: window cutting, overlap handling, edge truncation, and
the bucketized-join plan shape."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.epochs import epoch_trials, erp_average


def _sig_df(spark, X):
    n_t, n_ch = X.shape
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel(),
    }))


def _markers_df(spark, onsets):
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "trial_id": np.arange(len(onsets), dtype=np.int32),
        "onset_sample": np.asarray(onsets, dtype=np.int64),
    }))


def test_epochs_match_numpy_slices(spark):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((1000, 2))
    onsets = [100, 400, 800]
    pre, post = 20, 30
    ep = epoch_trials(_sig_df(spark, X), _markers_df(spark, onsets),
                      pre, post).collect()
    got = {(r.trial_id, r.channel, r.rel_idx): r.value for r in ep}
    assert len(got) == len(onsets) * 2 * (pre + post + 1)
    for ti, on in enumerate(onsets):
        for ch in (0, 1):
            for rel in (-pre, -1, 0, 7, post):
                assert got[(ti, ch, rel)] == pytest.approx(
                    X[on + rel, ch], abs=0)


def test_epochs_edge_truncation_and_erp_counts(spark):
    X = np.arange(100, dtype=np.float64)[:, None]  # value == sample_idx
    # first window truncated at the recording start, second complete
    ep = epoch_trials(_sig_df(spark, X), _markers_df(spark, [5, 50]),
                      pre=10, post=10)
    erp = {r.rel_idx: (r.erp, r.n_trials)
           for r in erp_average(ep).collect()}
    for rel in range(-10, 11):
        want_vals = [on + rel for on in (5, 50) if 0 <= on + rel < 100]
        got, n = erp[rel]
        assert n == len(want_vals)
        assert got == pytest.approx(np.mean(want_vals), abs=1e-12)
    # truncated rels have one trial, complete rels two
    assert erp[-10][1] == 1 and erp[0][1] == 2


def test_epochs_overlapping_windows_duplicate_samples(spark):
    X = np.ones((50, 1))
    ep = epoch_trials(_sig_df(spark, X), _markers_df(spark, [10, 14]),
                      pre=5, post=5).collect()
    # sample 12 is inside both windows -> appears once per trial
    hits = [r for r in ep if r.rel_idx + [10, 14][r.trial_id] == 12]
    assert len(hits) == 2


def test_epochs_guard_and_plan_is_equi_join(spark):
    df = _sig_df(spark, np.zeros((10, 1)))
    mk = _markers_df(spark, [5])
    with pytest.raises(ValueError, match="pre >= 0"):
        epoch_trials(df, mk, -1, 5)
    plan = epoch_trials(df, mk, 2, 2)._jdf.queryExecution().executedPlan() \
        .toString()
    # the bucketized design must plan a real equi-join, never the
    # samples x markers nested loop
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_plv_matches_numpy_and_limits(spark):
    from process_nwb_spark.operators.pac import phase_locking_value

    rng = np.random.default_rng(9)
    n = 3000
    phi = np.zeros((n, 3))
    phi[:, 0] = rng.uniform(-np.pi, np.pi, n)
    phi[:, 1] = phi[:, 0] + 1.1            # locked at constant offset
    phi[:, 2] = rng.uniform(-np.pi, np.pi, n)   # independent
    df = _sig_df(spark, phi).withColumnRenamed("value", "phase")
    out = {(r.ch_a, r.ch_b): (r.plv, r.n_samples)
           for r in phase_locking_value(df).collect()}
    assert len(out) == 3
    for (a, b), (plv, ns) in out.items():
        d = phi[:, a] - phi[:, b]
        want = np.abs(np.mean(np.exp(1j * d)))
        assert ns == n
        assert plv == pytest.approx(want, abs=1e-12)
    assert out[(0, 1)][0] == pytest.approx(1.0, abs=1e-12)
    assert out[(0, 2)][0] < 0.05


def test_itc_matches_numpy_and_locked_limit(spark):
    from process_nwb_spark.operators.epochs import (epoch_trials,
                                                    inter_trial_coherence)

    rng = np.random.default_rng(17)
    n = 600
    phi = rng.uniform(-np.pi, np.pi, (n, 1))
    onsets = [100, 250, 400]
    df = _sig_df(spark, phi).withColumnRenamed("value", "phase")
    ep = epoch_trials(df, _markers_df(spark, onsets), 5, 10,
                      value_col="phase")
    got = {r.rel_idx: (r.itc, r.n_trials)
           for r in inter_trial_coherence(ep).collect()}
    assert len(got) == 16
    for rel in range(-5, 11):
        vals = np.array([phi[on + rel, 0] for on in onsets])
        want = np.abs(np.mean(np.exp(1j * vals)))
        itc, nt = got[rel]
        assert nt == 3
        assert itc == pytest.approx(want, abs=1e-12)
    # identical phase at every trial -> ITC exactly 1
    locked = _sig_df(spark, np.tile(0.3, (600, 1))) \
        .withColumnRenamed("value", "phase")
    ep2 = epoch_trials(locked, _markers_df(spark, onsets), 2, 2,
                       value_col="phase")
    for r in inter_trial_coherence(ep2).collect():
        assert r.itc == pytest.approx(1.0, abs=1e-12)


def test_epochs_extra_keys_carry_band_for_ersp(spark):
    """extra_keys=("band",) epochs a banded stream (the ERSP workflow):
    per-(band, rel) averages match the per-band NumPy slices."""
    from process_nwb_spark.operators.epochs import epoch_trials, erp_average

    rng = np.random.default_rng(29)
    n_t, n_bands = 300, 3
    amps = rng.standard_normal((n_t, n_bands))
    rows = pd.DataFrame({
        "series_id": "s0", "channel": 0,
        "band": np.tile(np.arange(n_bands, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_bands),
        "amp": amps.ravel()})
    df = spark.createDataFrame(rows)
    onsets = [50, 150, 250]
    ep = epoch_trials(df, _markers_df(spark, onsets), 10, 20,
                      value_col="amp", extra_keys=("band",))
    erp = erp_average(ep, value_col="amp", extra_keys=("band",))
    got = {(r.band, r.rel_idx): (r.erp, r.n_trials) for r in erp.collect()}
    assert len(got) == n_bands * 31
    for b in range(n_bands):
        for rel in (-10, 0, 20):
            want = np.mean([amps[on + rel, b] for on in onsets])
            erp_v, nt = got[(b, rel)]
            assert nt == 3 and erp_v == pytest.approx(want, abs=1e-12)
