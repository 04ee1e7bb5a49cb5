"""Margin assertions for the contract-boolean driver faces first sampled
in round 7 (sig_band_power, sig_line_noise_snr, sig_spectral_features).

A contract face emits booleans like `snr > 3.0`; if the measured
statistic sat NEAR its threshold, an innocuous cross-session float
difference (partitioning, libm) could flip the boolean at the driver —
the same knife-edge class as ROUND-boundary hash flips. These tests pin
each underlying STATISTIC at >=2x slack from its face threshold, so the
face booleans cannot flip without a real regression. Measured values
(2026-08, local[32]): flat dev <=0.003 (thr 0.05), alpha 0.860 (thr
0.6), far-band <=0.005 (thr 0.05), clean snr 1.007 (window 0.5..2),
noisy snr 5.12 (thr 3), post-notch 0.80/0.84 (thr 2), entropy
0.9992/0.158 (thr 0.9/0.35), SEF 474.6/50.8 (windows 460..490/45..56).
"""
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.signal_queries import (_hash_uniform,
                                                         _synth_long)

RATE, N_T = 1000.0, 32768
PI2 = 2 * 3.141592653589793


def test_band_power_face_margins(spark):
    from process_nwb_spark.operators.spectral_summary import band_power

    def value_fn(ch, idx):
        t = idx.cast("double") / RATE
        tone = F.lit(2.0 ** 0.5) * F.sin(F.lit(PI2 * 10.0) * t)
        return F.when(ch == 1, tone + 0.3 * _hash_uniform(idx, ch)) \
            .otherwise(_hash_uniform(idx, ch))

    bp = band_power(_synth_long(spark, 2, N_T, value_fn),
                    RATE, 512, relative=True).collect()
    for r in bp:
        share = (r.hi_hz - r.lo_hz) / (RATE / 2.0)
        if r.channel == 0:
            # face threshold: dev < 0.05 -> require half of it
            assert abs(r.rel_power - share) < 0.025, (r.band_name,
                                                      r.rel_power, share)
        elif r.band_name == "alpha":
            # face threshold: > 0.6 -> require 0.75
            assert r.rel_power > 0.75, r.rel_power
        elif r.band_name in ("delta", "beta", "gamma"):
            # face threshold: < 0.05 -> require half of it
            assert r.rel_power < 0.025, (r.band_name, r.rel_power)


def test_line_noise_snr_face_margins(spark):
    from process_nwb_spark.operators.segmented import segmented_notch
    from process_nwb_spark.operators.spectral_summary import line_noise_snr

    def value_fn(ch, idx):
        t = idx.cast("double") / RATE
        line = F.lit(0.5) * F.sin(F.lit(PI2 * 60.0) * t)
        return F.when(ch == 1, line + _hash_uniform(idx, ch)) \
            .otherwise(_hash_uniform(idx, ch))

    sig = _synth_long(spark, 2, N_T, value_fn)
    before = {r.channel: r.snr
              for r in line_noise_snr(sig, RATE, 512).collect()}
    notched = segmented_notch(sig, RATE, seg_len=4096, overlap=512)
    after = {r.channel: r.snr
             for r in line_noise_snr(notched, RATE, 512).collect()}
    # face window 0.5..2.0 -> require the inner half 0.75..1.35
    assert 0.75 < before[0] < 1.35, before[0]
    # face threshold > 3.0 -> require 4.5 (1.5x; measured 5.12)
    assert before[1] > 4.5, before[1]
    # face threshold < 2.0 -> require 1.2 on both channels
    assert after[0] < 1.2 and after[1] < 1.2, after


def test_spectral_features_face_margins(spark):
    from process_nwb_spark.operators.features import (spectral_edge,
                                                      spectral_entropy)

    def value_fn(ch, idx):
        t = idx.cast("double") / RATE
        tone = F.lit(2.0 ** 0.5) * F.sin(F.lit(PI2 * 50.0) * t)
        return F.when(ch == 1, tone + 0.05 * _hash_uniform(idx, ch)) \
            .otherwise(_hash_uniform(idx, ch))

    sig = _synth_long(spark, 2, N_T, value_fn)
    ent = {r.channel: r.entropy
           for r in spectral_entropy(sig, RATE, 512).collect()}
    sef = {r.channel: r.sef_hz
           for r in spectral_edge(sig, RATE, 512).collect()}
    # face thresholds > 0.9 / < 0.35 -> require 0.95 / 0.25
    assert ent[0] > 0.95 and ent[1] < 0.25, ent
    # face windows 460..490 / 45..56 -> require the inner halves
    assert 467.0 < sef[0] < 483.0, sef[0]
    assert 47.0 < sef[1] < 54.0, sef[1]
