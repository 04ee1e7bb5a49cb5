#!/usr/bin/env python
"""Trial-analysis demo: the post-pipeline workflow on one screen.

1. `epoch_trials` + `erp_average` pull a stimulus-locked evoked response
   out of noise that hides it in any single trial;
2. `inter_trial_coherence` separates a phase-resetting channel from one
   whose phase ignores the stimulus;
3. `detect_bursts` finds the high-amplitude events and reports their
   extents and energy.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from process_nwb_spark import (detect_bursts, epoch_trials, erp_average,
                               get_spark, inter_trial_coherence)

RATE = 1000.0
ONSETS = np.arange(500, 19500, 1000)


def main():
    spark = get_spark("trial-demo")
    rng = np.random.default_rng(0)
    n = 20000
    t = np.arange(n)

    # an evoked bump (50-150 ms post-stimulus) buried under 3x noise
    evoked = np.zeros(n)
    for on in ONSETS:
        w = np.arange(50, 150)
        evoked[on + w] += np.hanning(100)
    x = evoked + 3.0 * rng.standard_normal(n)
    sig = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": 0,
        "sample_idx": t.astype("int64"), "value": x}))
    markers = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "trial_id": np.arange(len(ONSETS), dtype="int32"),
        "onset_sample": ONSETS.astype("int64")}))

    print(f"== ERP over {len(ONSETS)} trials: single-trial SNR ~0.3, "
          "averaged bump emerges ==")
    erp = erp_average(epoch_trials(sig, markers, pre=100, post=300))
    (erp.withColumn("window",
                    F.when(F.col("rel_idx").between(50, 149), "bump")
                    .otherwise("baseline"))
     .groupBy("window").agg(F.round(F.avg("erp"), 3).alias("mean_erp"),
                            F.min("n_trials").alias("n_trials"))
     .orderBy("window").show())

    print("== Inter-trial coherence: phase reset vs free-running ==")
    phi_reset = np.angle(np.exp(1j * 2 * np.pi * ((t % 1000) / 125.0)))
    phi_free = np.angle(np.exp(1j * (2 * np.pi * t / 777.0)))
    for name, phi in (("reset", phi_reset), ("free", phi_free)):
        ph = spark.createDataFrame(pd.DataFrame({
            "series_id": "s0", "channel": 0,
            "sample_idx": t.astype("int64"), "phase": phi}))
        ep = epoch_trials(ph, markers, 0, 100, value_col="phase")
        (inter_trial_coherence(ep)
         .agg(F.round(F.avg("itc"), 3).alias(f"mean_itc_{name}")).show())

    print("== Burst detection on the rectified evoked trace ==")
    hg = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": 0,
        "sample_idx": t.astype("int64"),
        "value": evoked + 0.05 * rng.standard_normal(n)}))
    (detect_bursts(hg, threshold=0.5, min_duration=10)
     .select("start_idx", "end_idx", "duration",
             F.round("peak", 3).alias("peak"),
             F.round("area", 2).alias("area"))
     .orderBy("start_idx").show(5))
    spark.stop()


if __name__ == "__main__":
    main()
