#!/usr/bin/env python
"""High-gamma preprocessing demo — the engine's analog of the reference's
plot_ECoG_preprocessing tutorials (examples/plot_ECoG_preprocessing_*.py):
synthetic ECoG -> scale -> resample -> notch -> CAR -> wavelet -> z-score
-> band mean, printed instead of plotted (no matplotlib here)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from process_nwb_spark import get_spark, high_gamma_trace, preprocess
from process_nwb_spark.synth import generate_synthetic_data, to_long_df


def main():
    spark = get_spark("high-gamma-demo")
    X = generate_synthetic_data(duration=5.0, nchannels=8, rate=3200.0, seed=0)
    signals = to_long_df(spark, X)

    res = preprocess(signals, rate=3200.0, initial_resample_rate=1600.0,
                     final_resample_rate=400.0, filters="rat", hg_only=True)
    hg = high_gamma_trace(res, baseline_seconds=0.25, final_rate=400.0)

    print("stage views:", res.materialize(spark))
    print("tf rows:", res.tf.count(), "(ch x band x time)")
    hg.orderBy("channel", "sample_idx").show(10)
    spark.stop()


if __name__ == "__main__":
    main()
