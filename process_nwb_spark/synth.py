"""Deterministic synthetic ECoG fixtures.

Seed-exact port of the reference generator
(/root/reference/src/process_nwb/utils.py:170-219) plus converters into the
engine's long-format Spark DataFrame and the electrodes dimension table
(utils.py:222-253).
"""
from __future__ import annotations

import numpy as np


def generate_synthetic_data(duration: float, nchannels: int, rate: float,
                            high_gamma: bool = True, linenoise: bool = True,
                            seed: int = 0) -> np.ndarray:
    """(n_time, n_channels) synthetic neural data; seed-exact vs utils.py:170-219."""
    kernel_length = 50
    rng = np.random.default_rng(seed=seed)
    neural_data = rng.standard_normal((int(duration * rate), nchannels)) / 100.0
    kernel = np.ones(kernel_length) / kernel_length
    for ch in range(nchannels):
        neural_data[:, ch] = np.convolve(neural_data[:, ch], kernel, mode="same")
    neural_data /= neural_data.std() * 2.0

    if high_gamma or linenoise:
        t = np.linspace(0, duration, neural_data.shape[0])[:, np.newaxis]
    if high_gamma:
        phase = 2 * np.pi * rng.random(nchannels)[np.newaxis]
        hg = np.sin(2 * np.pi * t * 100.0 + phase)
        phase = 2 * np.pi * rng.random(nchannels)[np.newaxis]
        hg *= np.sin(2 * np.pi * t * 1.0 + phase) ** 2 + 0.2
        neural_data += hg
    if linenoise:
        weights = rng.standard_normal((1, nchannels))
        if rate > 120.0:
            for ii, hz in enumerate(np.arange(60.0, rate, 60.0)):
                neural_data += (np.sin(2 * np.pi * t * hz) / 2.0 ** (ii + 1)) * weights

    return neural_data


def to_packed_df(spark, X: np.ndarray, series_id: str = "ECoG_data"):
    """Dense block -> packed layout directly (one row per channel), skipping
    the long round-trip when the consumer is a kernel stage."""
    import pandas as pd

    n_time, n_ch = X.shape
    pdf = pd.DataFrame({
        "series_id": [series_id] * n_ch,
        "channel": np.arange(n_ch, dtype=np.int32),
        "values": [X[:, c].astype(np.float64) for c in range(n_ch)],
    })
    return spark.createDataFrame(
        pdf, "series_id STRING, channel INT, values ARRAY<DOUBLE>")


def to_long_df(spark, X: np.ndarray, series_id: str = "ECoG_data"):
    """Dense (n_time, n_channels) block -> long DataFrame
    (series_id STRING, channel INT, sample_idx BIGINT, value DOUBLE).

    Ships one packed row per channel through Arrow (n_ch rows, not
    n_time*n_ch — via to_packed_df, the ONE spelling of the packed-frame
    construction) and explodes to long JVM-side — ~10x faster ingest than
    materializing the long frame driver-side."""
    from pyspark.sql import functions as F

    return to_packed_df(spark, X, series_id).select(
        "series_id", "channel",
        F.posexplode("values").alias("sample_idx", "value"),
    ).withColumn("sample_idx", F.col("sample_idx").cast("bigint"))


def long_to_dense(df, series_id=None) -> np.ndarray:
    """Collect a long signals DataFrame back to a dense (n_time, n_channels)
    block (test-sized data only — this is a driver-side collect)."""
    if series_id is not None:
        df = df.filter(df.series_id == series_id)
    pdf = df.toPandas().sort_values(["sample_idx", "channel"])
    n_time = pdf["sample_idx"].nunique()
    n_ch = pdf["channel"].nunique()
    return pdf["value"].to_numpy().reshape(n_time, n_ch)


def electrodes_df(spark, nchannels: int = 4):
    """Electrode dimension table; fixture values per utils.py:245-251."""
    rows = [(i, 1.0, 2.0, 3.0, float(-i), "cortex", "none", "Grid")
            for i in range(nchannels)]
    return spark.createDataFrame(
        rows,
        "id INT, x DOUBLE, y DOUBLE, z DOUBLE, imp DOUBLE, "
        "location STRING, filtering STRING, group_name STRING")
