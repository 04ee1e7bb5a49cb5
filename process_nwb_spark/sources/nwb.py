"""NWB/HDF5 ingestion boundary.

The reference reads `ElectricalSeries` from NWB HDF5 files via pynwb/h5py
(pipelines.py:55-65). Neither library ships in this environment, so the
HDF5 touchpoints are import-gated: `read_nwb_series` raises a clear error
unless pynwb is installed, and `series_to_long` — the part that matters to
the engine — converts any dense (n_time, n_channels) block + metadata into
the engine's long DataFrame, which IS tested (via synthetic fixtures).

At scale the real ingest path is: one driver/task per .nwb file (the
`preprocess_folder` analog, scripts/preprocess_folder:38-54 — series_id is
just another group key), h5py chunked reads -> Arrow batches -> a
partitioned parquet landing table via SignalCatalog, after which every
engine stage runs on parquet splits, never HDF5.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not installed in this container
    import pynwb  # type: ignore
    HAVE_PYNWB = True
except ImportError:
    pynwb = None
    HAVE_PYNWB = False


def read_nwb_series(spark: SparkSession, path: str,
                    acq_name: str = "ECoG") -> DataFrame:
    """Read an ElectricalSeries from an NWB file into the long layout.

    Mirrors the acquisition lookup with legacy fallback
    (pipelines.py:62-65). Requires pynwb."""
    if not HAVE_PYNWB:
        raise NotImplementedError(
            "pynwb/h5py are not installed in this environment; ingest NWB "
            "on a machine with pynwb, land to parquet via "
            "sources.catalog.SignalCatalog, then run the engine on parquet")
    with pynwb.NWBHDF5IO(path, "r") as io:  # pragma: no cover
        nwbfile = io.read()
        try:
            series = nwbfile.acquisition[acq_name]
        except KeyError:
            series = nwbfile.acquisition["Raw"][acq_name]
        X = series.data[:]
        if series.rate is None:
            # NWB allows timestamp-based ElectricalSeries (explicit
            # `timestamps`, no sampling rate); the engine's fixed-rate
            # long layout can't represent irregular sampling, so refuse
            # clearly instead of float(None)'s bare TypeError
            raise ValueError(
                f"{acq_name!r} carries explicit timestamps instead of a "
                f"sampling rate; resample it to a fixed rate before "
                f"landing (the long layout's sample_idx assumes uniform "
                f"sampling)")
        rate = float(series.rate)
        start = float(series.starting_time or 0.0)
    return series_to_long(spark, np.asarray(X), series_id=acq_name,
                          rate=rate, starting_time=start)


def series_to_long(spark: SparkSession, X: np.ndarray, series_id: str,
                   rate: float | None = None,
                   starting_time: float = 0.0) -> DataFrame:
    """Dense block + series metadata -> long signals DataFrame. When `rate`
    is given, an event-time column is derived (starting_time + idx/rate),
    the uniform-sampling metadata contract of SURVEY.md §1.1."""
    from pyspark.sql import functions as F

    from ..synth import to_long_df

    df = to_long_df(spark, X, series_id=series_id)
    if rate is not None:
        df = df.withColumn(
            "t", F.lit(starting_time) + F.col("sample_idx") / F.lit(rate))
    return df


def series_metadata(series_id: str, rate: float, starting_time: float = 0.0,
                    description: str = "") -> dict:
    """The series dimension-row (rate/starting_time carried as metadata,
    resample.py:202-203)."""
    return {"series_id": series_id, "rate": rate,
            "starting_time": starting_time, "description": description}
