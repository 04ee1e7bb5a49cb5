"""Spark operators: layout repack, kernel carriers, CAR, z-score, and the
bounded-memory segmented kernels (the 100 TB path for long recordings)."""
from .car import car_column, car_df, subtract_car, subtract_car_packed
from .repack import pack, unpack
from .segmented import (segmented_band_kernel, segmented_kernel,
                        segmented_notch, segmented_resample,
                        segmented_wavelet_amp)
from .zscore import band_mean, zscore_baseline

__all__ = ["pack", "unpack", "subtract_car", "subtract_car_packed",
           "car_column", "car_df", "zscore_baseline", "band_mean",
           "segmented_kernel", "segmented_resample", "segmented_notch",
           "segmented_band_kernel", "segmented_wavelet_amp"]
