"""Morlet filterbank construction (driver-side math + a Spark dimension table).

Behavioral parity targets:
- center freqs / bandwidths: /root/reference/src/process_nwb/utils.py:34-73
- gaussian/hamming kernels: wavelet_transform.py:15-71
- filterbank spec + hg subselect + Nyquist guard: wavelet_transform.py:74-139

The band list is tiny (<= 54 rows): it is built on the driver and used as a
broadcast dimension table (`bands_df`), which is the Spark-native shape of
the reference's band table (wavelet_transform.py:438-441).
"""
from __future__ import annotations

import numpy as np

from ..precision import real_dtype

HG_MIN, HG_MAX = 70.0, 150.0

FILTERSETS = ("rat", "human", "changlab")


def log_spaced_cfs(fmin: float, fmax: float, ncfs: int) -> np.ndarray:
    """Log-spaced center frequencies. Parity: utils.py:34-46."""
    return np.logspace(np.log10(fmin), np.log10(fmax), ncfs)


def const_q_sds(cfs: np.ndarray, Q: float = 8.0) -> np.ndarray:
    """Constant-Q bandwidths. Parity: utils.py:49-59."""
    return np.asarray(cfs) / Q


def chang_sds(cfs: np.ndarray) -> np.ndarray:
    """Chang-lab variable bandwidths. Parity: utils.py:62-73."""
    scale = 0.39
    return 10.0 ** (np.log10(scale) + 0.5 * np.log10(np.asarray(cfs))) * np.sqrt(2.0)


def gaussian_kernel(n_time: int, rate: float, center: float, sd: float,
                    precision: str = "single") -> np.ndarray:
    """L2-normalized Gaussian frequency-domain kernel on the fftfreq grid.

    Parity: wavelet_transform.py:15-37.
    """
    freq = np.fft.fftfreq(n_time, 1.0 / rate)
    k = np.exp(-((np.abs(freq) - center) ** 2) / (2.0 * sd ** 2))
    k /= np.linalg.norm(k)
    return k.astype(real_dtype(precision), copy=False)


def hamming_kernel(n_time: int, rate: float, min_freq: float, max_freq: float,
                   precision: str = "single") -> np.ndarray:
    """L2-normalized Hamming band kernel (positive + negative freq windows).

    Parity: wavelet_transform.py:40-71.
    """
    freq = np.fft.fftfreq(n_time, 1.0 / rate)
    k = np.zeros(len(freq))
    pos = (freq >= min_freq) & (freq <= max_freq)
    neg = (freq <= -min_freq) & (freq >= -max_freq)
    k[pos] = np.hamming(np.count_nonzero(pos))
    k[neg] = np.hamming(np.count_nonzero(neg))
    k /= np.linalg.norm(k)
    return k.astype(real_dtype(precision), copy=False)


def gaussian_raw_norm(n_time: int, rate: float, center: float,
                      sd: float) -> float:
    """L2 norm of the UNnormalized Gaussian kernel on the fftfreq grid of
    `n_time` — the grid-resolution-dependent constant that
    gaussian_kernel's unit-L2 normalization divides away. ~sqrt(n*sd/rate):
    this is exactly why wavelet amplitudes depend on the FFT length (see
    kernels.dense_kernel_norms)."""
    freq = np.fft.fftfreq(int(n_time), 1.0 / rate)
    k = np.exp(-((np.abs(freq) - center) ** 2) / (2.0 * sd ** 2))
    return float(np.linalg.norm(k))


def band_params(filters: str, hg_only: bool):
    """(cfs, sds) for a named filterset, hg-filtered.

    Parity: wavelet_transform.py:104-133 ('rat' 54 bands 2.6308-1200 Hz,
    'human'/'changlab' 40 bands 4.0749286538265-200 Hz; hg keeps
    70 <= cf <= 150 -> rat 6, human/changlab 8).
    """
    if filters in ("human", "changlab"):
        cfs = log_spaced_cfs(4.0749286538265, 200.0, 40)
    elif filters == "rat":
        cfs = log_spaced_cfs(2.6308, 1200.0, 54)
    else:
        raise NotImplementedError(f"unknown filterset {filters!r}")
    if hg_only:
        cfs = cfs[(cfs >= HG_MIN) & (cfs <= HG_MAX)]
    if filters in ("rat", "human"):
        sds = const_q_sds(cfs)
    else:
        sds = chang_sds(cfs)
    return cfs, sds


def check_nyquist(cfs: np.ndarray, rate: float) -> None:
    """Raise if the filterbank exceeds Nyquist. Parity: wavelet_transform.py:121-125."""
    if cfs.max() * 2.0 > np.nextafter(rate, np.inf):
        raise ValueError(
            f"Unable to compute wavelet transform above Nyquist rate "
            f"({cfs.max() * 2.0} Hz). Increase your rate ({rate} Hz) to at "
            f"least twice your desired maximum frequency of interest."
        )


def get_filterbank(filters, n_time: int, rate: float, hg_only: bool,
                   precision: str = "single"):
    """(kernels, cfs, sds); `filters` may be a prebuilt list (passes through).

    Parity: wavelet_transform.py:74-139.
    """
    if isinstance(filters, list):
        return filters, None, None
    cfs, sds = band_params(filters, hg_only)
    check_nyquist(cfs, rate)
    kernels = [gaussian_kernel(n_time, rate, cf, sd, precision=precision)
               for cf, sd in zip(cfs, sds)]
    return kernels, cfs, sds


def bands_df(spark, filters: str = "rat", hg_only: bool = True):
    """The filterbank as a Spark dimension table:
    (filterset STRING, band INT, cf DOUBLE, sd DOUBLE, hg BOOLEAN).

    Built on the driver (<= 54 rows), intended for broadcast joins.
    """
    cfs, sds = band_params(filters, hg_only)
    rows = [(filters, i, float(cf), float(sd), bool(HG_MIN <= cf <= HG_MAX))
            for i, (cf, sd) in enumerate(zip(cfs, sds))]
    return spark.createDataFrame(
        rows, "filterset STRING, band INT, cf DOUBLE, sd DOUBLE, hg BOOLEAN")
