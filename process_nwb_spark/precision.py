"""Precision policy: 'single' -> float32/complex64, 'double' -> float64/complex128.

Mirrors the reference's two-precision type system
(/root/reference/src/process_nwb/utils.py:9-31) but re-expressed for a
Spark engine: DataFrame columns carry DoubleType/FloatType, while the
numpy dtype policy applies inside Arrow-batched kernels.
"""
from __future__ import annotations

import numpy as np

_REAL = {"single": np.float32, "double": np.float64}
_COMPLEX = {"single": np.complex64, "double": np.complex128}


def check_precision(precision: str) -> str:
    p = precision.lower()
    if p not in _REAL:
        raise ValueError(
            f"`precision` should be either `single` or `double`. Got {precision}."
        )
    return p


def real_dtype(precision: str) -> np.dtype:
    return np.dtype(_REAL[check_precision(precision)])


def complex_dtype(precision: str) -> np.dtype:
    return np.dtype(_COMPLEX[check_precision(precision)])


def cast_dtype(X: np.ndarray, precision: str) -> np.dtype:
    """dtype to cast `X` to under `precision` (complex-aware)."""
    if np.iscomplexobj(X):
        return complex_dtype(precision)
    return real_dtype(precision)
