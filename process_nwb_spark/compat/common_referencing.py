"""Reference-compatible `process_nwb.common_referencing` module surface.

Parity: /root/reference/src/process_nwb/common_referencing.py:11-68 (pure,
delegated) and :71-113 (NWB store, env-gated).
"""
from __future__ import annotations

import numpy as np

from ..dsp import kernels as K
from ._gate import require_pynwb


def CAR(X, mean_frac=.95, round_func=np.ceil, precision="single"):
    """Trimmed-mean common average reference, (n_time, 1)
    (common_referencing.py:11-42)."""
    return K.car(np.asarray(X), mean_frac=mean_frac, round_func=round_func,
                 precision=precision)


def subtract_CAR(X, mean_frac=.95, round_func=np.ceil, precision="single"):
    """X minus its CAR (common_referencing.py:45-68)."""
    return K.subtract_car(np.asarray(X), mean_frac=mean_frac,
                          round_func=round_func, precision=precision)


def store_subtract_CAR(elec_series, processing, mean_frac=.95,
                       round_func=np.ceil, precision="single"):
    """NWB store path (common_referencing.py:71-113) — env-gated."""
    require_pynwb(
        "store_subtract_CAR",
        "operators.car.subtract_car_packed (or the Catalyst "
        "operators.car.subtract_car window form), persisted with "
        "sources.catalog.SignalCatalog under the 'CAR_'/'CAR_of_' "
        "lineage names")
