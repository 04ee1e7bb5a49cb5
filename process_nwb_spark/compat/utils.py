"""Reference-compatible `process_nwb.utils` module surface.

Parity: /root/reference/src/process_nwb/utils.py:9-66 (dtype + filterbank
math), :170-219 (seed-exact synthetic data), :222-253 (NWB fixture,
env-gated).
"""
from __future__ import annotations

from ..dsp.filterbank import chang_sds, log_spaced_cfs  # noqa: F401
from ..dsp.filterbank import const_q_sds
from ..precision import cast_dtype
from ..synth import generate_synthetic_data  # noqa: F401  (seed-exact port)
from ._gate import require_pynwb


def dtype(X, precision):
    """Cast target for `precision` given X's complexness (utils.py:9-31)."""
    return cast_dtype(X, precision)


def const_Q_sds(cfs, Q=8):
    """Constant-Q bandwidths (utils.py:49-59; reference capitalization)."""
    return const_q_sds(cfs, Q=Q)


def generate_nwbfile(nchannels=4):
    """NWB fixture builder (utils.py:222-253) — env-gated; the electrode
    table itself is available as synth.electrodes_df (same values)."""
    require_pynwb(
        "generate_nwbfile",
        "synth.electrodes_df(spark, nchannels) for the electrode dim table "
        "+ synth.to_long_df for the acquisition")
