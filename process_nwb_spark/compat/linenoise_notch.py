"""Reference-compatible `process_nwb.linenoise_notch` module surface.

Parity: /root/reference/src/process_nwb/linenoise_notch.py:55-92.
"""
from __future__ import annotations

import numpy as np

from ..dsp import kernels as K


def apply_linenoise_notch(X, rate, fft=True, noise_hz=60., npad="fast",
                          precision="single"):
    """Notch `noise_hz` and its harmonics below Nyquist
    (linenoise_notch.py:55-92).

    Only the FFT path exists here (`fft=True`, the reference default): the
    reference's non-FFT branch builds per-notch FIR masks in a loop whose
    accumulation keeps only the LAST notch (linenoise_notch.py:80-87) —
    a bug this engine deliberately does not replicate (SURVEY.md §2A #7).
    """
    if not fft:
        raise NotImplementedError(
            "fft=False replicates a reference bug (last-notch-wins FIR "
            "accumulation, linenoise_notch.py:80-87) and is deliberately "
            "not implemented; use the default FFT path.")
    return K.apply_linenoise_notch(np.asarray(X), rate, noise_hz=noise_hz,
                                   npad=npad, precision=precision)
