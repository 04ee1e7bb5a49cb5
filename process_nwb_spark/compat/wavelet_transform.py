"""Reference-compatible `process_nwb.wavelet_transform` module surface.

Parity: /root/reference/src/process_nwb/wavelet_transform.py:15-113 (kernel
builders), :238-322 (transform, delegated), :325-444 (NWB store, env-gated).
"""
from __future__ import annotations

from ..dsp import filterbank as FB
from ..dsp import kernels as K
from ._gate import require_pynwb


def gaussian(n_time, rate, center, sd, precision="single"):
    """Unit-L2 Gaussian frequency-domain kernel (wavelet_transform.py:15-37)."""
    return FB.gaussian_kernel(n_time, rate, center, sd, precision=precision)


def hamming(n_time, rate, min_freq, max_freq, precision="single"):
    """Hamming band kernel (wavelet_transform.py:40-71)."""
    return FB.hamming_kernel(n_time, rate, min_freq, max_freq,
                             precision=precision)


def get_filterbank(filters, n_time, rate, hg_only, precision="single"):
    """(kernels, cfs, sds) for a named filter bank with the Nyquist guard
    (wavelet_transform.py:74-113)."""
    return FB.get_filterbank(filters, n_time, rate, hg_only,
                             precision=precision)


def wavelet_transform(X, rate, filters="rat", hg_only=True, X_fft_h=None,
                      npad="fast", to_removes=None, precision="single"):
    """Analytic Morlet decomposition -> (Xh, X_fft_h, cfs, sds)
    (wavelet_transform.py:238-322); X_fft_h reuse and the DC-zeroed
    Heaviside match the reference."""
    return K.wavelet_transform(X, rate, filters=filters, hg_only=hg_only,
                               X_fft_h=X_fft_h, npad=npad,
                               to_removes=to_removes, precision=precision)


def store_wavelet_transform(elec_series, processing, filters="rat",
                            hg_only=True, abs_only=True, npad="fast",
                            post_resample_rate=None, chunked=True,
                            precision="single", source_series=None):
    """NWB store path (wavelet_transform.py:325-444) — env-gated. The
    phase+resample rejection lives in the Spark-native face
    (operators.kernel_ops.wavelet_op)."""
    require_pynwb(
        "store_wavelet_transform",
        "operators.kernel_ops.wavelet_op(abs_only=..., "
        "post_resample_rate=...) persisted with sources.catalog."
        "SignalCatalog under the 'wvlt_amp_'/'wvlt_phase_' lineage names "
        "(chunked writing = operators/segmented.py + partitioned parquet)")
