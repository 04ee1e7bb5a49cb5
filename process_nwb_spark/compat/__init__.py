"""Drop-in import-compatibility layer: the reference package's public
module layout and signatures, delegating to this engine's kernels.

A process_nwb user's imports keep working after swapping the package root:

    from process_nwb_spark.compat import preprocess_block
    from process_nwb_spark.compat.resample import resample, resample_func
    from process_nwb_spark.compat.common_referencing import CAR, subtract_CAR
    from process_nwb_spark.compat.linenoise_notch import apply_linenoise_notch
    from process_nwb_spark.compat.wavelet_transform import wavelet_transform
    from process_nwb_spark.compat.utils import generate_synthetic_data

Pure functions (the whole numerical API) delegate to dsp/ and are
bit-compatible with the reference math (see dsp/kernels.py parity
citations). NWB-object functions (`store_*`, `preprocess_block`,
`generate_nwbfile`) require pynwb/h5py, which this environment does not
ship — they raise with the Spark-native equivalent spelled out
(sources/nwb.py documents the parquet landing workaround; the engine's
own faces are operators/kernel_ops.py + pipelines.py + sources/catalog.py).

Mirrors /root/reference/src/process_nwb/__init__.py:1-4.
"""
from .pipelines import preprocess_block, store_linenoise_notch_CAR

__all__ = ["preprocess_block", "store_linenoise_notch_CAR"]
