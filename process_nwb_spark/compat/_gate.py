"""Shared env-gate for the compat layer's NWB-object entry points."""
from __future__ import annotations


def require_pynwb(fn_name: str, spark_equivalent: str):
    """Raise the documented environment gate for a `store_*`-style API.

    The reference's store functions take live pynwb objects
    (ElectricalSeries + Processing module) and write HDF5; pynwb/h5py are
    not installed here and the NWB write path is deliberately not
    reimplemented blind (sources/nwb.py:22-41 documents the landing
    workaround: ingest NWB where pynwb exists, land long-layout parquet,
    run this engine on that)."""
    try:
        import pynwb  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"{fn_name} writes to NWB via pynwb/h5py, which are not "
            f"installed in this environment. Land the recording as "
            f"long-layout parquet (see sources/nwb.py) and use the "
            f"Spark-native equivalent: {spark_equivalent}.") from None
    raise NotImplementedError(
        f"{fn_name}: pynwb is importable here, but the compat layer only "
        f"covers the in-memory numerical API; use the reference package "
        f"for NWB file I/O or the Spark-native equivalent: "
        f"{spark_equivalent}.")
