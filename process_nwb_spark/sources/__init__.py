"""Sources/sinks: partitioned-parquet signal catalog + gated NWB boundary."""
from .catalog import SignalCatalog, save_preprocess_result
from .nwb import read_nwb_series, series_to_long

__all__ = ["SignalCatalog", "save_preprocess_result", "read_nwb_series",
           "series_to_long"]
