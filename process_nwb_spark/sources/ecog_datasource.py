"""`ecog_synth` — a custom PySpark DataSource (Spark 4 Python Data Source
API) exposing the deterministic synthetic-ECoG generator (synth.py, parity
utils.py:170-219) as a first-class partitioned, filter-pushdown-capable
batch source AND a replayable micro-batch streaming source.

This is the engine's answer to the reference's NWB/HDF5 acquisition layer
(pipelines.py:55-65): recordings enter Spark as a *source* you `spark.read`
— schema'd, split into one task per channel, channel-predicate-prunable —
instead of a driver-side array import.

    spark.dataSource.register(EcogSynthDataSource)
    df = (spark.read.format("ecog_synth")
          .option("duration", 2.0).option("nchannels", 8)
          .option("rate", 2000.0).load())
    df.filter(df.channel == 3)   # scans ONE partition, not 8

Scale notes: partition = channel, the same unit the rest of the engine
groups on, so a downstream `groupBy(series_id, channel)` kernel reads an
already-aligned split. Each task regenerates the full (n_time, n_ch) block
to stay seed-exact with the reference's single-RNG draw order and slices
its channel — generation cost is O(n_time * n_ch) per task, which is fine
for a fixture source; a production acquisition source would read only its
channel's bytes. Rows leave the reader as Arrow RecordBatches (the fast
path the API offers), not per-row tuples.
"""
from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader, EqualTo,
                                    Filter, In, InputPartition,
                                    SimpleDataSourceStreamReader)

SCHEMA = "series_id string, channel int, sample_idx bigint, value double"


def _params(options) -> dict:
    return {
        "duration": float(options.get("duration", 1.0)),
        "nchannels": int(options.get("nchannels", 4)),
        "rate": float(options.get("rate", 2000.0)),
        "seed": int(options.get("seed", 0)),
        "series_id": options.get("series_id", "ECoG_data"),
    }


def _block(p: dict):
    """The full dense block, regenerated deterministically per call."""
    from ..synth import generate_synthetic_data

    return generate_synthetic_data(p["duration"], p["nchannels"], p["rate"],
                                   seed=p["seed"])


class _ChannelPartition(InputPartition):
    def __init__(self, channel: int):
        self.channel = channel


class EcogSynthReader(DataSourceReader):
    """Batch reader: one partition per channel; EqualTo/In filters on
    `channel` prune partitions at plan time (pushFilters)."""

    def __init__(self, options):
        self.p = _params(options)
        self.keep: set[int] | None = None  # None = all channels

    def pushFilters(self, filters):
        for f in filters:
            col = getattr(f, "attribute", None)
            if isinstance(f, EqualTo) and col == ("channel",):
                wanted = {int(f.value)}
            elif isinstance(f, In) and col == ("channel",):
                wanted = {int(v) for v in f.value}
            else:
                yield f  # not ours — Spark evaluates it post-scan
                continue
            self.keep = wanted if self.keep is None else (self.keep & wanted)

    def partitions(self):
        chans = range(self.p["nchannels"])
        if self.keep is not None:
            chans = [c for c in chans if c in self.keep]
        return [_ChannelPartition(c) for c in chans]

    def read(self, partition: _ChannelPartition):
        import numpy as np
        import pyarrow as pa

        X = _block(self.p)
        c = partition.channel
        n = X.shape[0]
        yield pa.record_batch({
            "series_id": pa.array([self.p["series_id"]] * n),
            "channel": pa.array(np.full(n, c, dtype=np.int32)),
            "sample_idx": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(X[:, c].astype(np.float64)),
        })


class EcogSynthStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch replay: offset = sample-block index; each batch emits
    `block_len` samples across ALL channels (the acquisition layout the
    streaming pipeline needs for exact in-batch CAR). Deterministic, so
    readBetweenOffsets replays identically after a restart."""

    def __init__(self, options):
        self.p = _params(options)
        self.block_len = int(options.get("block_len", 1024))
        n_time = int(self.p["duration"] * self.p["rate"])
        self.n_blocks = -(-n_time // self.block_len)

    def initialOffset(self) -> dict:
        return {"block": 0}

    def _rows(self, b: int):
        X = _block(self.p)
        lo = b * self.block_len
        hi = min(lo + self.block_len, X.shape[0])
        sid = self.p["series_id"]
        # materialized list, not a generator: the runner's prefetch cache
        # copy.copy()s the iterator, which plain generators don't support
        return [(sid, c, lo + i, float(X[lo + i, c]))
                for c in range(self.p["nchannels"])
                for i in range(hi - lo)]

    def read(self, start: dict):
        b = int(start["block"])
        if b >= self.n_blocks:
            return iter([]), start
        return iter(self._rows(b)), {"block": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out = []
        for b in range(int(start["block"]), int(end["block"])):
            out.extend(self._rows(b))
        return iter(out)


class EcogSynthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ecog_synth"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> EcogSynthReader:
        return EcogSynthReader(self.options)

    def simpleStreamReader(self, schema) -> EcogSynthStreamReader:
        return EcogSynthStreamReader(self.options)
