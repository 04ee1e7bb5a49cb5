"""Signal catalog: named, lineage-tracked parquet tables — the Spark
replacement for the reference's NWB processing-module namespace
(pipelines.py:67-68) and its name-mangled derived series
('downsampled_'+name resample.py:196, 'CAR_ln_'+name pipelines.py:148,
'wvlt_amp_'+name wavelet_transform.py:389).

Storage mapping (SURVEY.md §1.2): HDF5 + gzip/shuffle/fletcher32 ->
partitioned snappy parquet (columnar, compressed, checksummed). Long
signal tables partition by (series_id, channel): partition pruning makes
single-channel reads O(channel), and kernel stages repartition-free when
the read matches their grouping. Time-frequency tables add `band`.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

LINEAGE_PREFIXES = ("downsampled_", "CAR_ln_", "CAR_of_",
                    "wvlt_amp_", "wvlt_phase_")


class SignalCatalog:
    """Directory-backed catalog of named signal tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str,
              partition_by: tuple = ("series_id", "channel"),
              mode: str = "overwrite") -> str:
        cols = [c for c in partition_by if c in df.columns]
        writer = df.write.mode(mode)
        if cols:
            writer = writer.partitionBy(*cols)
        path = self._path(name)
        writer.parquet(path)
        return path

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def register(self, name: str) -> DataFrame:
        df = self.read(name)
        df.createOrReplaceTempView(name)
        return df

    def tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(d for d in os.listdir(self.root)
                      if os.path.isdir(os.path.join(self.root, d)))

    def write_bucketed(self, df: DataFrame, name: str, bucket_col: str,
                       n_buckets: int = 8) -> None:
        """Bucketed + sorted managed table: joins and aggregations on the
        bucket column become shuffle-FREE (co-located, Exchange-less) —
        the pre-partitioning strategy for repeatedly-joined 100 TB facts.
        Requires a warehouse (saveAsTable); see test_bucketed_join_no_shuffle
        for the plan proof."""
        (df.write.mode("overwrite")
         .bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
         .option("path", self._path(f"_bucketed_{name}"))
         .saveAsTable(name))

    def drop(self, name: str) -> None:
        """DROP TABLE analog of scripts/copy_strip (strips derived series).

        Covers both storage forms: the plain parquet directory (write())
        AND the bucketed managed table (write_bucketed stores data under
        _bucketed_<name> plus a metastore entry — dropping only the plain
        path would leave the data AND a stale catalog entry behind, and a
        later saveAsTable under the same name would resolve to old data)."""
        import shutil

        shutil.rmtree(self._path(name), ignore_errors=True)
        shutil.rmtree(self._path(f"_bucketed_{name}"), ignore_errors=True)
        self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")

    def drop_derived(self) -> list[str]:
        """copy_strip semantics: remove every lineage-derived table, keep
        raw acquisitions (copy_strip:22-30)."""
        dropped = [t for t in self.tables()
                   if t.startswith(LINEAGE_PREFIXES)]
        for t in dropped:
            self.drop(t)
        return dropped


def save_preprocess_result(catalog: SignalCatalog, result,
                           base_name: str = "ECoG") -> dict[str, str]:
    """Persist a PreprocessResult's stages under reference lineage names —
    the `all_steps=True` analog (pipelines.py:69-82)."""
    out = {}
    for stage, df in result.stages.items():
        name = f"{stage}_{base_name}"
        part = ("series_id", "channel", "band") if "band" in df.columns \
            else ("series_id", "channel")
        out[name] = catalog.write(df, name, partition_by=part)
    return out
