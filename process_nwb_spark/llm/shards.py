"""Training-shard export: the sink end of the corpus pipeline.

A training dataloader wants a FIXED set of similarly-sized shard files it
can assign to workers, plus a manifest to checksum / subset / resume from.
At 100 TB that means: deterministic shard assignment (re-running the
export on the same corpus reproduces the same shard membership — no
round-robin, no task-count dependence), shard-atomic files (one file per
shard, never a shard split across files), and a manifest computed in the
same engine pass, not by listing output directories.

Spark-first shape:
- shard id = xxhash64(key) mod n_shards — a pure projection, no shuffle,
  reproducible across runs/cluster sizes (unlike monotonically_increasing_id
  or round-robin repartition, both task-layout-dependent);
- one `repartition(n_shards, shard)` so every shard's rows land in one
  task (rows of a shard hash identically, so shards are partition-atomic;
  a partition may carry several shards — partitionBy still splits them
  into their own directories, one file each);
- manifest = one groupBy over the same shard column: row count, byte/token
  sums, and an order-insensitive content checksum (sum of per-row
  xxhash64), so two exports can be diffed without reading data files.

Scale note: n_shards bounds write parallelism (one task per shard wave);
pick n_shards >= cluster cores, and ~shard_size = corpus/n_shards well
under executor memory. Hash sharding balances rows to ~1/sqrt(rows/shard)
relative skew; token-balance rides the law of large numbers at real shard
sizes (millions of docs per shard).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard"


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard assignment: pmod(xxhash64(key), n) projection."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        .cast("int"))


def shard_manifest(sharded: DataFrame, key_col: str,
                   size_cols: tuple = ()) -> DataFrame:
    """Per-shard stats off the sharded frame (same engine, one groupBy):
    rows, optional size-column sums, and an order-insensitive content
    checksum (sum of pmod-bounded xxhash64 over all non-shard columns)."""
    # sorted: the read-back frame appends the partition column last, so a
    # positional column list would hash write-side and verify-side frames
    # differently
    data_cols = sorted(c for c in sharded.columns if c != SHARD_COL)
    # pmod-bound each row hash so the SUM cannot overflow bigint even at
    # 2^31 rows/shard (ANSI or not, an overflowing fingerprint is useless)
    row_hash = F.pmod(F.xxhash64(*data_cols), F.lit(2**31))
    aggs = [F.count(F.lit(1)).alias("rows"),
            F.sum(row_hash).alias("content_hash"),
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key")]
    for c in size_cols:
        aggs.append(F.sum(F.col(c).cast("double")).alias(f"sum_{c}"))
    return sharded.groupBy(SHARD_COL).agg(*aggs)


def export_training_shards(df: DataFrame, path: str, key_col: str,
                           n_shards: int,
                           size_cols: tuple = ()) -> DataFrame:
    """Write `df` as n_shards shard-atomic parquet directories plus a
    `_manifest` table; returns the manifest DataFrame (already written).

    Layout:  path/shard=K/part-*.parquet   (exactly one data file per K)
             path/_manifest/               (n_shards rows; the leading
             underscore keeps Spark's file listing from picking it up as
             data — the shard partition dirs deliberately do NOT start
             with "_" for the same reason, hidden-path filtering)

    Deterministic + idempotent: same input -> same shard membership and
    same manifest checksums; mode=overwrite replaces both atomically
    enough for a rerun (parquet overwrite per directory).

    The manifest is derived from the WRITTEN files, not the input frame:
    re-running the input lineage for a second aggregation would execute
    the whole upstream pipeline (curation gates, dedup, embedding) twice
    — at export scale that doubles the job — and a nondeterministic
    upstream could then stamp a manifest that disagrees with the data on
    disk. The parquet re-read is one columnar scan of exactly what
    shipped. To additionally check disk against the INPUT corpus, use
    verify_against_corpus (full lineage recompute, explicit opt-in).
    """
    sharded = with_shard(df, key_col, n_shards)
    # shard-atomic: all rows of a shard hash to the same partition, so the
    # partitionBy write emits ONE file per shard directory
    (sharded.repartition(n_shards, SHARD_COL)
     .write.mode("overwrite").partitionBy(SHARD_COL).parquet(path))
    manifest = shard_manifest(df.sparkSession.read.parquet(path), key_col,
                              size_cols)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest"))
    return manifest


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard, via partition pruning (no full-corpus listing/scan)."""
    return (spark.read.parquet(path)
            .filter(F.col(SHARD_COL) == shard))


def _manifests_agree(stored: DataFrame, fresh: DataFrame) -> bool:
    j = (stored.alias("s").join(fresh.alias("f"), SHARD_COL, "full_outer")
         .where((F.col("s.rows").isNull()) | (F.col("f.rows").isNull())
                | (F.col("s.rows") != F.col("f.rows"))
                | (F.col("s.content_hash") != F.col("f.content_hash"))))
    return j.limit(1).count() == 0


def verify_export(spark: SparkSession, path: str, key_col: str) -> bool:
    """Integrity gate: re-derive the manifest from the WRITTEN files and
    compare row counts + checksums against the stored manifest — catches
    lost/corrupted/tampered shard files before downstream work resumes.
    (Files vs stored manifest only; it does NOT re-check the input corpus
    — that is verify_against_corpus.)"""
    stored = spark.read.parquet(os.path.join(path, "_manifest"))
    fresh = shard_manifest(spark.read.parquet(path), key_col)
    return _manifests_agree(stored, fresh)


def verify_against_corpus(df: DataFrame, path: str, key_col: str,
                          n_shards: int) -> bool:
    """Provenance gate: recompute the manifest from the INPUT corpus
    (full upstream lineage re-execution — expensive by design) and compare
    against the stored manifest. True means the export still matches what
    the input lineage produces today; False means the corpus or its
    pipeline changed since the export (or the write dropped data)."""
    spark = df.sparkSession
    stored = spark.read.parquet(os.path.join(path, "_manifest"))
    fresh = shard_manifest(with_shard(df, key_col, n_shards), key_col)
    return _manifests_agree(stored, fresh)
