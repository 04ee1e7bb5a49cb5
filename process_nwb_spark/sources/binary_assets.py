"""Raw binary asset ingest — the `binaryFile` source as the front door of
the multimodal tier (SURVEY.md §2C "Scans/sources"; brief: image/audio/video
as opaque binary columns with typed metadata).

`spark.read.format("binaryFile")` lists the directory tree distributed,
yields one row per file (path, modificationTime, length, content) and never
decodes anything — ideal for shipping opaque blobs to the mapInPandas
feature kernels in llm/multimodal.py. Files are unit-of-parallelism (the
format is per-file, not splittable); at 100 TB you ingest millions of small
objects, so the listing itself is distributed and
`spark.sql.files.maxPartitionBytes` packs many small files per task.
`pathGlobFilter` prunes by extension at listing time (no bytes read for
filtered-out files); `recursiveFileLookup` walks nested prefixes.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_EXT_MODALITY = {
    "image": ("png", "jpg", "jpeg", "bmp", "gif", "webp"),
    "audio": ("wav", "flac", "mp3", "ogg"),
    "video": ("mp4", "avi", "mkv", "webm"),
}


def read_binary_assets(spark: SparkSession, path: str,
                       glob: str | None = None,
                       recursive: bool = False) -> DataFrame:
    """Ingest a directory of opaque media files.

    Returns (asset_id BIGINT, path STRING, modality STRING, length BIGINT,
    payload BINARY) — asset_id is xxhash64(path) so downstream joins and
    dedup run on an 8-byte key instead of the full path string.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    ext = F.lower(F.regexp_extract("path", r"\.([A-Za-z0-9]+)$", 1))
    modality = F.lit("binary")
    for mod, exts in _EXT_MODALITY.items():
        modality = F.when(ext.isin(*exts), mod).otherwise(modality)
    return df.select(
        F.xxhash64("path").alias("asset_id"),
        "path",
        modality.alias("modality"),
        "length",
        F.col("content").alias("payload"),
    )


def assets_to_multimodal(assets: DataFrame) -> DataFrame:
    """Adapt ingested assets to llm/multimodal.py's MULTIMODAL_SCHEMA so the
    feature-extraction kernels run unchanged on real files. Metadata that a
    real decoder would read from the container header is derived
    deterministically from the payload length (same convention as
    multimodal.attach_payloads)."""
    n_bytes = F.col("length")
    meta = F.struct(
        (F.abs(F.col("asset_id")) % 640 + 32).cast("int").alias("width"),
        (F.abs(F.col("asset_id")) % 480 + 32).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (n_bytes.cast("double") / 1000.0).alias("duration_s"),
        F.lit(30.0).alias("fps"),
        (n_bytes % 240 + 8).cast("int").alias("n_frames"),
    )
    return assets.select(
        F.col("asset_id").alias("doc_id"), "modality",
        "payload", meta.alias("meta"))
