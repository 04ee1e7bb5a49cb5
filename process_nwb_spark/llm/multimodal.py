"""Multimodal column plumbing: image/audio/video as opaque BINARY payloads
with typed metadata, processed by Arrow-batched `mapInPandas` kernels.

The real codecs (PIL/libsndfile/ffmpeg) are absent from this container, so
the decode step is a deterministic fake (`_fake_decode_*`, seeded by a
payload content hash) behind a clearly marked seam — swap `_DECODERS` for
real codec calls and nothing else changes. Everything Spark-side IS real
and tested: schemas, binary handling through Arrow, batch iteration shape,
partitioning, and the metadata contract.

Scale notes: payloads stay opaque bytes end-to-end (no JVM-side decode, no
string conversion); `mapInPandas` streams Arrow record batches so executor
memory is bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` times
payload size, not by partition size; feature extraction is narrow (no
shuffle) and composes with the dedup/similarity ops downstream (e.g. CLIP
embeddings -> embed_lsh buckets).
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- schemas (the public contract) -----------------------------------------

MULTIMODAL_SCHEMA = (
    "doc_id BIGINT, modality STRING, payload BINARY, "
    "meta STRUCT<width: INT, height: INT, channels: INT, "
    "sample_rate: INT, duration_s: DOUBLE, fps: DOUBLE, n_frames: INT>"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, channels INT, "
    "n_bytes INT, content_hash STRING, features ARRAY<FLOAT>"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_id BIGINT, sample_rate INT, duration_s DOUBLE, "
    "n_bytes INT, content_hash STRING, mel_mean ARRAY<FLOAT>"
)

FRAME_SAMPLE_SCHEMA = (
    "doc_id BIGINT, frame_idx INT, ts_s DOUBLE, frame_hash STRING"
)

_N_IMG_FEATURES = 16
_N_MEL = 8


# -- deterministic fake decoders (the codec seam) ---------------------------

def _content_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return np.random.default_rng(seed)


def _fake_decode_image(payload: bytes, n: int = _N_IMG_FEATURES) -> np.ndarray:
    """Stand-in for decode->resize->pool. Real impl: PIL.Image.open(BytesIO),
    .resize(), channel-mean pooling. Deterministic in the payload bytes."""
    return _content_rng(payload).random(n, dtype=np.float64).astype(np.float32)


def _fake_decode_audio(payload: bytes, n: int = _N_MEL) -> np.ndarray:
    """Stand-in for pcm-decode -> mel filterbank -> time-mean."""
    return _content_rng(payload).normal(size=n).astype(np.float32)


def decode_real(payload: bytes):  # pragma: no cover - documentation seam
    """The real-codec entry point. Not available in this container."""
    raise NotImplementedError(
        "image/audio codecs (PIL/soundfile/ffmpeg) are not installed; "
        "the pipeline uses deterministic fake decoders instead")


# -- payload builders (turn testdata into multimodal fixtures) --------------

def attach_payloads(documents: DataFrame) -> DataFrame:
    """documents -> multimodal rows: the utf-8 text bytes act as the opaque
    blob; modality round-robins by doc_id; metadata is derived
    deterministically so tests and oracles can recompute it."""
    payload = F.encode("text", "utf-8")
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # doc_id (e.g. an xxhash64-derived key, negative half the time) would
    # index 0 (runtime error) or -1 (silently 'video' via from-the-end
    # indexing)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"))
    n_bytes = F.octet_length(payload)
    meta = F.struct(
        # pmod for the same reason as modality above: doc_ids from hashed
        # keys can be negative, and plain % would emit negative dimensions
        (F.pmod(F.col("doc_id"), F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(480)) + 32).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (n_bytes.cast("double") / 1000.0).alias("duration_s"),
        F.lit(30.0).alias("fps"),
        (n_bytes % 240 + 8).cast("int").alias("n_frames"),
    )
    return documents.select(
        "doc_id", modality.alias("modality"),
        payload.alias("payload"), meta.alias("meta"))


# -- mapInPandas kernels ----------------------------------------------------

def extract_image_features(mm: DataFrame) -> DataFrame:
    """decode + resize + pool per image, Arrow-batched; output one feature
    row per input image."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [_fake_decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                "channels": pdf["meta"].map(lambda m: m["channels"]).astype("int32"),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "content_hash": pdf["payload"].map(
                    lambda p: hashlib.md5(bytes(p)).hexdigest()),
                "features": [f.tolist() for f in feats],
            })

    return (mm.filter(F.col("modality") == "image")
            .mapInPandas(kernel, IMAGE_FEATURES_SCHEMA))


def extract_audio_features(mm: DataFrame) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mel = [_fake_decode_audio(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "sample_rate": pdf["meta"].map(
                    lambda m: m["sample_rate"]).astype("int32"),
                "duration_s": pdf["meta"].map(lambda m: m["duration_s"]),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "content_hash": pdf["payload"].map(
                    lambda p: hashlib.md5(bytes(p)).hexdigest()),
                "mel_mean": [m.tolist() for m in mel],
            })

    return (mm.filter(F.col("modality") == "audio")
            .mapInPandas(kernel, AUDIO_FEATURES_SCHEMA))


def sample_frames(mm: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled frame —
    a fan-out kernel (rows out > rows in), the UDTF-shaped case."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ts_s": [], "frame_hash": []}
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                n_frames, fps = int(meta["n_frames"]), float(meta["fps"])
                blob = bytes(payload)
                for idx in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["ts_s"].append(idx / fps)
                    out["frame_hash"].append(hashlib.md5(
                        blob + idx.to_bytes(4, "big")).hexdigest())
            if out["doc_id"]:
                yield pd.DataFrame({
                    "doc_id": np.asarray(out["doc_id"], dtype="int64"),
                    "frame_idx": np.asarray(out["frame_idx"], dtype="int32"),
                    "ts_s": out["ts_s"],
                    "frame_hash": out["frame_hash"],
                })

    return (mm.filter(F.col("modality") == "video")
            .mapInPandas(kernel, FRAME_SAMPLE_SCHEMA))
