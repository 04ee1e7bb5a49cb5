"""LLM training-data pipeline: multimodal column plumbing (the relational
dedup/similarity/text ops live in relational/llm_ops.py + embed_lsh.py)."""
from .multimodal import (attach_payloads, extract_audio_features,
                         extract_image_features, sample_frames)

__all__ = ["attach_payloads", "extract_image_features",
           "extract_audio_features", "sample_frames"]
