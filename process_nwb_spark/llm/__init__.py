"""LLM training-data pipeline: multimodal column plumbing and the
end-to-end curation composition (the relational dedup/similarity/text ops
live in relational/llm_ops.py + embed_lsh.py)."""
from .curation import curate, fake_embedding, sign_bucket
from .multimodal import (attach_payloads, extract_audio_features,
                         extract_image_features, sample_frames)
from .shards import (export_training_shards, read_shard, shard_manifest,
                     verify_against_corpus, verify_export, with_shard)

__all__ = ["attach_payloads", "extract_image_features",
           "extract_audio_features", "sample_frames",
           "curate", "fake_embedding", "sign_bucket",
           "export_training_shards", "read_shard", "shard_manifest",
           "verify_against_corpus", "verify_export", "with_shard"]
