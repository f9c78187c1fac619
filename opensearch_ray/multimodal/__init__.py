"""Multimodal columns: opaque binary payloads + typed metadata.

Decode/feature-extract stages are actor-pool ``map_batches`` classes with REAL
Ray plumbing (schema, batch sizing, actor signature, output layout) and a
STUBBED codec: the image/audio libraries are not in this container, so decode
uses a deterministic fake (documented) or raises NotImplementedError when
``strict=True``.
"""

from .stages import (
    ImageDecodeStage, AudioFeatureStage, FrameSampleStage,
    attach_fake_payloads, MULTIMODAL_SCHEMA,
)

__all__ = ["ImageDecodeStage", "AudioFeatureStage", "FrameSampleStage",
           "attach_fake_payloads", "MULTIMODAL_SCHEMA"]
