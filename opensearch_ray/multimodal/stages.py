"""Multimodal actor-pool stages (binary payload columns).

Design notes for 100 TB operation (all real, only the codec is faked):
- payloads are `binary` columns; batches must stay SMALL (batch_size 16-64)
  so batch x concurrency fits worker heaps — callers pass batch_size through.
- stages are callable CLASSES: "model"/codec state loads once per actor in
  __init__ (the actor-pool pattern), work happens per batch in __call__.
- outputs are fixed-width feature vectors / resized payloads with explicit
  schemas, so downstream stages stay zero-copy Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MULTIMODAL_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

_FEAT_DIM = 32


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: derive a feature vector from the
    payload bytes (stable across processes). STUB — replace with PIL/ffmpeg
    in a real deployment."""
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(_FEAT_DIM, dtype=np.float32)
    pad = np.resize(arr.astype(np.float32), _FEAT_DIM * 8).reshape(_FEAT_DIM, 8)
    return (pad.mean(axis=1) / 255.0).astype(np.float32)


class ImageDecodeStage:
    """decode + resize + feature-extract for image payloads.

    Usage: ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={...},
    concurrency=N, num_cpus=1, batch_size=32, batch_format="pyarrow").
    """

    def __init__(self, target_size: int = 224, strict: bool = False):
        self.target_size = target_size
        self.strict = strict
        # real deployment: import PIL here, once per actor
        self.codec_available = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self.codec_available:
            raise NotImplementedError(
                "image codec not available in this container; "
                "install pillow and set codec_available")
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([_fake_decode(p or b"") for p in payloads]) \
            if payloads else np.empty((0, _FEAT_DIM), np.float32)
        flat = pa.array(feats.ravel(), type=pa.float32())
        offs = pa.array(np.arange(len(payloads) + 1, dtype=np.int32) * _FEAT_DIM)
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.ListArray.from_arrays(offs, flat),
            "resized_w": pa.array(np.full(len(payloads), self.target_size, np.int32)),
            "resized_h": pa.array(np.full(len(payloads), self.target_size, np.int32)),
        })


class AudioFeatureStage:
    """audio payload -> fixed-dim spectrogram-ish features (stub codec)."""

    def __init__(self, sample_rate: int = 16000, strict: bool = False):
        self.sample_rate = sample_rate
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("audio codec not available in this container")
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([_fake_decode(p or b"") for p in payloads]) \
            if payloads else np.empty((0, _FEAT_DIM), np.float32)
        flat = pa.array(feats.ravel(), type=pa.float32())
        offs = pa.array(np.arange(len(payloads) + 1, dtype=np.int32) * _FEAT_DIM)
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.ListArray.from_arrays(offs, flat),
        })


class FrameSampleStage:
    """video payload -> N deterministic frame descriptors (stub codec)."""

    def __init__(self, n_frames: int = 4, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video codec not available in this container")
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        n = len(ids)
        frame_idx = np.tile(np.arange(self.n_frames, dtype=np.int32), n)
        ts = (np.repeat(dur, self.n_frames)
              * (frame_idx + 0.5) / self.n_frames).astype(np.int32)
        return pa.table({
            "media_id": pa.array(np.repeat(ids, self.n_frames)),
            "frame_idx": pa.array(frame_idx),
            "frame_ts_ms": pa.array(ts),
        })


def attach_fake_payloads(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic multimodal table for tests (no external data)."""
    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.integers(100, 2000, size=n).astype(np.int32)),
        "height": pa.array(rng.integers(100, 2000, size=n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(1000, 60000, size=n).astype(np.int32)),
    }, schema=MULTIMODAL_SCHEMA)
