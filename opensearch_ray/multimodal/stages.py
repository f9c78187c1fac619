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


class PerceptualHashStage:
    """dHash perceptual hashing + near-dup bucketing for image payloads
    (public method: difference hash — resize to (H+1)xH grayscale,
    threshold horizontal gradients into H*H bits).

    The HASH machinery is real and runs over whatever the decode stage
    yields — here the deterministic fake decode (codec stubbed, container
    limit), in a real deployment the PIL grayscale thumbnail. Output:
    (media_id, phash uint64-as-int64, band16) where band16 = the top 16
    bits — a coarse LSH band so near-identical images co-locate under one
    low-cardinality groupby downstream."""

    def __init__(self, grid: int = 8, strict: bool = False):
        self.grid = grid
        self.strict = strict
        self.codec_available = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self.codec_available:
            raise NotImplementedError(
                "image codec not available in this container")
        g = self.grid
        payloads = batch.column("payload").to_pylist()
        hashes = np.zeros(len(payloads), np.uint64)
        for i, p in enumerate(payloads):
            # decode -> (g, g+1) grayscale grid (fake decode expanded
            # deterministically to the grid; real codec: thumbnail)
            base = _fake_decode(p or b"")
            grid = np.resize(base, (g, g + 1))
            bits = (grid[:, 1:] > grid[:, :-1]).ravel()
            h = np.uint64(0)
            for b in bits:
                h = (h << np.uint64(1)) | np.uint64(bool(b))
            hashes[i] = h
        return pa.table({
            "media_id": batch.column("media_id"),
            "phash": pa.array(hashes.astype(np.int64)),
            "band16": pa.array(
                (hashes >> np.uint64(48)).astype(np.int32)),
        })


def phash_dedup_pairs(ds, max_hamming: int = 4,
                      concurrency: int = 2,
                      batch_size: int = 64):
    """Near-duplicate image pairs by dHash hamming distance: hash via the
    actor-pool stage, bucket on band16 (identical coarse band is the LSH
    candidate gate), verify hamming <= ``max_hamming`` inside the bucket
    — one low-cardinality shuffle, vectorized popcount verify."""
    import pandas as pd

    hashed = ds.map_batches(PerceptualHashStage, concurrency=concurrency,
                            num_cpus=1, batch_size=batch_size,
                            batch_format="pyarrow")

    def pairs(grp: pa.Table) -> pa.Table:
        ids = grp.column("media_id").to_numpy(zero_copy_only=False)
        hs = grp.column("phash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        n = len(ids)
        out_a, out_b, out_d = [], [], []
        if 2 <= n <= 2000:
            ii, jj = np.triu_indices(n, k=1)
            x = hs[ii] ^ hs[jj]
            # vectorized popcount via uint8 view + lookup table
            lut = np.array([bin(v).count("1") for v in range(256)],
                           np.uint8)
            d = lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
            keep = d <= max_hamming
            a, b = ids[ii[keep]], ids[jj[keep]]
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            out_a, out_b, out_d = a2, b2, d[keep]
        return pa.table({
            "a": pa.array(np.asarray(out_a, np.int64)),
            "b": pa.array(np.asarray(out_b, np.int64)),
            "hamming": pa.array(np.asarray(out_d, np.int64))})

    out = (hashed.repartition(16, shuffle=False)
           .groupby("band16").map_groups(pairs, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
            {"a": np.int64, "b": np.int64, "hamming": np.int64})
    return out.drop_duplicates(["a", "b"]).sort_values(["a", "b"]) \
        .reset_index(drop=True)
