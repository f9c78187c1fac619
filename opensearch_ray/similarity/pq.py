"""Product-quantization ANN (PQ + ADC).

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011) — the memory-scale path for 100-TB embedding corpora: each
D-dim float vector compresses to M bytes (one uint8 codebook id per
subspace), so a 10^11-vector corpus fits in object-store-resident code
tables that a brute scan could never hold as floats. Queries score codes
with an asymmetric distance computation (ADC): one (M × ks) lookup table
per query, then a vectorized gather-sum over the code matrix per batch —
no per-row Python.

Cosine variant: vectors are L2-normalized before encoding and the ADC
table holds inner products, so code scores approximate cosine similarity
(exact for vectors on codebook centroids).

Pipeline shape: train on a deterministic hash-sample (one small driver
k-means per subspace), ``pq_encode`` is a map-only batch stage, and
``pq_topk`` runs per-batch top-k partials + a bounded driver merge —
identical distribution contract to similarity.brute_force_topk.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

def _norm_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _lloyd(X: np.ndarray, k: int, iters: int = 12, seed: int = 17
           ) -> np.ndarray:
    """Plain (Euclidean) Lloyd k-means, seeded/deterministic. PQ needs
    UN-normalized sub-centroids — spherical k-means (ivf._kmeans) would
    inflate every centroid to unit length and the ADC sums with it."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T)
              + (C * C).sum(1))
        assign = d2.argmin(1)
        for ci in range(len(C)):
            m = assign == ci
            if m.any():
                C[ci] = X[m].mean(axis=0)
    return C


def pq_train(ds: Dataset, vec_col: str = "embedding", m: int = 8,
             ks: int = 256, sample_size: int = 8192, seed: int = 17,
             id_col: str = "vec_id") -> np.ndarray:
    """Train codebooks -> (m, ks, d/m) float32. Sampling is hash-stable
    (id % stride), same determinism contract as IvfIndex.build."""
    n = ds.count()
    stride = max(1, n // sample_size)

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % stride == 0))

    sample = (ds.map_batches(pick, batch_format="pyarrow").to_pandas()
              .sort_values(id_col))  # Ray block order is not stable across
    # runs — id-sorting makes the k-means init deterministic
    X = _norm_rows(np.stack(sample[vec_col].to_numpy()).astype(np.float32))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    ks = min(ks, len(X))
    books = np.empty((m, ks, sub), np.float32)
    for j in range(m):
        books[j] = _lloyd(X[:, j * sub:(j + 1) * sub], ks,
                          seed=seed + j)[:ks]
    return books


def pq_encode(ds: Dataset, codebooks: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id"
              ) -> Dataset:
    """(id, vector) -> (id, pq_code: fixed M bytes). Map-only; the
    codebooks ride in the task closure (M*ks*sub floats ≪ a block)."""
    m, ks, sub = codebooks.shape

    def encode(t: pa.Table) -> pa.Table:
        X = _norm_rows(np.stack(
            t.column(vec_col).to_pylist()).astype(np.float32))
        codes = np.empty((len(X), m), np.uint8)
        for j in range(m):
            S = X[:, j * sub:(j + 1) * sub]
            # squared L2 to each sub-centroid, vectorized
            d2 = ((S * S).sum(1, keepdims=True)
                  - 2.0 * (S @ codebooks[j].T)
                  + (codebooks[j] * codebooks[j]).sum(1))
            codes[:, j] = d2.argmin(1).astype(np.uint8)
        # zero-copy fixed-width code column (the minhash._pack_sigs
        # pattern) — no per-row Python bytes objects
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), len(X), [None, pa.py_buffer(codes.tobytes())])
        return pa.table({id_col: t.column(id_col), "pq_code": packed})

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(codes: Dataset, codebooks: np.ndarray, query_vec: np.ndarray,
            k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """ADC top-k over encoded vectors: per-batch table-gather partials,
    bounded driver merge. Returns (id, score, rank), score = approximate
    cosine, ties (score desc, id asc)."""
    m, ks, sub = codebooks.shape
    q = np.asarray(query_vec, np.float32)
    q = q / max(np.linalg.norm(q), 1e-12)
    # ADC lookup table: inner product of each query sub-vector with every
    # sub-centroid -> scores sum to the approximate cosine
    table = np.stack([q[j * sub:(j + 1) * sub] @ codebooks[j].T
                      for j in range(m)])  # (m, ks) float32

    def partial(t: pa.Table) -> pa.Table:
        raw = t.column("pq_code").combine_chunks() \
            if isinstance(t.column("pq_code"), pa.ChunkedArray) \
            else t.column("pq_code")
        if pa.types.is_fixed_size_binary(raw.type):
            # fixed_size_binary: [validity, data] buffers, no offsets —
            # a straight zero-copy view sliced by the array offset
            data = np.frombuffer(raw.buffers()[1], np.uint8)
            buf = data[raw.offset * m:(raw.offset + len(raw)) * m]
        else:
            # variable binary with strictly m-apart offsets (older codes)
            off = np.frombuffer(raw.buffers()[1], np.int32)[
                raw.offset:raw.offset + len(raw) + 1]
            if len(off) > 1 and (np.diff(off) == m).all():
                data = np.frombuffer(raw.buffers()[2], np.uint8)
                buf = data[off[0]:off[-1]]
            else:
                buf = np.frombuffer(b"".join(raw.to_pylist()), np.uint8)
        C = buf.reshape(-1, m)
        scores = table[np.arange(m), C].sum(1)  # gather-sum, no row loop
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "score": pa.array(scores[order].astype(np.float64))})

    p = codes.map_batches(partial, batch_format="pyarrow").to_pandas()
    p = p.sort_values(["score", id_col], ascending=[False, True],
                      kind="mergesort").head(k).reset_index(drop=True)
    p["rank"] = np.arange(1, len(p) + 1, dtype=np.int64)
    return p
