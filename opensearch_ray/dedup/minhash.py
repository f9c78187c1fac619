"""MinHash + LSH near-duplicate detection.

Pipeline (the standard shingle -> minhash -> band -> bucket-groupby shape):
1. per batch: word-shingle each doc, hash shingles (stable 64-bit), compute an
   H-permutation MinHash signature via (a_i * x + b_i) mod p — fully
   vectorized (H x n_shingles matrix per doc is avoided: we reduce per doc).
2. explode signatures into (band_id, band_hash, doc_id) rows,
3. groupby (band_id, band_hash): docs sharing any band are candidate pairs,
4. verify candidates with exact signature similarity (est. Jaccard >= τ).

Scaling notes: the shuffle carries only (band_id, band_hash, doc_id) rows
(B rows/doc, ~tiny); giant buckets (boilerplate docs) are capped and reported
rather than exploding into O(n²) pairs.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_P = np.uint64((1 << 61) - 1)  # Mersenne prime


def _perm_params(num_hashes: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(shingles, dtype=object)).astype(np.uint64)


def _sig_for_hashes(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a*h+b) mod p, per permutation."""
    if h.size == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (H, S) matrix; mod-p on uint64 with Mersenne trick not needed for
    # similarity estimation — plain wrap-around multiply is a fine universal
    # family for dedup purposes, but we keep mod p for cleanliness.
    prod = (h[None, :] * a[:, None] + b[:, None]) % _P
    return prod.min(axis=1)


def minhash_signatures(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = 128, shingle_k: int = 3,
                       seed: int = 7) -> Dataset:
    """-> Dataset[(id_col, sig: list<uint64 as int64>)]."""
    a, b = _perm_params(num_hashes, seed)

    # plain-function stage: the "state" is two small numpy arrays shipped in
    # the closure — an actor pool here would reserve CPUs it doesn't need
    # (with a pool size == cluster CPUs the downstream stages starve and the
    # pipeline stalls; observed under a 4-cpu session)
    def sign(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        sigs = np.stack([
            _sig_for_hashes(_shingle_hashes(s or "", shingle_k), a, b)
            for s in texts
        ]) if texts else np.empty((0, num_hashes), dtype=np.uint64)
        flat = pa.array(sigs.astype(np.int64).ravel())
        offs = pa.array(np.arange(len(texts) + 1, dtype=np.int32) * num_hashes)
        return pa.table({
            id_col: t.column(id_col),
            "sig": pa.ListArray.from_arrays(offs, flat),
        })

    return ds.map_batches(sign, batch_format="pyarrow")


def lsh_candidate_pairs(sig_ds: Dataset, id_col: str = "doc_id",
                        num_hashes: int = 128, bands: int = 32,
                        max_bucket: int = 200) -> pd.DataFrame:
    """Band the signatures, groupby (band, band_hash), emit candidate pairs.
    Buckets larger than ``max_bucket`` are truncated (reported via the
    ``truncated`` flag) so boilerplate clusters can't go quadratic."""
    rows_per_band = num_hashes // bands

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = np.asarray(t.column("sig").to_pylist(), dtype=np.int64)
        if sigs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "bh": pa.array([], pa.int64())})
        n = len(ids)
        bandviews = sigs.reshape(n, bands, rows_per_band)
        # hash each band's row-slice to one value
        bh = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            bh = bh * np.uint64(0x9E3779B97F4A7C15) + bandviews[:, :, r].astype(np.uint64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "bh": pa.array(bh.astype(np.int64).ravel()),
        })

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        truncated = len(ids) > max_bucket
        ids = ids[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "truncated": []}).astype(
                {"a": np.int64, "b": np.int64, "truncated": bool})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj],
                             "truncated": truncated})

    cand = (exploded.groupby(["band", "bh"])
            .map_groups(pairs, batch_format="pandas").to_pandas())
    if cand.empty:
        return pd.DataFrame({"a": [], "b": []}).astype({"a": np.int64, "b": np.int64})
    return cand.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)


def minhash_dedup_pairs(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 128, bands: int = 32, shingle_k: int = 3,
                        threshold: float = 0.8, seed: int = 7) -> pd.DataFrame:
    """Full near-dup pipeline: candidates via LSH, verified by estimated
    Jaccard (signature agreement) >= threshold. Returns (a, b, est_jaccard)."""
    sigs = minhash_signatures(ds, text_col, id_col, num_hashes, shingle_k, seed)
    sig_mat = sigs.to_pandas().set_index(id_col)["sig"]
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    est = np.array([
        float(np.mean(np.asarray(sig_mat[a]) == np.asarray(sig_mat[b])))
        for a, b in zip(cand["a"], cand["b"])
    ])
    out = cand.assign(est_jaccard=est)
    out = out[out["est_jaccard"] >= threshold]
    return out[["a", "b", "est_jaccard"]].sort_values(["a", "b"]).reset_index(drop=True)
