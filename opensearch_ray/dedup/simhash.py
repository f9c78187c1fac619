"""SimHash near-dup: 64-bit weighted token fingerprint + banded Hamming join.

simhash(doc) = sign over bit positions of Σ_token tf * (±1 per bit of
hash(token)). Near-dups = Hamming distance <= k; candidates found by the
standard pigeonhole banding (split 64 bits into k+1 chunks: any pair within
distance k shares at least one exact chunk) -> groupby(chunk_id, chunk_value).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _simhash_batch(texts: List[str]) -> np.ndarray:
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        toks = (s or "").split()
        if not toks:
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        h = pd.util.hash_array(uniq).astype(np.uint64)
        # accumulate weighted ±1 per bit, vectorized over 64 bits
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        out[i] = np.uint64(np.sum((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))
    return out


def simhash_values(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    def add(t: pa.Table) -> pa.Table:
        sh = _simhash_batch(t.column(text_col).to_pylist())
        return pa.table({id_col: t.column(id_col),
                         "simhash": pa.array(sh.astype(np.int64))})
    return ds.map_batches(add, batch_format="pyarrow")


def simhash_dedup_pairs(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                        max_hamming: int = 3, max_bucket: int = 200) -> pd.DataFrame:
    """-> (a, b, hamming) pairs with distance <= max_hamming."""
    n_chunks = max_hamming + 1
    bits_per = 64 // n_chunks
    sh_ds = simhash_values(ds, text_col, id_col)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sh = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        chunks = np.stack([
            (sh >> np.uint64(c * bits_per)) & np.uint64((1 << bits_per) - 1)
            for c in range(n_chunks)
        ], axis=1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_chunks)),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), n_chunks)),
            "chunk": pa.array(np.tile(np.arange(n_chunks, dtype=np.int32), n)),
            "cv": pa.array(chunks.astype(np.int64).ravel()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
                {"a": np.int64, "b": np.int64, "hamming": np.int64})
        ii, jj = np.triu_indices(len(ids), k=1)
        x = sh[ii] ^ sh[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        m = ham <= max_hamming
        return pd.DataFrame({"a": ids[ii][m], "b": ids[jj][m], "hamming": ham[m]})

    out = (sh_ds.map_batches(explode, batch_format="pyarrow")
           .groupby(["chunk", "cv"])
           .map_groups(pairs, batch_format="pandas").to_pandas())
    if out.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
            {"a": np.int64, "b": np.int64, "hamming": np.int64})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))
