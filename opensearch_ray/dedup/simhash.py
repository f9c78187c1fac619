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

from opensearch_ray.arrowutil import nometa


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
                        max_hamming: int = 3, max_bucket: int = 200,
                        P: int = 256) -> pd.DataFrame:
    """-> (a, b, hamming) pairs with distance <= max_hamming.

    Same shuffle discipline as the MinHash path: band rows route through a
    LOW-CARDINALITY hash partition (P≈256) with local vectorized bucket
    formation (not a groupby over millions of distinct chunk values), and the
    Hamming verification is inline (the fingerprint travels with the row), so
    the driver receives only verified, deduplicated pairs."""
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
        # fold chunk index into the bucket key: one 64-bit key per row
        key = chunks.astype(np.uint64) ^ (np.arange(n_chunks, dtype=np.uint64)
                                          [None, :] * np.uint64(0xA24BAED4963EE407))
        part = (key % np.uint64(P)).astype(np.int32)
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_chunks)),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), n_chunks)),
            "key": pa.array(key.astype(np.int64).ravel()),
            "_part": pa.array(part.ravel()),
        })

    def pairs_part(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        sh = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, key))
        key_s, ids_s, sh_s = key[order], ids[order], sh[order]
        starts = np.flatnonzero(np.concatenate(([True], key_s[1:] != key_s[:-1])))
        ends = np.concatenate((starts[1:], [len(key_s)]))
        a_p, b_p, h_p = [], [], []
        for s, e in zip(starts, ends):
            m = min(e - s, max_bucket)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            x = sh_s[s:s + m][ii] ^ sh_s[s:s + m][jj]
            ham = np.zeros(len(x), dtype=np.int64)
            while x.any():
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            keep = ham <= max_hamming
            a_p.append(ids_s[s:s + m][ii][keep])
            b_p.append(ids_s[s:s + m][jj][keep])
            h_p.append(ham[keep])
        if not a_p:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({
            "a": pa.array(np.concatenate(a_p).astype(np.int64)),
            "b": pa.array(np.concatenate(b_p).astype(np.int64)),
            "hamming": pa.array(np.concatenate(h_p))})

    def add_pp(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        pp = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(P)
              ).astype(np.int32)
        return nometa(t.append_column("_pp", pa.array(pp)))

    def dedup_part(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        h = g.column("hamming").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([a, b, h], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1]),
                         "hamming": pa.array(u[:, 2])})

    out = (sh_ds.map_batches(explode, batch_format="pyarrow")
           .groupby("_part").map_groups(pairs_part, batch_format="pyarrow")
           .map_batches(add_pp, batch_format="pyarrow")
           .repartition(16, shuffle=False)  # block hygiene (see minhash)
           .groupby("_pp").map_groups(dedup_part, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
            {"a": np.int64, "b": np.int64, "hamming": np.int64})
    return (out[["a", "b", "hamming"]]
            .sort_values(["a", "b"]).reset_index(drop=True))
