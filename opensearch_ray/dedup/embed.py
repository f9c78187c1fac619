"""Embedding-cosine near-duplicate detection via random-hyperplane LSH.

Candidates = rows sharing a hyperplane sign-bucket (seed-fixed projection
matrix, broadcast to every batch), verified with exact cosine >= threshold
inside the bucket group. The shuffle carries (bucket, id, normalized vec).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def embedding_dedup_pairs(ds: Dataset, vec_col: str = "embedding",
                          id_col: str = "vec_id", threshold: float = 0.95,
                          n_planes: int = 12, n_tables: int = 4,
                          dim: int = 64, seed: int = 11,
                          max_bucket: int = 500) -> pd.DataFrame:
    """-> (a, b, cosine) with cosine >= threshold, found via any of
    ``n_tables`` independent hyperplane banks of ``n_planes`` bits."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float32)
        if vecs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "table": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.maximum(norms, 1e-12)
        n = len(ids)
        buckets = np.empty((n, n_tables), dtype=np.int64)
        for ti in range(n_tables):
            signs = (vn @ planes[ti].T) > 0  # (n, n_planes)
            buckets[:, ti] = (signs.astype(np.int64)
                              * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
        flat = pa.array(np.repeat(vn, n_tables, axis=0).ravel())
        offs = pa.array(np.arange(n * n_tables + 1, dtype=np.int32) * dim)
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_tables)),
            "table": pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
            "bucket": pa.array(buckets.ravel()),
            "vec": pa.ListArray.from_arrays(offs, flat),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(max_bucket)
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": np.int64, "b": np.int64, "cosine": np.float64})
        ids = g[id_col].to_numpy()
        V = np.stack(g["vec"].to_numpy())
        sim = V @ V.T
        ii, jj = np.triu_indices(len(ids), k=1)
        cs = sim[ii, jj]
        m = cs >= threshold
        return pd.DataFrame({"a": ids[ii][m], "b": ids[jj][m],
                             "cosine": cs[m].astype(np.float64)})

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby(["table", "bucket"])
           .map_groups(pairs, batch_format="pandas").to_pandas())
    if out.empty:
        return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
            {"a": np.int64, "b": np.int64, "cosine": np.float64})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))
