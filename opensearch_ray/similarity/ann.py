"""Approximate-nearest-neighbor search over a `list<float>` embedding column.

- ``brute_force_topk``: exact cosine top-k — one numpy matmul per batch
  against a broadcast query matrix (ray.put once, read per batch),
  per-batch top-k partials merged on the driver. The scale path's baseline.
- ``lsh_topk``: hyperplane-bucketed variant — probes only batches' rows whose
  sign-bucket matches one of the query's multi-probe buckets, then exact
  re-rank. Recall/latency trade documented per the IVF/LSH pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _as_matrix(vecs, dtype=np.float32) -> np.ndarray:
    return np.asarray(list(vecs), dtype=dtype)


def brute_force_topk(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     metric: str = "cosine", dtype=np.float32) -> pd.DataFrame:
    """Exact top-k for Q query vectors -> DataFrame(query_idx, vec_id, score
    [, rank]) with (score desc, id asc) tie-break. ``dtype=float64`` matches
    SQL/duckdb double math for oracle comparison."""
    Q = np.atleast_2d(np.asarray(query_vecs, dtype=dtype))
    if metric == "cosine":
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    else:
        Qn = Q
    q_ref = ray.put(Qn)

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        V = _as_matrix(t.column(vec_col).to_pylist(), qm.dtype)
        if metric == "cosine":
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = qm @ V.T  # (Q, n)
        nq, n = sims.shape
        kk = min(k, n)
        # per-batch top-k partial per query
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(np.arange(nq), kk)
        cand = idx.ravel()
        return pa.table({
            "query_idx": pa.array(rows_q.astype(np.int32)),
            id_col: pa.array(ids[cand].astype(np.int64)),
            "score": pa.array(sims[rows_q, cand].astype(np.float64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in parts.groupby("query_idx"):
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else parts.assign(rank=[])
    return res[["query_idx", id_col, "score", "rank"]]


def lsh_topk(ds: Dataset, query_vecs: np.ndarray, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             n_planes: int = 8, dim: int = 64, seed: int = 11,
             multiprobe_bits: int = 2) -> pd.DataFrame:
    """Approximate cosine top-k: score only rows whose hyperplane sign-bucket
    is within ``multiprobe_bits`` bit-flips of the query's bucket. Same
    output shape as brute_force_topk (recall < 1 by design)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)
    Q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float32))
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qb = ((Qn @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(n_planes))
    # multiprobe: query bucket + all buckets within hamming distance <= m
    probe_sets = []
    from itertools import combinations
    for b in qb:
        probes = {int(b)}
        for r in range(1, multiprobe_bits + 1):
            for flip in combinations(range(n_planes), r):
                x = int(b)
                for f in flip:
                    x ^= 1 << f
                probes.add(x)
        probe_sets.append(probes)
    ref = ray.put((Qn, probe_sets))

    def partial(t: pa.Table) -> pa.Table:
        qm, probes = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        V = _as_matrix(t.column(vec_col).to_pylist())
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        vb = ((Vn @ planes.T) > 0).astype(np.int64) @ (1 << np.arange(n_planes))
        out_q, out_i, out_s = [], [], []
        for qi in range(len(qm)):
            m = np.isin(vb, list(probes[qi]))
            if not m.any():
                continue
            sims = Vn[m] @ qm[qi]
            sel_ids = ids[m]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_i.extend(sel_ids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int32()),
                         id_col: pa.array(out_i, pa.int64()),
                         "score": pa.array(np.asarray(out_s, dtype=np.float64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in parts.groupby("query_idx"):
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    if not out:
        return pd.DataFrame({"query_idx": [], id_col: [], "score": [], "rank": []})
    return pd.concat(out, ignore_index=True)[["query_idx", id_col, "score", "rank"]]
