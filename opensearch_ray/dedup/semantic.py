"""SemDeDup-style semantic deduplication over an embedding column.

Public method: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540) — cluster
the embeddings with k-means, then inside each cluster drop all but one
of every group of mutually-near (cosine >= eps) points, keeping the one
FARTHEST from the centroid (the paper's keep-far policy; lowest id on
ties — deterministic).

Distributed shape (the 100-TB path):
- centroids train on a bounded sample (driver holds O(k x dim));
- cluster assignment is MAP-ONLY — centroids broadcast once via
  ``ray.put``, one matmul per batch;
- the within-cluster near-dup scan is a groupby over the LOW-CARDINALITY
  cluster id (k groups, each bounded by cluster size — the paper uses
  k large enough that clusters fit memory; ``max_cluster`` caps the
  quadratic scan like dedup/embed.py's ``max_bucket``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..similarity.ivf import _kmeans


def semantic_dedup(ds: Dataset, vec_col: str = "embedding",
                   id_col: str = "vec_id", eps: float = 0.95,
                   n_clusters: int = 16, sample: int = 20_000,
                   seed: int = 17, max_cluster: int = 20_000) -> Dataset:
    """-> Dataset[(id, cluster, keep)] — ``keep`` False marks semantic
    duplicates to drop. Every id appears exactly once."""

    # --- train centroids on a bounded deterministic sample: fetch block
    # refs only until the sample is filled — remaining blocks never
    # route to the driver
    head = []
    taken = 0
    for ref in ds.to_arrow_refs():
        if taken >= sample:
            break
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        take = min(sample - taken, t.num_rows)
        head.append(np.asarray(
            t.column(vec_col).slice(0, take).to_pylist(), np.float32))
        taken += take
    X = (np.concatenate(head) if head
         else np.zeros((1, 2), np.float32))
    C = _kmeans(X, n_clusters, seed=seed)
    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        cc = ray.get(c_ref)
        vecs = np.asarray(t.column(vec_col).to_pylist(), np.float32)
        if vecs.size == 0:
            return pa.table({id_col: t.column(id_col),
                             "cluster": pa.array([], pa.int32()),
                             "_v": pa.array([], pa.binary())})
        vn = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        a = (vn @ cc.T).argmax(axis=1).astype(np.int32)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(a),
            "_v": pa.array([v.tobytes() for v in vn], pa.binary())})

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        cid = int(g["cluster"].iloc[0])
        vn = np.frombuffer(b"".join(g["_v"]), np.float32) \
            .reshape(len(g), -1)
        n = min(len(g), max_cluster)
        keep = np.ones(len(g), bool)
        if n > 1:
            cc = ray.get(c_ref)[cid]
            # keep-far policy: process in DESCENDING centroid distance
            # (ascending centroid sim); ties by id — deterministic
            sims_c = vn[:n] @ cc
            order = np.lexsort((ids[:n], sims_c))
            sims = vn[:n][order] @ vn[:n][order].T
            for i in range(1, n):
                if keep[order[i]] and (sims[i, :i][keep[order[:i]]]
                                       >= eps).any():
                    keep[order[i]] = False
        return pd.DataFrame({id_col: ids, "cluster": cid, "keep": keep})

    # <=16 blocks into the cluster shuffle (round-5 block-count law)
    return (assigned.repartition(16, shuffle=False)
            .groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pandas")
            .select_columns([id_col, "cluster", "keep"]))
