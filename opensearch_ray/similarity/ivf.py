"""IVF (inverted-file) ANN index — the scale path for embedding search.

Classic IVF-Flat: a k-means coarse quantizer (trained on a driver-side
sample, seeded + deterministic) partitions vectors into cells; vectors land
in per-cell parquet files (one Ray write pass, cell = argmax centroid
similarity). A query probes only the ``nprobe`` nearest cells and exact-ranks
inside them, so it touches ~nprobe/n_cells of the data — unlike the
brute-force baseline which reads everything.

At 100 TB: cells are directories of parquet fragments; centroids are a tiny
broadcast; probe reads are predicate-pushdown file reads. Recall is tunable
via nprobe (nprobe == n_cells degenerates to exact search).
"""

from __future__ import annotations

import json
import os
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from opensearch_ray.arrowutil import nometa


def _kmeans(X: np.ndarray, k: int, iters: int = 10, seed: int = 17) -> np.ndarray:
    """Seeded spherical k-means (cosine): few Lloyd iterations on normalized
    vectors; deterministic."""
    rng = np.random.default_rng(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=min(k, len(Xn)), replace=False)].copy()
    for _ in range(iters):
        sims = Xn @ C.T
        assign = sims.argmax(axis=1)
        for ci in range(len(C)):
            m = assign == ci
            if m.any():
                v = Xn[m].mean(axis=0)
                C[ci] = v / max(np.linalg.norm(v), 1e-12)
    return C


class IvfIndex:
    """On-disk IVF index: {dir}/centroids.npy + cell={c:04d}/part-*.parquet."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        with open(os.path.join(index_dir, "ivf_meta.json")) as f:
            self.meta = json.load(f)

    @staticmethod
    def build(ds: Dataset, index_dir: str, vec_col: str = "embedding",
              id_col: str = "vec_id", n_cells: int = None,
              sample_size: int = 4096, seed: int = 17) -> "IvfIndex":
        os.makedirs(index_dir, exist_ok=True)
        # --- train the coarse quantizer on a DATA-DERIVED sample:
        # hash(id) % stride == 0 (ray's random_sample isn't stable across
        # runs even when seeded; determinism matters for resumable builds)
        n = ds.count()
        if n_cells is None:
            # ~sqrt(N) cells (the classic IVF sizing) so cell size grows as
            # sqrt, never corpus/16; floor keeps tiny corpora probe-able
            n_cells = int(min(65536, max(16, round(n ** 0.5))))
        # the k-means can train at most sample-many centroids: scale the
        # sample with the requested cell count (~40 points/centroid, the
        # faiss training heuristic) instead of silently capping n_cells
        sample_size = max(sample_size, 40 * n_cells)
        if sample_size > n:
            sample_size = n
        stride = max(1, n // max(sample_size, 1))

        def pick(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(ids.astype(object)) % np.uint64(stride)
            return t.filter(pa.array(h == 0)).select([id_col, vec_col])

        sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        # block arrival order is nondeterministic — sort by id so the k-means
        # init (index-based) sees an identical matrix every run
        sample = sample.sort_values(id_col, kind="mergesort")
        Xs = np.asarray(sample[vec_col].tolist(), dtype=np.float32)
        if len(Xs) < n_cells:
            import warnings
            warnings.warn(
                f"IVF sample ({len(Xs)}) smaller than n_cells ({n_cells}); "
                f"training only {len(Xs)} centroids", stacklevel=2)
        C = _kmeans(Xs, n_cells, seed=seed)
        np.save(os.path.join(index_dir, "centroids.npy"), C)
        c_ref = ray.put(C)

        # --- assign + write per-cell files (groupby cell = the only shuffle)
        def assign(t: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            V = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float32)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cell = (Vn @ cm.T).argmax(axis=1).astype(np.int32)
            return nometa(t.append_column("_cell", pa.array(cell)))

        # --- streaming partitioned write: every block emits its per-cell
        # slices directly (no whole-cell task — a cell is a DIRECTORY of
        # fragments, write parallelism = block count)
        import shutil
        staging = os.path.join(index_dir, "_staging")
        shutil.rmtree(staging, ignore_errors=True)
        (ds.map_batches(assign, batch_format="pyarrow")
           .select_columns([id_col, vec_col, "_cell"])
           .write_parquet(staging, partition_cols=["_cell"],
                          compression="zstd"))
        cell_rows = {}
        for name in sorted(os.listdir(staging)):
            if not name.startswith("_cell="):
                continue
            c = int(name.split("=", 1)[1])
            dst = os.path.join(index_dir, f"cell={c:04d}")
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(os.path.join(staging, name), dst)
            cell_rows[str(c)] = sum(
                pq.read_metadata(os.path.join(dst, f)).num_rows
                for f in os.listdir(dst) if f.endswith(".parquet"))
        shutil.rmtree(staging, ignore_errors=True)
        meta = {"n_cells": int(len(C)), "dim": int(C.shape[1]),
                "vec_col": vec_col, "id_col": id_col, "total": int(n),
                "cell_rows": cell_rows}
        with open(os.path.join(index_dir, "ivf_meta.json"), "w") as f:
            json.dump(meta, f)
        return IvfIndex(index_dir)

    def search(self, query_vec: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
        """Probe the nprobe nearest cells, exact cosine rank inside them."""
        q = np.asarray(query_vec, dtype=np.float32)
        qn = q / max(np.linalg.norm(q), 1e-12)
        order = (self.centroids @ qn).argsort()[::-1][:nprobe]
        vec_col, id_col = self.meta["vec_col"], self.meta["id_col"]
        frames = []
        for c in order:
            d = os.path.join(self.index_dir, f"cell={int(c):04d}")
            if not os.path.exists(d):
                continue
            t = pq.read_table(d, columns=[id_col, vec_col])
            V = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float32)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ qn
            frames.append(pd.DataFrame({
                id_col: t.column(id_col).to_numpy(zero_copy_only=False),
                "score": sims.astype(np.float64)}))
        if not frames:
            return pd.DataFrame({id_col: [], "score": [], "rank": []})
        allf = pd.concat(frames, ignore_index=True)
        allf = allf.sort_values(["score", id_col], ascending=[False, True],
                                kind="mergesort").head(k)
        allf["rank"] = np.arange(1, len(allf) + 1, dtype=np.int64)
        return allf.reset_index(drop=True)
