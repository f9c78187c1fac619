"""IVF-PQ: coarse inverted cells + product-quantized codes (IVFADC).

The composition Jégou et al. 2011 call IVFADC — the shape FAISS ships as
``IVFx,PQy`` and the standard recipe for billion-vector corpora: an IVF
coarse quantizer prunes the search to ``nprobe`` cells (I/O: only those
cell directories are read) while PQ codes shrink residency to M bytes per
vector (memory: a 10^11-vector corpus fits object-store-resident). Search
cost is nprobe/n_cells of the corpus scanned at one table-gather per
vector.

Simplification vs FAISS: codes quantize the NORMALIZED raw vectors, not
per-cell residuals (residual PQ needs per-cell rotation bookkeeping; raw
PQ keeps the codebooks global and the encode stage map-only). Documented
accuracy trade: slightly lower recall at equal M on clustered data.

Layout: ``{dir}/centroids.npy`` + ``pq_books.npy`` +
``cell={c:04d}/part-*.parquet`` of (id, pq_code) — same resumable
directory contract as similarity.ivf.IvfIndex.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from opensearch_ray.arrowutil import nometa

from .ivf import _kmeans
from .pq import _norm_rows, pq_topk, pq_train


_COARSE_SAMPLE_CAP = 1 << 20  # driver-materialized training cap (vectors)


def _streaming_spherical_kmeans(sample_ds, vec_col: str, k: int,
                                seed: int = 17, iters: int = 4
                                ) -> np.ndarray:
    """Spherical k-means over a sample too large to materialize on the
    driver: exact Lloyd iterations computed STREAMING — each pass scans
    the (id-sorted, hence deterministic) sample with ``iter_batches``,
    assigns per chunk (vectorized matmul) and folds global per-centroid
    sum/count accumulators; driver memory is O(k x dim), never the sample.
    Init = the first k sample vectors in id order (deterministic)."""
    C = None
    init_rows: list = []
    for it in range(iters + 1):
        if C is None:
            # pass 0: collect the deterministic init prefix only
            for b in sample_ds.iter_batches(batch_format="pyarrow",
                                            batch_size=8192):
                init_rows.extend(b.column(vec_col).to_pylist())
                if len(init_rows) >= k:
                    break
            X0 = _norm_rows(np.stack(init_rows[:k]).astype(np.float32))
            C = X0.copy()
            del init_rows, X0
            continue
        dim = C.shape[1]
        sums = np.zeros((k, dim), np.float64)
        counts = np.zeros(k, np.int64)
        for b in sample_ds.iter_batches(batch_format="pyarrow",
                                        batch_size=8192):
            V = _norm_rows(np.stack(
                b.column(vec_col).to_pylist()).astype(np.float32))
            assign = (V @ C.T).argmax(axis=1)
            np.add.at(sums, assign, V.astype(np.float64))
            np.add.at(counts, assign, 1)
        nz = counts > 0
        C[nz] = _norm_rows(
            (sums[nz] / counts[nz, None]).astype(np.float32))
    return C


class IvfPqIndex:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        self.codebooks = np.load(os.path.join(index_dir, "pq_books.npy"))
        with open(os.path.join(index_dir, "ivfpq_meta.json")) as f:
            self.meta = json.load(f)

    @staticmethod
    def build(ds: Dataset, index_dir: str, vec_col: str = "embedding",
              id_col: str = "vec_id", n_cells: Optional[int] = None,
              m: int = 8, ks: int = 256, sample_size: int = 8192,
              seed: int = 17) -> "IvfPqIndex":
        os.makedirs(index_dir, exist_ok=True)
        n = ds.count()
        if n_cells is None:
            n_cells = int(min(65536, max(4, round(n ** 0.5))))
        # coarse quantizer: spherical k-means on a hash-stable sample
        need = max(sample_size, 40 * n_cells)
        stride = max(1, n // need)

        def pick(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % stride == 0))

        if need <= _COARSE_SAMPLE_CAP:
            sample = (ds.map_batches(pick, batch_format="pyarrow")
                      .to_pandas().sort_values(id_col))
            X = np.stack(sample[vec_col].to_numpy()).astype(np.float32)
            C = _kmeans(X, n_cells, seed=seed)
        else:
            # faiss-style 40*k training vectors would exceed the driver
            # heap at the top cell counts (40 x 65536 ≈ 2.6 M vectors) —
            # stream exact Lloyd iterations instead: per-chunk assignment
            # + global sum/count accumulators, memory O(k x dim)
            # materialize once: iter_batches per Lloyd pass would otherwise
            # recompute the pick+sort lineage every epoch
            C = _streaming_spherical_kmeans(
                ds.map_batches(pick, batch_format="pyarrow")
                .sort(id_col).materialize(),
                vec_col, n_cells, seed=seed)
        books = pq_train(ds, vec_col=vec_col, m=m, ks=ks,
                         sample_size=sample_size, seed=seed, id_col=id_col)
        c_ref = ray.put(C)
        b_ref = ray.put(books)
        mm = books.shape[0]
        sub = books.shape[2]

        def assign_encode(t: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            bk = ray.get(b_ref)
            V = _norm_rows(np.stack(
                t.column(vec_col).to_pylist()).astype(np.float32))
            cell = (V @ cm.T).argmax(axis=1).astype(np.int32)
            codes = np.empty((len(V), mm), np.uint8)
            for j in range(mm):
                S = V[:, j * sub:(j + 1) * sub]
                d2 = ((S * S).sum(1, keepdims=True) - 2.0 * (S @ bk[j].T)
                      + (bk[j] * bk[j]).sum(1))
                codes[:, j] = d2.argmin(1).astype(np.uint8)
            packed = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(mm), len(V),
                [None, pa.py_buffer(codes.tobytes())])
            return nometa(pa.table({
                id_col: t.column(id_col),
                "pq_code": packed,
                "_cell": pa.array(cell),
            }))

        import shutil
        staging = os.path.join(index_dir, "_staging")
        shutil.rmtree(staging, ignore_errors=True)
        (ds.map_batches(assign_encode, batch_format="pyarrow")
           .write_parquet(staging, partition_cols=["_cell"],
                          compression="zstd"))
        cells = []
        for name in sorted(os.listdir(staging)):
            if not name.startswith("_cell="):
                continue
            c = int(name.split("=", 1)[1])
            dst = os.path.join(index_dir, f"cell={c:04d}")
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(os.path.join(staging, name), dst)
            cells.append(c)
        shutil.rmtree(staging, ignore_errors=True)
        np.save(os.path.join(index_dir, "centroids.npy"), C)
        np.save(os.path.join(index_dir, "pq_books.npy"), books)
        with open(os.path.join(index_dir, "ivfpq_meta.json"), "w") as f:
            json.dump({"n_cells": int(len(C)), "m": int(mm),
                       "id_col": id_col, "cells": cells,
                       "total": int(n)}, f)
        return IvfPqIndex(index_dir)

    def search(self, query_vec: np.ndarray, k: int = 10,
               nprobe: int = 4) -> pd.DataFrame:
        """ADC top-k over the ``nprobe`` nearest cells — reads ONLY those
        cell directories."""
        q = np.asarray(query_vec, np.float32)
        qn = q / max(np.linalg.norm(q), 1e-12)
        sims = self.centroids @ qn
        probe = np.argsort(-sims)[:nprobe]
        dirs = [os.path.join(self.index_dir, f"cell={int(c):04d}")
                for c in probe]
        # a list of DIRECTORIES confuses read_parquet's file opener —
        # expand to the fragment files explicitly
        paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not paths:
            return pd.DataFrame({self.meta["id_col"]: [], "score": [],
                                 "rank": []})
        codes = ray.data.read_parquet(paths)
        return pq_topk(codes, self.codebooks, q, k=k,
                       id_col=self.meta["id_col"])
