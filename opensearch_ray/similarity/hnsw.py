"""HNSW ANN — per-segment hierarchical navigable small-world graphs.

OpenSearch's k-NN plugin (opensearch-project/k-NN — distributed with
OpenSearch, not part of this reference checkout) delegates vector search
to per-Lucene-segment HNSW graphs (faiss / nmslib / Lucene's own
HnswVectorsFormat; KNNWeight: each segment searches its graph, the
collector merges per-segment top-k). Same model here, Ray-Data-first: vectors are
hash-partitioned into S segments with ONE partitioned write (no driver
materialization), each segment's graph is built inside its own Ray task
(the insert loop is inherently sequential *within* a graph, so parallelism
comes from segments — exactly Lucene's story), and a query descends every
segment graph with ``ef_search``, k-bounded partials merged on the driver.

Algorithm: Malkov & Yashunin, "Efficient and robust approximate nearest
neighbor search using Hierarchical Navigable Small World graphs"
(arXiv:1603.09320) — greedy upper-layer descent, best-first ``ef`` beam on
the base layer, and the Algorithm-4 diversity heuristic for neighbor
selection (what Lucene/faiss use).

Determinism (repo invariant): the level draw comes from a HASH of the
vector id, not an RNG consumed in arrival order, and inserts run in
id-sorted order inside each segment — identical graphs every run
regardless of Ray block scheduling.

At 100 TB: segments are independent npz blobs built map-side after one
low-cardinality shuffle (S ≈ corpus/2^20, each graph memory-bounded);
query fan-out is S bounded tasks returning k rows each, so the driver
merge is O(S·k). ef_search trades recall for per-segment work with zero
re-partitioning.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from opensearch_ray.arrowutil import nometa


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


class _Graph:
    """One segment's in-memory HNSW graph over L2-normalized float32 rows.

    Neighbor storage is a dense int32 matrix per level ([n, Mmax], -1 pad)
    — rows above a node's level stay unused; level sizes shrink by ~1/M so
    the waste is bounded and lookups are branch-free array indexing.
    """

    def __init__(self, Xn: np.ndarray, ids: np.ndarray, M: int = 16,
                 ef_construction: int = 64):
        self.Xn = np.ascontiguousarray(Xn, dtype=np.float32)
        self.ids = np.asarray(ids)
        self.M = int(M)
        self.Mmax0 = 2 * self.M
        self.efc = int(ef_construction)
        n = len(self.Xn)
        mL = 1.0 / np.log(self.M)
        # hash-derived uniform in (0,1) -> geometric-ish level (paper eq. 1)
        u = (pd.util.hash_array(self.ids.astype(object)).astype(np.float64)
             + 0.5) / float(2 ** 64)
        self.levels = np.floor(-np.log(u) * mL).astype(np.int32)
        self.max_level = int(self.levels.max()) if n else 0
        self.nbrs = [np.full((n, self.Mmax0 if lv == 0 else self.M), -1,
                             np.int32) for lv in range(self.max_level + 1)]
        self.entry = -1
        self.entry_level = -1
        for i in range(n):
            self._insert(i)

    # -- primitives ------------------------------------------------------
    def _sims(self, cand: np.ndarray, q: np.ndarray) -> np.ndarray:
        return self.Xn[cand] @ q

    def _neighbors(self, node: int, level: int) -> np.ndarray:
        row = self.nbrs[level][node]
        return row[row >= 0]

    def _greedy(self, q: np.ndarray, ep: int, level: int) -> int:
        """Greedy closest-neighbor descent within one level."""
        cur = ep
        cur_sim = float(self.Xn[cur] @ q)
        while True:
            nb = self._neighbors(cur, level)
            if nb.size == 0:
                return cur
            s = self._sims(nb, q)
            j = int(s.argmax())
            if s[j] <= cur_sim:
                return cur
            cur, cur_sim = int(nb[j]), float(s[j])

    def _search_layer(self, q: np.ndarray, eps, ef: int, level: int):
        """Best-first beam (paper Algorithm 2): returns (idx, sim) arrays
        of the ef best found, sim-descending."""
        import heapq
        eps = np.atleast_1d(np.asarray(eps, np.int64))
        visited = np.zeros(len(self.Xn), bool)  # bitmap beats a py-set
        visited[eps] = True
        s0 = self._sims(eps, q)
        # cand: max-heap by sim (store -sim); res: min-heap by sim
        cand = [(-float(s), int(e)) for s, e in zip(s0, eps)]
        heapq.heapify(cand)
        res = [(float(s), int(e)) for s, e in zip(s0, eps)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        nbrs = self.nbrs[level]
        while cand:
            cs, c = heapq.heappop(cand)
            if -cs < res[0][0] and len(res) >= ef:
                break
            row = nbrs[c]
            nb = row[row >= 0]
            nb = nb[~visited[nb]]
            if nb.size == 0:
                continue
            visited[nb] = True
            sims = self.Xn[nb] @ q
            floor = res[0][0]
            short = len(res) < ef
            for s, e in zip(sims.tolist(), nb.tolist()):
                if short or s > floor:
                    heapq.heappush(cand, (-s, e))
                    heapq.heappush(res, (s, e))
                    if len(res) > ef:
                        heapq.heappop(res)
                    floor = res[0][0]
                    short = len(res) < ef
        out = sorted(res, key=lambda t: (-t[0], t[1]))
        return (np.asarray([e for _, e in out], np.int64),
                np.asarray([s for s, _ in out], np.float32))

    def _select(self, cand: np.ndarray, sims: np.ndarray, M: int) -> np.ndarray:
        """Diversity heuristic (paper Algorithm 4, what Lucene's
        HnswGraphBuilder uses): take a candidate only if it is closer to
        the query than to every already-selected neighbor."""
        order = np.argsort(-sims, kind="stable")
        sel: list[int] = []
        for oi in order:
            c = int(cand[oi])
            if len(sel) >= M:
                break
            if not sel:
                sel.append(c)
                continue
            to_sel = self.Xn[np.asarray(sel, np.int64)] @ self.Xn[c]
            if float(to_sel.max()) < float(sims[oi]):
                sel.append(c)
        if len(sel) < M:  # backfill with nearest skipped (Lucene keepPruned)
            chosen = set(sel)
            for oi in order:
                c = int(cand[oi])
                if c not in chosen:
                    sel.append(c)
                    chosen.add(c)
                    if len(sel) >= M:
                        break
        return np.asarray(sel, np.int64)

    def _link(self, node: int, peers: np.ndarray, level: int) -> None:
        Mmax = self.Mmax0 if level == 0 else self.M
        row = self.nbrs[level][node]
        row[: len(peers)] = peers[:Mmax]
        for p in peers:
            p = int(p)
            prow = self.nbrs[level][p]
            free = np.flatnonzero(prow < 0)
            if free.size:
                prow[free[0]] = node
                continue
            # overflow: re-select the Mmax best/diverse among old + new
            cand = np.concatenate([prow, [node]]).astype(np.int64)
            sims = self.Xn[cand] @ self.Xn[p]
            keep = self._select(cand, sims.astype(np.float32), Mmax)
            prow[:] = -1
            prow[: len(keep)] = keep

    def _insert(self, i: int) -> None:
        lvl = int(self.levels[i])
        if self.entry < 0:
            self.entry, self.entry_level = i, lvl
            return
        q = self.Xn[i]
        ep = self.entry
        for lc in range(self.entry_level, lvl, -1):
            ep = self._greedy(q, ep, lc)
        eps = [ep]
        for lc in range(min(lvl, self.entry_level), -1, -1):
            cand, sims = self._search_layer(q, eps, self.efc, lc)
            peers = self._select(cand, sims, self.M)
            self._link(i, peers, lc)
            eps = cand.tolist()
        if lvl > self.entry_level:
            self.entry, self.entry_level = i, lvl

    # -- query -----------------------------------------------------------
    def search(self, q: np.ndarray, k: int, ef_search: int):
        if self.entry < 0:
            return (np.empty(0, dtype=self.ids.dtype),
                    np.empty(0, np.float32))
        qn = np.asarray(q, np.float32)
        qn = qn / max(np.linalg.norm(qn), 1e-12)
        ep = self.entry
        for lc in range(self.entry_level, 0, -1):
            ep = self._greedy(qn, ep, lc)
        idx, sims = self._search_layer(qn, [ep], max(ef_search, k), 0)
        return self.ids[idx[:k]], sims[:k]

    # -- (de)serialization ------------------------------------------------
    def save(self, path: str) -> None:
        payload = {"Xn": self.Xn, "ids": self.ids, "levels": self.levels,
                   "entry": np.asarray([self.entry, self.entry_level,
                                        self.M, self.efc], np.int64)}
        for lv, a in enumerate(self.nbrs):
            payload[f"nbr{lv}"] = a
        tmp = path + ".tmp.npz"  # .npz suffix stops savez appending one
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "_Graph":
        z = np.load(path)
        g = cls.__new__(cls)
        g.Xn = z["Xn"]
        g.ids = z["ids"]
        g.levels = z["levels"]
        ent = z["entry"]
        g.entry, g.entry_level = int(ent[0]), int(ent[1])
        g.M, g.efc = int(ent[2]), int(ent[3])
        g.Mmax0 = 2 * g.M
        g.max_level = int(g.levels.max()) if len(g.levels) else 0
        g.nbrs = [z[f"nbr{lv}"] for lv in range(g.max_level + 1)]
        return g


@ray.remote
def _search_segment(path: str, Q: np.ndarray, k: int, ef_search: int):
    """All queries against ONE segment graph (KNNWeight.searchLeaf): the
    graph loads once per task, queries amortize the load."""
    g = _Graph.load(path)
    ids_out, sims_out, q_out = [], [], []
    for qi in range(len(Q)):
        ids, sims = g.search(Q[qi], k, ef_search)
        ids_out.append(ids)
        sims_out.append(sims)
        q_out.append(np.full(len(ids), qi, np.int64))
    return (np.concatenate(ids_out) if ids_out else np.empty(0, np.int64),
            np.concatenate(sims_out) if sims_out else np.empty(0, np.float32),
            np.concatenate(q_out) if q_out else np.empty(0, np.int64))


@ray.remote
def _rebuild_segment(Xn: np.ndarray, ids: np.ndarray, M: int, efc: int,
                     path: str) -> int:
    """Merge worker: rebuild one graph from already-normalized rows."""
    g = _Graph(Xn, ids, M=M, ef_construction=efc)
    g.save(path)
    return len(ids)


@ray.remote
def _build_segment(seg_dir: str, out_path: str, vec_col: str, id_col: str,
                   M: int, ef_construction: int) -> dict:
    t = pq.read_table(seg_dir, columns=[id_col, vec_col])
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")  # arrival-order independence
    ids = ids[order]
    X = np.asarray(t.column(vec_col).to_pylist(), np.float32)[order]
    g = _Graph(_normalize(X), ids, M=M, ef_construction=ef_construction)
    g.save(out_path)
    return {"n": int(len(ids)), "path": out_path}


class HnswIndex:
    """On-disk per-segment HNSW: {dir}/hnsw_meta.json + seg={s:03d}.npz."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "hnsw_meta.json")) as f:
            self.meta = json.load(f)
        self._graphs: dict[int, _Graph] = {}

    @staticmethod
    def build(ds: Dataset, index_dir: str, vec_col: str = "embedding",
              id_col: str = "vec_id", n_segments: int = None,
              M: int = 16, ef_construction: int = 64) -> "HnswIndex":
        os.makedirs(index_dir, exist_ok=True)
        n = ds.count()
        if n_segments is None:
            # ~64k vectors per graph keeps build latency and task memory
            # bounded; one graph suffices below that
            n_segments = int(min(64, max(1, round(n / 65536))))
        S = int(n_segments)

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            seg = (pd.util.hash_array(ids.astype(object))
                   % np.uint64(S)).astype(np.int32)
            return nometa(t.select([id_col, vec_col])
                          .append_column("_seg", pa.array(seg)))

        staging = os.path.join(index_dir, "_staging")
        shutil.rmtree(staging, ignore_errors=True)
        (ds.map_batches(tag, batch_format="pyarrow")
           .write_parquet(staging, partition_cols=["_seg"],
                          compression="zstd"))
        refs, segs = [], []
        for name in sorted(os.listdir(staging)):
            if not name.startswith("_seg="):
                continue
            s = int(name.split("=", 1)[1])
            out = os.path.join(index_dir, f"seg={s:03d}.npz")
            refs.append(_build_segment.remote(
                os.path.join(staging, name), out, vec_col, id_col,
                M, ef_construction))
            segs.append(s)
        infos = ray.get(refs)
        shutil.rmtree(staging, ignore_errors=True)
        meta = {"n_segments": S, "segments": sorted(segs), "M": int(M),
                "ef_construction": int(ef_construction), "total": int(n),
                "vec_col": vec_col, "id_col": id_col,
                "seg_rows": {str(s): i["n"] for s, i in zip(segs, infos)}}
        with open(os.path.join(index_dir, "hnsw_meta.json"), "w") as f:
            json.dump(meta, f)
        return HnswIndex(index_dir)

    def append(self, ds: Dataset, n_segments: int = None) -> "HnswIndex":
        """Incremental growth, the Lucene way: new vectors become NEW
        segment graphs (existing graphs untouched — no re-insert);
        searches automatically fan over old + new. Segment ids continue
        from the current max."""
        meta = self.meta
        base = (max(meta["segments"]) + 1) if meta["segments"] else 0
        n = ds.count()
        if n == 0:
            return self
        if n_segments is None:
            n_segments = int(min(64, max(1, round(n / 65536))))
        S = int(n_segments)
        vec_col, id_col = meta["vec_col"], meta["id_col"]

        def tag(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            seg = (pd.util.hash_array(ids.astype(object))
                   % np.uint64(S)).astype(np.int32) + np.int32(base)
            return nometa(t.select([id_col, vec_col])
                          .append_column("_seg", pa.array(seg)))

        staging = os.path.join(self.index_dir, "_staging_append")
        shutil.rmtree(staging, ignore_errors=True)
        (ds.map_batches(tag, batch_format="pyarrow")
           .write_parquet(staging, partition_cols=["_seg"],
                          compression="zstd"))
        refs, segs = [], []
        for name in sorted(os.listdir(staging)):
            if not name.startswith("_seg="):
                continue
            s = int(name.split("=", 1)[1])
            out = os.path.join(self.index_dir, f"seg={s:03d}.npz")
            refs.append(_build_segment.remote(
                os.path.join(staging, name), out, vec_col, id_col,
                meta["M"], meta["ef_construction"]))
            segs.append(s)
        infos = ray.get(refs)
        shutil.rmtree(staging, ignore_errors=True)
        meta["segments"] = sorted(meta["segments"] + segs)
        meta["total"] = int(meta["total"]) + int(n)
        meta["seg_rows"].update(
            {str(s): i["n"] for s, i in zip(segs, infos)})
        with open(os.path.join(self.index_dir, "hnsw_meta.json"),
                  "w") as f:
            json.dump(meta, f)
        return self

    def force_merge(self, max_segments: int = 1) -> "HnswIndex":
        """The `_forcemerge` analogue for graph segments: while more than
        ``max_segments`` remain, rebuild the two smallest into one graph
        (TieredMergePolicy's smallest-first discipline). Graph rebuild is
        the real cost — exactly Lucene's HNSW merge story — and runs in a
        Ray task off the driver."""
        while len(self.meta["segments"]) > max_segments:
            segs = sorted(self.meta["segments"],
                          key=lambda s: int(self.meta["seg_rows"][str(s)]))
            a, b = segs[0], segs[1]
            ga, gb = self._graph(a), self._graph(b)
            Xn = np.concatenate((ga.Xn, gb.Xn))
            ids = np.concatenate((ga.ids, gb.ids))
            new_path = os.path.join(self.index_dir, f"seg={a:03d}.npz")
            # deterministic: _Graph sorts nothing itself, so order rows
            # by id first (same invariant as _build_segment)
            order = np.argsort(ids, kind="stable")
            n = ray.get(_rebuild_segment.remote(
                Xn[order], ids[order], self.meta["M"],
                self.meta["ef_construction"], new_path))
            os.remove(os.path.join(self.index_dir, f"seg={b:03d}.npz"))
            self.meta["segments"] = sorted(
                s for s in self.meta["segments"] if s != b)
            self.meta["seg_rows"][str(a)] = int(n)
            del self.meta["seg_rows"][str(b)]
            self._graphs.pop(a, None)
            self._graphs.pop(b, None)
        with open(os.path.join(self.index_dir, "hnsw_meta.json"),
                  "w") as f:
            json.dump(self.meta, f)
        return self

    def _graph(self, s: int) -> _Graph:
        if s not in self._graphs:
            self._graphs[s] = _Graph.load(
                os.path.join(self.index_dir, f"seg={s:03d}.npz"))
        return self._graphs[s]

    def search_batch(self, query_vecs: np.ndarray, k: int = 10,
                     ef_search: int = 64) -> pd.DataFrame:
        """Many queries at once: S remote tasks (one per segment, ALL
        queries each — graphs load once, segments search in parallel),
        k-bounded per-(query, segment) partials merged on the driver.
        Returns (query_idx, id, score, rank) rows."""
        Q = np.asarray(query_vecs, np.float32)
        q_ref = ray.put(Q)
        id_col = self.meta["id_col"]
        refs = [_search_segment.remote(
            os.path.join(self.index_dir, f"seg={s:03d}.npz"),
            q_ref, k, ef_search) for s in self.meta["segments"]]
        frames = []
        for ids, sims, qs in ray.get(refs):
            frames.append(pd.DataFrame(
                {"query_idx": qs, id_col: ids,
                 "score": sims.astype(np.float64)}))
        allf = pd.concat(frames, ignore_index=True)
        allf = allf.sort_values(["query_idx", "score", id_col],
                                ascending=[True, False, True],
                                kind="mergesort")
        allf = allf.groupby("query_idx", sort=True).head(k) \
            .reset_index(drop=True)
        allf["rank"] = allf.groupby("query_idx").cumcount() + 1
        return allf

    def search(self, query_vec: np.ndarray, k: int = 10,
               ef_search: int = 64,
               allow_ids=None) -> pd.DataFrame:
        """Per-segment graph search, k-bounded coordinator merge —
        KNNWeight.searchLeaf + TopDocs.merge in the reference.

        ``allow_ids`` = filtered k-NN (the plugin's filtered-query path):
        a sorted vector-id allowlist. Per segment, the beam widens
        (ef × allowed-fraction⁻¹, capped) so enough allowed hits survive;
        when the filter is MORE selective than that cap covers, the
        segment falls back to EXACT scoring over its allowed rows — the
        plugin's own exact-search threshold behavior."""
        id_col = self.meta["id_col"]
        allow = (np.asarray(sorted(allow_ids))
                 if allow_ids is not None else None)
        frames = []
        for s in self.meta["segments"]:
            g = self._graph(s)
            if allow is None:
                ids, sims = g.search(query_vec, k, ef_search)
            else:
                in_allow = np.isin(g.ids, allow)
                n_allowed = int(in_allow.sum())
                if n_allowed == 0:
                    continue
                frac = n_allowed / max(len(g.ids), 1)
                ef_eff = int(min(max(ef_search / max(frac, 1e-9),
                                     ef_search), 4 * ef_search))
                if n_allowed <= max(k, ef_search) or frac < 0.05:
                    # exact fallback over the allowed rows
                    qn = np.asarray(query_vec, np.float32)
                    qn = qn / max(np.linalg.norm(qn), 1e-12)
                    rows = np.flatnonzero(in_allow)
                    sims_all = g.Xn[rows] @ qn
                    top = np.argsort(-sims_all, kind="stable")[:k]
                    ids, sims = g.ids[rows[top]], sims_all[top]
                else:
                    ids, sims = g.search(query_vec, max(k, ef_eff),
                                         ef_eff)
                    m = np.isin(ids, allow)
                    ids, sims = ids[m][:k], sims[m][:k]
            frames.append(pd.DataFrame(
                {id_col: ids, "score": sims.astype(np.float64)}))
        if not frames:  # empty corpus / empty filter
            return pd.DataFrame({id_col: [], "score": [], "rank": []})
        allf = pd.concat(frames, ignore_index=True)
        allf = allf.sort_values(["score", id_col], ascending=[False, True],
                                kind="mergesort").head(k)
        allf["rank"] = np.arange(1, len(allf) + 1, dtype=np.int64)
        return allf.reset_index(drop=True)
