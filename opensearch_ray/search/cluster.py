"""Distributed query execution: an actor pool of per-segment-group executors.

Mirrors the reference's shard fan-out (SearchQueryThenFetchAsyncAction.java:59,128
-> per-shard query phase -> coordinator TopDocs.merge): each ``QueryExecutor``
actor owns a disjoint group of segments (its "shard"), holds the segment norms
+ a posting-row cache in memory, scores its group with the same exact
MaxScore/block-max pruned BM25 as the local Searcher, and returns its top-k
partial. The driver merges partials with the identical (score desc, docid asc)
tie-break, so cluster results == local Searcher results exactly.

Scale notes: norms are 1 byte/doc, so an executor holding G segments keeps
G x doc_count bytes — size the pool so segments-per-executor fits the heap.
Executors read per-segment postings files (shard-local lookup, like a Lucene
shard reading its own terms dict); the merged bucket layout remains the
single-scan path.
"""

from __future__ import annotations

from typing import List

import numpy as np

import ray

from .searcher import Searcher, SearchHit


@ray.remote
class QueryExecutor:
    def __init__(self, index_dir: str, seg_ids: List[int],
                 dtype_str: str = "float32"):
        dtype = np.float32 if dtype_str == "float32" else np.float64
        self.searcher = Searcher(index_dir, dtype=dtype)
        # restrict to this executor's segment group (shard semantics)
        segs = [s for s in self.searcher.manifest.segments if s.seg_id in set(seg_ids)]
        self.searcher.manifest.segments = segs
        self.searcher.manifest.merged = False  # per-segment postings lookup
        # warm the norm cache once per actor
        for s in segs:
            self.searcher.norms(s.seg_id)

    def search(self, query_text: str, k: int, operator: str = "or"):
        hits = self.searcher.search(query_text, k=k, operator=operator)
        return [(h.docid, h.score) for h in hits]

    def count_terms(self, query_text: str):
        terms = self.searcher.analyzer.tokens(query_text)
        return self.searcher.term_stats(terms)


class SearchCluster:
    """Driver-side handle: fan out a query to E executors, k-way merge."""

    def __init__(self, index_dir: str, num_executors: int = 4,
                 dtype=np.float32):
        from ..index.build import load_manifest

        manifest = load_manifest(index_dir)
        seg_ids = sorted(s.seg_id for s in manifest.segments)
        num_executors = max(1, min(num_executors, len(seg_ids)))
        groups: List[List[int]] = [[] for _ in range(num_executors)]
        for i, sid in enumerate(seg_ids):
            groups[i % num_executors].append(sid)
        dtype_str = "float32" if dtype == np.float32 else "float64"
        self.executors = [
            QueryExecutor.remote(index_dir, g, dtype_str) for g in groups if g
        ]

    def search(self, query_text: str, k: int = 10, operator: str = "or",
               ) -> List[SearchHit]:
        partials = ray.get([e.search.remote(query_text, k, operator)
                            for e in self.executors])
        docs = np.array([d for p in partials for d, _ in p], dtype=np.int64)
        scores = np.array([s for p in partials for _, s in p])
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return [SearchHit(int(docs[i]), float(scores[i])) for i in order]

    def shutdown(self):
        for e in self.executors:
            ray.kill(e)
        self.executors = []
