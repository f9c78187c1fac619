"""Distributed query execution: an actor pool of per-segment-group executors.

Mirrors the reference's shard fan-out (SearchQueryThenFetchAsyncAction.java:59,128
-> per-shard query phase -> coordinator TopDocs.merge): each ``QueryExecutor``
actor owns a disjoint group of segments (its "shard"), holds the segment norms
+ a posting-row cache in memory, scores its group with the same exact
MaxScore/block-max pruned BM25 as the local Searcher, and returns its top-k
partial. The driver merges partials with the identical (score desc, docid asc)
tie-break, so cluster results == local Searcher results exactly.

Feature parity with the local path (filters, search_after, field sort,
aggs-on-hits, count) runs per shard + a bounded coordinator merge — each
shard's partial is exact over its own segments, so the merge is exact:
- filters: applied inside each shard's segment scoring (non-scoring context)
- search_after: each shard returns its page strictly after the cursor
  (SearchAfterBuilder semantics, pushed into the collector as a rank
  filter so the per-shard heap stays O(page)); coordinator re-merges
- field sort: per-shard top-k by doc values, merge on (value, docid)
- terms agg on hits: per-shard top-shard_size partials (size*1.5+10
  over-fetch, TermsAggregatorFactory discipline) + doc_count_error bound;
  coordinator reduce is O(E x shard_size), not field cardinality
- scroll: cursor loop over search_after — the executors' fixed segment set
  IS the point-in-time (PIT/CreatePitAction analogue: actor state pins the
  view for the scroll's lifetime)

Scale notes: norms are 1 byte/doc, so an executor holding G segments keeps
G x doc_count bytes — size the pool so segments-per-executor fits the heap.
Executors read per-segment postings files (shard-local lookup, like a Lucene
shard reading its own terms dict); the merged bucket layout remains the
single-scan path.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

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
        # searcher-internal segment arrays must match the restricted group
        segs_sorted = sorted(segs, key=lambda s: s.seg_id)
        self.searcher._seg_ids = np.array([s.seg_id for s in segs_sorted],
                                          dtype=np.int64)
        self.searcher._bases = np.array([s.doc_base for s in segs_sorted],
                                        dtype=np.int64)
        self.searcher._counts = np.array([s.doc_count for s in segs_sorted],
                                         dtype=np.int64)
        # warm the norm cache once per actor
        for s in segs:
            self.searcher.norms(s.seg_id)
        self._slices: Dict[tuple, np.ndarray] = {}  # sliced-scroll masks

    def _slice_allow(self, slice_id: int, slice_max: int):
        """Sorted allowlist of this shard's docids owned by slice
        (id, max) — SliceBuilder partitioning, hash(docid) % max, computed
        once per (id, max) per actor and pushed into the collector's
        docs= gate.

        Memory: 8 bytes per owned docid per cached slice; with all
        ``max`` slices scrolling one actor, the cache totals 8 B/doc of
        the shard — fine for bench-to-billions shards, but a
        crawl-scale shard should slice on a PRECOMPUTED doc-values
        column via ``filters`` instead (the reference has the same
        trade: hash slicing on _id forces a doc-values visit per doc,
        SliceBuilder docs recommend a numeric field)."""
        key = (slice_id, slice_max)
        cached = self._slices.get(key)
        if cached is None:
            import pandas as pd
            parts = []
            for seg in self.searcher.manifest.segments:
                ids = np.arange(seg.doc_count, dtype=np.int64) \
                    + seg.doc_base
                h = pd.util.hash_array(ids) % np.uint64(slice_max)
                parts.append(ids[h == slice_id])
            cached = (np.concatenate(parts) if parts
                      else np.empty(0, np.int64))
            self._slices[key] = cached
        return cached

    def search(self, query_text: str, k: int, operator: str = "or",
               filters: Optional[dict] = None,
               allowed_segs: Optional[list] = None,
               slice_spec: Optional[tuple] = None):
        docs = (self._slice_allow(*slice_spec) if slice_spec else None)
        hits = self.searcher.search(
            query_text, k=k, operator=operator, filters=filters,
            allowed_segs=set(allowed_segs) if allowed_segs else None,
            docs=docs)
        return [(h.docid, h.score) for h in hits]

    def search_after(self, query_text: str, page_size: int,
                     after: Tuple[float, int], operator: str = "or",
                     filters: Optional[dict] = None,
                     slice_spec: Optional[tuple] = None):
        """This shard's next page strictly after the (score, docid) cursor.
        The cursor is pushed into the collector (search(after=...)), so the
        per-shard heap is O(page_size) at any depth — never the shard's
        full match list."""
        docs = (self._slice_allow(*slice_spec) if slice_spec else None)
        hits = self.searcher.search(query_text, k=page_size,
                                    operator=operator, filters=filters,
                                    after=after, docs=docs)
        return [(h.docid, h.score) for h in hits]

    def search_sorted(self, query_text: str, sort_field: str, k: int,
                      ascending: bool, operator: str = "or",
                      filters: Optional[dict] = None):
        df = self.searcher.search_sorted(query_text, sort_field, k=k,
                                         ascending=ascending,
                                         operator=operator, filters=filters)
        return list(zip(df["_docid"].tolist(), df[sort_field].tolist()))

    def terms_agg_on_hits(self, query_text: str, field: str,
                          shard_size: int, operator: str = "or"):
        """This shard's top-``shard_size`` key counts plus the smallest
        count it still included — the per-shard over-fetch discipline of
        TermsAggregatorFactory (shard_size default size*1.5+10): the
        coordinator reduce is bounded by E x shard_size keys instead of the
        field's global cardinality, and the last-included count bounds the
        doc_count_error for keys a shard did NOT report."""
        df = self.searcher.terms_agg_on_hits(query_text, field,
                                             size=shard_size,
                                             operator=operator)
        # a shard that returned fewer than shard_size keys is COMPLETE —
        # nothing was cut, so it contributes no error
        worst = int(df["doc_count"].iloc[-1]) if len(df) >= shard_size else 0
        return list(zip(df[field].tolist(), df["doc_count"].tolist())), worst

    def count(self, query_text: str, operator: str = "or") -> int:
        return self.searcher.count(query_text, operator=operator)

    def msearch(self, requests: List[Tuple[str, int, str]]):
        """Batched search (`_msearch`): all requests in ONE actor round-trip."""
        return [self.search(q, k, op) for q, k, op in requests]

    def mexecute_dsl(self, bodies: List[dict], text_field: str):
        """Batched execute_dsl: every body in one actor round-trip."""
        return [self.execute_dsl(b, text_field) for b in bodies]

    def count_terms(self, query_text: str):
        terms = self.searcher.analyzer.tokens(query_text)
        return self.searcher.term_stats(terms)

    def execute_dsl(self, body: dict, text_field: str):
        """This shard's top hits for a JSON-DSL request body (query/filters
        only — sort/collapse/rescore are coordinator concerns). Scores are
        GLOBAL (term stats come from the index-level stats shards), so the
        coordinator's (score desc, docid asc) merge is exact."""
        from .dsl import execute_search
        shard = dict(body)
        shard["from"], shard["size"] = 0, (int(body.get("from", 0))
                                           + int(body.get("size", 10)))
        shard.pop("_source", None)  # fetch phase happens at the coordinator
        hits = execute_search(self.searcher, shard, text_field=text_field,
                              id_col="_docid")
        return list(zip(hits["_docid"].tolist(), hits["score"].tolist()))


class SearchCluster:
    """Driver-side handle: fan out a query to E executors, k-way merge."""

    def __init__(self, index_dir: str, num_executors: int = 4,
                 dtype=np.float32):
        from ..index.build import load_manifest

        manifest = load_manifest(index_dir)
        seg_ids = sorted(s.seg_id for s in manifest.segments)
        # sizing rule: executors are 1-CPU actors pinned for the cluster's
        # lifetime — never reserve every CPU of a small session (a pool of
        # concurrency >= num_cpus starves concurrent Ray Data stages and
        # deadlocks pipelines; see CLAUDE.md invariant). Keep >= 2 CPUs of
        # headroom for driver-side Dataset stages.
        try:
            avail = int(ray.cluster_resources().get("CPU", 4))
        except Exception:  # not initialised yet — Ray Data will init lazily
            avail = 4
        num_executors = max(1, min(num_executors, len(seg_ids), avail - 2))
        groups: List[List[int]] = [[] for _ in range(num_executors)]
        for i, sid in enumerate(seg_ids):
            groups[i % num_executors].append(sid)
        dtype_str = "float32" if dtype == np.float32 else "float64"
        groups = [g for g in groups if g]
        self.executors = [
            QueryExecutor.remote(index_dir, g, dtype_str) for g in groups
        ]
        self._groups = groups
        #: routed layout (build_index_from_dataset): seg_id ==
        #: hash(partition_key) % P, so `routing=` can shrink the shard set
        self._routing = (manifest.build_params or {}).get("routing")
        self._index_dir = index_dir
        self._fetcher: Optional[Searcher] = None  # lazy fetch-phase reader

    def _route(self, routing) -> Optional[Tuple[int, int]]:
        """routing value -> (executor index, seg_id) of the owning shard,
        or None when the index is not hash-routed (then every shard must
        be searched — the reference behaves the same without a routing
        mapping). OperationRouting.generateShardId analogue on the
        builder's pd.util.hash_array partitioner."""
        if routing is None or not self._routing:
            return None
        import pandas as pd
        P = int(self._routing["num_partitions"])
        part = int(pd.util.hash_array(
            np.asarray([routing], dtype=object))[0] % np.uint64(P))
        for ei, g in enumerate(self._groups):
            if part in g:
                return ei, part
        return None

    @staticmethod
    def _merge_hits(partials, k: int) -> List[SearchHit]:
        docs = np.array([d for p in partials for d, _ in p], dtype=np.int64)
        scores = np.array([s for p in partials for _, s in p])
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return [SearchHit(int(docs[i]), float(scores[i])) for i in order]

    def search(self, query_text: str, k: int = 10, operator: str = "or",
               filters: Optional[dict] = None,
               routing=None) -> List[SearchHit]:
        """``routing``: search only the shard owning the routing value —
        the ?routing search parameter. Requires the routed layout
        (build_index_from_dataset); on an unrouted index it is ignored
        and every shard is searched."""
        owner = self._route(routing)
        if owner is not None:
            ei, seg = owner
            partials = [ray.get(self.executors[ei].search.remote(
                query_text, k, operator, filters, [seg]))]
        else:
            partials = ray.get([
                e.search.remote(query_text, k, operator, filters)
                for e in self.executors])
        return self._merge_hits(partials, k)

    def search_with_timeout(self, query_text: str, k: int = 10,
                            timeout_ms: float = 1000.0,
                            allow_partial_search_results: bool = True,
                            operator: str = "or",
                            filters: Optional[dict] = None) -> dict:
        """Request-level ``timeout`` + ``allow_partial_search_results``
        (SearchRequest.allowPartialSearchResults; QueryPhase's timeout
        raises TimeExceededException and the coordinator keeps the shards
        that answered): shard fan-out under a coordinator deadline via
        ``ray.wait``. Shards missing the deadline are excluded, the
        response is marked ``timed_out`` and the ``_shards`` section
        carries the accounting — the reference's partial-results shape.
        With allow_partial_search_results=False the request fails instead
        (SearchPhaseExecutionException analogue -> TimeoutError). Late
        shard tasks are left to finish and be dropped — actor tasks are
        not forcibly cancelled, matching the reference's best-effort
        cancellation."""
        refs = [e.search.remote(query_text, k, operator, filters)
                for e in self.executors]
        done, pending = ray.wait(refs, num_returns=len(refs),
                                 timeout=timeout_ms / 1000.0)
        if pending and not allow_partial_search_results:
            raise TimeoutError(
                f"{len(pending)}/{len(refs)} shards missed the "
                f"{timeout_ms:g} ms deadline and partial results are "
                "disallowed")
        partials = ray.get(done) if done else []
        return {"hits": self._merge_hits(partials, k),
                "timed_out": bool(pending),
                "_shards": {"total": len(refs), "successful": len(done),
                            "skipped": len(pending), "failed": 0}}

    def async_search(self, query_text: str, k: int = 10,
                     operator: str = "or",
                     filters: Optional[dict] = None) -> "AsyncSearch":
        """Submit-and-poll search — the async-search plugin's
        `_async_search` submit/status/get surface, Ray-native: shard tasks
        are in flight as ObjectRefs the moment this returns; the handle
        polls with zero-timeout ray.wait and merges whatever has landed."""
        refs = [e.search.remote(query_text, k, operator, filters)
                for e in self.executors]
        return AsyncSearch(self, refs, k)

    def search_after(self, query_text: str, page_size: int,
                     after: Tuple[float, int], operator: str = "or",
                     filters: Optional[dict] = None,
                     slice_spec: Optional[tuple] = None) -> List[SearchHit]:
        partials = ray.get([
            e.search_after.remote(query_text, page_size, after, operator,
                                  filters, slice_spec)
            for e in self.executors])
        return self._merge_hits(partials, page_size)

    def scroll(self, query_text: str, page_size: int = 100,
               operator: str = "or", filters: Optional[dict] = None,
               slice_spec: Optional[tuple] = None
               ) -> Iterator[List[SearchHit]]:
        """Deep pagination: yields successive pages until exhausted. The
        executors' pinned segment groups give PIT semantics for the scroll's
        lifetime.

        ``slice_spec`` = (id, max) — sliced scroll (SliceBuilder): the doc
        space partitions by hash(docid) % max, so ``max`` consumers scroll
        disjoint slices in parallel and their union is exactly the
        unsliced scroll (the parallel-export surface `_search?scroll`
        with `"slice"` exists for). Per-shard slice allowlists are
        computed once per actor and pushed into the collector's docs=
        gate."""
        if slice_spec is not None:
            sid, smax = slice_spec
            if not (0 <= int(sid) < int(smax)):
                raise ValueError(f"slice id {sid} not in [0, {smax})")
        page = self._sliced_first_page(query_text, page_size, operator,
                                       filters, slice_spec)
        while page:
            yield page
            cur = (page[-1].score, page[-1].docid)
            page = self.search_after(query_text, page_size, cur,
                                     operator=operator, filters=filters,
                                     slice_spec=slice_spec)

    def _sliced_first_page(self, query_text, page_size, operator, filters,
                           slice_spec):
        partials = ray.get([
            e.search.remote(query_text, page_size, operator, filters,
                            None, slice_spec)
            for e in self.executors])
        return self._merge_hits(partials, page_size)

    def search_sorted(self, query_text: str, sort_field: str, k: int = 10,
                      ascending: bool = True, operator: str = "or",
                      filters: Optional[dict] = None):
        import pandas as pd
        partials = ray.get([
            e.search_sorted.remote(query_text, sort_field, k, ascending,
                                   operator, filters)
            for e in self.executors])
        rows = [r for p in partials for r in p]
        df = pd.DataFrame(rows, columns=["_docid", sort_field])
        df = df.sort_values([sort_field, "_docid"],
                            ascending=[ascending, True], kind="mergesort")
        return df.head(k).reset_index(drop=True)

    def terms_agg_on_hits(self, query_text: str, field: str, size: int = 10,
                          operator: str = "or",
                          shard_size: Optional[int] = None,
                          return_error: bool = False):
        """Distributed terms agg over query hits with the reference's
        shard_size discipline (TermsAggregatorFactory: default
        size*1.5+10): every shard returns its top-shard_size partial, the
        coordinator sums — reduce memory is O(E x shard_size), not the
        field's global cardinality. ``return_error=True`` additionally
        returns the per-key doc_count_error_upper_bound (the sum of the
        last-included counts of shards that didn't report the key —
        InternalTerms.doCountError semantics)."""
        import pandas as pd
        if shard_size is None:
            shard_size = int(size * 1.5 + 10)
        partials = ray.get([
            e.terms_agg_on_hits.remote(query_text, field, shard_size,
                                       operator)
            for e in self.executors])
        acc: Dict[object, int] = {}
        for rows, _worst in partials:
            for key, n in rows:
                acc[key] = acc.get(key, 0) + int(n)
        df = pd.DataFrame({field: list(acc), "doc_count": list(acc.values())})
        df = df.sort_values(["doc_count", field], ascending=[False, True],
                            kind="mergesort").head(size)
        df = df.reset_index(drop=True)
        if return_error:
            worst_of = [w for _, w in partials]
            seen_of = [{k for k, _ in rows} for rows, _ in partials]
            df["doc_count_error_upper_bound"] = [
                sum(w for w, sn in zip(worst_of, seen_of) if key not in sn)
                for key in df[field]]
        return df

    def count(self, query_text: str, operator: str = "or") -> int:
        return int(sum(ray.get([e.count.remote(query_text, operator)
                                for e in self.executors])))

    def msearch(self, requests: List[Tuple[str, int, str]]
                ) -> List[List[SearchHit]]:
        """Batched multi-query (`_msearch` API): ships the WHOLE request list
        to every executor in one round-trip (N queries cost one fan-out, not
        N), then merges per query."""
        per_exec = ray.get([e.msearch.remote(requests)
                            for e in self.executors])
        out = []
        for qi, (_, k, _) in enumerate(requests):
            out.append(self._merge_hits([pe[qi] for pe in per_exec], k))
        return out

    def execute_search(self, body: dict, text_field: str = "text",
                       id_col: str = "doc_id"):
        """Distributed JSON-DSL search (the `_search` body through the
        shard fan-out): every executor runs the body on its segment group,
        the coordinator merges by (score desc, docid asc) and pages —
        query_then_fetch for the DSL surface. Bodies with sort / collapse /
        rescore are not distributed here (single-searcher concerns)."""
        import pandas as pd
        for key in ("sort", "collapse", "rescore"):
            if body.get(key):
                raise ValueError(f"{key} is not supported on the cluster "
                                 "DSL path")
        partials = ray.get([e.execute_dsl.remote(body, text_field)
                            for e in self.executors])
        frm = int(body.get("from", 0))
        size = int(body.get("size", 10))
        merged = self._merge_hits(partials, frm + size)[frm:]
        out = pd.DataFrame({id_col: [h.docid for h in merged],
                            "score": [h.score for h in merged]})
        src = body.get("_source")
        if src and len(out):
            # fetch phase at the coordinator (query_then_fetch's second
            # round-trip) — reads only the owning segments' doc stores
            import numpy as np
            from .dsl import _fetch_aligned
            if self._fetcher is None:
                self._fetcher = Searcher(self._index_dir)
            for c, vals in _fetch_aligned(
                    self._fetcher, out[id_col].to_numpy(np.int64),
                    list(src)).items():
                out[c] = vals
        return out

    def msearch_dsl(self, bodies: List[dict], text_field: str = "text",
                    id_col: str = "doc_id") -> List:
        """`_msearch` with JSON-DSL bodies: ALL bodies ship to every
        executor in ONE actor round-trip (the reference's msearch bulk
        framing — one transport message, N searches), then each body's
        partials merge exactly like execute_search. Latency is one
        fan-out instead of len(bodies)."""
        import pandas as pd
        for body in bodies:
            for key in ("sort", "collapse", "rescore"):
                if body.get(key):
                    raise ValueError(f"{key} is not supported on the "
                                     "cluster DSL path")
        per_exec = ray.get([e.mexecute_dsl.remote(bodies, text_field)
                            for e in self.executors])
        out = []
        for qi, body in enumerate(bodies):
            partials = [p[qi] for p in per_exec]
            frm = int(body.get("from", 0))
            size = int(body.get("size", 10))
            merged = self._merge_hits(partials, frm + size)[frm:]
            out.append(pd.DataFrame(
                {id_col: [h.docid for h in merged],
                 "score": [h.score for h in merged]}))
        return out

    def shutdown(self):
        for e in self.executors:
            ray.kill(e)
        self.executors = []


class AsyncSearch:
    """Handle for an in-flight fan-out search (the async-search plugin's
    submit/status/get lifecycle). The shard tasks run regardless; the
    handle only decides when and how much to merge:

    - ``status()``  — non-blocking shard accounting (`GET
      _async_search/status/<id>` shape: is_running + _shards counts).
    - ``get(partial=True)`` — merge the shards that have completed so far
      (the plugin's partial-response semantics while is_running).
    - ``get()`` — block until every shard answered, merge the full top-k
      (equivalent to the synchronous search result).
    """

    def __init__(self, cluster: "SearchCluster", refs, k: int):
        self._cluster = cluster
        self._refs = list(refs)
        self._k = int(k)

    def status(self) -> dict:
        done, pending = ray.wait(self._refs, num_returns=len(self._refs),
                                 timeout=0)
        return {"is_running": bool(pending),
                "_shards": {"total": len(self._refs),
                            "successful": len(done),
                            "skipped": 0, "failed": 0}}

    def get(self, partial: bool = False) -> dict:
        if partial:
            done, pending = ray.wait(self._refs,
                                     num_returns=len(self._refs),
                                     timeout=0)
        else:
            done, pending = self._refs, []
        partials = ray.get(done) if done else []
        return {"hits": SearchCluster._merge_hits(partials, self._k),
                "is_partial": bool(pending),
                "_shards": {"total": len(self._refs),
                            "successful": len(done),
                            "skipped": len(pending), "failed": 0}}
