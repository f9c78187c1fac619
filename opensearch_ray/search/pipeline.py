"""Search pipelines: request/response processors around a search.

Ref: server/search/pipeline/ + modules/search-pipeline-common/ — processors
`filter_query`, `rename_field`, `truncate_hits`, `collapse`, `oversample`,
`script`. A pipeline wraps a Searcher call: request processors rewrite the
(query_text, k, operator, filters) request; response processors post-process
the hit list / fetched frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Dict, List, Optional

from .searcher import Searcher, SearchHit


@dataclass
class SearchRequest:
    query_text: str
    k: int = 10
    operator: str = "or"
    filters: Optional[Dict[str, object]] = None


RequestProcessor = Callable[[SearchRequest], SearchRequest]
ResponseProcessor = Callable[[SearchRequest, List[SearchHit]], List[SearchHit]]


# ---------------------------------------------------------- request procs

def filter_query(extra_filters: Dict[str, object]) -> RequestProcessor:
    """filter_query processor: AND an extra filter clause into every request."""
    def p(req: SearchRequest) -> SearchRequest:
        merged = dict(req.filters or {})
        merged.update(extra_filters)
        return replace(req, filters=merged)
    return p


def oversample(factor: float) -> RequestProcessor:
    """oversample processor: widen k (pair with truncate_hits after rerank)."""
    def p(req: SearchRequest) -> SearchRequest:
        return replace(req, k=max(req.k, int(req.k * factor)))
    return p


def script_request(fn: Callable[[SearchRequest], SearchRequest]) -> RequestProcessor:
    return fn


# --------------------------------------------------------- response procs

def truncate_hits(size: int) -> ResponseProcessor:
    def p(req: SearchRequest, hits: List[SearchHit]) -> List[SearchHit]:
        return hits[:size]
    return p


def min_score(threshold: float) -> ResponseProcessor:
    def p(req: SearchRequest, hits: List[SearchHit]) -> List[SearchHit]:
        return [h for h in hits if h.score >= threshold]
    return p


def script_response(fn: Callable[[List[SearchHit]], List[SearchHit]]
                    ) -> ResponseProcessor:
    def p(req: SearchRequest, hits: List[SearchHit]) -> List[SearchHit]:
        return fn(hits)
    return p


def collapse_response(searcher: Searcher, field: str) -> ResponseProcessor:
    """collapse response processor (CollapseResponseProcessor.java): keep
    the best-ranked hit per distinct value of ``field`` (doc values), in
    original rank order."""
    def p(req: SearchRequest, hits: List[SearchHit]) -> List[SearchHit]:
        if not hits:
            return hits
        t = searcher.fetch([h.docid for h in hits], columns=[field])
        val = dict(zip(t.column("_docid").to_pylist(),
                       t.column(field).to_pylist()))
        seen, out = set(), []
        for h in hits:
            v = val.get(h.docid)
            if v in seen:
                continue
            seen.add(v)
            out.append(h)
        return out
    return p


def rename_field(mapping: Dict[str, str]
                 ) -> Callable[["object"], "object"]:
    """rename_field response processor (RenameFieldResponseProcessor.java):
    applies at the FETCH stage — renames columns of the fetched stored-field
    frame (hits themselves carry only docid/score here)."""
    def p(frame):
        return frame.rename_columns(
            [mapping.get(c, c) for c in frame.column_names]) \
            if hasattr(frame, "rename_columns") \
            else frame.rename(columns=mapping)
    return p


@dataclass
class SearchPipeline:
    request_processors: List[RequestProcessor] = field(default_factory=list)
    response_processors: List[ResponseProcessor] = field(default_factory=list)

    def search(self, searcher: Searcher, query_text: str, k: int = 10,
               operator: str = "or",
               filters: Optional[Dict[str, object]] = None) -> List[SearchHit]:
        req = SearchRequest(query_text, k, operator, filters)
        for rp in self.request_processors:
            req = rp(req)
        hits = searcher.search(req.query_text, k=req.k, operator=req.operator,
                               filters=req.filters)
        for sp in self.response_processors:
            hits = sp(req, hits)
        return hits
