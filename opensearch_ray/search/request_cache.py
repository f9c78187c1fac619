"""Shard-request cache — IndicesRequestCache analogue.

Reference: ``server/src/main/java/org/opensearch/indices/
IndicesRequestCache.java`` — a size-bounded LRU keyed by the request
bytes, serving whole query-phase results (hits=size:0 aggregations in
the reference; full request results here), invalidated on refresh.
Segments in this engine are IMMUTABLE, so entries never need
refresh-invalidation: the cache is a plain bounded LRU with the
reference's hit/miss stats surface (`_stats/request_cache`).

Un-cacheable requests — anything that cannot be canonically serialized
(Python-callable scripts, derived-field definitions) — bypass the cache
and execute directly, like the reference's non-deterministic-query
opt-out (DateMath `now`, scripted queries).
"""
from __future__ import annotations

import json
from collections import OrderedDict
from typing import Optional


class RequestCache:
    """Bounded LRU over ``execute_request`` results for one Searcher."""

    def __init__(self, max_entries: int = 256):
        self.max_entries = int(max_entries)
        self._lru: "OrderedDict[str, dict]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def cache_key(body: dict, text_field: str) -> Optional[str]:
        """Canonical request bytes, or None when un-cacheable."""
        try:
            return text_field + "\x00" + json.dumps(
                body, sort_keys=True, separators=(",", ":"))
        except TypeError:
            return None  # callables / non-JSON values: bypass

    def execute(self, s, body: dict, text_field: str = "text",
                id_col: str = "doc_id") -> dict:
        from .dsl import execute_request

        key = self.cache_key(body, text_field)
        if key is not None and key in self._lru:
            self._lru.move_to_end(key)
            self.hits += 1
            out = self._lru[key]
            # hand out a fresh frame so callers can mutate their copy
            return {**out, "hits": out["hits"].copy()}
        result = execute_request(s, body, text_field=text_field,
                                 id_col=id_col)
        if key is not None:
            self.misses += 1
            self._lru[key] = {**result, "hits": result["hits"].copy()}
            while len(self._lru) > self.max_entries:
                self._lru.popitem(last=False)
        return result

    def stats(self) -> dict:
        """The `_stats/request_cache` shape (hit/miss/entry counts)."""
        return {"hit_count": self.hits, "miss_count": self.misses,
                "entries": len(self._lru)}

    def clear(self) -> None:
        """`POST /<index>/_cache/clear?request=true` analogue."""
        self._lru.clear()
