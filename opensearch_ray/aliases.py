"""Index aliases — the `_aliases` API surface.

Reference semantics (server/cluster/metadata/AliasMetadata.java,
MetadataIndexAliasesService.java; rest _aliases actions add/remove):

- an alias names one or more indexes; searching the alias fans out to
  every member and merges like a multi-index search;
- a member may carry a FILTER query — queries through the alias see only
  matching docs, transparently (filter context, scores unaffected);
- one member may be the WRITE index (``is_write_index``) — resolves
  which index an indexing call through the alias targets.

Ray-native shape: the registry is a JSON document (atomic tmp+rename,
like the index manifest); search applies each member's filter as a
sorted-docid allowlist pushed into ``Searcher.search(docs=...)`` — the
collector-level filter-context gate, so disallowed candidates never
reach the top-k heap.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


class AliasRegistry:
    """alias -> [{"index": dir, "filter": query|None, "is_write_index":
    bool}] with atomic persistence."""

    def __init__(self, path: str):
        self.path = path
        self.aliases: Dict[str, List[dict]] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.aliases = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.aliases, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # ------------------------------------------------------------ actions

    def update(self, actions: List[dict]) -> None:
        """The `_aliases` POST body: [{"add": {"index", "alias",
        "filter"?, "is_write_index"?}} | {"remove": {...}}] — applied
        atomically (all actions then one save, like the reference's
        single cluster-state update)."""
        staged = {a: list(ms) for a, ms in self.aliases.items()}
        for act in actions:
            (kind, body), = act.items()
            alias, index = body["alias"], body["index"]
            members = staged.setdefault(alias, [])
            members[:] = [m for m in members if m["index"] != index]
            if kind == "add":
                members.append({
                    "index": index,
                    "filter": body.get("filter"),
                    "is_write_index": bool(body.get("is_write_index"))})
            elif kind != "remove":
                raise ValueError(f"unknown alias action: {kind}")
            if not members:
                del staged[alias]
        self.aliases = staged
        self._save()

    def resolve(self, name: str) -> List[dict]:
        """Member list for an alias; a concrete index dir resolves to
        itself (the reference's index-or-alias expression resolution)."""
        if name in self.aliases:
            return self.aliases[name]
        return [{"index": name, "filter": None, "is_write_index": True}]

    def write_index(self, name: str) -> str:
        """The index an indexing request through ``name`` targets
        (MetadataIndexAliasesService write-index validation)."""
        members = self.resolve(name)
        writers = [m for m in members if m.get("is_write_index")]
        if len(members) == 1 and not writers:
            return members[0]["index"]
        if len(writers) != 1:
            raise ValueError(
                f"alias {name!r} does not have a unique write index")
        return writers[0]["index"]

    def indices_for(self, name: str) -> List[str]:
        return [m["index"] for m in self.resolve(name)]

    # ------------------------------------------------------------- search

    def search(self, name: str, query_text: str, k: int = 10,
               operator: str = "or",
               dtype=None) -> pd.DataFrame:
        """Search through an alias: per-member filtered BM25 (each index
        scores with its OWN stats — query_then_fetch, no cross-index
        DFS), merged on (score desc, index asc, docid asc).
        -> (index, doc_id, score)."""
        from .search import Searcher
        from .search import dsl

        rows = []
        for m in sorted(self.resolve(name), key=lambda m: m["index"]):
            kwargs = {} if dtype is None else {"dtype": dtype}
            s = Searcher(m["index"], **kwargs)
            docs: Optional[np.ndarray] = None
            if m.get("filter"):
                docs = dsl.query_docs(s, m["filter"])
                if docs.size == 0:
                    continue
            for h in s.search(query_text, k=k, operator=operator,
                              docs=docs):
                rows.append((m["index"], h.docid, h.score))
        rows.sort(key=lambda r: (-r[2], r[0], r[1]))
        return pd.DataFrame(rows[:k],
                            columns=["index", "doc_id", "score"])
