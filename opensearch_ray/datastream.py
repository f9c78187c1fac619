"""Data streams: append-only series of backing indices + rollover + retention.

Reference: MetadataCreateDataStreamService (backing indices named
``.ds-<name>-<generation>``, writes always target the latest),
`server/action/admin/indices/rollover/` (RolloverRequest conditions
max_docs / max_size / max_age) and ILM-style retention (delete the oldest
backing indices whole — the reason data streams exist: time-partitioned
deletes are directory drops, never doc-level rewrites).

Batch translation (immutable segments, SURVEY §2.9): every ``append``
builds one sub-index; the WRITE GENERATION groups consecutive appends
until a rollover condition trips, then the next append opens generation
N+1. Search unions every live backing sub-index with per-index stats (the
reference's query_then_fetch over ``.ds-*``); ``retain(last_n)`` drops
whole generations oldest-first. State is a JSON manifest, updated
atomically — a crashed append leaves a complete-or-absent sub-index dir
and the manifest never references incomplete builds.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional

import pandas as pd


class DataStream:
    def __init__(self, root: str, name: str = "stream"):
        self.root = root
        self.name = name
        os.makedirs(root, exist_ok=True)
        self._state_path = os.path.join(root, "datastream.json")
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                self.state = json.load(f)
        else:
            self.state = {"name": name, "generation": 1, "backing": []}

    # ------------------------------------------------------------ state
    def _persist(self) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f)
        os.replace(tmp, self._state_path)

    def _gen_dir(self, gen: int, part: int) -> str:
        return os.path.join(self.root,
                            f".ds-{self.name}-{gen:06d}", f"part-{part:04d}")

    def backing_indices(self) -> List[dict]:
        return list(self.state["backing"])

    # ----------------------------------------------------------- writes
    def append(self, input_path, rollover_max_docs: Optional[int] = None,
               rollover_max_size_bytes: Optional[int] = None,
               **build_kwargs) -> dict:
        """Build one sub-index from ``input_path`` into the write
        generation, then evaluate rollover conditions — the batch
        analogue of bulk-into-write-index + RolloverConditions."""
        from .index.build import build_index

        gen = int(self.state["generation"])
        part = sum(1 for b in self.state["backing"]
                   if b["generation"] == gen)
        idx_dir = self._gen_dir(gen, part)
        m = build_index(input_path, idx_dir, **build_kwargs)
        entry = {"generation": gen, "dir": idx_dir,
                 "docs": int(m.total_docs),
                 "bytes": _dir_bytes(idx_dir)}
        self.state["backing"].append(entry)
        rolled = self._maybe_rollover(rollover_max_docs,
                                      rollover_max_size_bytes)
        self._persist()
        return {"generation": gen, "index": idx_dir,
                "docs": entry["docs"], "rolled_over": rolled}

    def _maybe_rollover(self, max_docs, max_size_bytes) -> bool:
        gen = int(self.state["generation"])
        cur = [b for b in self.state["backing"] if b["generation"] == gen]
        docs = sum(b["docs"] for b in cur)
        size = sum(b["bytes"] for b in cur)
        if ((max_docs is not None and docs >= max_docs)
                or (max_size_bytes is not None and size >= max_size_bytes)):
            self.state["generation"] = gen + 1
            return True
        return False

    def rollover(self) -> int:
        """Unconditional `_rollover`: the next append opens a fresh
        generation. Returns the new write generation."""
        self.state["generation"] = int(self.state["generation"]) + 1
        self._persist()
        return self.state["generation"]

    # -------------------------------------------------------- retention
    def retain(self, last_generations: int) -> List[int]:
        """ILM delete phase: drop the oldest generations, keeping the
        newest ``last_generations`` — whole-directory removals."""
        gens = sorted({b["generation"] for b in self.state["backing"]})
        drop = gens[:-last_generations] if last_generations > 0 else gens
        for g in drop:
            shutil.rmtree(os.path.join(self.root,
                                       f".ds-{self.name}-{g:06d}"),
                          ignore_errors=True)
        self.state["backing"] = [b for b in self.state["backing"]
                                 if b["generation"] not in drop]
        self._persist()
        return drop

    # ----------------------------------------------------------- search
    def search(self, query_text: str, k: int = 10,
               operator: str = "or") -> pd.DataFrame:
        """Union search over every live backing sub-index, per-index
        stats (query_then_fetch over ``.ds-*`` — features.py's
        multi-index merge)."""
        from .search import Searcher
        from .search.features import multi_index_search
        searchers = {b["dir"]: Searcher(b["dir"])
                     for b in self.state["backing"]}
        if not searchers:
            return pd.DataFrame({"index": [], "doc_id": [], "score": []})
        return multi_index_search(searchers, query_text, k=k,
                                  operator=operator)

    def stats(self) -> dict:
        return {"name": self.name,
                "write_generation": int(self.state["generation"]),
                "backing_indices": len(self.state["backing"]),
                "total_docs": sum(b["docs"]
                                  for b in self.state["backing"])}


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(base, f))
            except OSError:
                pass
    return total
