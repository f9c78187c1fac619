"""Percolator: registered queries matched against incoming documents.

Reference: the percolator module stores queries as documents and, at
percolate time, extracts candidate queries via the query-terms it indexed,
then verifies each candidate against the in-memory document
(modules/percolator/ PercolatorQueryBuilder, PercolateQueryBuilder's
candidate-matching via extracted terms). Same shape here:

- ``register`` compiles a bool-style query and records a term -> query-ids
  map (the "query index")
- ``percolate`` runs as ONE ``map_batches`` pass: per doc, candidate query
  ids = union over the doc's tokens of the term map (cheap dict hits), then
  full verification of just the candidates. The compiled query table is a
  broadcast (``ray.put``) — tiny next to the corpus, never shuffled.

Match-all-style queries with no positive terms are verified against every
doc (the reference's MatchAllDocs candidate path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .analysis import get_analyzer


@dataclass
class _Query:
    query_id: str
    must: Tuple[str, ...] = ()
    should: Tuple[str, ...] = ()
    must_not: Tuple[str, ...] = ()
    minimum_should_match: int = 0
    phrase: Optional[Tuple[str, ...]] = None  # analyzed phrase tokens
    phrase_pos: Tuple[int, ...] = ()  # their analyzed positions (stop gaps kept)

    def matches(self, tok_set: set, pos_of: Dict[str, List[int]]) -> bool:
        if any(t not in tok_set for t in self.must):
            return False
        if any(t in tok_set for t in self.must_not):
            return False
        if self.should:
            need = max(1, self.minimum_should_match)
            if sum(1 for t in self.should if t in tok_set) < need:
                return False
        if self.phrase:
            # position-gap-aware phrase verification, identical semantics to
            # Searcher.match_phrase / _match_phrase_textverify: a stopword
            # between phrase terms leaves a position gap that must NOT match
            # an adjacent-token document ("hash the join" != phrase "hash join")
            deltas = [p - self.phrase_pos[0] for p in self.phrase_pos]
            pos_sets = [set(pos_of.get(t, ())) for t in self.phrase]
            if not all(pos_sets):
                return False
            ok = any(all((s0 + dp) in ps for dp, ps in zip(deltas, pos_sets))
                     for s0 in pos_of.get(self.phrase[0], ()))
            if not ok:
                return False
        return True


class Percolator:
    def __init__(self, analyzer: str = "default"):
        self.analyzer_name = analyzer
        self.queries: Dict[str, _Query] = {}
        self._term_map: Dict[str, List[str]] = {}
        self._unconditional: List[str] = []

    def register(self, query_id: str, must: Sequence[str] = (),
                 should: Sequence[str] = (), must_not: Sequence[str] = (),
                 minimum_should_match: int = 0,
                 phrase: Optional[str] = None) -> None:
        an = get_analyzer(self.analyzer_name)
        norm = lambda ts: tuple(t for x in ts for t in an.tokens(x))
        ptoks, ppos = an.analyze(phrase) if phrase else ((), ())
        q = _Query(query_id, norm(must), norm(should), norm(must_not),
                   minimum_should_match,
                   tuple(ptoks) if ptoks else None, tuple(ppos))
        self.queries[query_id] = q
        # candidate triggers: any positive term (must / should / phrase)
        triggers = set(q.must) | set(q.should) | set(q.phrase or ())
        if triggers:
            for t in triggers:
                self._term_map.setdefault(t, []).append(query_id)
        else:
            self._unconditional.append(query_id)

    def percolate(self, ds: Dataset, text_col: str = "text",
                  id_col: str = "doc_id") -> Dataset:
        """-> Dataset[(id_col, query_id)] for every (doc, matching query)."""
        import ray

        state_ref = ray.put((self.queries, self._term_map,
                             self._unconditional, self.analyzer_name))

        def match(t: pa.Table) -> pa.Table:
            queries, term_map, uncond, an_name = ray.get(state_ref)
            an = get_analyzer(an_name)
            out_ids, out_qs = [], []
            for did, s in zip(t.column(id_col).to_pylist(),
                              t.column(text_col).to_pylist()):
                toks, poss = an.analyze(s or "")
                tok_set = set(toks)
                pos_of: Dict[str, List[int]] = {}
                for tok, p in zip(toks, poss):
                    pos_of.setdefault(tok, []).append(p)
                cands = set(uncond)
                for tok in tok_set:
                    hits = term_map.get(tok)
                    if hits:
                        cands.update(hits)
                for qid in cands:
                    if queries[qid].matches(tok_set, pos_of):
                        out_ids.append(did)
                        out_qs.append(qid)
            return pa.table({id_col: pa.array(out_ids),
                             "query_id": pa.array(out_qs, pa.string())})

        return ds.map_batches(match, batch_format="pyarrow")
