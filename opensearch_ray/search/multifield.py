"""Multi-field indexing + multi_match query.

Reference mapping: OpenSearch keeps one postings/norms structure PER FIELD
inside each Lucene segment (server/index/mapper/MapperService.java field
mapping tree; per-field Terms in the codec). We mirror that as one sub-index
per analyzed text field under the same root (field-<name>/), built over the
SAME corpus with the SAME sort order, so segment-local and global docids
align across fields and each field carries its own df/ttf stats, norms and
avgdl — exactly Lucene's per-field BM25 inputs.

multi_match (server/index/query/MultiMatchQueryBuilder.java:1-100):
- ``best_fields`` (default): dis_max over the per-field match queries —
  score = max_f(score_f) + tie_breaker * Σ(other fields)   (DisMaxQueryBuilder
  semantics, DisjunctionMaxQuery)
- ``most_fields``: sum of per-field scores (bool-should over fields)
Per-field boosts multiply that field's score (BM25 term weight is linear in
boost: weight = boost*idf*(k1+1)).

Build cost note: N fields = N analysis passes over the corpus (one pruned
column read per field), matching the reference's per-field analysis work; the
corpus text is never shuffled either way.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .searcher import Searcher, SearchHit


def build_multi_field_index(
    input_path,
    index_dir: str,
    fields: Sequence[str],
    analyzer="default",
    sort_cols: Sequence[str] = ("conv_id", "turn_idx"),
    copy_to: Optional[Dict[str, Sequence[str]]] = None,
    **build_kwargs,
) -> dict:
    """Build one sub-index per analyzed field (same corpus, same doc order).
    ``analyzer`` may be a single name or {field: analyzer} (per-field
    analyzers, the mapping-tree analogue).

    ``copy_to`` maps a TARGET field name to its source fields
    (FieldMapper.CopyTo / DocumentParser.parseCopyFields): the target is a
    real indexed field whose per-doc text is every source's values — its
    own postings, df and length norms (dl = Σ source dls), searchable like
    any field but never stored separately (fetch reads the sources)."""
    from ..index.build import build_index

    os.makedirs(index_dir, exist_ok=True)
    copy_to = dict(copy_to or {})
    an_of = (dict(analyzer) if isinstance(analyzer, dict)
             else {f: analyzer for f in [*fields, *copy_to]})
    for f in fields:
        build_index(input_path, os.path.join(index_dir, f"field-{f}"),
                    analyzer=an_of[f], text_col=f, sort_cols=sort_cols,
                    **build_kwargs)
    for target, srcs in copy_to.items():
        build_index(input_path, os.path.join(index_dir, f"field-{target}"),
                    analyzer=an_of.get(target, "default"),
                    text_col=list(srcs), sort_cols=sort_cols,
                    **build_kwargs)
    meta = {"fields": [*fields, *copy_to],
            "copy_to": {t: list(s) for t, s in copy_to.items()}}
    with open(os.path.join(index_dir, "fields.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


class MultiFieldSearcher:
    """Searchers over the per-field sub-indexes; global docids align because
    every sub-index was built over the same corpus in the same order."""

    def __init__(self, index_dir: str, dtype=np.float32):
        with open(os.path.join(index_dir, "fields.json")) as fh:
            self.fields: List[str] = json.load(fh)["fields"]
        self.searchers: Dict[str, Searcher] = {
            f: Searcher(os.path.join(index_dir, f"field-{f}"), dtype=dtype)
            for f in self.fields
        }

    def multi_match(self, query_text: str,
                    field_boosts: Optional[Dict[str, float]] = None,
                    match_type: str = "best_fields", tie_breaker: float = 0.0,
                    k: int = 10, operator: str = "or") -> List[SearchHit]:
        """Top-k multi_match. ``field_boosts`` defaults to 1.0 for every
        indexed field. Exact (unpruned) per-field scoring feeds the combine,
        so ranks match the reference's DisjunctionMaxQuery collection."""
        boosts = field_boosts or {f: 1.0 for f in self.fields}
        if match_type == "cross_fields":
            return self._cross_fields(query_text, boosts, tie_breaker, k,
                                      operator)
        # per-field doc SET + score_docs (bounded numpy arrays) — replaces
        # the exhaustive k=10^9 per-field hit lists
        per_field: Dict[str, tuple] = {}
        for f, boost in boosts.items():
            sr = self.searchers[f]
            toks = sr.analyzer.tokens(query_text)
            uniq = list(dict.fromkeys(toks))
            if not uniq:
                per_field[f] = (np.empty(0, np.int64),
                                np.empty(0, np.float64))
                continue
            if match_type == "bool_prefix":
                # Type.BOOL_PREFIX: match_bool_prefix per field, dis_max
                from . import queries as _Q
                d = np.sort(_Q.match_bool_prefix_docs(sr, query_text))
            elif match_type in ("phrase", "phrase_prefix"):
                # MultiMatchQueryBuilder.Type.PHRASE(_PREFIX): the phrase
                # query per field, dis_max combine; matching docs are
                # term-BM25-scored (documented stand-in for Lucene's
                # phrase-frequency scoring — the doc SET is exact)
                d = np.sort(sr.match_phrase(query_text)
                            if match_type == "phrase"
                            else sr.match_phrase_prefix(query_text))
            else:
                d = np.sort(sr.bool_docs(must=uniq) if operator == "and"
                            else sr.bool_docs(should=uniq))
            per_field[f] = (d, boost * sr.score_docs(d, toks))
        all_ids = np.unique(np.concatenate(
            [d for d, _ in per_field.values() if d.size] or
            [np.empty(0, np.int64)]))
        if all_ids.size == 0:
            return []
        mat = np.zeros((len(boosts), all_ids.size), dtype=np.float64)
        for i, f in enumerate(boosts):
            ids, sc = per_field[f]
            if ids.size:
                mat[i, np.searchsorted(all_ids, ids)] = sc
        if match_type == "most_fields":
            total = mat.sum(axis=0)
        else:  # best_fields: dis_max + tie_breaker
            mx = mat.max(axis=0)
            total = mx + tie_breaker * (mat.sum(axis=0) - mx)
        if operator == "and" and match_type == "best_fields":
            # a doc must satisfy the AND in at least one field — already
            # guaranteed: only docs returned by some per-field AND search
            # appear in all_ids
            pass
        order = np.lexsort((all_ids, -total))[:k]
        return [SearchHit(int(all_ids[i]), float(total[i])) for i in order]

    def _cross_fields(self, query_text, boosts, tie_breaker, k, operator):
        return _cross_fields_impl(self.searchers, query_text, boosts,
                                  tie_breaker, k, operator)


def _dlq(sr: Searcher, docs: np.ndarray) -> np.ndarray:
    """Quantized doc length (SmallFloat norm table value) per global docid."""
    from ..index.norms import NORM_LENGTH_TABLE
    seg_idx = np.searchsorted(sr._bases, docs, side="right") - 1
    out = np.empty(docs.size, np.float64)
    for si in np.unique(seg_idx):
        seg_id = int(sr._seg_ids[si])
        m = seg_idx == si
        local = docs[m] - int(sr._bases[si])
        out[m] = NORM_LENGTH_TABLE[sr.norms(seg_id)[local]].astype(np.float64)
    return out


def _cross_fields_impl(searchers: Dict[str, Searcher], query_text: str,
                       boosts: Dict[str, float], tie_breaker: float,
                       k: int, operator: str) -> List[SearchHit]:
    """multi_match type=cross_fields (MultiMatchQueryBuilder.Type.
    CROSS_FIELDS / Lucene BlendedTermQuery): term-centric, not
    field-centric. Every term's df is BLENDED to the MAX across the
    field group, the term is scored in each field with the blended idf
    and that field's own tf/norms/avgdl, and the per-TERM score is the
    max over fields (+ tie_breaker * the rest). Terms sum per doc.
    ``operator="and"`` requires every term in SOME field — the
    "first name in one column, last name in another" semantics the type
    exists for. float64 arithmetic (ln-idf), matching the SQL oracle."""
    from collections import Counter
    fields = list(boosts)
    s0 = searchers[fields[0]]
    counts = Counter(s0.analyzer.tokens(query_text))
    toks = list(counts)   # deduped, first-seen order; multiplicity kept
    if not toks:
        return []
    N = float(s0.N)
    k1, b = 1.2, 0.75
    posts = {(t, f): searchers[f].term_postings(t)
             for t in toks for f in fields}
    parts = [posts[(t, f)][0] for t in toks for f in fields
             if posts[(t, f)][0].size]
    if not parts:
        return []
    all_docs = np.unique(np.concatenate(parts))
    dlq = {f: _dlq(searchers[f], all_docs) for f in fields}
    total = np.zeros(all_docs.size, np.float64)
    seen_all = np.ones(all_docs.size, bool)
    for t in toks:
        df = max(len(posts[(t, f)][0]) for f in fields)
        if df == 0:
            seen_all[:] = False
            continue
        idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
        mat = np.zeros((len(fields), all_docs.size), np.float64)
        for i, f in enumerate(fields):
            d, tf = posts[(t, f)]
            if not d.size:
                continue
            pos = np.searchsorted(all_docs, d)
            tfv = tf.astype(np.float64)
            denom = tfv + k1 * (1.0 - b + b * dlq[f][pos]
                                / float(searchers[f].avgdl))
            mat[i, pos] = (float(boosts[f]) * idf * (k1 + 1.0)
                           * tfv / denom)
        mx = mat.max(axis=0)
        total += counts[t] * (mx + tie_breaker * (mat.sum(axis=0) - mx))
        seen_all &= mat.any(axis=0)
    keep = seen_all if operator == "and" else total > 0
    ids, sc = all_docs[keep], total[keep]
    order = np.lexsort((ids, -sc))[:k]
    return [SearchHit(int(ids[i]), float(sc[i])) for i in order]
