"""search_as_you_type field type + multi_match type=bool_prefix query.

Reference: modules/mapper-extras/src/main/java/org/opensearch/index/mapper/
SearchAsYouTypeFieldMapper.java. The mapper indexes one root field plus
derived subfields (Defaults: max_shingle_size=3, MIN_GRAM=1, MAX_GRAM=20):

- ``field._2gram`` .. ``._Mgram``: FixedShingleFilter(n) over the base
  analyzer — shingles of EXACTLY n words, no unigrams (mapper :360).
- ``field._index_prefix``: TrailingShingleTokenFilter (M-1 extra trailing
  position increments, so end-of-stream windows shorter than M are emitted
  padded with the "" filler) -> FixedShingleFilter(M, " ", "") ->
  EdgeNGramTokenFilter(1, 20, preserveOriginal) (mapper :735-742).
  omitNorms=true (:210) — term queries on it score tf/(tf+k1), b ignored.

Query (multi_match type=bool_prefix over [field, ._2gram, ._3gram],
MultiMatchQueryBuilder.Type.BOOL_PREFIX tie_breaker=1.0 => per-field score
SUM): each field gets MatchBoolPrefixQuery semantics — every term from the
field's search analyzer except the last becomes a SHOULD TermQuery on that
field; the LAST becomes a prefix query DELEGATED to ._index_prefix as a
plain TermQuery when its length is within [MIN_GRAM-1, MAX_GRAM]
(SearchAsYouTypeFieldType.prefixQuery :338-342, PrefixFieldType.prefixQuery),
else a constant-score prefix expansion on the field itself.

Ray-Data-first layout: one sub-index per subfield over the SAME corpus in
the SAME sort order (aligned global docids — the multifield.py discipline),
each an independent embarrassingly-parallel build; nothing new shuffles.
The prefix sub-index trades ~20x token fan-out for O(1) as-you-type term
lookups — exactly the reference's storage trade.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..analysis.analyzer import Analyzer, get_analyzer
from ..analysis.token_filters import (TOKEN_FILTERS, make_edge_ngram_filter,
                                      make_shingle_filter, make_stop_filter)
from .bm25 import bm25_idf, term_weight
from .searcher import Searcher, SearchHit

MIN_GRAM, MAX_GRAM = 1, 20  # SearchAsYouTypeFieldMapper.Defaults


def _explicit_chain(base) -> Analyzer:
    """Expand a fast-path analyzer into its explicit filter chain so extra
    filters can be appended after it."""
    an = get_analyzer(base)
    if an._lower_fast:
        filters = (TOKEN_FILTERS["lowercase"],)
        if an._stop_fast is not None:
            filters = filters + (make_stop_filter(an._stop_fast),)
        return Analyzer(tokenizer=an.tokenizer, char_filters=an.char_filters,
                        token_filters=filters, name=an.name)
    return an


def _trailing_fixed_shingle(n: int):
    """FixedShingleFilter(n, " ", "") preceded by TrailingShingleTokenFilter:
    every token position starts a window; windows running past the end are
    padded with the empty filler (mapper :735-742), so 'fox' at the end of a
    3-shingle field also yields 'fox  ' — the token that makes single-word
    prefixes resolvable in the prefix sub-index."""
    def filt(tokens: List[str], positions: List[int]):
        out_t, out_p = [], []
        for i in range(len(tokens)):
            parts = tokens[i:i + n]
            parts = parts + [""] * (n - len(parts))
            out_t.append(" ".join(parts))
            out_p.append(positions[i])
        return out_t, out_p
    return filt


def query_shingles(tokens: Sequence[str], n: int) -> List[str]:
    """Search-time FixedShingleFilter: exactly-n windows, NO trailing pad
    (withShingle wrapper, mapper :360)."""
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def sayt_analyzers(base="standard", max_shingle_size: int = 3
                   ) -> Dict[str, Analyzer]:
    """{subfield name -> index analyzer} for the search_as_you_type layout."""
    if not (2 <= max_shingle_size <= 4):  # mapper bounds :99-100
        raise ValueError("max_shingle_size must be in [2, 4]")
    root = get_analyzer(base)
    b = _explicit_chain(base)
    subs: Dict[str, Analyzer] = {"root": root}
    for n in range(2, max_shingle_size + 1):
        subs[f"{n}gram"] = Analyzer(
            tokenizer=b.tokenizer, char_filters=b.char_filters,
            token_filters=tuple(b.token_filters)
            + (make_shingle_filter(n, n, output_unigrams=False),),
            name=f"sayt_{n}gram")
    subs["prefix"] = Analyzer(
        tokenizer=b.tokenizer, char_filters=b.char_filters,
        token_filters=tuple(b.token_filters)
        + (_trailing_fixed_shingle(max_shingle_size),
           make_edge_ngram_filter(MIN_GRAM, MAX_GRAM, preserve_original=True)),
        name="sayt_prefix")
    return subs


def build_sayt_index(input_path, index_dir: str, field: str = "text",
                     base_analyzer="standard", max_shingle_size: int = 3,
                     sort_cols: Sequence[str] = ("conv_id", "turn_idx"),
                     **build_kwargs) -> dict:
    """One sub-index per subfield, same corpus + sort order (aligned docids).
    Each build is the standard embarrassingly-parallel per-fragment pass."""
    from ..index.build import build_index

    os.makedirs(index_dir, exist_ok=True)
    subs = sayt_analyzers(base_analyzer, max_shingle_size)
    for name, an in subs.items():
        build_index(input_path, os.path.join(index_dir, f"sub-{name}"),
                    analyzer=an, text_col=field, sort_cols=sort_cols,
                    **build_kwargs)
    meta = {"field": field, "base_analyzer": getattr(
        get_analyzer(base_analyzer), "name", "custom"),
        "max_shingle_size": max_shingle_size,
        "subfields": list(subs.keys())}
    with open(os.path.join(index_dir, "sayt.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


class SaytSearcher:
    """multi_match type=bool_prefix over a search_as_you_type field.

    Per-field score = Σ BM25(complete terms) + TermQuery(._index_prefix) on
    the last (as-you-type) term; total = Σ over fields (BOOL_PREFIX
    tie_breaker=1.0 — dis_max with tb=1 IS the sum). The prefix term query
    scores idf*(k1+1)*tf/(tf+k1): omitNorms drops the length normalization.
    """

    def __init__(self, index_dir: str, dtype=np.float32):
        with open(os.path.join(index_dir, "sayt.json")) as fh:
            self.meta = json.load(fh)
        self.max_shingle = int(self.meta["max_shingle_size"])
        self.dtype = dtype
        ans = sayt_analyzers(self.meta["base_analyzer"], self.max_shingle)
        self.sub: Dict[str, Searcher] = {
            name: Searcher(os.path.join(index_dir, f"sub-{name}"),
                           dtype=dtype, analyzer=ans[name])
            for name in self.meta["subfields"]}
        self.root = self.sub["root"]
        self.prefix = self.sub["prefix"]

    def _prefix_clause(self, field: Searcher, value: str):
        """(docids, scores) of the last-term prefix clause."""
        if MIN_GRAM - 1 <= len(value) <= MAX_GRAM:
            # delegated TermQuery on ._index_prefix (edge-ngrams indexed)
            docs, tfs = self.prefix.term_postings(value)
            if docs.size == 0:
                return docs, np.empty(0, np.float64)
            df = self.prefix.term_stats([value])[value][0]
            w = term_weight(bm25_idf(df, self.prefix.N, self.dtype),
                            1.0, field.params, self.dtype)
            tf = tfs.astype(np.float64)
            return docs, np.float64(w) * (tf / (tf + field.params.k1))
        # fallback: constant-score prefix expansion on the field itself
        # (MultiTermQuery CONSTANT_SCORE rewrite -> 1.0 per matching doc)
        docs = field.prefix_docs(value)
        return docs, np.ones(docs.size, np.float64)

    def query(self, text: str, k: int = 10,
              fields: Optional[Sequence[int]] = None) -> List[SearchHit]:
        """``fields``: shingle sizes to search (default 1..max_shingle,
        i.e. [field, field._2gram, field._3gram])."""
        toks = self.root.analyzer.tokens(text)
        if not toks:
            return []
        sizes = list(fields) if fields is not None else list(
            range(1, self.max_shingle + 1))
        clause_docs: List[np.ndarray] = []
        clause_scores: List[np.ndarray] = []
        for n in sizes:
            ftoks = list(toks) if n == 1 else query_shingles(toks, n)
            if not ftoks:
                continue  # query shorter than the shingle size
            field = self.root if n == 1 else self.sub[f"{n}gram"]
            complete, last = ftoks[:-1], ftoks[-1]
            if complete:
                d = np.sort(field.bool_docs(
                    should=list(dict.fromkeys(complete))))
                if d.size:
                    clause_docs.append(d)
                    clause_scores.append(field.score_docs(d, complete))
            d, s = self._prefix_clause(field, last)
            if d.size:
                clause_docs.append(d)
                clause_scores.append(s)
        if not clause_docs:
            return []
        docs = np.concatenate(clause_docs)
        scores = np.concatenate(clause_scores)
        uniq, inv = np.unique(docs, return_inverse=True)
        total = np.zeros(uniq.size, np.float64)
        np.add.at(total, inv, scores)
        order = np.lexsort((uniq, -total))[:k]
        return [SearchHit(int(uniq[i]), float(total[i])) for i in order]
