"""Query-surface extensions over a built index: exists / regexp / terms_set,
the span family beyond span_near, intervals, and match_bool_prefix.

Each function takes a :class:`~opensearch_ray.search.searcher.Searcher` and
returns ascending global docids (filter context — constant-score, like the
reference's rewrites). Reference semantics:

- exists      — server/index/query/ExistsQueryBuilder.java (doc has any value
                for the field; null / missing docs excluded), conformance
                rest-api-spec/test/search/160_exists_query.yml
- regexp      — server/index/query/RegexpQueryBuilder.java: anchored regex
                over the TERM dictionary, rewritten to a disjunction of the
                matching terms (MultiTermQuery CONSTANT_SCORE rewrite)
- terms_set   — server/index/query/TermsSetQueryBuilder.java: per-doc
                minimum_should_match read from a numeric doc-values field
- span_or / span_first / span_not —
                server/index/query/SpanOrQueryBuilder.java,
                SpanFirstQueryBuilder.java, SpanNotQueryBuilder.java
- intervals   — server/index/query/IntervalQueryBuilder.java +
                IntervalBuilder.java (match / any_of / all_of sources),
                conformance rest-api-spec/test/search/230_interval_query.yml
- match_bool_prefix — MatchBoolPrefixQueryBuilder.java: all analyzed terms as
                bool SHOULD term clauses except the last, which is a prefix
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .searcher import Searcher


# ------------------------------------------------------------- doc values

def exists_docs(s: Searcher, field: str) -> np.ndarray:
    """Docs whose ``field`` doc value is non-null (ExistsQueryBuilder:
    FieldNamesFieldMapper membership == "the doc supplied a value").
    Segment-streamed: one Arrow validity scan per segment."""
    parts: List[np.ndarray] = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        vals = s.doc_values(seg.seg_id, field)
        if vals.dtype == object:
            mask = np.array([v is not None for v in vals], dtype=bool)
        elif vals.dtype.kind == "f":
            mask = ~np.isnan(vals)
        elif vals.dtype.kind == "M":
            mask = ~np.isnat(vals)
        else:
            mask = np.ones(len(vals), dtype=bool)  # non-nullable int/bool
        if mask.any():
            parts.append(np.flatnonzero(mask).astype(np.int64)
                         + s.doc_base(seg.seg_id))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def terms_set_docs(s: Searcher, terms: Sequence[str], msm_field: str
                   ) -> np.ndarray:
    """terms_set: doc matches when the number of DISTINCT query terms it
    contains >= its own ``msm_field`` doc value
    (TermsSetQueryBuilder.minimum_should_match_field; CoveringQuery)."""
    uniq = list(dict.fromkeys(terms))
    by_term = s._term_docs_by_seg(uniq)
    out: List[np.ndarray] = []
    empty = np.empty(0, np.int64)
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        sid = seg.seg_id
        lists = [by_term[t].get(sid, empty) for t in uniq]
        cat = np.concatenate(lists) if lists else empty
        if cat.size == 0:
            continue
        docs, counts = np.unique(cat, return_counts=True)
        required = np.asarray(
            s.doc_values(sid, msm_field)[docs], dtype=np.int64)
        # a doc requiring more matches than there are query terms can never
        # match (CoveringQuery: minimumNumberMatch > scorers.size() -> no hit)
        hit = (required >= 1) & (counts >= required)
        if hit.any():
            out.append(docs[hit] + s.doc_base(sid))
    return np.concatenate(out) if out else np.empty(0, np.int64)


# ------------------------------------------------------------ terms dict

def expand_regexp(s: Searcher, pattern: str) -> List[str]:
    """Vocabulary terms fully matching ``pattern`` (RegexpQueryBuilder:
    the regex is ANCHORED — must match the whole term). One vectorized
    Arrow regex kernel over the sorted terms dict, with a literal-prefix
    prune like expand_wildcard."""
    import re as _re
    # prune by any literal prefix before the first regex metacharacter
    lit = ""
    m = _re.match(r"[a-z0-9]+", pattern)
    if m and not pattern.startswith("("):
        lit = m.group(0)
        # a trailing literal char may be quantified ("ab*" - the 'b' is not
        # guaranteed); keep only the guaranteed prefix
        if len(lit) < len(pattern) and pattern[len(lit)] in "*?{":
            lit = lit[:-1]
    # prefix-pruned terms-dict slice (row-group min/max pruning) when a
    # literal prefix exists, full scan otherwise (the automaton walk)
    v = s._vocab_range(*s._prefix_bounds(lit)) if lit else s._vocab()
    mask = pc.match_substring_regex(v.column("term"),
                                    "^(?:" + pattern + ")$")
    return v.filter(mask).column("term").to_pylist()  # term-sorted


def regexp_docs(s: Searcher, pattern: str) -> np.ndarray:
    """Constant-score rewrite: union of docs of every matching term."""
    terms = expand_regexp(s, pattern)
    return s.bool_docs(should=terms) if terms else np.empty(0, np.int64)


def match_bool_prefix_docs(s: Searcher, text: str) -> np.ndarray:
    """match_bool_prefix: analyzed terms become bool SHOULD clauses, the
    LAST term a prefix clause (MatchBoolPrefixQueryBuilder semantics — any
    clause matching qualifies the doc; the prefix clause is a PrefixQuery,
    NOT capped by max_expansions like match_phrase_prefix)."""
    toks = s.analyzer.tokens(text)
    if not toks:
        return np.empty(0, np.int64)
    should = list(dict.fromkeys(toks[:-1] + s.expand_prefix(toks[-1])))
    return s.bool_docs(should=should) if should else np.empty(0, np.int64)


# ----------------------------------------------------------- span family

def _positions_by_doc(s: Searcher, terms: Sequence[str], cand: np.ndarray
                      ) -> Dict[int, Dict[str, np.ndarray]]:
    """global docid -> {term: ascending positions} for candidate docs, from
    stored positions when indexed, else by re-analyzing the candidates'
    stored text (the match_phrase fallback)."""
    uniq = list(dict.fromkeys(terms))
    out: Dict[int, Dict[str, np.ndarray]] = {}
    if s.manifest.has_positions:
        post = s.postings(uniq)
        seg_idx = np.searchsorted(s._bases, cand, side="right") - 1
        for si in np.unique(seg_idx):
            seg_id = int(s._seg_ids[si])
            base = int(s._bases[si])
            per_term: Dict[str, Dict[int, np.ndarray]] = {}
            for t in uniq:
                maps: Dict[int, np.ndarray] = {}
                tbl = post.get(t)
                if tbl is not None and tbl.num_rows:
                    for row in tbl.to_pylist():
                        if int(row["seg_id"]) == seg_id:
                            maps.update(s._decode_positions(row))
                per_term[t] = maps
            for ld in (cand[seg_idx == si] - base):
                ld = int(ld)
                out[ld + base] = {t: per_term[t].get(ld, np.empty(0, np.int64))
                                  for t in uniq}
    else:
        fetched = s.fetch(cand.tolist(), columns=[s.manifest.text_col])
        for r in fetched.to_pylist():
            toks, poss = s.analyzer.analyze(r[s.manifest.text_col] or "")
            pos_of: Dict[str, List[int]] = {}
            for t, p in zip(toks, poss):
                pos_of.setdefault(t, []).append(p)
            out[int(r["_docid"])] = {
                t: np.asarray(pos_of.get(t, ()), dtype=np.int64)
                for t in uniq}
    return out


def span_or_docs(s: Searcher, terms: Sequence[str]) -> np.ndarray:
    """span_or over term spans: union of the clause doc sets
    (SpanOrQueryBuilder — doc-level result of the span disjunction)."""
    toks = [t for term in terms for t in s.analyzer.tokens(term)]
    return s.bool_docs(should=list(dict.fromkeys(toks))) if toks else \
        np.empty(0, np.int64)


def span_first_docs(s: Searcher, term: str, end: int) -> np.ndarray:
    """span_first: the term span must END within the first ``end`` positions
    (SpanFirstQueryBuilder / SpanFirstQuery: span.end <= end). For a
    single-term span of width 1 that is position + 1 <= end."""
    toks = s.analyzer.tokens(term)
    if not toks:
        return np.empty(0, np.int64)
    t = toks[0]
    cand = s.term_docs(t)
    if cand.size == 0:
        return cand
    pos = _positions_by_doc(s, [t], cand)
    out = [d for d in cand.tolist()
           if pos[d][t].size and int(pos[d][t][0]) + 1 <= end]
    return np.asarray(out, dtype=np.int64)


def span_not_docs(s: Searcher, include: str, exclude: str,
                  pre: int = 0, post: int = 0) -> np.ndarray:
    """span_not: docs with an ``include``-term occurrence whose position
    neighborhood [p - pre, p + post] contains NO ``exclude``-term occurrence
    (SpanNotQueryBuilder pre/post semantics)."""
    inc = s.analyzer.tokens(include)
    exc = s.analyzer.tokens(exclude)
    if not inc or not exc:
        return s.term_docs(inc[0]) if inc else np.empty(0, np.int64)
    ti, te = inc[0], exc[0]
    cand = s.term_docs(ti)
    if cand.size == 0:
        return cand
    pos = _positions_by_doc(s, [ti, te], cand)
    out = []
    for d in cand.tolist():
        ip, ep = pos[d][ti], pos[d][te]
        if ep.size == 0:
            out.append(d)
            continue
        # an include position survives when no exclude position falls in
        # [p - pre, p + post] — vectorized interval-overlap check
        lo = np.searchsorted(ep, ip - pre, side="left")
        hi = np.searchsorted(ep, ip + post, side="right")
        if (hi == lo).any():
            out.append(d)
    return np.asarray(out, dtype=np.int64)


def _clause_spans(s: Searcher, clause, pos_of: Dict[str, np.ndarray]
                  ) -> List[tuple]:
    """Matching spans [(start, end)] of a span clause within ONE doc, from
    its per-term position lists. Clauses: a term string (width-1 spans) or
    {"span_near": {"terms": [...], "slop": int, "in_order": bool}} —
    ordered spans enumerate the greedy-minimal chain per start position
    (Lucene NearSpansOrdered's canonical span set)."""
    if isinstance(clause, str):
        toks = s.analyzer.tokens(clause)
        if not toks:
            return []
        return [(int(p), int(p)) for p in pos_of.get(toks[0], ())]
    spec = clause["span_near"]
    q_toks = [t for term in spec["terms"] for t in s.analyzer.tokens(term)]
    slop = int(spec.get("slop", 0))
    in_order = bool(spec.get("in_order", True))
    lists = [np.asarray(pos_of.get(t, ()), dtype=np.int64) for t in q_toks]
    if not all(l.size for l in lists):
        return []
    n = len(q_toks)
    spans = []
    if in_order:
        for s0 in lists[0]:
            prev, ok = int(s0), True
            for pl in lists[1:]:
                i = int(np.searchsorted(pl, prev + 1))
                if i >= len(pl):
                    ok = False
                    break
                prev = int(pl[i])
            if ok and (prev - int(s0) + 1) - n <= slop:
                spans.append((int(s0), prev))
    else:
        # enumerate feasible unordered windows: for each anchor position of
        # the first term, the tightest window covering one position per term
        import itertools
        if int(np.prod([l.size for l in lists])) <= 4096:
            for combo in itertools.product(*[l.tolist() for l in lists]):
                if len(set(combo)) < n:
                    continue
                lo, hi = min(combo), max(combo)
                if (hi - lo + 1) - n <= slop:
                    spans.append((int(lo), int(hi)))
        else:  # degenerate huge docs: fall back to the boolean sweep
            if Searcher._sloppy_ok(lists, [0] * n, q_toks, slop + n - 1):
                allp = np.concatenate(lists)
                spans.append((int(allp.min()), int(allp.max())))
    return sorted(set(spans))


def _span_clause_terms(s: Searcher, clause) -> List[str]:
    if isinstance(clause, str):
        return s.analyzer.tokens(clause)
    return [t for term in clause["span_near"]["terms"]
            for t in s.analyzer.tokens(term)]


def span_containing_docs(s: Searcher, big, little) -> np.ndarray:
    """span_containing (SpanContainingQueryBuilder): docs with a ``big``
    span that fully encloses a ``little`` span (big.start <= little.start
    and little.end <= big.end). Clause forms as in _clause_spans."""
    big_terms = _span_clause_terms(s, big)
    little_terms = _span_clause_terms(s, little)
    if not big_terms or not little_terms:
        return np.empty(0, np.int64)
    cand = s.bool_docs(must=list(dict.fromkeys(big_terms + little_terms)))
    if cand.size == 0:
        return cand
    pos = _positions_by_doc(s, big_terms + little_terms, cand)
    out = []
    for d in cand.tolist():
        bs = _clause_spans(s, big, pos[d])
        if not bs:
            continue
        ls = _clause_spans(s, little, pos[d])
        if any(b0 <= l0 and l1 <= b1
               for b0, b1 in bs for l0, l1 in ls):
            out.append(d)
    return np.asarray(out, dtype=np.int64)


def span_within_docs(s: Searcher, big, little) -> np.ndarray:
    """span_within (SpanWithinQueryBuilder): the same containment predicate
    as span_containing — the two differ only in WHICH query's spans are
    emitted for scoring, which doesn't change the matching doc set."""
    return span_containing_docs(s, big, little)


# -------------------------------------------------------------- intervals

def intervals_docs(s: Searcher, source: dict) -> np.ndarray:
    """intervals query, doc-level result (IntervalQueryBuilder). Supported
    sources (the conformance-test surface, 230_interval_query.yml):

    - {"match": {"query": str, "ordered": bool, "max_gaps": int}} —
      all analyzed terms within one interval; gaps = width - n_terms must be
      <= max_gaps (-1 = unlimited); ordered requires increasing positions.
      This is exactly the span_near measure (IntervalBuilder builds
      Intervals.ordered/unordered over the analyzed terms).
    - {"any_of": {"intervals": [source, ...]}} — union.
    - {"all_of": {"intervals": [source, ...]}} — intersection (supported
      WITHOUT an enclosing max_gaps: doc-level conjunction only).
    """
    if "match" in source:
        spec = source["match"]
        toks = s.analyzer.tokens(spec["query"])
        if not toks:
            return np.empty(0, np.int64)
        max_gaps = int(spec.get("max_gaps", -1))
        ordered = bool(spec.get("ordered", False))
        if len(toks) == 1:
            return s.term_docs(toks[0])
        if max_gaps < 0:
            # unlimited gaps: any co-occurrence qualifies (ordered still
            # requires an increasing chain — a huge slop reduces to that)
            max_gaps = 1 << 30
        return s.span_near(toks, slop=max_gaps, in_order=ordered)
    if "any_of" in source:
        parts = [intervals_docs(s, sub)
                 for sub in source["any_of"]["intervals"]]
        parts = [p for p in parts if p.size]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64))
    if "all_of" in source:
        if source["all_of"].get("max_gaps", -1) != -1:
            raise NotImplementedError(
                "all_of with max_gaps needs sub-interval spans; only the "
                "doc-level conjunction (max_gaps=-1) is supported")
        cur: Optional[np.ndarray] = None
        for sub in source["all_of"]["intervals"]:
            d = intervals_docs(s, sub)
            cur = d if cur is None else np.intersect1d(cur, d,
                                                       assume_unique=True)
            if cur.size == 0:
                return cur
        return cur if cur is not None else np.empty(0, np.int64)
    raise ValueError(f"unsupported intervals source: {sorted(source)}")
