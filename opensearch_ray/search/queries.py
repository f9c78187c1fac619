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

def expand_regexp(s: Searcher, pattern: str,
                  case_insensitive: bool = False) -> List[str]:
    """Vocabulary terms fully matching ``pattern`` (RegexpQueryBuilder:
    the regex is ANCHORED — must match the whole term). One vectorized
    Arrow regex kernel over the sorted terms dict, with a literal-prefix
    prune like expand_wildcard. ``case_insensitive`` (the builder's
    CASE_INSENSITIVE_FIELD) streams with (?i) and no prefix prune."""
    import re as _re
    if case_insensitive:
        rx = "(?i)^(?:" + pattern + ")$"
        v = s._vocab_scan(
            lambda t: t.filter(pc.match_substring_regex(t.column("term"),
                                                        rx)),
            cache_key=("rci", rx))
        return v.column("term").to_pylist()
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


def regexp_docs(s: Searcher, pattern: str,
                case_insensitive: bool = False) -> np.ndarray:
    """Constant-score rewrite: union of docs of every matching term."""
    terms = expand_regexp(s, pattern, case_insensitive)
    return s.bool_docs(should=terms) if terms else np.empty(0, np.int64)


def ci_value_docs(s: Searcher, field: str, value: str) -> np.ndarray:
    """Doc-values keyword equality under case folding (the term query's
    case_insensitive option on a non-text field): per-segment
    vectorized casefold compare."""
    import pandas as pd
    low = value.lower()
    parts = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        vals = s.doc_values(seg.seg_id, field)
        m = pd.Series(vals).astype(str).str.lower().to_numpy() == low
        if m.any():
            parts.append(np.flatnonzero(m).astype(np.int64)
                         + s.doc_base(seg.seg_id))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


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
    if "span_multi" in clause:
        # SpanMultiTermQueryWrapper: width-1 spans at every position of any
        # term the wrapped multi-term query expands to
        ps = sorted({int(p) for t in _span_multi_terms(s, clause)
                     for p in pos_of.get(t, ())})
        return [(p, p) for p in ps]
    spec = clause["span_near"]
    q_toks = [t for term in spec["terms"] for t in s.analyzer.tokens(term)]
    slop = int(spec.get("slop", 0))
    in_order = bool(spec.get("in_order", True))
    lists = [np.asarray(pos_of.get(t, ()), dtype=np.int64) for t in q_toks]
    return _enum_near_spans(lists, slop, in_order, q_toks=q_toks)


def _enum_near_spans(lists: List[np.ndarray], slop: int, in_order: bool,
                     q_toks: Optional[List[str]] = None) -> List[tuple]:
    """Enumerate the matching (start, end) spans of a term-position near
    query within one doc: one position per list, window gaps
    (width - n) <= slop; ordered = strictly increasing positions."""
    if not all(l.size for l in lists):
        return []
    n = len(lists)
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
        elif q_toks is not None:  # degenerate huge docs: boolean sweep
            if Searcher._sloppy_ok(lists, [0] * n, q_toks, slop + n - 1):
                allp = np.concatenate(lists)
                spans.append((int(allp.min()), int(allp.max())))
    return sorted(set(spans))


def _span_multi_terms(s: Searcher, clause) -> List[str]:
    """Expand a {"span_multi": {"wildcard"|"prefix"|"regexp": pat}} clause
    against the (prefix-pruned) terms dict — the MultiTermQuery rewrite the
    reference applies inside SpanMultiTermQueryWrapper."""
    spec = clause["span_multi"]
    if "wildcard" in spec:
        return s.expand_wildcard(spec["wildcard"])
    if "prefix" in spec:
        return s.expand_prefix(spec["prefix"])
    if "regexp" in spec:
        return expand_regexp(s, spec["regexp"])
    raise ValueError(f"unsupported span_multi inner query: {sorted(spec)}")


def _span_clause_terms(s: Searcher, clause) -> List[str]:
    if isinstance(clause, str):
        return s.analyzer.tokens(clause)
    if "span_multi" in clause:
        return _span_multi_terms(s, clause)
    return [t for term in clause["span_near"]["terms"]
            for t in s.analyzer.tokens(term)]


def span_near_clauses_docs(s: Searcher, clauses: Sequence, slop: int = 0,
                           in_order: bool = True) -> np.ndarray:
    """span_near over generalized span clauses (term string, span_multi,
    nested span_near — the _clause_spans forms): docs with one span per
    clause packable into a window of (width - n_spans_positions) <= slop;
    ordered requires strictly increasing non-overlapping spans
    (SpanNearQueryBuilder with SpanMultiTermQueryWrapper sub-clauses).

    A ``{"span_gap": width}`` / ``{"span_gap": {field: width}}`` clause
    (SpanGapQueryBuilder — SearchModule registers it only inside
    span_near) consumes ``width`` unmatched positions at its slot:
    consecutive real spans must leave >= that many free positions
    between them, and the gap counts as covered in the slop accounting.
    Ordered mode only (the reference's supported shape)."""
    # split off gap clauses, remembering the gap width at each slot
    def gap_width(c) -> Optional[int]:
        if isinstance(c, dict) and "span_gap" in c:
            g = c["span_gap"]
            return int(g if isinstance(g, (int, float))
                       else next(iter(g.values())))
        return None

    gaps = [gap_width(c) for c in clauses]
    if any(g is not None for g in gaps):
        if not in_order:
            raise ValueError("span_gap requires in_order=true")
        real: List = []
        gap_before: List[int] = []   # free positions required before slot i
        pending = 0
        lead = 0
        for c, g in zip(clauses, gaps):
            if g is not None:
                pending += g
                continue
            if not real:
                lead = pending
            else:
                gap_before.append(pending)
            pending = 0
            real.append(c)
        trail = pending
        clauses = real
    else:
        gap_before, lead, trail = [0] * (len(clauses) - 1), 0, 0

    per_clause = [_span_clause_terms(s, c) for c in clauses]
    if not all(per_clause):
        return np.empty(0, np.int64)
    # candidates: docs containing >= 1 term of EVERY clause
    cand: Optional[np.ndarray] = None
    for terms in per_clause:
        d = np.sort(s.bool_docs(should=list(dict.fromkeys(terms))))
        cand = d if cand is None else np.intersect1d(cand, d,
                                                     assume_unique=True)
        if cand.size == 0:
            return cand
    all_terms = list(dict.fromkeys(t for ts in per_clause for t in ts))
    pos = _positions_by_doc(s, all_terms, cand)
    out = []
    import itertools
    for d in cand.tolist():
        span_lists = [_clause_spans(s, c, pos[d]) for c in clauses]
        if not all(span_lists):
            continue
        hit = False
        if int(np.prod([len(sl) for sl in span_lists])) <= 4096:
            gap_total = lead + trail + sum(gap_before)
            for combo in itertools.product(*span_lists):
                covered = sum(e - b + 1 for b, e in combo) + gap_total
                lo = min(b for b, _ in combo) - lead
                hi = max(e for _, e in combo) + trail
                if (hi - lo + 1) - covered > slop:
                    continue
                if in_order and any(combo[i + 1][0] <= combo[i][1]
                                    for i in range(len(combo) - 1)):
                    continue
                # span_gap slots: enough free positions between neighbors
                if any(combo[i + 1][0] - combo[i][1] - 1 < gap_before[i]
                       for i in range(len(combo) - 1)):
                    continue
                # spans may not overlap even unordered (Lucene NearSpans)
                ordered = sorted(combo)
                if any(ordered[i + 1][0] <= ordered[i][1]
                       for i in range(len(ordered) - 1)):
                    continue
                hit = True
                break
        if hit:
            out.append(d)
    return np.asarray(out, dtype=np.int64)


def field_masking_span_docs(mfs, clauses: Sequence[tuple], slop: int = 0,
                            in_order: bool = True) -> np.ndarray:
    """field_masking_span (FieldMaskingSpanQueryBuilder): a span query whose
    sub-clauses read positions from DIFFERENT fields of the same documents
    but combine as if one field — legal because our multi-field sub-indexes
    share global docids (multifield.py invariant). ``mfs`` is a
    MultiFieldSearcher; ``clauses`` are (field, term) pairs; position
    streams come from each clause's own field."""
    import itertools
    per = []  # (searcher, analyzed term) per clause
    for field, term in clauses:
        s = mfs.searchers[field]
        toks = s.analyzer.tokens(term)
        if not toks:
            return np.empty(0, np.int64)
        per.append((s, toks[0]))
    cand: Optional[np.ndarray] = None
    for s, t in per:
        d = np.sort(s.term_docs(t))
        cand = d if cand is None else np.intersect1d(cand, d,
                                                     assume_unique=True)
        if cand.size == 0:
            return cand
    pos_per_clause = [
        _positions_by_doc(s, [t], cand) for s, t in per]
    out = []
    for d in cand.tolist():
        lists = [pc_[d][t] for pc_, (s, t) in zip(pos_per_clause, per)]
        if not all(l.size for l in lists):
            continue
        hit = False
        if int(np.prod([l.size for l in lists])) <= 4096:
            for combo in itertools.product(*[l.tolist() for l in lists]):
                if len(set(combo)) < len(combo):
                    continue
                if in_order and any(combo[i + 1] <= combo[i]
                                    for i in range(len(combo) - 1)):
                    continue
                if (max(combo) - min(combo) + 1) - len(combo) <= slop:
                    hit = True
                    break
        if hit:
            out.append(d)
    return np.asarray(out, dtype=np.int64)


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


# ----------------------------------------------------- more query types

def ids_docs(s: Searcher, values: Sequence, id_field: str) -> np.ndarray:
    """ids query (server/index/query/IdsQueryBuilder.java): docs whose
    stored id is in the given set. The reference matches on _id; our custom
    id lives in a doc-values column — one vectorized isin per segment."""
    want = np.asarray(list(values))
    parts: List[np.ndarray] = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        vals = s.doc_values(seg.seg_id, id_field)
        mask = np.isin(vals, want)
        if mask.any():
            parts.append(np.flatnonzero(mask).astype(np.int64)
                         + s.doc_base(seg.seg_id))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def constant_score_docs(s: Searcher, filter_docs: np.ndarray,
                        boost: float = 1.0):
    """constant_score (ConstantScoreQueryBuilder.java): every filtered doc
    scores exactly ``boost`` (ties broken by docid asc, like all hits)."""
    d = np.sort(np.asarray(filter_docs, dtype=np.int64))
    return d, np.full(d.size, float(boost), dtype=np.float64)


def distance_feature_topk(s: Searcher, field: str, origin, pivot: float,
                          cand: np.ndarray, k: int = 10, boost: float = 1.0):
    """distance_feature (server/index/query/DistanceFeatureQueryBuilder.java):
    score = boost * pivot / (pivot + |value - origin|) over candidate docs;
    for date fields distance is in MILLISECONDS (the reference's unit).
    Returns (docids, scores) of the top-k by (score desc, docid asc)."""
    cand = np.asarray(cand, dtype=np.int64)
    if cand.size == 0:
        return cand, np.empty(0, np.float64)
    seg_idx = np.searchsorted(s._bases, cand, side="right") - 1
    dist = np.empty(cand.size, dtype=np.float64)
    for si in np.unique(seg_idx):
        seg_id = int(s._seg_ids[si])
        base = int(s._bases[si])
        m = seg_idx == si
        vals = s.doc_values(seg_id, field)[cand[m] - base]
        if vals.dtype.kind == "M":
            v_ms = vals.astype("datetime64[ms]").astype(np.int64)
            o_ms = np.datetime64(origin).astype("datetime64[ms]").astype(np.int64)
            dist[m] = np.abs(v_ms - o_ms).astype(np.float64)
        else:
            dist[m] = np.abs(vals.astype(np.float64) - float(origin))
    # (boost*pivot)/(pivot+dist) — keep this float64 op order; the SQL
    # oracle's `boost * pivot / (pivot + d)` parses left-associatively
    scores = (float(boost) * float(pivot)) / (float(pivot) + dist)
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order]


def script_score_topk(s: Searcher, cand: np.ndarray, script, k: int = 10):
    """script_score (server/index/query/ScriptScoreQueryBuilder.java): the
    wrapped query provides the doc set, the script the score. ``script`` is
    a Python callable over a {field: numpy doc-values} dict (the Painless
    analogue, vectorized over all candidates at once)."""
    cand = np.asarray(cand, dtype=np.int64)
    if cand.size == 0:
        return cand, np.empty(0, np.float64)
    seg_idx = np.searchsorted(s._bases, cand, side="right") - 1

    class _DocValues:
        def __init__(self, inner, pick):
            self._inner, self._pick = inner, pick

        def __getitem__(self, f):
            return self._inner.doc_values(self._pick[0], f)[self._pick[1]]

    scores = np.empty(cand.size, dtype=np.float64)
    for si in np.unique(seg_idx):
        seg_id = int(s._seg_ids[si])
        base = int(s._bases[si])
        m = seg_idx == si
        scores[m] = np.asarray(
            script(_DocValues(s, (seg_id, cand[m] - base))), dtype=np.float64)
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order]


# --------------------------------------------------- simple_query_string

def _sqs_tokenize(q: str) -> List[str]:
    """Lexer for the simple-query-string subset: ( ) + | - "..." term."""
    out, i, n = [], 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in '()+|-':
            out.append(c)
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            j = n if j < 0 else j
            out.append('"' + q[i + 1:j])
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()+|-"':
                j += 1
            out.append(q[i:j])
            i = j
    return out


def simple_query_string_docs(s: Searcher, query: str,
                             default_operator: str = "or") -> np.ndarray:
    """simple_query_string (server/index/query/SimpleQueryStringBuilder.java
    -> Lucene SimpleQueryParser), filter-context doc set. Supported syntax
    (the conformance surface): bare terms joined by ``default_operator``,
    explicit ``+`` (AND) / ``|`` (OR), ``-`` negation, ``"..."`` phrases,
    trailing ``*`` prefix, ``( )`` grouping. Unlike query_string, malformed
    input never raises — lenient parsing drops what it can't read."""
    toks = _sqs_tokenize(query)
    pos = 0
    all_docs = None  # lazy: only a leading/lone negation needs the universe

    def universe() -> np.ndarray:
        nonlocal all_docs
        if all_docs is None:
            all_docs = s.bool_docs()  # match_all, segment-streamed
        return all_docs

    def leaf(tok: str) -> np.ndarray:
        if tok.startswith('"'):
            return np.sort(s.match_phrase(tok[1:]))
        if tok.endswith('*') and len(tok) > 1:
            # prefix leaf: analyzers don't run on prefixes (Lucene rewrites
            # the raw lowercased prefix against the terms dict)
            terms = s.expand_prefix(tok[:-1].lower())
            return (np.sort(s.bool_docs(should=terms)) if terms
                    else np.empty(0, np.int64))
        ts = s.analyzer.tokens(tok)
        if not ts:
            return np.empty(0, np.int64)
        return np.sort(s.bool_docs(must=ts))

    def parse_clause():
        nonlocal pos
        neg = False
        while pos < len(toks) and toks[pos] == '-':
            neg = not neg
            pos += 1
        if pos >= len(toks):
            return np.empty(0, np.int64), neg
        t = toks[pos]
        if t == '(':
            pos += 1
            d = parse_expr()
            if pos < len(toks) and toks[pos] == ')':
                pos += 1
            return d, neg
        if t in ')+|':  # stray operator: lenient skip
            pos += 1
            return parse_clause()
        pos += 1
        return leaf(t), neg

    def parse_expr() -> np.ndarray:
        # Lucene SimpleQueryParser: a `-` clause becomes MUST_NOT on the
        # ENCLOSING BooleanQuery regardless of the connective — so 'a -b'
        # (default OR) is a AND NOT b, never union(a, complement(b)).
        # Positives combine with the connectives; negatives subtract at the
        # end of the level. A level with ONLY negated clauses complements
        # against match_all (the leading-negation case).
        nonlocal pos
        acc: Optional[np.ndarray] = None
        negs: List[np.ndarray] = []
        first = True
        while pos < len(toks) and toks[pos] != ')':
            op = default_operator
            if not first:
                if toks[pos] == '+':
                    op, pos = "and", pos + 1
                elif toks[pos] == '|':
                    op, pos = "or", pos + 1
                if pos >= len(toks) or toks[pos] == ')':
                    break
            d, neg = parse_clause()
            first = False
            if neg:
                negs.append(d)
                continue
            if acc is None:
                acc = d
            elif op == "and":
                acc = np.intersect1d(acc, d, assume_unique=True)
            else:
                acc = np.union1d(acc, d)
        if acc is None:
            acc = universe() if negs else np.empty(0, np.int64)
        for nd in negs:
            acc = np.setdiff1d(acc, nd, assume_unique=True)
        return acc

    return parse_expr()


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
    - {"all_of": {"intervals": [source, ...], "ordered": bool,
      "max_gaps": int}} — conjunction. With the default max_gaps=-1 and
      ordered=False this is the doc-level intersection; otherwise one
      sub-interval per child must pack into a window whose uncovered
      positions are <= max_gaps (ordered = increasing, non-overlapping) —
      sub-interval span tracking via :func:`_interval_spans`, the
      IntervalsSourceProvider.Combine semantics.
    """
    if _interval_needs_spans(source):
        # filter clauses / ordered+max_gaps combine need per-doc span
        # tracking: candidates from the filter-stripped doc-level query
        # (a superset — filters and window constraints only prune)
        cand = intervals_docs(s, _strip_interval_constraints(source))
        if cand.size == 0:
            return cand
        pos = _positions_by_doc(s, _interval_terms(s, source), cand)
        out = [d for d in cand.tolist()
               if _interval_spans(s, source, pos[d])]
        return np.asarray(out, dtype=np.int64)
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
    if any(k in source for k in ("prefix", "wildcard", "fuzzy",
                                 "regexp")):
        # Intervals.prefix/wildcard/fuzzy/regexp: expanded against the
        # (prefix-pruned / streamed) terms dict, doc set = union
        terms = _interval_multi_terms(s, source)
        parts = [s.term_docs(t) for t in terms]
        parts = [p for p in parts if p.size]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64))
    if "any_of" in source:
        parts = [intervals_docs(s, sub)
                 for sub in source["any_of"]["intervals"]]
        parts = [p for p in parts if p.size]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64))
    if "all_of" in source:
        spec = source["all_of"]
        cur: Optional[np.ndarray] = None
        for sub in spec["intervals"]:
            d = intervals_docs(s, sub)
            cur = d if cur is None else np.intersect1d(cur, d,
                                                       assume_unique=True)
            if cur.size == 0:
                return cur
        return cur if cur is not None else np.empty(0, np.int64)
    raise ValueError(f"unsupported intervals source: {sorted(source)}")


_INTERVAL_KEYS = ("match", "prefix", "wildcard", "fuzzy", "regexp",
                  "any_of", "all_of")


def _interval_spec(source: dict):
    for k in _INTERVAL_KEYS:
        if k in source:
            return k, source[k]
    raise ValueError(f"unsupported intervals source: {sorted(source)}")


def _interval_multi_terms(s: Searcher, source: dict) -> List[str]:
    if "prefix" in source:
        return s.expand_prefix(source["prefix"]["prefix"])
    if "wildcard" in source:
        return s.expand_wildcard(source["wildcard"]["pattern"])
    if "fuzzy" in source:
        spec = source["fuzzy"]
        return s.expand_fuzzy(spec["term"],
                              max_edits=int(spec.get("fuzziness", 2)),
                              prefix_length=int(spec.get("prefix_length",
                                                         0)))
    return expand_regexp(s, source["regexp"]["pattern"])


def _interval_needs_spans(source: dict) -> bool:
    """True when doc-level evaluation is insufficient: a filter clause
    anywhere, or an all_of with ordered / max_gaps constraints."""
    kind, spec = _interval_spec(source)
    if spec.get("filter"):
        return True
    if kind == "all_of" and (int(spec.get("max_gaps", -1)) != -1
                             or bool(spec.get("ordered", False))):
        return True
    if kind in ("any_of", "all_of"):
        return any(_interval_needs_spans(sub) for sub in spec["intervals"])
    return False


def _strip_interval_constraints(source: dict) -> dict:
    """Drop filter clauses and relax all_of windows — yields the
    doc-level SUPERSET query used for candidate pruning."""
    import copy
    src = copy.deepcopy(source)

    def walk(node):
        kind, spec = _interval_spec(node)
        spec.pop("filter", None)
        if kind == "all_of":
            spec["max_gaps"] = -1
            spec["ordered"] = False
        if kind in ("any_of", "all_of"):
            for sub in spec["intervals"]:
                walk(sub)

    walk(src)
    return src


def _interval_terms(s: Searcher, source: dict) -> List[str]:
    """All analyzed terms a source reads positions for (recursive,
    including filter sources and multi-term expansions)."""
    kind, spec = _interval_spec(source)
    seen: List[str] = []
    if kind == "match":
        seen = list(s.analyzer.tokens(spec["query"]))
    elif kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        seen = list(_interval_multi_terms(s, source))
    else:
        for sub in spec["intervals"]:
            for t in _interval_terms(s, sub):
                if t not in seen:
                    seen.append(t)
    f = spec.get("filter")
    if f:
        for fsub in f.values():
            for t in _interval_terms(s, fsub):
                if t not in seen:
                    seen.append(t)
    return seen


def _apply_interval_filter(s: Searcher, spans: List[tuple], f: dict,
                           pos_of: Dict[str, np.ndarray]) -> List[tuple]:
    """IntervalFilter (IntervalsSourceProvider.IntervalFilter): keep base
    spans by their relation to the filter source's spans."""
    (kind, fsource), = f.items()
    fspans = _interval_spans(s, fsource, pos_of)

    def rel(S):
        b, e = S
        if kind == "containing":
            return any(b <= tb and te <= e for tb, te in fspans)
        if kind == "contained_by":
            return any(tb <= b and e <= te for tb, te in fspans)
        if kind == "not_containing":
            return not any(b <= tb and te <= e for tb, te in fspans)
        if kind == "not_contained_by":
            return not any(tb <= b and e <= te for tb, te in fspans)
        if kind == "overlapping":
            return any(b <= te and tb <= e for tb, te in fspans)
        if kind == "not_overlapping":
            return not any(b <= te and tb <= e for tb, te in fspans)
        if kind == "before":  # base span ends before any filter span
            return any(e < tb for tb, te in fspans)
        if kind == "after":   # base span starts after any filter span
            return any(b > te for tb, te in fspans)
        raise ValueError(f"unsupported intervals filter: {kind}")

    return [S for S in spans if rel(S)]


def _minimal_spans(spans: List[tuple]) -> List[tuple]:
    """Lucene's minimal-interval discipline: drop any interval that
    strictly contains another matching interval."""
    if len(spans) <= 1:
        return spans
    spans = sorted(set(spans))
    out = []
    for i, (b, e) in enumerate(spans):
        contained = False
        for b2, e2 in spans:
            if (b2, e2) != (b, e) and b2 >= b and e2 <= e:
                contained = True
                break
        if not contained:
            out.append((b, e))
    return out


def _interval_spans(s: Searcher, source: dict,
                    pos_of: Dict[str, np.ndarray]) -> List[tuple]:
    """Matching minimal (start, end) intervals of an intervals source
    within ONE doc (IntervalsSourceProvider: Match / Prefix / Wildcard /
    Disjunction / Combine, each optionally wrapped by an IntervalFilter).
    Gap accounting matches the span machinery: uncovered positions in the
    enclosing window must be <= max_gaps."""
    kind, spec = _interval_spec(source)
    if kind == "match":
        toks = s.analyzer.tokens(spec["query"])
        if not toks:
            return []
        max_gaps = int(spec.get("max_gaps", -1))
        ordered = bool(spec.get("ordered", False))
        lists = [np.asarray(pos_of.get(t, ()), dtype=np.int64)
                 for t in toks]
        if len(toks) == 1:
            spans = [(int(p), int(p)) for p in lists[0]]
        else:
            slop = max_gaps if max_gaps >= 0 else (1 << 30)
            spans = _minimal_spans(_enum_near_spans(lists, slop, ordered))
    elif kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        ps = sorted({int(p) for t in _interval_multi_terms(s, source)
                     for p in pos_of.get(t, ())})
        spans = [(p, p) for p in ps]
    elif kind == "any_of":
        allsp: List[tuple] = []
        for sub in spec["intervals"]:
            allsp.extend(_interval_spans(s, sub, pos_of))
        spans = _minimal_spans(allsp)
    else:  # all_of
        max_gaps = int(spec.get("max_gaps", -1))
        ordered = bool(spec.get("ordered", False))
        sub_spans = [_interval_spans(s, sub, pos_of)
                     for sub in spec["intervals"]]
        if not all(sub_spans):
            return []
        import itertools
        combos: List[tuple] = []
        if int(np.prod([len(sl) for sl in sub_spans])) <= 4096:
            for combo in itertools.product(*sub_spans):
                seq = combo if ordered else sorted(combo)
                # sub-intervals may not overlap (NearSpans discipline)
                if any(seq[i + 1][0] <= seq[i][1]
                       for i in range(len(seq) - 1)):
                    continue
                covered = sum(e - b + 1 for b, e in combo)
                lo = min(b for b, _ in combo)
                hi = max(e for _, e in combo)
                if max_gaps >= 0 and (hi - lo + 1) - covered > max_gaps:
                    continue
                combos.append((lo, hi))
        spans = _minimal_spans(combos)
    f = spec.get("filter")
    if f and spans:
        spans = _apply_interval_filter(s, spans, f, pos_of)
    return spans
