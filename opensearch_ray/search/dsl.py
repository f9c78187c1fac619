"""OpenSearch JSON query-DSL executor.

The reference's actual user surface is the JSON ``_search`` request body:
``server/src/main/java/org/opensearch/index/query/*QueryBuilder.java``
parsed via ``AbstractQueryBuilder.parseInnerQueryBuilder`` and
``server/.../search/builder/SearchSourceBuilder.java``. This module accepts
that body as a Python dict and dispatches each query type onto the engine's
native primitives (``Searcher`` + ``search/queries.py``), so a user of the
reference can submit the same request shape here.

Two evaluation contexts, mirroring Lucene/OpenSearch:

- **filter context** (:func:`query_docs`): a query evaluates to the set of
  matching docids, no scores (``BoolQueryBuilder.filter``, constant-score
  rewrite). Set algebra over sorted global docid arrays — the same
  materialization contract as ``Searcher.bool_docs`` (segment-streamed
  underneath, only result sets surface here).
- **query context** (:func:`execute_search`): text clauses in positive
  scoring positions contribute BM25 scores; the full query still gates the
  hit set. Scores from the engine's exact block-max scorer, filtering by
  membership — the ``post_filter``/``FilteredCollector`` shape.

Query types handled: match, match_all, match_none, term, terms, range,
exists, ids, prefix, wildcard, fuzzy, regexp, match_phrase,
match_phrase_prefix, match_bool_prefix, terms_set, intervals, bool,
constant_score, wrapper (base64 JSON — WrapperQueryBuilder.java), script
(Python callable as the Painless stand-in — ScriptQueryBuilder.java),
span_near/span_or/span_first/span_not.
"""
from __future__ import annotations

import base64
import json
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from .searcher import Searcher
from . import queries as Q


def _all_docs(s: Searcher) -> np.ndarray:
    """match_all in filter context — per-segment aranges (global order)."""
    parts = [np.arange(seg.doc_count, dtype=np.int64) + s.doc_base(seg.seg_id)
             for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id)]
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def _field_body(body: dict):
    """{field: spec} -> (field, spec) for single-field query bodies."""
    (field, spec), = body.items()
    return field, spec


def _match_terms(s: Searcher, spec) -> tuple:
    """Normalize a match spec -> (terms, operator, msm)."""
    if isinstance(spec, dict):
        text = spec.get("query", "")
        op = spec.get("operator", "or").lower()
        msm = spec.get("minimum_should_match", 0)
    else:
        text, op, msm = str(spec), "or", 0
    return s.analyzer.tokens(str(text)), op, msm


def _intersect(parts: List[np.ndarray]) -> np.ndarray:
    out = parts[0]
    for p in parts[1:]:
        out = np.intersect1d(out, p, assume_unique=True)
    return out


def query_docs(s: Searcher, q: dict, text_field: str = "text") -> np.ndarray:
    """Evaluate ``q`` in FILTER context -> sorted unique global docids."""
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(f"query must be a single-key dict, got {q!r}")
    (kind, body), = q.items()

    if kind == "match_all":
        return _all_docs(s)
    if kind == "match_none":  # MatchNoneQueryBuilder.java
        return np.empty(0, np.int64)
    if kind == "wrapper":  # WrapperQueryBuilder.java: base64(JSON query)
        inner = body["query"] if isinstance(body, dict) else body
        return query_docs(s, json.loads(base64.b64decode(inner)), text_field)
    if kind == "constant_score":
        return query_docs(s, body["filter"], text_field)
    if kind == "bool":
        return _bool_docs(s, body, text_field)
    if kind == "script":
        return _script_docs(s, body)
    if kind == "ids":
        return np.sort(Q.ids_docs(s, body["values"],
                                  body.get("field", "doc_id")))
    if kind == "exists":
        return Q.exists_docs(s, body["field"])
    if kind == "terms_set":
        field, spec = _field_body(body)
        return np.sort(Q.terms_set_docs(
            s, spec["terms"], spec["minimum_should_match_field"]))
    if kind == "intervals":
        field, spec = _field_body(body)
        return np.sort(Q.intervals_docs(s, spec))
    if kind == "span_near":
        clauses = [_span_term_value(c) if "span_term" in c else c
                   for c in body["clauses"]]
        return np.sort(Q.span_near_clauses_docs(
            s, clauses, slop=body.get("slop", 0),
            in_order=body.get("in_order", True)))
    if kind == "span_or":
        terms = [_span_term_value(c) for c in body["clauses"]]
        return np.sort(Q.span_or_docs(s, terms))
    if kind == "span_first":
        return np.sort(Q.span_first_docs(
            s, _span_term_value(body["match"]), body["end"]))
    if kind == "span_not":
        return np.sort(Q.span_not_docs(
            s, _span_term_value(body["include"]),
            _span_term_value(body["exclude"]),
            pre=body.get("pre", 0), post=body.get("post", 0)))

    field, spec = _field_body(body)
    if kind == "match":
        terms, op, msm = _match_terms(s, spec)
        if not terms:
            return np.empty(0, np.int64)
        if op == "and":
            return np.sort(s.bool_docs(must=terms))
        return np.sort(s.bool_docs(should=terms,
                                   minimum_should_match=msm or 1))
    if kind == "match_phrase":
        slop = spec.get("slop", 0) if isinstance(spec, dict) else 0
        text = spec["query"] if isinstance(spec, dict) else spec
        return np.sort(s.match_phrase(str(text), slop=slop))
    if kind == "match_phrase_prefix":
        text = spec["query"] if isinstance(spec, dict) else spec
        return np.sort(s.match_phrase_prefix(str(text)))
    if kind == "match_bool_prefix":
        text = spec["query"] if isinstance(spec, dict) else spec
        return np.sort(Q.match_bool_prefix_docs(s, str(text)))
    ci = isinstance(spec, dict) and bool(spec.get("case_insensitive"))
    if kind == "term":
        val = spec["value"] if isinstance(spec, dict) else spec
        if field == text_field:
            if ci:  # casefolded terms-dict expansion (TermQueryBuilder:58)
                terms = s.expand_case_insensitive(str(val))
                return (np.sort(s.bool_docs(should=terms)) if terms
                        else np.empty(0, np.int64))
            return np.sort(s.term_docs(str(val)))
        if ci:
            return Q.ci_value_docs(s, field, str(val))
        return s.range_docs(field, val)  # scalar spec == doc-values equality
    if kind == "terms":
        vals = list(spec)
        if field == text_field:
            return np.sort(s.bool_docs(should=[str(v) for v in vals],
                                       minimum_should_match=1))
        return s.range_docs(field, vals)
    if kind == "range":
        return s.range_docs(field, spec)
    if kind == "prefix":
        val = spec["value"] if isinstance(spec, dict) else spec
        if ci:
            terms = s.expand_prefix_ci(str(val))
            return (np.sort(s.bool_docs(should=terms)) if terms
                    else np.empty(0, np.int64))
        return np.sort(s.prefix_docs(str(val)))
    if kind == "wildcard":
        val = spec["value"] if isinstance(spec, dict) else spec
        if ci:
            terms = s.expand_wildcard(str(val), case_insensitive=True)
            return (np.sort(s.bool_docs(should=terms)) if terms
                    else np.empty(0, np.int64))
        return np.sort(s.wildcard_docs(str(val)))
    if kind == "fuzzy":
        val = spec["value"] if isinstance(spec, dict) else spec
        fz = spec.get("fuzziness", 2) if isinstance(spec, dict) else 2
        # FuzzyQueryBuilder.transpositions (adjacent swap = 1 edit, the
        # reference's DEFAULT); kept opt-in default-off here to preserve
        # the plain-Levenshtein oracle entries — the option is what the
        # reference exposes, both distances are served
        tp = bool(spec.get("transpositions", False)) \
            if isinstance(spec, dict) else False
        return np.sort(s.fuzzy_docs(str(val), max_edits=int(fz),
                                    transpositions=tp))
    if kind == "regexp":
        val = spec["value"] if isinstance(spec, dict) else spec
        return np.sort(Q.regexp_docs(s, str(val), case_insensitive=ci))
    raise ValueError(f"unsupported query type: {kind}")


def _fast_path(s: Searcher, q: dict, text_field: str):
    """Detect request shapes the searcher answers natively with block-max
    top-k + pre-heap doc-values filters (no full-corpus scoring): a plain
    match, or a bool whose ONLY clauses are one scoring match (must) plus
    doc-values term/range filters. Returns (query_text, terms, operator,
    filters) or None."""
    (kind, body), = q.items()
    if kind == "match":
        field, spec = _field_body(body)
        if field != text_field:
            return None
        terms, op, msm = _match_terms(s, spec)
        if not terms or msm:
            return None
        return " ".join(terms), terms, op, None
    if kind != "bool":
        return None
    if body.get("should") or body.get("must_not") \
            or body.get("minimum_should_match"):
        return None
    must = _aslist(body.get("must"))
    if len(must) != 1 or "match" not in must[0]:
        return None
    inner = _fast_path(s, must[0], text_field)
    if inner is None:
        return None
    filters: dict = {}
    for c in _aslist(body.get("filter")):
        (fk, fb), = c.items()
        if fk not in ("range", "term", "terms"):
            return None
        field, spec = _field_body(fb)
        if field == text_field or field in filters:
            return None
        if fk == "term" and isinstance(spec, dict):
            spec = spec["value"]
        if fk == "terms":
            spec = list(spec)
        filters[field] = spec
    qtext, terms, op, _ = inner
    return qtext, terms, op, (filters or None)


def _bool_docs(s: Searcher, body: dict, text_field: str) -> np.ndarray:
    """Recursive bool set algebra (BoolQueryBuilder.java doRewrite).

    minimum_should_match default: 1 when the bool has should clauses and no
    must/filter, else 0 (Queries.calculateMinShouldMatch call sites)."""
    must = [query_docs(s, c, text_field) for c in _aslist(body.get("must"))]
    filt = [query_docs(s, c, text_field) for c in _aslist(body.get("filter"))]
    nots = [query_docs(s, c, text_field)
            for c in _aslist(body.get("must_not"))]
    shoulds = [query_docs(s, c, text_field)
               for c in _aslist(body.get("should"))]
    msm = body.get("minimum_should_match")
    if msm is None:
        msm = 1 if shoulds and not (must or filt) else 0
    if isinstance(msm, str) and msm.endswith("%"):
        msm = (len(shoulds) * int(msm[:-1])) // 100

    if not (must or filt or shoulds or nots):
        return _all_docs(s)  # clause-less bool == match_all (Lucene rewrite)
    base: Optional[np.ndarray] = None
    if must or filt:
        base = _intersect(must + filt)
    if shoulds:
        if msm > 0:
            cat = np.concatenate(shoulds) if shoulds else np.empty(0, np.int64)
            ids, cnt = np.unique(cat, return_counts=True)
            ok = ids[cnt >= msm]
            base = ok if base is None else np.intersect1d(
                base, ok, assume_unique=True)
        # msm == 0 with must/filter present: should only boosts, no gating
    if base is None:
        if not nots:
            return np.empty(0, np.int64)
        # must_not-only bool: per-segment complement — peak extra memory is
        # ONE segment's arange, never a global arange(N) (the result set
        # itself is inherently O(matches), same contract as bool_docs)
        excl = np.unique(np.concatenate(nots)) if nots else \
            np.empty(0, np.int64)
        parts = []
        for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
            base_id = s.doc_base(seg.seg_id)
            local = np.arange(seg.doc_count, dtype=np.int64) + base_id
            lo = np.searchsorted(excl, base_id)
            hi = np.searchsorted(excl, base_id + seg.doc_count)
            keep = np.setdiff1d(local, excl[lo:hi], assume_unique=True)
            if keep.size:
                parts.append(keep)
        return (np.concatenate(parts) if parts
                else np.empty(0, np.int64))
    for n in nots:
        base = np.setdiff1d(base, n, assume_unique=True)
    return base


def _script_docs(s: Searcher, body: dict) -> np.ndarray:
    """script query (ScriptQueryBuilder.java) — the Painless stand-in is a
    Python callable over a per-segment doc-values DataFrame returning a
    boolean mask (vectorized; one call per segment, never per doc)."""
    spec = body.get("script", body)
    fn: Callable[[pd.DataFrame], np.ndarray] = spec["source"]
    fields: Sequence[str] = spec.get("fields", ())
    parts: List[np.ndarray] = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        df = pd.DataFrame({f: s.doc_values(seg.seg_id, f) for f in fields})
        mask = np.asarray(fn(df), dtype=bool)
        if mask.any():
            parts.append(np.flatnonzero(mask).astype(np.int64)
                         + s.doc_base(seg.seg_id))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def _aslist(x) -> list:
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


def _span_term_value(clause: dict) -> str:
    """{"span_term": {field: value-or-{"value": v}}} -> the term string."""
    (field, v), = clause["span_term"].items()
    return str(v["value"] if isinstance(v, dict) else v)


def _fetch_aligned(s: Searcher, ids: np.ndarray, columns: List[str]):
    """Doc-values gather aligned to ``ids`` order (fetch() returns rows
    sorted by global docid — realign via searchsorted on _docid)."""
    t = s.fetch(ids, columns=columns)
    fd = t.column("_docid").to_numpy()
    pos = np.searchsorted(fd, np.asarray(ids, np.int64))
    return {c: t.column(c).to_numpy(zero_copy_only=False)[pos]
            for c in columns}


def _score_terms(s: Searcher, q: dict) -> List[str]:
    """Analyzed terms in POSITIVE scoring positions (match / term /
    match_phrase on the text field inside must/should or at top level).
    filter / must_not / constant_score contribute no scores — the
    query-vs-filter-context split of BooleanClause.Occur."""
    (kind, body), = q.items()
    if kind == "match":
        _, spec = _field_body(body)
        terms, _, _ = _match_terms(s, spec)
        return terms
    if kind in ("match_phrase", "match_phrase_prefix", "match_bool_prefix"):
        _, spec = _field_body(body)
        text = spec["query"] if isinstance(spec, dict) else spec
        return s.analyzer.tokens(str(text))
    if kind == "term":
        _, spec = _field_body(body)
        val = spec["value"] if isinstance(spec, dict) else spec
        return [str(val)]
    if kind == "bool":
        out: List[str] = []
        for c in _aslist(body.get("must")) + _aslist(body.get("should")):
            out.extend(_score_terms(s, c))
        return out
    if kind == "wrapper":
        inner = body["query"] if isinstance(body, dict) else body
        return _score_terms(s, json.loads(base64.b64decode(inner)))
    return []


#: index.max_result_window default (IndexSettings.java:211-216)
MAX_RESULT_WINDOW = 10_000


def _index_sort_prune(s: Searcher, body: dict, ids: np.ndarray,
                      scores: np.ndarray):
    """Index-sort early termination for the DSL sort path
    (QueryPhase.canEarlyTerminate): when the request sorts by the index
    sort's leading column ascending (optionally tie-broken by ``_doc``
    asc — the same order the cut preserves) and is not cursor-paged,
    each segment can contribute only its FIRST from+size matches — local
    docid order IS the sort order — before the value gather runs. Cuts
    the sort phase's doc-value fetch from O(matches) to
    O(k x segments) on index-sorted layouts; a no-op otherwise."""
    specs = _parse_sort(body.get("sort"))
    eligible = (
        bool(s.manifest.index_sort)
        and body.get("search_after") is None
        and 1 <= len(specs) <= 2
        and specs[0] == (s.manifest.index_sort[0], False)
        and (len(specs) == 1 or specs[1] == ("_doc", False))
        and specs[0][0] not in (body.get("derived") or {})
        and specs[0][0] not in s._derived  # a derived shadow re-orders
        and all(getattr(seg, "index_sorted", True)
                for seg in s.manifest.segments))
    if not eligible or ids.size == 0:
        return ids, scores
    need = int(body.get("from", 0)) + int(body.get("size", 10))
    g = np.sort(ids)
    seg_idx = np.searchsorted(s._bases, g, side="right") - 1
    # first `need` match docids of every segment, one vectorized pass:
    # rank-within-segment = position - first-position-of-that-segment
    first = np.concatenate(([0], np.flatnonzero(np.diff(seg_idx)) + 1))
    seg_start = np.repeat(first, np.diff(np.concatenate((first, [g.size]))))
    keep_sorted = g[(np.arange(g.size) - seg_start) < need]
    mask = np.isin(ids, keep_sorted)
    return ids[mask], scores[mask]


def _register_derived(s: Searcher, body: dict) -> None:
    """Request-body ``derived`` section (DerivedFieldResolver — derived
    fields can be defined per search request, not only in the mapping).
    Spec shapes, both accepted:
      {name: {"script": {"source": callable, "fields": [...]}}}   # the
          reference's JSON shape with a Python callable for Painless
      {name: {"script": callable, "source_columns": [...]}}
    Registration makes the field a first-class doc-values column on the
    Searcher (term/terms/range/exists, sort, aggs, collapse); it is
    idempotent, so the wide/post_filter re-entries are safe."""
    for name, spec in (body.get("derived") or {}).items():
        script = spec.get("script", spec)
        if isinstance(script, dict):
            fn = script.get("source")
            cols = script.get("fields") or ()
        else:
            fn = script
            cols = spec.get("source_columns") or spec.get("fields") or ()
        if callable(fn) and cols:
            s.register_derived_field(name, fn, cols,
                                     spec.get("ignore_malformed", False))


def _hybrid_search(s: Searcher, spec: dict, body: dict, text_field: str,
                   id_col: str) -> pd.DataFrame:
    """OpenSearch ``hybrid`` query (neural-search HybridQueryBuilder +
    the search pipeline's normalization-processor): execute each
    sub-query independently, keep each leg's top ``pagination_depth``
    (default from+size), normalize per leg (min_max / l2), combine with
    a weighted arithmetic/geometric/harmonic mean over the legs where
    the doc appears, then page the fused ranking (score desc, id asc).

    The ``normalization`` / ``combination`` specs ride inline under the
    clause — the body-level analogue of the processor config::

        {"hybrid": {"queries": [...], "pagination_depth": 100,
                    "normalization": {"technique": "min_max"},
                    "combination": {"technique": "arithmetic_mean",
                                    "parameters": {"weights": [...]}}}}
    """
    from ..similarity.hybrid import _combine, _normalize_leg
    subs = spec.get("queries") or []
    if not subs:
        raise ValueError("hybrid query requires a non-empty 'queries'")
    frm = int(body.get("from", 0))
    size = int(body.get("size", 10))
    depth = int(spec.get("pagination_depth", 0)) or (frm + size)
    technique = (spec.get("normalization") or {}).get(
        "technique", "min_max")
    comb = spec.get("combination") or {}
    combination = comb.get("technique", "arithmetic_mean")
    weights = (comb.get("parameters") or {}).get("weights")
    w = np.asarray(weights if weights is not None
                   else [1.0 / len(subs)] * len(subs), np.float64)
    if w.size != len(subs):
        raise ValueError("combination weights must match sub-query count")

    legs = []
    for subq in subs:
        if isinstance(subq, dict) and len(subq) == 1 and "knn" in subq:
            (field, kspec), = subq["knn"].items()
            allow = (query_docs(s, kspec["filter"], text_field)
                     if kspec.get("filter") else None)
            ids, sc = knn_docs_scores(s, field, kspec["vector"],
                                      int(kspec.get("k", depth)),
                                      allow=allow)
        else:
            docs = query_docs(s, subq, text_field)
            terms = _score_terms(s, subq)
            if terms:
                sc = s.score_docs(docs, terms)
                m = sc > 0
                ids, sc = docs[m], sc[m]
            else:
                ids, sc = Q.constant_score_docs(s, docs, 1.0)
        top = np.lexsort((ids, -sc))[:depth]
        legs.append((ids[top], np.asarray(sc, np.float64)[top]))

    all_ids = np.unique(np.concatenate([i for i, _ in legs]))
    mat = np.zeros((all_ids.size, len(legs)), np.float64)
    present = np.zeros_like(mat)
    for j, (ids, sc) in enumerate(legs):
        idx = np.searchsorted(all_ids, ids)
        mat[idx, j] = _normalize_leg(sc, technique)
        present[idx, j] = 1.0
    score = _combine(mat, present, w, combination)
    order = np.lexsort((all_ids, -score))[frm:frm + size]
    out = pd.DataFrame({id_col: all_ids[order], "score": score[order]})
    src = body.get("_source")
    if src:
        for c, vals in _fetch_aligned(
                s, out[id_col].to_numpy(), list(src)).items():
            out[c] = vals
    _project_field_options(s, out, out[id_col].to_numpy(), body)
    return out


def execute_search(s: Searcher, body: dict, text_field: str = "text",
                   id_col: str = "doc_id",
                   field_aliases: Optional[dict] = None) -> pd.DataFrame:
    """Execute a ``_search`` request body -> hits DataFrame.

    ``field_aliases``: {alias: concrete_path} mapping from ``alias``-type
    fields in the mapping (FieldAliasMapper.java); resolved once up front
    so the executor only ever sees concrete field names.

    Supported body keys: query, from, size, sort (field names or
    {field: {"order"}} or "_score"/"_doc"), search_after (sort-tuple cursor;
    score-ordered cursors ride the collector's after= floor on the fast
    path), _source (column list projected into the result). Scoring: BM25 over the positive text clauses, gated by the full
    query's filter-context doc set; pure-filter queries score constant 1.0
    (or the constant_score boost) with docid-ascending order — matching the
    reference's constant-score rewrite."""
    if field_aliases:
        from ..mapper import resolve_field_aliases
        body = resolve_field_aliases(body, field_aliases)
    _register_derived(s, body)
    # index.max_result_window (IndexSettings.java:211, default 10000):
    # deep pages must use search_after / scroll, not from+size
    win = int(body.get("from", 0)) + int(body.get("size", 10))
    if win > MAX_RESULT_WINDOW and not body.get("_internal_window"):
        raise ValueError(
            f"Result window is too large, from + size must be less than "
            f"or equal to: [{MAX_RESULT_WINDOW}] but was [{win}]. See the "
            "scroll api for a more efficient way to request large data "
            "sets.")
    q = body.get("query", {"match_all": {}})
    if isinstance(q, dict) and len(q) == 1 and "knn" in q:
        (field, spec), = q["knn"].items()
        radial = ("min_score" in spec or "max_distance" in spec)
        kk = int(spec.get("k", body.get("size", 10)))
        allow = (query_docs(s, spec["filter"], text_field)
                 if spec.get("filter") else None)
        ids, scores = knn_docs_scores(s, field, spec["vector"], kk,
                                      allow=allow,
                                      min_score=spec.get("min_score"),
                                      max_distance=spec.get("max_distance"))
        frm = int(body.get("from", 0))
        size = int(body.get("size", len(ids) if radial else kk))
        out = pd.DataFrame({id_col: ids[frm:frm + size],
                            "score": scores[frm:frm + size]})
        src = body.get("_source")
        if src:
            for c, vals in _fetch_aligned(
                    s, out[id_col].to_numpy(), list(src)).items():
                out[c] = vals
        _project_field_options(s, out, out[id_col].to_numpy(), body)
        return out
    if isinstance(q, dict) and len(q) == 1 and "hybrid" in q:
        return _hybrid_search(s, q["hybrid"], body, text_field, id_col)
    fast = _fast_path(s, q, text_field)
    if fast is not None:
        frm = int(body.get("from", 0))
        size = int(body.get("size", 10))
        qtext, terms, op, filters = fast
        if not body.get("sort"):
            after = None
            after_b = body.get("search_after")
            if after_b is not None:
                # score-ordered cursor [last_score] or [last_score,
                # last_docid] -> the collector-level after= floor: O(k)
                # heap at any page depth, never a ranked-prefix replay
                after = (float(after_b[0]),
                         int(after_b[1]) if len(after_b) > 1 else 2 ** 62)
            hits = s.search(qtext, k=frm + size, terms=terms, operator=op,
                            filters=filters, after=after)
            ids = np.fromiter((h.docid for h in hits), np.int64,
                              count=len(hits))[frm:]
            scores = np.asarray([h.score for h in hits],
                                np.float64)[frm:frm + size]
            out = pd.DataFrame({id_col: ids, "score": scores})
            src = body.get("_source")
            if src:
                for c, vals in _fetch_aligned(s, ids, list(src)).items():
                    out[c] = vals
            _project_field_options(s, out, ids, body)
            _attach_explanations(s, out, body, terms, id_col)
            return out

    docs = query_docs(s, q, text_field)
    terms = _score_terms(s, q)

    if terms:
        # score exactly the filter-context matches (score_docs is value-
        # identical to the exhaustive scorer) — memory O(len(docs)), never
        # O(every doc matching any scoring term)
        sc = s.score_docs(docs, terms)
        m = sc > 0  # docs matching no scoring term drop out (same hit set
        #             as the intersect-with-exhaustive-hits path)
        ids, scores = docs[m], sc[m]
        order = np.lexsort((ids, -scores))
        ids, scores = ids[order], scores[order]
    else:
        boost = 1.0
        (kind, qb), = q.items()
        if kind == "constant_score" and isinstance(qb, dict):
            boost = float(qb.get("boost", 1.0))
        ids, scores = Q.constant_score_docs(s, docs, boost)

    derived = body.get("derived") or {}

    def resolve(field: str, want_ids: np.ndarray) -> np.ndarray:
        """Column values aligned to want_ids — stored field or derived
        field (DerivedFieldMapper: query-time script over stored fields;
        the Painless stand-in is a vectorized Python callable)."""
        if field in derived:
            spec = derived[field].get("script", derived[field])
            fn = spec["source"]
            cols = list(spec.get("fields", ()))
            vals = _fetch_aligned(s, want_ids, cols)
            return np.asarray(fn(pd.DataFrame(vals)))
        if field in s._derived:  # mapping-level derived field
            from .sort_phase import gather_doc_values
            return gather_doc_values(s, want_ids, field)
        return _fetch_aligned(s, want_ids, [field])[field]

    sort = body.get("sort")
    if sort:
        ids, scores = _index_sort_prune(s, body, ids, scores)
        ids, scores = _apply_sort(s, ids, scores, sort, resolve)

    after_b = body.get("search_after")
    if after_b is not None:
        if sort:
            specs, cur = _parse_sort(sort), after_b
        else:
            # implicit order is (_score desc, docid asc); a 1-value cursor
            # means "strictly below this score" (docid sentinel past max)
            specs = [("_score", True), ("_doc", False)]
            cur = (list(after_b) if len(after_b) > 1
                   else [after_b[0], 2 ** 62])
        m = _search_after_mask(s, ids, scores, specs, resolve, cur)
        ids, scores = ids[m], scores[m]

    frm = int(body.get("from", 0))
    size = int(body.get("size", 10))
    ids, scores = ids[frm:frm + size], scores[frm:frm + size]
    out = pd.DataFrame({id_col: ids, "score": scores})
    src = body.get("_source")
    if src:
        for c in src:
            out[c] = resolve(c, ids)
    _project_field_options(s, out, ids, body, resolve)
    _attach_explanations(s, out, body, terms, id_col)
    return out


def _attach_explanations(s: Searcher, out: pd.DataFrame, body: dict,
                         terms, id_col: str) -> None:
    """Request-body ``explain: true`` (ExplainPhase): per-hit scoring
    breakdown as a JSON string column — per-term tf/df/idf/norm
    contributions for scored queries, a constant-score marker for
    pure-filter hits."""
    if not body.get("explain"):
        return
    import json as _json
    qt = " ".join(terms) if terms else ""
    out["_explanation"] = [
        _json.dumps(s.explain(qt, int(d)) if qt else
                    {"docid": int(d), "constant_score": True,
                     "score": float(sc)})
        for d, sc in zip(out[id_col], out["score"])]


def _project_field_options(s: Searcher, out: pd.DataFrame, ids: np.ndarray,
                           body: dict, resolve=None) -> None:
    """Request-body ``docvalue_fields`` / ``fields`` projection
    (SearchSourceBuilder.docValueField / FetchFieldsPhase): append the
    requested columns to the hits frame — both read the columnar doc
    values here, the reference's docvalue path. Specs may be plain names
    or {"field": name} objects; columns already projected are skipped."""
    specs = _aslist(body.get("docvalue_fields")) + _aslist(body.get("fields"))
    for spec in specs:
        f = spec["field"] if isinstance(spec, dict) else spec
        if f in out.columns:
            continue
        if resolve is not None:
            vals = resolve(f, ids)
        else:
            vals = _fetch_aligned(s, ids, [f])[f]
        fmt = spec.get("format") if isinstance(spec, dict) else None
        if fmt:
            # docvalue_fields date `format` (DocValueFieldsContext /
            # DateFormatter): Java date-pattern subset -> strftime
            vals = _format_datetimes(vals, fmt)
        out[f] = vals


#: Java DateTimeFormatter tokens -> strftime (the subset the reference's
#: named formats are built from); SSS (millis) handled separately
_JAVA_DATE_TOKENS = [("yyyy", "%Y"), ("SSS", "%f"), ("MM", "%m"),
                     ("dd", "%d"), ("HH", "%H"), ("mm", "%M"),
                     ("ss", "%S")]


def _format_datetimes(vals, fmt: str) -> list:
    """Render datetime64 doc values with a Java-style date pattern
    (yyyy-MM-dd'T'HH:mm:ss[.SSS], epoch_millis, epoch_second) —
    vectorized through pandas' strftime. SSS is supported as a TRAILING
    millisecond field (the position every reference named format uses)."""
    import pandas as pd
    ser = pd.Series(np.asarray(vals))
    if fmt == "epoch_millis":
        return (ser.astype("datetime64[ns]").astype(np.int64)
                // 1_000_000).tolist()
    if fmt == "epoch_second":
        return (ser.astype("datetime64[ns]").astype(np.int64)
                // 1_000_000_000).tolist()
    pat = fmt.replace("'T'", "T")
    for j, p in _JAVA_DATE_TOKENS:
        pat = pat.replace(j, p)
    out = ser.dt.strftime(pat)
    if "SSS" in fmt:  # strftime %f is micros; trim to millis
        out = out.str.slice(0, -3)
    return out.tolist()


def knn_docs_scores(s: Searcher, field: str, vector, k: int = 10,
                    allow: Optional[np.ndarray] = None,
                    min_score: Optional[float] = None,
                    max_distance: Optional[float] = None):
    """knn query (the k-NN plugin's query type; OpenSearch `"query":
    {"knn": {field: {"vector": [...], "k": N, "filter": {...}}}}`): exact
    cosine top-k over a list<float> doc-values column — per-segment
    vectorized matmul partials, global (score desc, docid asc) merge.
    ``allow`` (sorted global docids) is the efficient PRE-filter: only
    allowed rows are gathered and scored, the k-NN plugin's filtered
    search semantics (not post-filtering the top-k). Float64 scoring
    (the oracle-comparable mode; ANN variants live in similarity/).

    Radial search (the plugin's `min_score` / `max_distance` options —
    RNN query): when either is given, ALL docs inside the radius are
    returned (score desc, docid asc) and ``k`` is ignored.
    ``max_distance`` is cosine DISTANCE, i.e. 1 - cosine similarity."""
    thr = None
    if max_distance is not None:
        thr = 1.0 - float(max_distance)
    if min_score is not None:
        thr = float(min_score) if thr is None else max(thr, float(min_score))
    q = np.asarray(vector, np.float64)
    q = q / max(np.linalg.norm(q), 1e-300)
    cand_ids: List[np.ndarray] = []
    cand_sc: List[np.ndarray] = []
    for seg in sorted(s.manifest.segments, key=lambda x: x.seg_id):
        base = s.doc_base(seg.seg_id)
        vals = s.doc_values(seg.seg_id, field)
        if allow is not None:
            lo = int(np.searchsorted(allow, base))
            hi = int(np.searchsorted(allow, base + len(vals)))
            local = allow[lo:hi] - base
            if local.size == 0:
                continue
            vals = vals[local]
            ids = local.astype(np.int64) + base
        else:
            ids = np.arange(len(vals), dtype=np.int64) + base
        V = np.stack([np.asarray(v, np.float64) for v in vals])
        norms = np.linalg.norm(V, axis=1)
        sc = (V @ q) / np.maximum(norms, 1e-300)
        if thr is not None:
            keep = np.flatnonzero(sc >= thr)
            cand_ids.append(ids[keep])
            cand_sc.append(sc[keep])
        else:
            top = np.lexsort((ids, -sc))[:k]
            cand_ids.append(ids[top])
            cand_sc.append(sc[top])
    if not cand_ids:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ids = np.concatenate(cand_ids)
    sc = np.concatenate(cand_sc)
    order = np.lexsort((ids, -sc))
    if thr is None:
        order = order[:k]
    return ids[order], sc[order]


def _gather_values(s: Searcher, docs: np.ndarray, field: str) -> np.ndarray:
    """Doc-values gather for a sorted global docid set (per-segment
    vectorized take — the aggregation-phase doc-values read)."""
    if docs.size == 0:
        return np.empty(0, object)
    seg_idx = np.searchsorted(s._bases, docs, side="right") - 1
    vals = []
    for si in np.unique(seg_idx):
        seg_id = int(s._seg_ids[si])
        local = docs[seg_idx == si] - int(s._bases[si])
        vals.append(s.doc_values(seg_id, field)[local])
    return np.concatenate(vals)


def _iter_seg_values(s: Searcher, docs: np.ndarray, field: str):
    """Per-segment doc-values slices for a sorted docid set — the
    streaming shape for aggregations: each yield is ONE segment's matched
    values, so reducers hold per-segment partials (bounded by key
    cardinality), never the full matched value array."""
    if docs.size == 0:
        return
    seg_idx = np.searchsorted(s._bases, docs, side="right") - 1
    for si in np.unique(seg_idx):
        seg_id = int(s._seg_ids[si])
        local = docs[seg_idx == si] - int(s._bases[si])
        yield s.doc_values(seg_id, field)[local]


def _bucket_doc_sets(s: Searcher, docs: np.ndarray, field: str,
                     keys) -> list:
    """Sorted docid subsets per bucket key, aligned to ``keys`` — the
    membership gather behind sub-agg recursion (one doc-values pass per
    segment, bounded by len(keys) masks)."""
    parts = {k: [] for k in keys}
    seg_idx = np.searchsorted(s._bases, docs, side="right") - 1
    for si in np.unique(seg_idx):
        seg_id = int(s._seg_ids[si])
        base = int(s._bases[si])
        d = docs[seg_idx == si]
        v = s.doc_values(seg_id, field)[d - base]
        for k in keys:
            m = v == k
            if m.any():
                parts[k].append(d[m])
    return [np.concatenate(parts[k]) if parts[k]
            else np.empty(0, np.int64) for k in keys]


def execute_aggs(s: Searcher, docs: np.ndarray, aggs: dict,
                 text_field: str = "text") -> dict:
    """The request-body ``aggs`` tree over a matched doc set
    (SearchSourceBuilder.aggregation → AggregatorFactories): terms,
    avg/sum/min/max/value_count/stats, missing, filter (with sub-aggs),
    global (escapes the query scope, sub-aggs over ALL docs); terms /
    histogram / date_histogram / range buckets recurse into their own
    ``aggs`` sub-trees."""
    out: dict = {}
    for name, spec in aggs.items():
        sub = spec.get("aggs", {})
        kinds = [k for k in spec if k != "aggs"]
        if len(kinds) != 1:
            raise ValueError(f"agg {name!r} needs exactly one type")
        kind = kinds[0]
        body = spec[kind]
        if kind == "global":
            g = _all_docs(s)
            out[name] = {"doc_count": int(g.size),
                         **execute_aggs(s, g, sub, text_field)}
            continue
        if kind == "filter":
            f = np.intersect1d(docs, query_docs(s, body, text_field),
                               assume_unique=True)
            out[name] = {"doc_count": int(f.size),
                         **execute_aggs(s, f, sub, text_field)}
            continue
        if kind == "top_hits":
            # TopHitsAggregator in bucket context: the bucket's top docs
            # by an explicit sort spec (no scores in filter context —
            # default _doc asc, the reference's tiebreak order)
            size = int(body.get("size", 3))
            srt = body.get("sort", [])
            if srt:
                (fld, spec), = srt[0].items() if isinstance(
                    srt[0], dict) else (srt[0], {})
                desc = (spec.get("order", "asc") if isinstance(spec, dict)
                        else spec) == "desc"
                vals = _gather_values(s, docs, fld).astype(np.float64)
                order = np.lexsort((docs, -vals if desc else vals))
            else:
                order = np.arange(docs.size)
            top_ids = docs[order[:size]]
            hits = []
            flds = body.get("_source", [])
            by_id = {}
            if flds and top_ids.size:
                for row in s.fetch(top_ids.tolist(),
                                   columns=list(flds)).to_pylist():
                    by_id[row["_docid"]] = row
            for d in top_ids.tolist():
                h = {"_id": int(d)}
                if flds:
                    h["_source"] = {k: by_id[d][k] for k in flds}
                hits.append(h)
            out[name] = {"hits": {"total": int(docs.size), "hits": hits}}
            continue
        field = body["field"]
        # every agg below folds PER-SEGMENT partials (terms: per-segment
        # unique+counts; metrics: scalar accumulators) — driver memory is
        # bounded by key cardinality / O(1), never by matched-doc count
        if kind == "terms":
            acc: dict = {}
            for v in _iter_seg_values(s, docs, field):
                uniq, counts = np.unique(v, return_counts=True)
                for u, c in zip(uniq.tolist(), counts.tolist()):
                    acc[u] = acc.get(u, 0) + int(c)
            top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            top = top[:body.get("size", 10)]
            buckets = [{"key": u, "doc_count": c} for u, c in top]
            if sub and top:
                # sub-agg tree per SELECTED bucket (AggregatorFactories
                # nesting): membership gathered only for the top keys, so
                # the extra pass is bounded by size x matched docs
                for b, bd in zip(buckets,
                                 _bucket_doc_sets(s, docs, field,
                                                  [u for u, _ in top])):
                    b.update(execute_aggs(s, bd, sub, text_field))
            out[name] = {"buckets": buckets}
            continue
        if kind == "missing":
            n = 0
            for v in _iter_seg_values(s, docs, field):
                if v.dtype == object:
                    n += sum(1 for x in v if x is None or x == "")
                elif v.dtype.kind == "f":
                    n += int(np.isnan(v).sum())
            out[name] = {"doc_count": n}
            continue
        if kind == "date_histogram" and "calendar_interval" in body:
            # calendar rounding (Rounding.java calendar units) — numpy
            # datetime64 truncation per segment, Monday-aligned weeks
            unit = {"year": "Y", "month": "M", "week": "W", "day": "D",
                    "hour": "h", "minute": "m",
                    "second": "s"}[body["calendar_interval"]]
            acc = {}
            for v in _iter_seg_values(s, docs, field):
                d64 = v.astype("datetime64[ns]")
                if unit == "W":
                    dd = d64.astype("datetime64[D]")
                    dow = (dd.astype(np.int64) + 3) % 7  # Monday == 0
                    key = dd - dow.astype("timedelta64[D]")
                else:
                    key = d64.astype(f"datetime64[{unit}]")
                ks = key.astype("datetime64[s]").astype(np.int64)
                uniq, counts = np.unique(ks, return_counts=True)
                for u, c in zip(uniq.tolist(), counts.tolist()):
                    acc[int(u)] = acc.get(int(u), 0) + int(c)
            out[name] = {"buckets": [
                {"key_as_string": str(np.int64(kk)
                                      .astype("datetime64[s]")),
                 "key": kk * 1000, "doc_count": acc[kk]}
                for kk in sorted(acc)]}
            continue
        if kind in ("histogram", "date_histogram"):
            # HistogramAggregator / DateHistogramAggregator: per-segment
            # floor-keyed counts; empty buckets between min and max key
            # filled (the reference's min_doc_count=0 default). Dates use
            # a fixed_interval over int64 epoch-ns doc values (the native
            # aggs/ date_histogram carries the calendar intervals).
            if kind == "date_histogram":
                interval = int(_fixed_interval_ns(
                    body.get("fixed_interval", body.get("interval"))))
            else:
                interval = float(body["interval"])
            acc = {}
            for v in _iter_seg_values(s, docs, field):
                if v.dtype.kind == "M":
                    # stay in INTEGER space: epoch-ns (~1.5e18) exceeds
                    # float64's 2^53 integer range, so a float divide
                    # mis-buckets timestamps within ~256 ns of a boundary
                    # (the reference buckets with long arithmetic —
                    # Rounding.java fixed-interval round())
                    vi = v.astype("datetime64[ns]").astype(np.int64)
                    keys = vi // np.int64(interval)
                else:
                    vf = v.astype(np.float64)
                    vf = vf[~np.isnan(vf)]
                    keys = np.floor(vf / interval)
                uniq, counts = np.unique(keys, return_counts=True)
                for u, c in zip(uniq.tolist(), counts.tolist()):
                    acc[int(u)] = acc.get(int(u), 0) + int(c)
            min_dc = int(body.get("min_doc_count", 0))
            buckets = []
            if acc:
                lo, hi = min(acc), max(acc)
                # search.max_buckets analogue (MultiBucketConsumerService):
                # the min_doc_count=0 gap-fill is bounded — a sparse field
                # over a wide range must error, not OOM the driver
                if min_dc == 0 and hi - lo + 1 > 65536:
                    raise ValueError(
                        f"too_many_buckets_exception: histogram would "
                        f"create {hi - lo + 1} buckets (limit 65536); "
                        f"raise min_doc_count or widen the interval")
                kks = (range(lo, hi + 1) if min_dc == 0
                       else sorted(acc))
                for kk in kks:
                    c = acc.get(kk, 0)
                    if c >= min_dc:
                        buckets.append({"key": kk * interval,
                                        "doc_count": c})
            if sub and buckets:
                want = [b for b in buckets if b["doc_count"] > 0]
                member = {b["key"]: [] for b in want}
                seg_idx = np.searchsorted(s._bases, docs,
                                          side="right") - 1
                for si in np.unique(seg_idx):
                    seg_id = int(s._seg_ids[si])
                    d = docs[seg_idx == si]
                    v = s.doc_values(seg_id, field)[
                        d - int(s._bases[si])]
                    if v.dtype.kind == "M":
                        keys = (v.astype("datetime64[ns]")
                                .astype(np.int64)
                                // np.int64(interval)) * interval
                    else:
                        vf = v.astype(np.float64)
                        ok = ~np.isnan(vf)
                        d = d[ok]
                        keys = np.floor(vf[ok] / interval) * interval
                    for b in want:
                        m = keys == b["key"]
                        if m.any():
                            member[b["key"]].append(d[m])
                for b in want:
                    bd = (np.concatenate(member[b["key"]])
                          if member[b["key"]]
                          else np.empty(0, np.int64))
                    b.update(execute_aggs(s, bd, sub, text_field))
            out[name] = {"buckets": buckets}
            continue
        if kind == "range":
            # RangeAggregator: [from, to) per range, overlapping allowed
            ranges = body["ranges"]
            cnts = [0] * len(ranges)
            members: list = [[] for _ in ranges]
            seg_idx = np.searchsorted(s._bases, docs, side="right") - 1
            for si in np.unique(seg_idx):
                seg_id = int(s._seg_ids[si])
                d = docs[seg_idx == si]
                v = s.doc_values(seg_id, field)[d - int(s._bases[si])] \
                    .astype(np.float64)
                for i, r in enumerate(ranges):
                    m = np.ones(v.size, bool)
                    if "from" in r:
                        m &= v >= float(r["from"])
                    if "to" in r:
                        m &= v < float(r["to"])
                    cnts[i] += int(m.sum())
                    if sub and m.any():
                        members[i].append(d[m])
            buckets = []
            for i, (r, c) in enumerate(zip(ranges, cnts)):
                b = {"key": f"{r.get('from', '*')}-{r.get('to', '*')}",
                     **({"from": float(r["from"])} if "from" in r else {}),
                     **({"to": float(r["to"])} if "to" in r else {}),
                     "doc_count": c}
                if sub:
                    bd = (np.concatenate(members[i]) if members[i]
                          else np.empty(0, np.int64))
                    b.update(execute_aggs(s, bd, sub, text_field))
                buckets.append(b)
            out[name] = {"buckets": buckets}
            continue
        if kind == "cardinality":
            # exact per-segment unique fold (the native aggs/ cardinality
            # carries the HLL++ sketch for the high-cardinality path)
            seen: set = set()
            for v in _iter_seg_values(s, docs, field):
                seen.update(np.unique(v).tolist())
            out[name] = {"value": len(seen)}
            continue
        if kind == "percentiles":
            # PercentilesAggregationBuilder default percents; the exact
            # nearest-rank fold over the (bounded) matched values — the
            # native aggs/ module carries t-digest/HDR for the sketched
            # path. Lucene's TDigest at these sizes is exact too.
            percents = body.get("percents",
                                [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0])
            vals = np.sort(_gather_values(s, docs, field)
                           .astype(np.float64))
            vv: dict = {}
            for p in percents:
                if vals.size == 0:
                    vv[f"{float(p):g}"] = None
                else:
                    i = max(int(np.ceil(p / 100.0 * vals.size)) - 1, 0)
                    vv[f"{float(p):g}"] = float(vals[i])
            out[name] = {"values": vv}
            continue
        if kind == "extended_stats":
            # ExtendedStatsAggregator: count/min/max/sum/avg +
            # sum_of_squares/variance/std_deviation (population)
            cnt2, tot2, sq = 0, 0.0, 0.0
            mn2, mx2 = np.inf, -np.inf
            for v in _iter_seg_values(s, docs, field):
                v = v.astype(np.float64)
                cnt2 += int(v.size)
                tot2 += float(v.sum())
                sq += float((v * v).sum())
                if v.size:
                    mn2 = min(mn2, float(v.min()))
                    mx2 = max(mx2, float(v.max()))
            if cnt2:
                avg = tot2 / cnt2
                var = sq / cnt2 - avg * avg
                out[name] = {"count": cnt2, "min": mn2, "max": mx2,
                             "sum": tot2, "avg": avg,
                             "sum_of_squares": sq, "variance": var,
                             "std_deviation": float(np.sqrt(max(var,
                                                                0.0)))}
            else:
                out[name] = {"count": 0, "min": None, "max": None,
                             "sum": 0.0, "avg": None,
                             "sum_of_squares": 0.0, "variance": None,
                             "std_deviation": None}
            continue
        cnt, tot = 0, 0.0
        mn, mx = np.inf, -np.inf
        for v in _iter_seg_values(s, docs, field):
            v = v.astype(np.float64)
            cnt += int(v.size)
            tot += float(v.sum())
            if v.size:
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
        if kind == "avg":
            out[name] = {"value": tot / cnt if cnt else None}
        elif kind == "sum":
            out[name] = {"value": tot}
        elif kind == "min":
            out[name] = {"value": mn if cnt else None}
        elif kind == "max":
            out[name] = {"value": mx if cnt else None}
        elif kind == "value_count":
            out[name] = {"value": cnt}
        elif kind == "stats":
            out[name] = ({"count": cnt, "min": mn, "max": mx, "sum": tot,
                          "avg": tot / cnt} if cnt else
                         {"count": 0, "min": None, "max": None,
                          "sum": 0.0, "avg": None})
        else:
            raise ValueError(f"unsupported agg type: {kind}")
    return out


_FIXED_UNITS_NS = {"ms": 10**6, "s": 10**9, "m": 60 * 10**9,
                   "h": 3600 * 10**9, "d": 86400 * 10**9}


def _fixed_interval_ns(spec) -> float:
    """'1d' / '30m' / '1h' -> nanoseconds (DateHistogramInterval fixed
    units; calendar intervals live in the native aggs/ path)."""
    import re as _re
    m = _re.fullmatch(r"(\d+)(ms|s|m|h|d)", str(spec))
    if not m:
        raise ValueError(f"unsupported fixed_interval: {spec!r}")
    return float(int(m.group(1)) * _FIXED_UNITS_NS[m.group(2)])


def _extract_named(q, acc: list):
    """Strip ``_name`` markers from a query tree, collecting each named
    clause as a STANDALONE query (MatchedQueriesPhase /
    AbstractQueryBuilder.queryName). Handles both placements the DSL
    allows: clause-level ({"bool": {..., "_name": n}}) and field-level
    ({"term": {"f": {"value": v, "_name": n}}})."""
    if isinstance(q, list):
        return [_extract_named(x, acc) for x in q]
    if not isinstance(q, dict):
        return q
    out = {}
    for kind, spec in q.items():
        if isinstance(spec, dict):
            if "_name" in spec:
                cleaned = {k: _extract_named(v, acc)
                           for k, v in spec.items() if k != "_name"}
                acc.append((spec["_name"], {kind: cleaned}))
                out[kind] = cleaned
                continue
            new_spec = {}
            for f, opts in spec.items():
                if isinstance(opts, dict) and "_name" in opts:
                    cleaned = {k: v for k, v in opts.items()
                               if k != "_name"}
                    acc.append((opts["_name"], {kind: {f: cleaned}}))
                    new_spec[f] = cleaned
                else:
                    new_spec[f] = _extract_named(opts, acc)
            out[kind] = new_spec
        else:
            out[kind] = _extract_named(spec, acc)
    return out


def execute_request(s: Searcher, body: dict, text_field: str = "text",
                    id_col: str = "doc_id",
                    field_aliases: Optional[dict] = None) -> dict:
    """Full request: hits + aggregations (+post_filter). Aggregations run
    over ALL query matches; post_filter then narrows only the HITS — the
    FilteredCollector distinction the post_filter option exists for.

    ``field_aliases`` resolves ``alias``-type field names to their
    concrete paths before execution (FieldAliasMapper.java)."""
    import time as _time
    if field_aliases:
        from ..mapper import resolve_field_aliases
        body = resolve_field_aliases(body, field_aliases)
    _register_derived(s, body)
    prof: dict = {}
    t0 = _time.perf_counter()
    named: list = []
    q = _extract_named(body.get("query", {"match_all": {}}), named)
    if named:
        body = dict(body)
        body["query"] = q
    docs = query_docs(s, q, text_field)
    prof["query_ms"] = (_time.perf_counter() - t0) * 1e3
    t0 = _time.perf_counter()
    aggs = execute_aggs(s, docs, body.get("aggs", {}), text_field)
    prof["aggregations_ms"] = (_time.perf_counter() - t0) * 1e3
    t0 = _time.perf_counter()
    hits_body = dict(body)
    pf = body.get("post_filter")
    if pf is not None:
        inner = {"bool": {"must": [q], "filter": [pf]}}
        hits_body["query"] = inner
    collapse = body.get("collapse")
    rescore = body.get("rescore")
    if collapse is not None or rescore is not None:
        # bounded wide-list options: rescore touches only its window_size
        # (QueryRescorer), collapse over-fetches and widens geometrically
        # until the page has enough DISTINCT groups — heap is O(needed),
        # never O(total matches)
        frm = int(body.get("from", 0))
        size = int(body.get("size", 10))
        need = frm + size
        window = (int(rescore.get("window_size", 10))
                  if rescore is not None else 0)
        k0 = max(need, window)
        if collapse is not None:
            k0 = max(k0, need * 3 + 10)
        wide = dict(hits_body)
        wide["from"] = 0
        # rescore/collapse windows are collector-internal, not a client
        # page — exempt from the max_result_window guard (the reference
        # validates window_size against max_rescore_window separately)
        wide["_internal_window"] = True
        while True:
            wide["size"] = k0
            all_hits = execute_search(s, wide, text_field=text_field,
                                      id_col=id_col)
            n_returned = len(all_hits)
            if rescore is not None:
                all_hits = _apply_rescore(s, all_hits, rescore, text_field,
                                          id_col)
            if collapse is not None:
                # dedupe by the collapse key in rank order (CollapseContext)
                field = collapse["field"]
                keys = _fetch_aligned(s, all_hits[id_col].to_numpy(),
                                      [field])[field]
                all_hits = all_hits.copy()
                all_hits[field] = keys
                all_hits = all_hits.drop_duplicates(subset=[field],
                                                    keep="first")
                if len(all_hits) < need and n_returned >= k0:
                    k0 *= 4  # more groups may exist beyond the window
                    continue
            break
        hits = all_hits.iloc[frm:frm + size].reset_index(drop=True)
    else:
        hits = execute_search(s, hits_body, text_field=text_field,
                              id_col=id_col)

    hl = body.get("highlight")
    if hl is not None and len(hits):
        # unified-highlighter default (SearchModule.java:910-912); tag the
        # positive scoring terms of the query — over the RETURNED PAGE's
        # docs only (HighlightPhase runs in the fetch phase on the page)
        from .features import highlight_unified
        terms = _score_terms(s, q)
        frags = highlight_unified(
            s, " ".join(terms) if terms else "",
            docids=hits[id_col].to_numpy(np.int64),
            number_of_fragments=hl.get("number_of_fragments", 1),
            fragment_char_size=hl.get("fragment_size", 100),
            pre_tag=(hl.get("pre_tags") or ["<em>"])[0],
            post_tag=(hl.get("post_tags") or ["</em>"])[0])
        snip = dict(zip(frags["_docid"], frags["snippet"]))
        hits = hits.copy()
        hits["highlight"] = [snip.get(d) for d in hits[id_col]]

    if named and len(hits):
        # MatchedQueriesPhase: per returned hit, which _name'd clauses it
        # satisfies — each named clause re-evaluated standalone over the
        # page's docs (the reference keeps per-query Weights; page-bounded
        # here)
        ids = hits[id_col].to_numpy()
        mq: list = [[] for _ in range(len(hits))]
        for name, nq in named:
            nd = query_docs(s, nq, text_field)
            for i in np.flatnonzero(np.isin(ids, nd)):
                mq[i].append(name)
        hits = hits.copy()
        hits["matched_queries"] = mq
    prof["fetch_ms"] = (_time.perf_counter() - t0) * 1e3
    out = {"hits": hits, "aggregations": aggs, "total": int(docs.size)}
    sugg = body.get("suggest")
    if sugg:
        out["suggest"] = _apply_suggest(s, sugg)
    if body.get("profile"):
        # the `profile: true` option (search/profile/Profilers.java) —
        # phase-level wall times; per-Lucene-collector detail has no
        # analogue here
        out["profile"] = prof
    return out


def _apply_suggest(s: Searcher, sugg: dict) -> dict:
    """Request-body ``suggest`` section (SearchSourceBuilder.suggest):
    named term / phrase / completion suggesters over this index."""
    from . import features
    out = {}
    for name, spec in sugg.items():
        text = spec.get("text", "")
        if "term" in spec:
            t = spec["term"]
            df = features.term_suggest(
                s, text, max_edits=t.get("max_edits", 2),
                size=t.get("size", 5),
                suggest_mode=t.get("suggest_mode", "always"),
                sort=t.get("sort", "score"))
            out[name] = df.to_dict(orient="records")
        elif "phrase" in spec:
            p = spec["phrase"]
            kw = {}
            # request-body smoothing models (PhraseSuggestionBuilder.
            # smoothingModel: stupid_backoff / laplace /
            # linear_interpolation)
            sm = p.get("smoothing")
            if sm:
                (model, params), = sm.items()
                kw["smoothing"] = model
                if model == "stupid_backoff":
                    kw["discount"] = params.get("discount", 0.4)
                elif model == "laplace":
                    kw["alpha"] = params.get("alpha", 0.5)
                elif model == "linear_interpolation":
                    kw["bigram_lambda"] = params.get("bigram_lambda", 0.7)
                    kw["unigram_lambda"] = params.get("unigram_lambda",
                                                      0.3)
            gen = (p.get("direct_generator") or [{}])[0]
            col = p.get("collate")
            if col is not None:
                # collate: check each suggestion against the index;
                # prune=true annotates (collate_match), default drops
                kw["collate"] = ("prune" if col.get("prune")
                                 else "filter")
            df = features.phrase_suggest(
                s, text, size=p.get("size", 5),
                max_edits=int(gen.get("max_edits", 1)),
                **kw)
            out[name] = df.to_dict(orient="records")
        elif "completion" in spec:
            c = spec["completion"]
            comp = s.complete(spec.get("prefix", text),
                              size=c.get("size", 5))
            out[name] = (comp.to_dict(orient="records")
                         if hasattr(comp, "to_dict") else comp)
        else:
            raise ValueError(f"unknown suggester in {name!r}")
    return out


def _apply_rescore(s: Searcher, hits: pd.DataFrame, rescore: dict,
                   text_field: str, id_col: str) -> pd.DataFrame:
    """QueryRescorer (search/rescore/QueryRescorer.java, score_mode total):
    re-rank the top ``window_size`` hits with
    qw*primary + rw*rescore_query_score; docs outside the window keep their
    original order below the rescored block. The rescore query's score is
    its BM25 text score gated on the query's full match set (so a
    match_phrase rescore only boosts true phrase matches)."""
    spec = rescore["query"]
    window = int(rescore.get("window_size", 10))
    rq = spec["rescore_query"]
    qw = float(spec.get("query_weight", 1.0))
    rw = float(spec.get("rescore_query_weight", 1.0))
    head = hits.iloc[:window].copy()
    head_ids = head[id_col].to_numpy(np.int64)
    # rescore-query scores for the WINDOW docs only (QueryRescorer bounds
    # all work to window_size) — score_docs + a filter-context gate probe
    gate = np.sort(query_docs(s, rq, text_field))
    rterms = _score_terms(s, rq)
    sec = (s.score_docs(head_ids, rterms) if rterms
           else np.zeros(head_ids.size, np.float64))
    pos = np.searchsorted(gate, head_ids)
    in_gate = (pos < gate.size)
    in_gate[in_gate] = gate[pos[in_gate]] == head_ids[in_gate]
    sec = np.where(in_gate, sec, 0.0)
    head["score"] = qw * head["score"].to_numpy() + rw * sec
    head = head.sort_values(["score", id_col], ascending=[False, True],
                            kind="mergesort")
    return pd.concat([head, hits.iloc[window:]], ignore_index=True)


_KNOWN_KINDS = frozenset([
    "match_all", "match_none", "wrapper", "constant_score", "bool",
    "script", "ids", "exists", "terms_set", "intervals", "span_near",
    "span_or", "span_first", "span_not", "match", "match_phrase",
    "match_phrase_prefix", "match_bool_prefix", "term", "terms", "range",
    "prefix", "wildcard", "fuzzy", "regexp"])


def count_request(s: Searcher, body: dict, text_field: str = "text") -> int:
    """`_count` with a request body (rest-api-spec/api/count.json —
    RestCountAction): the query evaluates in filter context, no scoring,
    no fetch; derived fields in the body register first."""
    _register_derived(s, body)
    return int(query_docs(s, body.get("query", {"match_all": {}}),
                          text_field).size)


def validate_query(s: Searcher, q: dict) -> dict:
    """The `_validate/query` API (server/action/admin/indices/validate/
    query/TransportValidateQueryAction.java): parse/rewrite the query
    WITHOUT executing it; returns {"valid": bool, "error": str|None}."""
    try:
        _validate_walk(q)
    except Exception as e:  # noqa: BLE001 — the API reports, never raises
        return {"valid": False, "error": f"{type(e).__name__}: {e}"}
    return {"valid": True, "error": None}


def _validate_walk(q) -> None:
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(f"query must be a single-key dict, got {q!r}")
    (kind, body), = q.items()
    if kind not in _KNOWN_KINDS:
        raise ValueError(f"unknown query type: {kind}")
    if kind == "bool":
        for sec in ("must", "filter", "should", "must_not"):
            for c in _aslist(body.get(sec)):
                _validate_walk(c)
    elif kind == "constant_score":
        _validate_walk(body["filter"])
    elif kind == "wrapper":
        inner = body["query"] if isinstance(body, dict) else body
        _validate_walk(json.loads(base64.b64decode(inner)))
    elif kind in ("match_all", "match_none", "script", "ids", "exists",
                  "span_near", "span_or", "span_first", "span_not"):
        pass  # structural bodies, checked at execution
    else:
        _field_body(body)  # raises on multi-field bodies


_ARROW_CAPS = (("timestamp", "date"), ("string", "keyword"),
               ("large_string", "keyword"), ("bool", "boolean"),
               ("double", "double"), ("float", "float"),
               ("int64", "long"), ("int32", "integer"))


def field_caps(s: Searcher, text_field: str = "text") -> pd.DataFrame:
    """The `_field_caps` API (server/action/fieldcaps/
    TransportFieldCapabilitiesAction.java): per-field type + capabilities.
    Types map from the doc-store Arrow schema; the indexed text field is
    searchable-not-aggregatable, doc-values fields are both."""
    import pyarrow.parquet as pq
    import os
    seg0 = s._seg_dir(int(s._seg_ids[0]))
    schema = pq.read_schema(os.path.join(seg0, "docs.parquet"))
    rows = []
    for f in schema:
        if f.name in ("docid", "dl", "norm"):  # index internals (≈ _norms)
            continue
        t = str(f.type)
        mapped = next((m for a, m in _ARROW_CAPS if t.startswith(a)), t)
        is_text = f.name == text_field
        rows.append({"field": f.name,
                     "type": "text" if is_text else mapped,
                     "searchable": True,
                     "aggregatable": not is_text})
    return pd.DataFrame(rows).sort_values("field").reset_index(drop=True)


def _parse_sort(sort) -> List[tuple]:
    """SearchSourceBuilder.sort items -> [(field, desc)] with the
    reference's per-field order defaults (_score desc, everything else
    asc)."""
    specs = []
    for item in _aslist(sort):
        if isinstance(item, str):
            field, order = item, "asc" if item != "_score" else "desc"
        else:
            (field, spec), = item.items()
            order = (spec.get("order", "desc" if field == "_score" else "asc")
                     if isinstance(spec, dict) else spec)
        specs.append((field, order == "desc"))
    return specs


def _sort_values(s: Searcher, ids: np.ndarray, scores: np.ndarray,
                 field: str, resolve=None) -> np.ndarray:
    """One sort key's values aligned to ids (_score / _doc pseudo-fields,
    stored or derived fields via resolve)."""
    if field == "_score":
        return scores
    if field == "_doc":
        return ids
    if resolve is not None:
        return resolve(field, ids)
    return _fetch_aligned(s, ids, [field])[field]


def _apply_sort(s: Searcher, ids: np.ndarray, scores: np.ndarray, sort,
                resolve=None):
    """SearchSourceBuilder.sort: list of field names / {field: {order}} /
    "_score"; ties broken by docid asc (the implicit _doc tiebreak)."""
    keys = [(_sort_values(s, ids, scores, field, resolve), desc)
            for field, desc in _parse_sort(sort)]
    # np.lexsort: last key is primary; docid asc as final tiebreak
    cols = [ids]
    for vals, desc in reversed(keys):
        v = np.asarray(vals)
        if desc:
            if v.dtype.kind in "iufM":
                # negate through float64 with explicit null handling
                # (sort_phase._sort_key discipline): in-place integer
                # negation wraps unsigned doc values, overflows int64 min,
                # and explodes on NaT (INT64_MIN)
                if v.dtype.kind == "M":
                    null = np.isnat(v)
                    f = v.astype("datetime64[ns]").astype(np.int64) \
                        .astype(np.float64)
                else:
                    f = v.astype(np.float64)
                    null = np.isnan(f)
                f = -f
                f[null] = np.inf  # missing sorts last (_last default)
                v = f
            else:  # lexicographic desc over objects: rank trick
                _, inv = np.unique(v, return_inverse=True)
                v = -inv
        cols.append(v)
    order = np.lexsort(cols)
    return ids[order], scores[order]


def _after_key_masks(vals, desc: bool, cursor_val):
    """(strictly-after, tied) masks of one sort key against the cursor
    value. Missing values sort LAST in both orders (the reference's
    ``missing: _last`` default), so a missing row ranks after any concrete
    cursor value, and a missing cursor value ties only with missing rows.

    Reference: search/searchafter/SearchAfterBuilder.java — the collector
    resumes strictly past the cursor's sort tuple."""
    v = np.asarray(vals)
    if v.dtype.kind == "M":
        null = np.isnat(v)
        if cursor_val is None or (isinstance(cursor_val, float)
                                  and np.isnan(cursor_val)):
            # missing cursor key (the engine emits these when a page ends
            # on a null sort value): nothing sorts after; missing rows tie
            return np.zeros(v.size, bool), null
        f = v.astype("datetime64[ns]").astype(np.int64).astype(np.float64)
        c = np.datetime64(cursor_val)
        cf = float(np.datetime64(c, "ns").astype(np.int64))
    elif v.dtype.kind in "iuf":
        f = v.astype(np.float64)
        null = np.isnan(f)
        if cursor_val is None or (isinstance(cursor_val, float)
                                  and np.isnan(cursor_val)):
            return np.zeros(v.size, bool), null
        cf = float(cursor_val)
    else:
        null = pd.isna(v)
        if cursor_val is None:
            # missing cursor key: nothing sorts after it; only missing ties
            return np.zeros(v.size, bool), null
        vv = np.where(null, cursor_val, v)
        gt = (vv < cursor_val) if desc else (vv > cursor_val)
        return (gt & ~null) | null, (vv == cursor_val) & ~null
    if desc:
        f, cf = -f, -cf
    f[null] = np.inf
    return f > cf, f == cf


def _search_after_mask(s: Searcher, ids: np.ndarray, scores: np.ndarray,
                       specs: List[tuple], resolve, cursor) -> np.ndarray:
    """Row mask for hits whose sort tuple is STRICTLY after the cursor
    (lexicographic over the request's sort keys). Rows tying the cursor on
    every key are excluded — same duplicate/skip semantics as the
    reference, which is why real requests end the sort with a unique
    tiebreak field."""
    cursor = list(cursor)
    if len(cursor) != len(specs):
        raise ValueError(
            f"search_after has {len(cursor)} values but sort has "
            f"{len(specs)} keys")
    gt = np.zeros(ids.size, bool)
    eq = np.ones(ids.size, bool)
    for (field, desc), c in zip(specs, cursor):
        vals = _sort_values(s, ids, scores, field, resolve)
        g, e = _after_key_masks(vals, desc, c)
        gt |= eq & g
        eq &= e
    return gt
