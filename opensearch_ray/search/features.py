"""Search-phase features beyond core top-k.

Reference mapping:
- rescore        — search/rescore/QueryRescorer.java (second query over the
                   top-``window_size`` hits)
- collapse       — search/collapse/CollapseBuilder.java (best hit per field)
- highlight      — search/fetch/subphase/highlight (``plain`` highlighter:
                   first matching fragment with the match marked)
- term suggester — search/suggest/term (edit-distance candidates from the
                   term dictionary, ordered by frequency)
- search_after   — search/searchafter/SearchAfterBuilder.java (cursor
                   pagination over a total sort order)
- function_score — index/query/functionscore (field_value_factor, gauss/exp/
                   linear decay, weight)
- terms lookup   — index/query/TermsQueryBuilder.java (fetch a term list,
                   broadcast semi-join filter)

All driver-side features operate on a Searcher (they post-process small
top-k/fetch results); set-returning ones compose with the bool/doc-set
primitives.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .searcher import Searcher, SearchHit


#: QueryRescoreMode combinators (search/rescore/QueryRescorerBuilder —
#: the `score_mode` option): both inputs arrive already weighted
_RESCORE_MODES: Dict[str, Callable[[float, float], float]] = {
    "total": lambda p, s: p + s,
    "multiply": lambda p, s: p * s,
    "avg": lambda p, s: (p + s) / 2.0,
    "max": max,
    "min": min,
}


def rescore(searcher: Searcher, query_text: str, window_size: int, k: int,
            rescore_fn: Callable[[pa.Table], np.ndarray],
            query_weight: float = 1.0, rescore_query_weight: float = 1.0,
            score_mode: str = "total") -> List[SearchHit]:
    """Re-rank the top-``window_size`` BM25 hits with a secondary score
    computed from their fetched rows: final = combine(qw*bm25,
    rqw*secondary) under ``score_mode`` (total/multiply/avg/max/min —
    QueryRescoreMode; weighted scores enter the combinator, the
    reference's order of operations)."""
    comb = _RESCORE_MODES[score_mode]
    hits = searcher.search(query_text, k=window_size)
    if not hits:
        return []
    ids = [h.docid for h in hits]
    fetched = searcher.fetch(ids)
    sec = rescore_fn(fetched)
    sec_by_id = dict(zip(fetched.column("_docid").to_pylist(), sec))
    rescored = [
        (h.docid, comb(query_weight * h.score,
                       rescore_query_weight * float(sec_by_id[h.docid])))
        for h in hits
    ]
    rescored.sort(key=lambda t: (-t[1], t[0]))
    return [SearchHit(d, s) for d, s in rescored[:k]]


def collapse_search(searcher: Searcher, query_text: str, collapse_field: str,
                    k: int = 10, candidate_window: int = 1000) -> pd.DataFrame:
    """Top-k hits keeping only the best-scoring doc per ``collapse_field``
    value (tie: lowest docid)."""
    hits = searcher.search(query_text, k=candidate_window)
    if not hits:
        return pd.DataFrame({collapse_field: [], "_docid": [], "score": []})
    fetched = searcher.fetch([h.docid for h in hits]).to_pandas()
    score = {h.docid: h.score for h in hits}
    fetched["score"] = fetched["_docid"].map(score)
    fetched = fetched.sort_values(["score", "_docid"], ascending=[False, True],
                                  kind="mergesort")
    best = fetched.drop_duplicates(subset=[collapse_field], keep="first")
    return best.head(k)[[collapse_field, "_docid", "score"]].reset_index(drop=True)


def collapse_inner_hits(searcher: Searcher, query_text: str,
                        collapse_field: str, k: int = 10,
                        inner_size: int = 3,
                        operator: str = "or") -> pd.DataFrame:
    """collapse + inner_hits (CollapseBuilder.setInnerHits;
    search/fetch/subphase/InnerHitsPhase.java; conformance
    rest-api-spec/test/search/110_field_collapsing.yml asserts
    hits.hits.0.inner_hits): the top-``k`` collapse GROUPS ordered by their
    best hit (score desc, docid asc), each expanded to its top
    ``inner_size`` members by the same order.

    Exploded layout — (collapse key, _docid, score, _inner_rank), one row
    per inner hit; rank 1 is the group's representative hit. Bounded: doc
    set + score_docs numpy arrays, never per-doc Python."""
    from .sort_phase import gather_doc_values

    terms = list(dict.fromkeys(searcher.analyzer.tokens(query_text)))
    empty = pd.DataFrame({collapse_field: [], "_docid": [], "score": [],
                          "_inner_rank": []})
    if not terms:
        return empty
    docs = np.sort(searcher.bool_docs(must=terms) if operator == "and"
                   else searcher.bool_docs(should=terms))
    if docs.size == 0:
        return empty
    scores = searcher.score_docs(docs, searcher.analyzer.tokens(query_text))
    keys = gather_doc_values(searcher, docs, collapse_field)
    order = np.lexsort((docs, -scores))
    docs, scores, keys = docs[order], scores[order], keys[order]
    df = pd.DataFrame({collapse_field: keys, "_docid": docs,
                       "score": scores})
    # rank-order grouping: first occurrence of a key = the group's best hit
    df["_inner_rank"] = df.groupby(collapse_field, sort=False).cumcount() + 1
    top_keys = df.drop_duplicates(subset=[collapse_field],
                                  keep="first").head(k)[collapse_field]
    df = df[df[collapse_field].isin(set(top_keys))
            & (df["_inner_rank"] <= inner_size)]
    return df.reset_index(drop=True)


def highlight(searcher: Searcher, query_text: str, k: int = 10,
              fragment_size: int = 60, pre_tag: str = "<em>",
              post_tag: str = "</em>") -> pd.DataFrame:
    """Plain-highlighter: for each top-k hit, the fragment around the FIRST
    query-term occurrence with the match wrapped in tags."""
    terms = searcher.analyzer.tokens(query_text)
    hits = searcher.search(query_text, k=k)
    if not hits:
        return pd.DataFrame({"_docid": [], "snippet": []})
    fetched = searcher.fetch([h.docid for h in hits])
    text_col = searcher.manifest.text_col
    out_ids, out_snips = [], []
    for r in fetched.to_pylist():
        text = r[text_col] or ""
        low = text.lower()
        first_pos, first_term = None, None
        for t in terms:
            p = low.find(t)
            # token-boundary check: previous/next char must not be a word char
            while p >= 0:
                pre_ok = p == 0 or not (low[p - 1].isalnum() or low[p - 1] == "_")
                post = p + len(t)
                post_ok = post >= len(low) or not (low[post].isalnum() or low[post] == "_")
                if pre_ok and post_ok:
                    break
                p = low.find(t, p + 1)
            if p >= 0 and (first_pos is None or p < first_pos):
                first_pos, first_term = p, t
        if first_pos is None:
            out_ids.append(r["_docid"])
            out_snips.append(text[:fragment_size])
            continue
        end = first_pos + len(first_term)
        lo = max(0, first_pos - (fragment_size - len(first_term)) // 2)
        hi = min(len(text), lo + fragment_size)
        snippet = (text[lo:first_pos] + pre_tag + text[first_pos:end]
                   + post_tag + text[end:hi])
        out_ids.append(r["_docid"])
        out_snips.append(snippet)
    order = {h.docid: i for i, h in enumerate(hits)}
    df = pd.DataFrame({"_docid": out_ids, "snippet": out_snips})
    return df.sort_values("_docid", key=lambda s: s.map(order)).reset_index(drop=True)


def highlight_unified(searcher: Searcher, query_text: str, k: int = 10,
                      number_of_fragments: int = 1,
                      fragment_char_size: int = 100,
                      pre_tag: str = "<em>", post_tag: str = "</em>",
                      docids=None) -> pd.DataFrame:
    """Unified-highlighter semantics (the reference default —
    SearchModule.java:910-912, search/fetch/subphase/highlight/
    UnifiedHighlighter): break the stored text into passages, score each
    passage, return the top ``number_of_fragments`` passages re-ordered by
    text position with EVERY query-term occurrence tagged.

    Passages: sentence-bounded (split at .!? like the BreakIterator
    default), falling back to ~fragment_char_size word-boundary windows for
    unpunctuated text. Passage score = Σ over unique matched terms of
    idf(term) * (1 + ln(1 + tf_in_passage)) — the PassageScorer shape
    (idf-weighted, tf-dampened) without its proximity pivot.

    ``docids``: highlight exactly these docs (the fetch-phase shape — the
    caller already has its page) instead of re-running the search."""
    import re as _re

    terms = list(dict.fromkeys(searcher.analyzer.tokens(query_text)))
    if docids is not None:
        hits = [SearchHit(int(d), 0.0) for d in docids]
    else:
        hits = searcher.search(query_text, k=k)
    if not hits or not terms:
        return pd.DataFrame({"_docid": [], "snippet": []})
    stats = searcher.term_stats(terms)
    N = max(searcher.N, 1)
    idf = {t: float(np.log(1 + (N - stats[t][0] + 0.5) / (stats[t][0] + 0.5)))
           for t in terms}
    term_rx = _re.compile(
        r"\b(" + "|".join(_re.escape(t) for t in
                          sorted(terms, key=len, reverse=True)) + r")\b",
        _re.IGNORECASE)
    fetched = searcher.fetch([h.docid for h in hits])
    text_col = searcher.manifest.text_col
    out_ids, out_snips = [], []
    for r in fetched.to_pylist():
        text = r[text_col] or ""
        # sentence passages, else fixed word-boundary windows
        bounds = [m.end() for m in _re.finditer(r"[.!?]+\s*", text)]
        if bounds and (bounds[-1] >= len(text) * 0.5 or len(bounds) > 1):
            starts = [0] + bounds
            passages = [(s, e) for s, e in zip(starts, starts[1:] + [len(text)])
                        if e > s]
        else:
            passages = []
            pos = 0
            while pos < len(text):
                end = min(len(text), pos + fragment_char_size)
                if end < len(text):
                    sp = text.rfind(" ", pos, end)
                    if sp > pos:
                        end = sp
                passages.append((pos, end))
                pos = end + 1
        scored = []
        for pi, (s, e) in enumerate(passages):
            tf: Dict[str, int] = {}
            for m in term_rx.finditer(text, s, e):
                key = m.group(0).lower()
                tf[key] = tf.get(key, 0) + 1
            if not tf:
                continue
            sc = sum(idf.get(t, 0.0) * (1.0 + np.log1p(c))
                     for t, c in tf.items())
            scored.append((sc, pi, s, e))
        scored.sort(key=lambda x: (-x[0], x[1]))
        chosen = sorted(scored[:number_of_fragments], key=lambda x: x[1])
        snips = []
        for _, _, s, e in chosen:
            frag = text[s:e]
            snips.append(term_rx.sub(
                lambda m: pre_tag + m.group(0) + post_tag, frag).strip())
        out_ids.append(r["_docid"])
        out_snips.append(" ... ".join(snips) if snips
                         else text[:fragment_char_size])
    order = {h.docid: i for i, h in enumerate(hits)}
    df = pd.DataFrame({"_docid": out_ids, "snippet": out_snips})
    return df.sort_values("_docid", key=lambda s: s.map(order)).reset_index(drop=True)


def highlight_fvh(searcher: Searcher, query_text: str, k: int = 10,
                  number_of_fragments: int = 1,
                  fragment_char_size: int = 100,
                  phrase: bool = False,
                  matched_fields: Optional[List[str]] = None,
                  pre_tag: str = "<em>", post_tag: str = "</em>"
                  ) -> pd.DataFrame:
    """fvh (fast-vector) highlighter semantics
    (search/fetch/subphase/highlight/FastVectorHighlighter.java wrapping
    Lucene's FieldPhraseList/FieldFragList):

    - fragments are built AROUND match clusters (term-vector offsets), not
      sentence passages: each fragment is a ±window centered on a run of
      nearby matches, ranked by Σ idf over the matches it covers
    - ``phrase=True``: only positions where the FULL phrase occurs match —
      the whole phrase span is tagged as one unit (FieldPhraseList's
      WeightedPhraseInfo), stray single-term occurrences are ignored
    - ``matched_fields``: extra analyzer names whose token streams over the
      SAME stored text contribute additional match terms (the
      matched_fields option: combine e.g. exact + stemmed subfields into
      one highlight)."""
    import re as _re

    terms = list(dict.fromkeys(searcher.analyzer.tokens(query_text)))
    hits = searcher.search(query_text, k=k)
    if not hits or not terms:
        return pd.DataFrame({"_docid": [], "snippet": []})
    match_terms = set(terms)
    if matched_fields:
        from ..analysis.analyzer import get_analyzer
        for name in matched_fields:
            match_terms.update(get_analyzer(name).tokens(query_text))
    stats = searcher.term_stats(sorted(match_terms))
    N = max(searcher.N, 1)
    idf = {t: float(np.log(1 + (N - stats[t][0] + 0.5) / (stats[t][0] + 0.5)))
           for t in match_terms}

    if phrase:
        pat = r"\b" + r"\W+".join(_re.escape(t) for t in terms) + r"\b"
    else:
        pat = r"\b(?:" + "|".join(
            _re.escape(t) for t in
            sorted(match_terms, key=len, reverse=True)) + r")\b"
    rx = _re.compile(pat, _re.IGNORECASE)

    fetched = searcher.fetch([h.docid for h in hits])
    text_col = searcher.manifest.text_col
    out_ids, out_snips = [], []
    for r in fetched.to_pylist():
        text = r[text_col] or ""
        matches = [(m.start(), m.end(), m.group(0)) for m in
                   rx.finditer(text)]
        if not matches:
            out_ids.append(r["_docid"])
            out_snips.append(text[:fragment_char_size])
            continue
        # cluster matches whose gap fits one fragment window
        clusters: List[List[tuple]] = [[matches[0]]]
        for m in matches[1:]:
            if m[0] - clusters[-1][0][0] < fragment_char_size:
                clusters[-1].append(m)
            else:
                clusters.append([m])

        def cluster_score(cl) -> float:
            if phrase:  # whole-phrase weight = Σ idf of its terms per occ
                return len(cl) * sum(idf.get(t, 0.0) for t in terms)
            return sum(idf.get(m[2].lower(), 0.0) for m in cl)

        ranked = sorted(enumerate(clusters),
                        key=lambda ic: (-cluster_score(ic[1]), ic[0]))
        chosen = sorted(ranked[:number_of_fragments], key=lambda ic: ic[0])
        snips = []
        for _, cl in chosen:
            s0, e0 = cl[0][0], cl[-1][1]
            pad = max(0, (fragment_char_size - (e0 - s0)) // 2)
            lo = max(0, s0 - pad)
            hi = min(len(text), e0 + pad)
            frag = text[lo:hi]
            snips.append(rx.sub(
                lambda m: pre_tag + m.group(0) + post_tag, frag).strip())
        out_ids.append(r["_docid"])
        out_snips.append(" ... ".join(snips))
    order = {h.docid: i for i, h in enumerate(hits)}
    df = pd.DataFrame({"_docid": out_ids, "snippet": out_snips})
    return df.sort_values("_docid",
                          key=lambda s: s.map(order)).reset_index(drop=True)


def _levenshtein(a: str, b: str, maxd: int = 2,
                 transpositions: bool = False) -> int:
    """Bounded edit distance (classic DP with early exit).
    ``transpositions=True`` adds adjacent-swap as ONE edit — the optimal
    string alignment distance Lucene's FuzzyQuery defaults to
    (LevenshteinAutomata withTranspositions; FuzzyQuery.defaultTranspositions
    = true): "ab"→"ba" costs 1, not 2."""
    if abs(len(a) - len(b)) > maxd:
        return maxd + 1
    prev2 = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if (transpositions and i > 1 and j > 1
                    and ca == b[j - 2] and a[i - 2] == cb):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
            best = min(best, cur[j])
        if best > maxd:
            return maxd + 1
        prev2, prev = prev, cur
    return prev[-1]


def term_suggest(searcher: Searcher, text: str, max_edits: int = 2,
                 size: int = 5, suggest_mode: str = "always",
                 sort: str = "score") -> pd.DataFrame:
    """Term suggester: vocabulary terms within ``max_edits`` of each input
    token — ref search/suggest/term/TermSuggester + SuggestMode:

    - ``always``: suggest for every input token
    - ``missing``: only for tokens absent from the index (df == 0)
    - ``popular``: only suggestions with df GREATER than the input token's

    ``sort`` (TermSuggestionBuilder.SortBy): ``score`` orders by
    (distance asc, df desc, term asc) — similarity first; ``frequency``
    orders by (df desc, distance asc, term asc)."""
    if suggest_mode not in ("always", "missing", "popular"):
        raise ValueError(f"unknown suggest_mode: {suggest_mode}")
    if sort not in ("score", "frequency"):
        raise ValueError(f"unknown sort: {sort}")
    rows = []
    for tok in searcher.analyzer.tokens(text):
        # exact-df pinpoint read ([tok, tok+"\x00") prunes to one term)
        v0 = searcher._vocab_range(tok, tok + "\x00")
        tok_df = int(v0.column("df")[0].as_py()) if v0.num_rows else 0
        if suggest_mode == "missing" and tok_df > 0:
            continue
        ctbl = searcher.fuzzy_candidates(tok, max_edits)  # streamed band
        cands = []
        for term, df, d in zip(ctbl.column("term").to_pylist(),
                               ctbl.column("df").to_pylist(),
                               ctbl.column("distance").to_pylist()):
            if term == tok:
                continue
            if suggest_mode == "popular" and df <= tok_df:
                continue
            cands.append((int(d), -int(df), term))
        if sort == "frequency":
            cands.sort(key=lambda c: (c[1], c[0], c[2]))
        else:
            cands.sort()
        for rank, (d, negdf, term) in enumerate(cands[:size], 1):
            rows.append({"input": tok, "suggestion": term, "distance": d,
                         "df": -negdf, "rank": rank})
    return pd.DataFrame(rows, columns=["input", "suggestion", "distance",
                                       "df", "rank"])


def termvectors(searcher: Searcher, docid: int, field: Optional[str] = None,
                term_statistics: bool = False) -> pd.DataFrame:
    """``_termvectors`` API (action/termvectors/TermVectorsService.java):
    the per-doc term vector, re-analyzed ON THE FLY from the stored source
    — the reference's path when vectors aren't stored at index time.
    One row per distinct term: (term, term_freq, positions) with
    positions comma-joined analyzer increments (stopword gaps preserved);
    ``term_statistics=True`` adds global df via pinpoint terms-dict reads
    (the bounded TermVectorsFilter lookups, never a dict scan)."""
    field = field or searcher.manifest.text_col
    tbl = searcher.fetch([int(docid)], columns=[field])
    text = tbl.column(field)[0].as_py() if tbl.num_rows else ""
    toks, pos = searcher.analyzer.analyze(text or "")
    acc: dict = {}
    for t, p in zip(toks, pos):
        acc.setdefault(t, []).append(p)
    rows = [{"term": t, "term_freq": len(ps),
             "positions": ",".join(str(p) for p in sorted(ps))}
            for t, ps in sorted(acc.items())]
    out = pd.DataFrame(rows, columns=["term", "term_freq", "positions"])
    if term_statistics:
        dfs = []
        for t in out["term"]:
            v = searcher._vocab_range(t, t + "\x00")
            dfs.append(int(v.column("df")[0].as_py()) if v.num_rows else 0)
        out["doc_freq"] = dfs
    return out


def mtermvectors(searcher: Searcher, docids, field: Optional[str] = None,
                 term_statistics: bool = False) -> pd.DataFrame:
    """``_mtermvectors`` API (rest-api-spec/api/mtermvectors.json): the
    batched variant of :func:`termvectors` — ONE stored-source fetch for
    the whole docid list, then per-doc re-analysis; term_statistics df
    lookups are deduplicated across docs (each distinct term hits the
    terms dict once). -> one row per (docid, term), docid-major order."""
    field = field or searcher.manifest.text_col
    ids = [int(d) for d in docids]
    tbl = searcher.fetch(ids, columns=[field])
    texts = dict(zip(tbl.column("_docid").to_pylist(),
                     tbl.column(field).to_pylist()))
    frames = []
    for d in ids:
        toks, pos = searcher.analyzer.analyze(texts.get(d) or "")
        acc: dict = {}
        for t, p in zip(toks, pos):
            acc.setdefault(t, []).append(p)
        frames.append(pd.DataFrame(
            [{"docid": d, "term": t, "term_freq": len(ps),
              "positions": ",".join(str(p) for p in sorted(ps))}
             for t, ps in sorted(acc.items())],
            columns=["docid", "term", "term_freq", "positions"]))
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["docid", "term", "term_freq", "positions"])
    if term_statistics and len(out):
        dfs: dict = {}
        for t in pd.unique(out["term"]):
            v = searcher._vocab_range(t, t + "\x00")
            dfs[t] = int(v.column("df")[0].as_py()) if v.num_rows else 0
        out["doc_freq"] = out["term"].map(dfs).astype(np.int64)
    elif term_statistics:
        out["doc_freq"] = pd.Series([], dtype=np.int64)
    return out


def search_after_page(searcher: Searcher, query_text: str, page_size: int,
                      after: Optional[Tuple[float, int]] = None) -> List[SearchHit]:
    """Cursor pagination over (score desc, docid asc): return the next page
    strictly after the (score, docid) cursor. The cursor is pushed into the
    collector (search(after=...)), so the heap stays O(page_size) at any
    depth — no oversampling rescan."""
    return searcher.search(query_text, k=page_size, after=after)


# ------------------------------------------------------------ function_score

def decay_gauss(value: np.ndarray, origin: float, scale: float,
                offset: float = 0.0, decay: float = 0.5) -> np.ndarray:
    """gauss decay (ref functionscore/GaussDecayFunction): exp(-d²/2σ²) with
    σ² = -scale²/(2 ln decay), d = max(0, |v-origin|-offset)."""
    sigma2 = -(scale ** 2) / (2.0 * math.log(decay))
    d = np.maximum(0.0, np.abs(value - origin) - offset)
    return np.exp(-(d ** 2) / (2.0 * sigma2))


def decay_exp(value: np.ndarray, origin: float, scale: float,
              offset: float = 0.0, decay: float = 0.5) -> np.ndarray:
    lam = math.log(decay) / scale
    d = np.maximum(0.0, np.abs(value - origin) - offset)
    return np.exp(lam * d)


def decay_linear(value: np.ndarray, origin: float, scale: float,
                 offset: float = 0.0, decay: float = 0.5) -> np.ndarray:
    s = scale / (1.0 - decay)
    d = np.maximum(0.0, np.abs(value - origin) - offset)
    return np.maximum(0.0, (s - d) / s)


def function_score_topk(ds, value_fn: Callable[[pa.Table], np.ndarray],
                        id_col: str, k: int = 10) -> pd.DataFrame:
    """field_value_factor-style scoring over a Dataset: per-batch vectorized
    score + per-batch top-k partials, merged on the driver."""
    def partial(t: pa.Table) -> pa.Table:
        sc = np.asarray(value_fn(t), dtype=np.float64)
        kk = min(k, len(sc))
        if kk == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        # the partial must honor the global (score desc, id asc) tie-break:
        # a score-only argpartition could drop the smaller-id row of a tie at
        # the k-th boundary, so order the batch lexicographically first
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -sc))[:kk]
        return pa.table({id_col: t.column(id_col).take(pa.array(top)),
                         "score": pa.array(sc[top])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["score", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


_KNUTH_A = np.uint64(2654435761)   # Knuth TAOCP vol.3 §6.4 (2^32/phi)
_KNUTH_MOD = np.uint64(1) << np.uint64(32)


def random_score_values(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """`random_score` function values (RandomScoreFunctionBuilder with a
    seed + field=doc id — deterministic per (seed, doc), uniform [0,1)):
    Knuth multiplicative hash, the repo's SQL-reproducible recipe
    ((id + seed) * 2654435761 mod 2^32 / 2^32)."""
    h = (ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH_A % _KNUTH_MOD
    return h.astype(np.float64) / float(_KNUTH_MOD)


#: FunctionScoreQuery combine modes — `boost_mode` joins the query score
#: with the function score; `score_mode` folds multiple function values
#: (functionscore/FunctionScoreQuery.ScoreMode + CombineFunction)
_BOOST_MODES: Dict[str, Callable[[np.ndarray, np.ndarray], np.ndarray]] = {
    "multiply": lambda q, f: q * f,
    "replace": lambda q, f: f,
    "sum": lambda q, f: q + f,
    "avg": lambda q, f: (q + f) / 2.0,
    "max": np.maximum,
    "min": np.minimum,
}


def function_score_search(searcher: Searcher, query_text: str,
                          functions: List[Callable[[pa.Table], np.ndarray]],
                          k: int = 10, window: int = 1000,
                          boost_mode: str = "multiply",
                          score_mode: str = "multiply",
                          weights: Optional[List[float]] = None
                          ) -> pd.DataFrame:
    """function_score over QUERY hits (FunctionScoreQueryBuilder): each
    function maps the fetched candidate rows (columns incl. `_docid`) to
    per-doc values; function values fold under ``score_mode``
    (multiply/sum/avg/first/max/min, weighted), then join the BM25 score
    under ``boost_mode`` (multiply/replace/sum/avg/max/min). Top-k,
    (score desc, docid asc). Use :func:`random_score_values` inside a
    function for the seeded random_score shape."""
    hits = searcher.search(query_text, k=window)
    if not hits:
        return pd.DataFrame({"doc_id": [], "score": []})
    ids = np.array([h.docid for h in hits], np.int64)
    qsc = np.array([h.score for h in hits], np.float64)
    fetched = searcher.fetch(list(ids))
    # align fetch output to hit order
    pos = {d: i for i, d in enumerate(fetched.column("_docid").to_pylist())}
    perm = np.array([pos[int(d)] for d in ids], np.int64)
    w = np.asarray(weights if weights is not None
                   else [1.0] * len(functions), np.float64)
    vals = np.stack([np.asarray(fn(fetched), np.float64)[perm] * w[i]
                     for i, fn in enumerate(functions)], axis=1)
    if score_mode == "multiply":
        f = vals.prod(axis=1)
    elif score_mode == "sum":
        f = vals.sum(axis=1)
    elif score_mode == "avg":
        f = (vals.sum(axis=1) / w.sum())
    elif score_mode == "first":
        f = vals[:, 0]
    elif score_mode == "max":
        f = vals.max(axis=1)
    elif score_mode == "min":
        f = vals.min(axis=1)
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    sc = _BOOST_MODES[boost_mode](qsc, f)
    top = np.lexsort((ids, -sc))[:k]
    out = pd.DataFrame({"doc_id": ids[top], "score": sc[top]})
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def more_like_this(searcher: Searcher, docid: int, k: int = 10,
                  max_query_terms: int = 25, min_term_freq: int = 1,
                  min_doc_freq: int = 2) -> List[SearchHit]:
    """more_like_this: select the doc's most distinctive terms by tf-idf
    (ref index/query/MoreLikeThisQueryBuilder defaults: max_query_terms=25,
    min_term_freq/min_doc_freq thresholds), OR-query them, exclude the
    source doc itself."""
    import numpy as np

    from .bm25 import bm25_idf

    row = searcher.fetch([docid]).to_pylist()
    if not row:
        return []
    text = row[0][searcher.manifest.text_col] or ""
    toks = searcher.analyzer.tokens(text)
    if not toks:
        return []
    from collections import Counter
    tf = Counter(toks)
    stats = searcher.term_stats(list(tf))
    scored_terms = []
    for t, f in tf.items():
        df = stats[t][0]
        if f < min_term_freq or df < min_doc_freq:
            continue
        scored_terms.append((float(f) * float(bm25_idf(df, searcher.N)), t))
    scored_terms.sort(key=lambda x: (-x[0], x[1]))
    query_terms = [t for _, t in scored_terms[:max_query_terms]]
    if not query_terms:
        return []
    hits = searcher.search(" ".join(query_terms), k=k + 1)
    return [h for h in hits if h.docid != docid][:k]


# ---------------------------------------------------- phrase suggester

def bigram_model(searcher: Searcher) -> dict:
    """Corpus bigram counts over analyzed (stop-filtered) token sequences —
    the word language model behind the phrase suggester (ref
    search/suggest/phrase/PhraseSuggester.java:60-150; Lucene WordScorer
    reads these from the index's shingle field, we run ONE distributed count
    pass over the doc store). Cached on the searcher. At larger corpora the
    counts stay a parquet artifact with per-w1 pruning; the model a suggester
    needs is vocab-bounded either way."""
    if hasattr(searcher, "_bigram_counts"):
        return searcher._bigram_counts
    import os

    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum

    text_col = searcher.manifest.text_col
    files = [os.path.join(searcher.manifest.index_dir, "segments",
                          f"seg-{s.seg_id:05d}", "docs.parquet")
             for s in searcher.manifest.segments]
    an = searcher.analyzer

    def grams(t: pa.Table) -> pa.Table:
        w1, w2 = [], []
        for s in t.column(text_col).to_pylist():
            toks = an.tokens(s or "")
            w1.extend(toks[:-1])
            w2.extend(toks[1:])
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "n": pa.array(np.ones(len(w1), np.int64))})

    counts = (ray.data.read_parquet(files, columns=[text_col])
              .map_batches(grams, batch_format="pyarrow")
              .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    model = {(a, b): int(n) for a, b, n in
             zip(counts["w1"], counts["w2"], counts["n"])}
    searcher._bigram_counts = model
    return model


def phrase_suggest(searcher: Searcher, text: str, size: int = 5,
                   max_edits: int = 1, candidates_per_term: int = 5,
                   discount: float = 0.4,
                   smoothing: str = "stupid_backoff",
                   alpha: float = 0.5,
                   bigram_lambda: float = 0.7,
                   unigram_lambda: float = 0.3,
                   collate: Optional[str] = None) -> pd.DataFrame:
    """Did-you-mean whole phrases: per-token candidates from the term
    dictionary (edit distance <= max_edits, ordered (distance, df desc, term),
    capped — DirectCandidateGenerator shape), every candidate phrase scored
    with a bigram language model under one of the reference's three
    smoothing models (search/suggest/phrase/WordScorer.java and its
    StupidBackoffScorer / LaplaceScorer / LinearInterpolatingScorer):

      stupid_backoff (default, discount=0.4):
        S(b|a) = count(a,b)/ttf(a) if seen, else discount * ttf(b)/T
      laplace (alpha=0.5):
        S(b|a) = (alpha + count(a,b)) / (ttf(a) + alpha * V)
      linear_interpolation (lambdas normalized to sum 1):
        S(b|a) = bigram_lambda * count(a,b)/(0.5 + ttf(a))
                 + unigram_lambda * (1 + ttf(b))/(T + V)
        (count==0 -> unigram term only — LinearInterpolatingScorer:97)

    T = total analyzed tokens (manifest.sum_dl); V = distinct terms
    (stats-shard row count — includes the few salted duplicates, the
    same upper-bound convention the stats reader documents). Returns
    (phrase, score, rank), (score desc, phrase asc)."""
    import itertools
    import math

    toks = searcher.analyzer.tokens(text)
    if not toks:
        return pd.DataFrame({"phrase": [], "score": [], "rank": []})
    cand_of: List[List[str]] = []
    for tok in toks:
        ctbl = searcher.fuzzy_candidates(tok, max_edits)  # streamed band
        cands = sorted(
            (int(d), -int(df), term)
            for term, df, d in zip(ctbl.column("term").to_pylist(),
                                   ctbl.column("df").to_pylist(),
                                   ctbl.column("distance").to_pylist()))
        cand_of.append([t for _, _, t in cands[:candidates_per_term]]
                       or [tok])
    if smoothing not in ("stupid_backoff", "laplace",
                         "linear_interpolation"):
        raise ValueError(f"unknown smoothing model {smoothing!r}")
    model = bigram_model(searcher)
    stats = searcher.term_stats([t for cl in cand_of for t in cl])
    T = float(searcher.manifest.sum_dl) or 1.0
    V = 0.0
    if smoothing != "stupid_backoff":
        import pyarrow.parquet as _pq
        import glob as _glob
        V = float(sum(
            _pq.ParquetFile(f).metadata.num_rows for f in _glob.glob(
                os.path.join(searcher.manifest.index_dir, "term_stats",
                             "*.parquet")))) or 1.0
        lam = bigram_lambda + unigram_lambda
        bl, ul = bigram_lambda / lam, unigram_lambda / lam
    rows = []
    for phrase in itertools.product(*cand_of):
        ttf1 = stats.get(phrase[0], (0, 0))[1]
        if ttf1 == 0:
            continue
        p = ttf1 / T
        ok = True
        for a, b in zip(phrase[:-1], phrase[1:]):
            big = model.get((a, b), 0)
            ttfa = stats.get(a, (0, 0))[1]
            ttfb = stats.get(b, (0, 0))[1]
            if smoothing == "laplace":
                p *= (alpha + big) / (ttfa + alpha * V)
            elif smoothing == "linear_interpolation":
                uni = ul * (1.0 + ttfb) / (T + V)
                p *= (uni if big < 1
                      else bl * big / (0.5 + ttfa) + uni)
            elif big:
                p *= big / ttfa
            else:
                if ttfb == 0:
                    ok = False
                    break
                p *= discount * ttfb / T
        if ok and p > 0:
            rows.append((" ".join(phrase), math.log(p)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = pd.DataFrame(rows[:size], columns=["phrase", "score"])
    if collate == "prune":
        # PhraseSuggestionBuilder.collate with prune=true: every
        # suggestion is CHECKED against the index (default collate query
        # = a match query on the suggest field) and annotated, none
        # dropped
        out["collate_match"] = [
            bool(searcher.bool_docs(must=p.split()).size)
            for p in out["phrase"]]
    elif collate == "filter":
        # prune=false (the default collate mode): non-matching
        # suggestions are dropped
        out = out[[bool(searcher.bool_docs(must=p.split()).size)
                   for p in out["phrase"]]].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


# ------------------------------------------------- compound queries

def dis_max(searcher: Searcher, queries: List[Tuple[str, str]],
            tie_breaker: float = 0.0, k: int = 10) -> List[SearchHit]:
    """dis_max over match subqueries (ref index/query/DisMaxQueryBuilder.java:
    47-90 / DisjunctionMaxQuery): per doc, score = best subquery score +
    tie_breaker * Σ(other matching subqueries). ``queries`` = [(text, operator)]."""
    import numpy as np

    # per-subquery doc SET + score_docs — O(matches) numpy arrays, never a
    # Python hit list over the whole corpus (the k=10^9 path this replaces)
    per_q = []
    for qtext, op in queries:
        toks = searcher.analyzer.tokens(qtext)
        uniq = list(dict.fromkeys(toks))
        if not uniq:
            per_q.append((np.empty(0, np.int64), np.empty(0, np.float64)))
            continue
        d = (searcher.bool_docs(must=uniq) if op == "and"
             else searcher.bool_docs(should=uniq))
        d = np.sort(d)
        per_q.append((d, searcher.score_docs(d, toks)))
    all_ids = np.unique(np.concatenate(
        [d for d, _ in per_q if d.size] or [np.empty(0, np.int64)]))
    if all_ids.size == 0:
        return []
    mat = np.zeros((len(per_q), all_ids.size), dtype=np.float64)
    for i, (ids, sc) in enumerate(per_q):
        if ids.size:
            mat[i, np.searchsorted(all_ids, ids)] = sc
    mx = mat.max(axis=0)
    total = mx + tie_breaker * (mat.sum(axis=0) - mx)
    order = np.lexsort((all_ids, -total))[:k]
    return [SearchHit(int(all_ids[i]), float(total[i])) for i in order]


def boosting_query(searcher: Searcher, positive: str, negative: str,
                   negative_boost: float = 0.2, k: int = 10,
                   operator: str = "or") -> List[SearchHit]:
    """boosting query (ref index/query/BoostingQueryBuilder.java): positive
    matches keep their score; those also matching the negative query are
    DEMOTED by multiplying with ``negative_boost`` (not excluded)."""
    import numpy as np

    pos_toks = searcher.analyzer.tokens(positive)
    uniq = list(dict.fromkeys(pos_toks))
    if not uniq:
        return []
    docs = np.sort(searcher.bool_docs(must=uniq) if operator == "and"
                   else searcher.bool_docs(should=uniq))
    if docs.size == 0:
        return []
    scores = searcher.score_docs(docs, pos_toks)
    neg_terms = list(dict.fromkeys(searcher.analyzer.tokens(negative)))
    if neg_terms:
        neg = np.sort(searcher.bool_docs(should=neg_terms))
        demote = np.isin(docs, neg, assume_unique=True)
        scores = np.where(demote, scores * negative_boost, scores)
    order = np.lexsort((docs, -scores))[:k]
    return [SearchHit(int(docs[i]), float(scores[i])) for i in order]


# --------------------------------------------------------- query_string

def _qs_tokenize(q: str) -> List[str]:
    """Lexer for the query_string mini-grammar: parentheses, AND/OR/NOT,
    quoted phrases, bare terms (trailing ``*`` = prefix)."""
    out, i, n = [], 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            j = n if j < 0 else j
            out.append(q[i:j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            out.append(q[i:j])
            i = j
    return out


class _QSParser:
    """Recursive descent with Lucene classic QueryParser semantics
    (QueryStringQueryBuilder.java -> classic grammar, default_operator=OR):
    AND binds tighter than (implicit) OR; ``NOT x`` marks a PROHIBITED clause
    of the enclosing bool (subtracted from its positive matches — never a
    standalone complement; a pure-negative bool matches nothing)."""

    def __init__(self, searcher: Searcher, tokens: List[str]):
        self.s = searcher
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def parse_or(self) -> "np.ndarray":
        import numpy as np
        acc = None
        negs = []
        while True:
            p = self.peek()
            if p in (None, ")"):
                break
            if p == "OR":
                self.i += 1
                continue
            ds, is_neg = self.parse_and_group()
            if is_neg:
                negs.append(ds)
            else:
                acc = ds if acc is None else np.union1d(acc, ds)
        acc = acc if acc is not None else np.empty(0, np.int64)
        for nd in negs:
            acc = np.setdiff1d(acc, nd, assume_unique=True)
        return acc

    def parse_and_group(self):
        """One AND-chain -> (docset, is_pure_negative)."""
        import numpy as np
        pos = None
        negs = []

        def take_unary():
            if self.peek() == "NOT":
                self.i += 1
                return self.parse_atom(), True
            return self.parse_atom(), False

        ds, neg = take_unary()
        if neg:
            negs.append(ds)
        else:
            pos = ds
        while self.peek() == "AND":
            self.i += 1
            ds, neg = take_unary()
            if neg:
                negs.append(ds)
            else:
                pos = ds if pos is None else np.intersect1d(
                    pos, ds, assume_unique=True)
        if pos is None:
            # pure negative group: prohibited at the enclosing level
            u = negs[0]
            for nd in negs[1:]:
                u = np.union1d(u, nd)
            return u, True
        for nd in negs:
            pos = np.setdiff1d(pos, nd, assume_unique=True)
        return pos, False

    def parse_atom(self) -> "np.ndarray":
        import numpy as np
        tok = self.peek()
        if tok == "(":
            self.i += 1
            inner = self.parse_or()
            if self.peek() == ")":
                self.i += 1
            return inner
        self.i += 1
        if tok is None:
            return np.empty(0, np.int64)
        if tok.startswith('"'):
            return self.s.match_phrase(tok.strip('"'))
        if tok.endswith("*") and len(tok) > 1:
            return self.s.prefix_docs(tok[:-1].lower())
        terms = self.s.analyzer.tokens(tok)
        if not terms:
            return np.empty(0, np.int64)
        return self.s.bool_docs(should=terms)


def query_string(searcher: Searcher, q: str, k: Optional[int] = None
                 ) -> pd.DataFrame:
    """query_string query: boolean mini-language (AND/OR/NOT, parentheses,
    "phrases", prefix*) parsed and evaluated over posting-list doc sets, hits
    scored by the BM25 sum of the POSITIVE bare terms they match (Lucene bool
    scoring: matching clauses sum; NOT clauses contribute nothing).
    Returns (doc_id, score) sorted (score desc, doc_id asc)."""
    import numpy as np

    toks = _qs_tokenize(q)
    docs = _QSParser(searcher, toks).parse_or()
    if docs.size == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    # positive bare terms (not operators / phrases / under NOT)
    pos_terms: List[str] = []
    skip_next_neg = False
    for t in toks:
        if t == "NOT":
            skip_next_neg = True
            continue
        if t in ("AND", "OR", "(", ")"):
            continue
        if skip_next_neg:
            skip_next_neg = False
            continue
        if t.startswith('"') or t.endswith("*"):
            continue
        pos_terms.extend(searcher.analyzer.tokens(t))
    pos_terms = list(dict.fromkeys(pos_terms))
    scores = (searcher.score_docs(np.sort(docs), pos_terms) if pos_terms
              else np.zeros(docs.size, np.float64))
    out = pd.DataFrame({
        "doc_id": np.sort(docs).astype(np.int64),
        "score": scores,
    })
    out = out.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    return out.head(k) if k else out


# -------------------------------------------------------------- rank_feature

def rank_feature_topk(ds, field: str, id_col: str, k: int = 10,
                      function: str = "saturation", pivot: float = 1.0,
                      scale: float = 1.0, exponent: float = 1.0
                      ) -> pd.DataFrame:
    """rank_feature query over a numeric feature column (ref
    index/query/RankFeatureQueryBuilder / mapper/RankFeatureFieldMapper):
    score = saturation v/(v+pivot) | log ln(scale + v) | sigmoid
    v^exp/(v^exp + pivot^exp). Distributed: per-batch vectorized scoring +
    per-batch top-k partials, driver merges k rows/block."""
    import pyarrow.compute as _pc

    def score_fn(v: np.ndarray) -> np.ndarray:
        if function == "saturation":
            return v / (v + pivot)
        if function == "log":
            return np.log(scale + v)
        if function == "sigmoid":
            vp = np.power(v, exponent)
            return vp / (vp + np.power(pivot, exponent))
        raise ValueError(function)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        sc = score_fn(v)
        kk = min(k, len(sc))
        if kk == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        # the partial must honor the global (score desc, id asc) tie-break:
        # a score-only argpartition could drop the smaller-id row of a tie at
        # the k-th boundary, so order the batch lexicographically first
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        top = np.lexsort((ids, -sc))[:kk]
        return pa.table({id_col: t.column(id_col).take(pa.array(top)),
                         "score": pa.array(sc[top])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["score", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


def rank_features_topk(ds, json_col: str, feature: str, id_col: str,
                       k: int = 10, function: str = "saturation",
                       pivot: float = 1.0, scale: float = 1.0,
                       exponent: float = 1.0) -> pd.DataFrame:
    """rank_features (PLURAL) field (mapper-extras
    RankFeaturesFieldMapper.java): a per-doc {feature: value} map — here a
    JSON-string column — addressed by one feature key in a rank_feature
    query. Docs missing the key do NOT match (the sparse-features
    contract). Extraction is one vectorized regex per batch; scoring and
    the per-batch top-k partial reuse :func:`rank_feature_topk`."""
    import re

    pat = re.compile(r'"' + re.escape(feature) +
                     r'"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?)')

    def extract(t: pa.Table) -> pa.Table:
        txt = pd.Series(t.column(json_col).to_pylist(), dtype=object)
        v = txt.str.extract(pat, expand=False).astype(np.float64)
        keep = v.notna().to_numpy()
        return pa.table({
            id_col: t.column(id_col).filter(pa.array(keep)),
            "_rfv": pa.array(v.to_numpy()[keep])})

    sub = ds.map_batches(extract, batch_format="pyarrow")
    return rank_feature_topk(sub, "_rfv", id_col, k=k, function=function,
                             pivot=pivot, scale=scale, exponent=exponent)


def neural_sparse_topk(ds, map_col: str, query_tokens: Dict[str, float],
                       id_col: str, k: int = 10) -> pd.DataFrame:
    """``neural_sparse`` query shape (OpenSearch neural-search plugin,
    public "Neural sparse search" docs; scoring per NeuralSparseQuery =
    a sparse dot product): the doc side is a {token: weight} map — here
    a JSON-string column like rank_features — the query side an
    explicit {token: weight} dict (the raw-vector `query_tokens` mode).
    score(d) = sum over shared tokens of q_w * d_w; docs sharing NO
    token do not match. Distributed: one vectorized regex extraction
    per query token per batch, per-batch top-k partials, k-bounded
    driver merge."""
    import re

    pats = [(re.compile(r'"' + re.escape(t)
                        + r'"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?)'), float(w))
            for t, w in query_tokens.items()]

    def partial(t: pa.Table) -> pa.Table:
        txt = pd.Series(t.column(map_col).to_pylist(), dtype=object)
        sc = np.zeros(len(txt), np.float64)
        hit = np.zeros(len(txt), bool)
        for pat, w in pats:
            v = txt.str.extract(pat, expand=False).astype(np.float64)
            m = v.notna().to_numpy()
            sc[m] += w * v.to_numpy()[m]
            hit |= m
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ids, sc = ids[hit], sc[hit]
        kk = min(k, len(sc))
        top = np.lexsort((ids, -sc))[:kk]
        return pa.table({id_col: pa.array(ids[top]),
                         "score": pa.array(sc[top])})

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.reset_index(drop=True)


# ------------------------------------------------------------------- murmur3

def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple:
    """MurmurHash3 x64_128 (Austin Appleby's public-domain algorithm) —
    the hash the murmur3 field mapper stores (plugins/mapper-murmur3
    Murmur3FieldMapper: hash128 of the UTF-8 term, doc-values = h1).
    Returns (h1, h2) as unsigned 64-bit ints."""
    M = 0xFFFFFFFFFFFFFFFF
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def fmix(kk):
        kk ^= kk >> 33
        kk = (kk * 0xFF51AFD7ED558CCD) & M
        kk ^= kk >> 33
        kk = (kk * 0xC4CEB9FE1A85EC53) & M
        kk ^= kk >> 33
        return kk

    h1 = h2 = seed & M
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")
        k1 = rotl((k1 * c1) & M, 31) * c2 & M
        h1 = ((rotl(h1 ^ k1, 27) + h2) * 5 + 0x52DCE729) & M
        k2 = rotl((k2 * c2) & M, 33) * c1 & M
        h2 = ((rotl(h2 ^ k2, 31) + h1) * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        h2 ^= rotl((k2 * c2) & M, 33) * c1 & M
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        h1 ^= rotl((k1 * c1) & M, 31) * c2 & M
    h1 = (h1 ^ n) & M
    h2 = (h2 ^ n) & M
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


def murmur3_column(ds, col: str, out_col: str = "_murmur3"):
    """murmur3 field type: append the signed-int64 h1 of each value's
    UTF-8 bytes (the mapper's stored doc-value, built for cheap
    cardinality aggs). Each batch hashes its DISTINCT values once and
    maps back — keyword columns are low-cardinality per block."""
    def add(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(col).to_pylist(), dtype=object)
        uniq, inv = np.unique(v, return_inverse=True)
        hs = np.array(
            [np.uint64(murmur3_x64_128(str(u).encode("utf-8"))[0])
             .astype(np.int64) for u in uniq], dtype=np.int64)
        return t.append_column(out_col, pa.array(hs[inv]))

    return ds.map_batches(add, batch_format="pyarrow")


# --------------------------------------------------------- multi-index union

def multi_index_search(searchers: "dict[str, Searcher]", query_text: str,
                       k: int = 10, operator: str = "or") -> pd.DataFrame:
    """Search several indexes in one request (``GET /idx1,idx2/_search``):
    each index scores with its OWN stats (the default query_then_fetch — no
    cross-index DFS), hits merge on (score desc, index asc, docid asc).
    Returns (index, doc_id, score)."""
    rows = []
    for name in sorted(searchers):
        for h in searchers[name].search(query_text, k=k, operator=operator):
            rows.append((name, h.docid, h.score))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    out = pd.DataFrame(rows[:k], columns=["index", "doc_id", "score"])
    return out


def indices_boost_search(searchers: "dict[str, Searcher]", query_text: str,
                         boosts: "dict[str, float]", k: int = 10,
                         operator: str = "or") -> pd.DataFrame:
    """indices_boost (SearchSourceBuilder.indexBoosts): multi-index search
    with each index's hit scores multiplied by its boost before the merge.
    Missing indexes default to 1.0."""
    rows = []
    for name in sorted(searchers):
        b = float(boosts.get(name, 1.0))
        for h in searchers[name].search(query_text, k=k, operator=operator):
            rows.append((name, h.docid, h.score * b))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return pd.DataFrame(rows[:k], columns=["index", "doc_id", "score"])


def post_filter_search(searcher: Searcher, query_text: str,
                       post_filter: "dict[str, object]", agg_field: str,
                       k: int = 10, operator: str = "or") -> "dict":
    """post_filter (SearchSourceBuilder.postFilter; FilteredCollector):
    aggregations are computed over ALL query matches, hits are filtered
    AFTERWARDS — the one observable difference from a bool.filter clause.

    Returns {"hits": DataFrame(_docid, score), "aggregations":
    DataFrame(key, doc_count)}. Aggs and the filter mask read per-segment
    DOC VALUES (never a stored-field fetch of every match); hits score via
    score_docs over the filtered set — memory O(matches) numpy, no
    corpus-sized Python hit list."""
    from .sort_phase import gather_doc_values

    terms = list(dict.fromkeys(searcher.analyzer.tokens(query_text)))
    docs = np.sort(searcher.bool_docs(must=terms) if operator == "and"
                   else searcher.bool_docs(should=terms)) if terms else \
        np.empty(0, np.int64)
    if docs.size == 0:
        return {"hits": pd.DataFrame({"_docid": [], "score": []}),
                "aggregations": pd.DataFrame({"key": [], "doc_count": []})}
    keys = gather_doc_values(searcher, docs, agg_field)
    uniq, counts = np.unique(keys, return_counts=True)
    aggs = pd.DataFrame({"key": uniq, "doc_count": counts.astype(np.int64)})
    mask = np.ones(docs.size, dtype=bool)
    for col, spec in post_filter.items():
        mask &= Searcher._spec_mask(gather_doc_values(searcher, docs, col),
                                    spec)
    flt_docs = docs[mask]
    scores = searcher.score_docs(flt_docs,
                                 searcher.analyzer.tokens(query_text))
    order = np.lexsort((flt_docs, -scores))[:k]
    return {"hits": pd.DataFrame({"_docid": flt_docs[order],
                                  "score": scores[order]}),
            "aggregations": aggs}


def common_terms_query(searcher: Searcher, text: str, cutoff_df: int,
                       k: int = 10, low_freq_operator: str = "or",
                       minimum_should_match: int = 1) -> pd.DataFrame:
    """common terms query (server/index/query/CommonTermsQueryBuilder.java /
    Lucene CommonTermsQuery): query terms are partitioned by document
    frequency at ``cutoff_df``. The LOW-frequency group selects the matching
    docs (``low_freq_operator`` and/or, ``minimum_should_match``); the
    HIGH-frequency (stopword-like) group never gates but still contributes
    BM25 score on docs the low group matched. When every term is
    high-frequency the high group gates by itself (Lucene's fallback)."""
    terms = list(dict.fromkeys(searcher.analyzer.tokens(text)))
    if not terms:
        return pd.DataFrame({"_docid": [], "score": []})
    stats = searcher.term_stats(terms)
    low = [t for t in terms if 0 < stats[t][0] <= cutoff_df]
    high = [t for t in terms if stats[t][0] > cutoff_df]
    if low:
        if low_freq_operator == "and":
            gate = searcher.bool_docs(must=low)
        else:
            gate = searcher.bool_docs(
                should=low, minimum_should_match=minimum_should_match)
    else:
        gate = searcher.bool_docs(should=high, minimum_should_match=1)
    gate_sorted = np.sort(gate)
    scores = searcher.score_docs(gate_sorted, terms)
    order = np.lexsort((gate_sorted, -scores))[:k]
    return pd.DataFrame({"_docid": gate_sorted[order],
                         "score": scores[order]})


def min_score_search(searcher: Searcher, query_text: str, min_score: float,
                     k: int = 10, operator: str = "or") -> pd.DataFrame:
    """min_score (SearchSourceBuilder.minScore): hits scoring below the
    cutoff are dropped before pagination. Qualifying hits are a PREFIX of
    the (score desc, docid asc) ranking, so the top-k heap suffices — no
    exhaustive hit materialization."""
    hits = searcher.search(query_text, k=k, operator=operator)
    kept = [(h.docid, h.score) for h in hits if h.score >= min_score]
    return pd.DataFrame(kept, columns=["_docid", "score"])


def matched_queries_search(searcher: Searcher,
                           named_clauses: "dict[str, list]",
                           ) -> pd.DataFrame:
    """Named queries (_name on bool clauses; MatchedQueriesPhase): every doc
    matching ANY clause, with the sorted list of clause names it matched.
    Each clause is a match query (OR over its terms), filter context."""
    clause_docs = {}
    for name, terms in named_clauses.items():
        sets = [searcher.term_docs(t) for t in terms]
        nonempty = [s for s in sets if len(s)]
        clause_docs[name] = (np.unique(np.concatenate(nonempty))
                             if nonempty else np.empty(0, np.int64))
    all_docs = np.unique(np.concatenate(
        [d for d in clause_docs.values() if len(d)] or
        [np.empty(0, np.int64)]))
    names = sorted(clause_docs)
    flags = {n: np.isin(all_docs, clause_docs[n]) for n in names}
    matched = [",".join(n for n in names if flags[n][i])
               for i in range(len(all_docs))]
    return pd.DataFrame({"_docid": all_docs.astype(np.int64),
                         "matched": matched})


# ------------------------------------------------------------- terms lookup

def terms_lookup_filter(ds, filter_col: str, lookup_ds, lookup_col: str,
                        lookup_pred: Callable[[pa.Table], pa.Array]):
    """terms-lookup semi-join: fetch the (small) term list from the lookup
    side, broadcast it, filter the main Dataset — no shuffle
    (TermsQueryBuilder + the guide's broadcast-semi-join pattern)."""
    import pyarrow.compute as pc
    import ray

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.cast(lookup_pred(t), pa.bool_())).select([lookup_col])

    keys = lookup_ds.map_batches(pick, batch_format="pyarrow").to_pandas()[lookup_col]
    key_ref = ray.put(pa.array(sorted(set(keys))))

    def filt(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        return t.filter(pc.is_in(t.column(filter_col), value_set=ks))

    return ds.map_batches(filt, batch_format="pyarrow")
