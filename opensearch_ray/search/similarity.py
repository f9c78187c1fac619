"""Alternative per-field similarities (the reference's similarity module).

Reference: server/src/main/java/org/opensearch/index/similarity/
SimilarityProviders.java (registered types: BM25, boolean, DFR, DFI, IB,
LMDirichlet, LMJelinekMercer) and the Lucene scorers they wrap:

- ``boolean``    BooleanSimilarity: score = boost per matching term.
- ``lm_dirichlet``  LMDirichletSimilarity (mu=2000, SimilarityProviders
  DEFAULT): score = boost * (ln(1 + tf/(mu*p)) + ln(mu/(dl+mu))), clamped at
  0, with collection probability p = (ttf+1)/(total_tokens+1)
  (LMSimilarity.computeProbability) and dl the 1-byte-quantized doc length
  (the same norm decode BM25 uses).
- ``lm_jelinek_mercer``  LMJelinekMercerSimilarity (lambda=0.1): score =
  boost * ln(1 + ((1-l)*tf/dl) / (l*p)), clamped at 0.
- ``dfi``  DFISimilarity (independence measure ``standardized``):
  expected = (ttf+1)*dl/(total_tokens+1); tf <= expected scores 0, else
  boost * log2((tf-expected)/sqrt(expected) + 1).

These are an exhaustive-OR scoring surface (no block-max pruning: the
precomputed block bounds in the index are BM25 upper bounds and do not bound
these formulas). Scoring is fully vectorized per (term, segment) chunk and
accumulated in float64 — the SQL-oracle-compatible mode; ties break
(score desc, docid asc) like Searcher.search.

BM25 itself stays in bm25.py / Searcher.search (the rank-identity invariant
gate); this module never touches that path.
"""

from __future__ import annotations

import numpy as np

from ..index.norms import NORM_LENGTH_TABLE
from .searcher import Searcher, SearchHit

SIMILARITIES = ("boolean", "lm_dirichlet", "lm_jelinek_mercer", "dfi",
                "scripted")


def _contrib(similarity: str, tf: np.ndarray, dl: np.ndarray,
             ttf: int, total_tokens: int, boost: float, params: dict,
             df: int = 0, n_docs: int = 0) -> np.ndarray:
    """Per-posting float64 contribution of one query term."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    if similarity == "boolean":
        return np.full(len(tf), float(boost))
    if similarity == "scripted":
        # `scripted` similarity (SimilarityService.java:115 builtIn
        # "scripted"): a user Python callable in place of Painless,
        # receiving the same per-term statistics the reference exposes
        # (doc.freq/doc.length, term.docFreq/totalTermFreq,
        # field.docCount/sumTotalTermFreq, query.boost), vectorized over
        # the postings of one (term, segment) chunk.
        fn = params["script"]
        return np.asarray(fn(tf=tf, dl=dl, df=float(df), ttf=float(ttf),
                             n_docs=float(n_docs),
                             total_tokens=float(total_tokens),
                             boost=float(boost)), dtype=np.float64)
    p = (ttf + 1.0) / (total_tokens + 1.0)  # LMSimilarity.computeProbability
    if similarity == "lm_dirichlet":
        mu = float(params.get("mu", 2000.0))
        s = boost * (np.log(1.0 + tf / (mu * p)) + np.log(mu / (dl + mu)))
        return np.maximum(s, 0.0)
    if similarity == "lm_jelinek_mercer":
        lam = float(params.get("lambda", 0.1))
        s = boost * np.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * p))
        return np.maximum(s, 0.0)
    if similarity == "dfi":
        expected = (ttf + 1.0) * dl / (total_tokens + 1.0)
        measure = (tf - expected) / np.sqrt(expected)  # standardized
        # max(measure, 0) only guards log2's domain on the discarded branch
        s = boost * np.log2(np.maximum(measure, 0.0) + 1.0)
        return np.where(tf > expected, s, 0.0)
    raise ValueError(f"unknown similarity: {similarity!r}")


def similarity_search(searcher: Searcher, query_text: str, k: int = 10,
                      similarity: str = "lm_dirichlet",
                      **params) -> list:
    """Match-query (OR) top-k under an alternative similarity.

    Every query-term posting is decoded once per segment (chunk decode cache
    shared with the BM25 path) and scored with the similarity's vectorized
    formula; per-doc totals accumulate in float64.
    """
    if k <= 0:
        return []
    terms = searcher.analyzer.tokens(query_text)
    if not terms or not searcher.N:
        return []
    from collections import Counter
    mult = Counter(terms)
    uniq = list(mult.keys())
    stats = searcher.term_stats(uniq)
    live = [t for t in uniq if stats[t][0] > 0]
    if not live:
        return []
    post = searcher.postings(live)
    total_tokens = int(searcher.manifest.sum_dl)

    per_seg: dict = {}
    for t in live:
        tbl = post[t]
        if tbl.num_rows == 0:
            continue
        for row in tbl.to_pylist():
            per_seg.setdefault(int(row["seg_id"]), []).append((t, row))

    docs_all, scores_all = [], []
    for seg_id in sorted(per_seg):
        base = searcher.doc_base(seg_id)
        norms = searcher.norms(seg_id)
        d_parts, s_parts = [], []
        for t, row in per_seg[seg_id]:
            docids, tfs = searcher._decode_chunk_rows(row)
            dl = NORM_LENGTH_TABLE[norms[docids]]
            c = _contrib(similarity, tfs, dl, stats[t][1], total_tokens,
                         float(mult[t]), params,
                         df=stats[t][0], n_docs=searcher.N)
            d_parts.append(docids)
            s_parts.append(c)
        d_cat = np.concatenate(d_parts)
        udocs, inv = np.unique(d_cat, return_inverse=True)
        acc = np.zeros(len(udocs), np.float64)
        np.add.at(acc, inv, np.concatenate(s_parts))
        docs_all.append(udocs + base)
        scores_all.append(acc)
    if not docs_all:
        return []
    docs = np.concatenate(docs_all)
    scores = np.concatenate(scores_all)
    order = np.lexsort((docs, -scores))[:k]
    return [SearchHit(docid=int(docs[i]), score=float(scores[i]))
            for i in order]
