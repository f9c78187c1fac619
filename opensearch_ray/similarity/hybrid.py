"""Hybrid lexical + vector retrieval: RRF and normalized-score fusion.

Two public fusion methods:

* RRF (Cormack, Clarke & Buettcher, SIGIR'09) — the rank fusion behind
  hybrid BM25+kNN search in modern retrieval stacks: score(d) = sum
  over result lists of 1 / (k0 + rank_list(d)). Rank-based fusion needs
  no score normalization, which is why it beats linear combinations
  across heterogeneous scorers.
* Normalized-score fusion — the OpenSearch `hybrid` query's
  normalization-processor semantics (search-pipeline processor in the
  neural-search plugin; public docs "Hybrid search"): per-leg score
  normalization (``min_max`` or ``l2``) followed by a weighted
  combination (``arithmetic_mean`` / ``geometric_mean`` /
  ``harmonic_mean``) over the legs where the doc appears.

Distributed shape: both legs are already bounded — BM25 top-``depth``
from the index's block-max collector, cosine top-``depth`` from the
per-batch-partial brute-force (or any ANN index). Fusion touches only
2 x depth (id, rank) pairs on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def hybrid_rrf_search(searcher, emb_ds, query_text: str,
                      query_vec: np.ndarray, k: int = 10, k0: int = 60,
                      depth: int = 100, id_col: str = "vec_id",
                      dtype=np.float64) -> pd.DataFrame:
    """-> DataFrame(doc_id, rrf_score, bm25_rank, knn_rank, rank): top-k
    by RRF over the BM25 top-``depth`` and cosine top-``depth`` lists
    (rank 0 = absent from that leg; ties break on doc id)."""
    from .ann import brute_force_topk

    hits = searcher.search(query_text, k=depth)
    bm_rank = {h.docid: i + 1 for i, h in enumerate(hits)}
    knn = brute_force_topk(emb_ds, np.asarray(query_vec, dtype), k=depth,
                           id_col=id_col, dtype=dtype)
    kn_rank = dict(zip(knn[id_col].astype(int).tolist(),
                       knn["rank"].astype(int).tolist()))
    rows = []
    for d in sorted(set(bm_rank) | set(kn_rank)):
        s = 0.0
        if d in bm_rank:
            s += 1.0 / (k0 + bm_rank[d])
        if d in kn_rank:
            s += 1.0 / (k0 + kn_rank[d])
        rows.append((d, s, bm_rank.get(d, 0), kn_rank.get(d, 0)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = pd.DataFrame(rows[:k], columns=["doc_id", "rrf_score",
                                          "bm25_rank", "knn_rank"])
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


#: single-result / zero-floor constants of the min_max technique (the
#: neural-search MinMaxScoreNormalizationTechnique behavior: a
#: degenerate max==min leg normalizes to 1.0; an exact-min score is
#: floored to 0.001 so it stays a positive signal)
_SINGLE_RESULT_SCORE = 1.0
_MIN_SCORE = 0.001


def _normalize_leg(scores: np.ndarray, technique: str) -> np.ndarray:
    if technique == "min_max":
        if scores.size == 0:
            return scores
        lo, hi = float(scores.min()), float(scores.max())
        if hi == lo:
            return np.full_like(scores, _SINGLE_RESULT_SCORE)
        return np.maximum((scores - lo) / (hi - lo), _MIN_SCORE)
    if technique == "l2":
        nrm = float(np.sqrt((scores ** 2).sum()))
        return scores / nrm if nrm > 0 else scores
    raise ValueError(f"unknown normalization technique {technique!r}")


def _combine(mat: np.ndarray, present: np.ndarray, weights: np.ndarray,
             combination: str) -> np.ndarray:
    """Weighted mean over the PRESENT legs per doc (absent legs carry no
    weight — the neural-search combination contract). ``mat`` is
    (docs, legs) normalized scores with 0 where absent."""
    w = present * weights[None, :]
    wsum = w.sum(axis=1)
    if combination == "arithmetic_mean":
        return (mat * w).sum(axis=1) / wsum
    if combination == "geometric_mean":
        logs = np.where(mat > 0, np.log(np.maximum(mat, 1e-300)), 0.0)
        return np.exp((logs * w).sum(axis=1) / wsum)
    if combination == "harmonic_mean":
        inv = np.where(mat > 0, w / np.maximum(mat, 1e-300), 0.0)
        return wsum / inv.sum(axis=1)
    raise ValueError(f"unknown combination technique {combination!r}")


def hybrid_normalized_search(searcher, emb_ds, query_text: str,
                             query_vec: np.ndarray, k: int = 10,
                             depth: int = 100, technique: str = "min_max",
                             combination: str = "arithmetic_mean",
                             weights=(0.5, 0.5), id_col: str = "vec_id",
                             dtype=np.float64) -> pd.DataFrame:
    """OpenSearch ``hybrid`` query fusion (normalization processor of
    the search pipeline; neural-search plugin, public "Hybrid search"
    docs): normalize each leg's scores with ``technique``, combine with
    the weighted ``combination`` mean over legs where the doc appears,
    then top-k (score desc, doc id asc).

    -> DataFrame(doc_id, bm25_norm, knn_norm, score, rank); a leg the
    doc is absent from reports norm 0 and contributes no weight."""
    from .ann import brute_force_topk

    hits = searcher.search(query_text, k=depth)
    bm_ids = np.array([h.docid for h in hits], np.int64)
    bm_sc = _normalize_leg(np.array([h.score for h in hits], np.float64),
                           technique)
    knn = brute_force_topk(emb_ds, np.asarray(query_vec, dtype), k=depth,
                           id_col=id_col, dtype=dtype)
    kn_ids = knn[id_col].to_numpy(np.int64)
    kn_sc = _normalize_leg(knn["score"].to_numpy(np.float64), technique)

    ids = np.unique(np.concatenate((bm_ids, kn_ids)))
    mat = np.zeros((ids.size, 2), np.float64)
    present = np.zeros((ids.size, 2), np.float64)
    bi = np.searchsorted(ids, bm_ids)
    mat[bi, 0] = bm_sc
    present[bi, 0] = 1.0
    ki = np.searchsorted(ids, kn_ids)
    mat[ki, 1] = kn_sc
    present[ki, 1] = 1.0
    score = _combine(mat, present, np.asarray(weights, np.float64),
                     combination)
    top = np.lexsort((ids, -score))[:k]
    out = pd.DataFrame({"doc_id": ids[top], "bm25_norm": mat[top, 0],
                        "knn_norm": mat[top, 1], "score": score[top]})
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out
