"""Hybrid lexical + vector retrieval with Reciprocal Rank Fusion.

Public method: RRF (Cormack, Clarke & Buettcher, SIGIR'09) — the rank
fusion behind hybrid BM25+kNN search in modern retrieval stacks:
score(d) = sum over result lists of 1 / (k0 + rank_list(d)). Rank-based
fusion needs no score normalization, which is why it beats linear
combinations across heterogeneous scorers.

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
