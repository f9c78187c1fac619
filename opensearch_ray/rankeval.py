"""Ranking evaluation — the rank-eval module (`_rank_eval` API).

Mirrors ``modules/rank-eval/src/main/java/org/opensearch/index/rankeval/``:
each rated request runs a search, its hit list is joined with the request's
document ratings, and a ranking metric scores the list; the API reports the
per-request quality plus the mean over requests
(``TransportRankEvalAction.java``, ``RankEvalSpec.java``).

Metrics (exact evaluate() semantics of the Java classes):

- :func:`precision_at_k` — ``PrecisionAtK.java``: relevant-retrieved /
  retrieved, where *retrieved* counts rated hits plus (unless
  ``ignore_unlabeled``) unlabeled hits; relevant = rating >=
  ``relevant_rating_threshold``.
- :func:`recall_at_k` — ``RecallAtK.java``: relevant-retrieved over ALL
  relevant rated docs.
- :func:`mean_reciprocal_rank` — ``MeanReciprocalRank.java``: 1/rank of the
  first relevant hit (0 when none in the top k).
- :func:`dcg_at_k` — ``DiscountedCumulativeGain.java``:
  sum((2^rating - 1) / log2(rank + 1)); unlabeled hits keep their rank slot
  but contribute ``unknown_doc_rating`` (skipped when None). ``normalize``
  divides by the ideal DCG over all rated docs truncated to the hit-list
  length (NDCG).
- :func:`expected_reciprocal_rank` — ``ExpectedReciprocalRank.java``:
  probability-cascade ERR with prob(r) = (2^r - 1) / 2^max_rating.

The search side is any callable returning ranked docids — by default the
JSON-DSL executor (:func:`opensearch_ray.search.dsl.execute_search`), so
rated requests carry the same request bodies the reference accepts.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence

import pandas as pd


def precision_at_k(ranked: Sequence[int], ratings: Dict[int, int],
                   relevant_rating_threshold: int = 1,
                   ignore_unlabeled: bool = False) -> float:
    relevant = retrieved = 0
    for d in ranked:
        r = ratings.get(int(d))
        if r is not None:
            retrieved += 1
            if r >= relevant_rating_threshold:
                relevant += 1
        elif not ignore_unlabeled:
            retrieved += 1
    return relevant / retrieved if retrieved else 0.0


def recall_at_k(ranked: Sequence[int], ratings: Dict[int, int],
                relevant_rating_threshold: int = 1) -> float:
    rel_total = sum(1 for r in ratings.values()
                    if r >= relevant_rating_threshold)
    if not rel_total:
        return 0.0
    rel_hit = sum(1 for d in ranked
                  if ratings.get(int(d), -1) >= relevant_rating_threshold)
    return rel_hit / rel_total


def mean_reciprocal_rank(ranked: Sequence[int], ratings: Dict[int, int],
                         relevant_rating_threshold: int = 1) -> float:
    for i, d in enumerate(ranked):
        r = ratings.get(int(d))
        if r is not None and r >= relevant_rating_threshold:
            return 1.0 / (i + 1)
    return 0.0


def _dcg(rs: Sequence[Optional[int]]) -> float:
    return sum((2.0 ** r - 1.0) / math.log2(i + 2)
               for i, r in enumerate(rs) if r is not None)


def dcg_at_k(ranked: Sequence[int], ratings: Dict[int, int],
             normalize: bool = True,
             unknown_doc_rating: Optional[int] = None) -> float:
    rs = [ratings.get(int(d), unknown_doc_rating) for d in ranked]
    dcg = _dcg(rs)
    if not normalize:
        return dcg
    ideal = sorted(ratings.values(), reverse=True)[:len(rs)]
    idcg = _dcg(ideal)
    return dcg / idcg if idcg else 0.0


def expected_reciprocal_rank(ranked: Sequence[int], ratings: Dict[int, int],
                             max_rating: int,
                             unknown_doc_rating: Optional[int] = None
                             ) -> float:
    p, err = 1.0, 0.0
    denom = 2.0 ** max_rating
    for i, d in enumerate(ranked):
        r = ratings.get(int(d), unknown_doc_rating)
        if r is not None:
            prob = (2.0 ** r - 1.0) / denom
            err += p * prob / (i + 1)
            p *= 1.0 - prob
    return err


METRICS = {
    "precision": precision_at_k,
    "recall": recall_at_k,
    "mean_reciprocal_rank": mean_reciprocal_rank,
    "dcg": dcg_at_k,
    "expected_reciprocal_rank": expected_reciprocal_rank,
}


def rank_eval(searcher, requests: List[dict], metric: str = "precision",
              k: int = 10, text_field: str = "text",
              id_col: str = "doc_id", **metric_kwargs) -> pd.DataFrame:
    """Evaluate rated requests; returns one row per request
    (query_id, metric_score) plus the mean — RankEvalResponse's
    ``quality_level`` + ``details`` shape.

    ``requests``: [{"id": str, "body"|"query_text": ..., "ratings":
    {docid: rating}}]. ``body`` is a JSON-DSL request body (its ``size``
    defaults to k); ``query_text`` is a shortcut for a plain match query.
    """
    from .search import dsl

    fn = METRICS[metric]
    rows = []
    scores = []
    for req in requests:
        body = req.get("body") or {
            "query": {"match": {text_field: req["query_text"]}}}
        body = dict(body)
        body.setdefault("size", k)
        hits = dsl.execute_search(searcher, body, text_field=text_field,
                                  id_col=id_col)
        ranked = hits[id_col].tolist()
        ratings = {int(d): int(r) for d, r in req["ratings"].items()}
        sc = fn(ranked, ratings, **metric_kwargs)
        rows.append({"query_id": str(req["id"]), "metric_score": sc})
        scores.append(sc)
    rows.append({"query_id": "_mean",
                 "metric_score": sum(scores) / len(scores) if scores else 0.0})
    return pd.DataFrame(rows)
