"""Okapi BM25, matching the reference's defaults exactly.

Reference: ``LegacyBM25Similarity`` (the OpenSearch default similarity —
/root/reference/server/src/main/java/org/opensearch/index/similarity/SimilarityService.java:37,86-102,
params k1=1.2 b=0.75 discount_overlaps per SimilarityProviders.java:274-282).

score(q, d) = Σ_t idf(t) * (k1+1) * tf / (tf + k1 * (1 - b + b * dl_q/avgdl))

where
  idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
  dl_q    = byte4_to_int(int_to_byte4(dl))   (lossy 1-byte norm, norms.py)
  avgdl   = sum_dl / N with EXACT (unquantized) sum_dl
  (k1+1)  = the Legacy/classic-BM25 numerator factor kept by OpenSearch.

All per-doc arithmetic is float32 with Lucene's evaluation order:
``weight * (tf / (tf + cache[norm_byte]))`` where
``cache[j] = k1*(1-b+b*LENGTH_TABLE[j]/avgdl)`` is precomputed per query
(Lucene BM25Scorer's 256-entry norm cache). The brute-force oracle
(oracle.py) uses the same ops so engine scores are bit-identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..index.norms import NORM_LENGTH_TABLE


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


def bm25_idf(df: int, n_docs: int, dtype=np.float32):
    """ln(1 + (N - df + 0.5)/(df + 0.5)), computed in double then narrowed —
    Lucene's BM25Similarity.idf returns float. ``dtype=float64`` keeps full
    precision (the SQL-oracle-compatible mode)."""
    return dtype(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def make_norm_cache(avgdl: float, params: BM25Params = BM25Params(),
                    dtype=np.float32) -> np.ndarray:
    """256-entry cache: k1*(1-b+b*LENGTH_TABLE[j]/avgdl)."""
    tbl = NORM_LENGTH_TABLE.astype(np.float64)
    cache = params.k1 * ((1.0 - params.b) + params.b * tbl / float(avgdl))
    return cache.astype(dtype)


def term_weight(idf, boost: float = 1.0,
                params: BM25Params = BM25Params(), dtype=np.float32):
    """boost * idf * (k1+1), left-associated — Lucene's weight; the oracle
    uses the identical float32 expression so scores are bit-identical."""
    return dtype(dtype(boost) * idf * dtype(params.k1 + 1.0))


def score_postings(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    weight,
    norm_cache: np.ndarray,
) -> np.ndarray:
    """Vectorized per-posting BM25 contribution: weight * tf/(tf+cache[norm]),
    in the cache's dtype (float32 = Lucene mode, float64 = SQL-oracle mode)."""
    tf = tfs.astype(norm_cache.dtype)
    c = norm_cache[norm_bytes]
    return weight * (tf / (tf + c))


def max_block_score(
    block_max_tf: np.ndarray,
    block_min_norm: np.ndarray,
    weight: np.float32,
    norm_cache: np.ndarray,
) -> np.ndarray:
    """Per-block score upper bound (block-max metadata): tf at its block max,
    norm at its block min (shortest doc) -> max possible contribution."""
    return score_postings(block_max_tf, block_min_norm.astype(np.int64), weight,
                          norm_cache)
