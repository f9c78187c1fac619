"""Similarity search over embedding columns (ANN)."""

from .ann import brute_force_topk, lsh_topk
from .hybrid import hybrid_rrf_search, hybrid_normalized_search
from .hnsw import HnswIndex
from .ivf import IvfIndex

__all__ = ["brute_force_topk", "lsh_topk", "IvfIndex", "HnswIndex",
           "hybrid_rrf_search", "hybrid_normalized_search"]
