"""Similarity search over embedding columns (ANN)."""

from .ann import brute_force_topk, lsh_topk
from .ivf import IvfIndex

__all__ = ["brute_force_topk", "lsh_topk", "IvfIndex"]
