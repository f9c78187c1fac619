"""Text analysis for training-data pipelines: language id, quality scoring,
token counting, document fingerprinting."""

from .stats import (
    token_counts, quality_scores, langid_heuristic, fingerprints,
)
from .dsir import dsir_log_weights, dsir_select, hashed_ngram_counts

__all__ = ["token_counts", "quality_scores", "langid_heuristic",
           "fingerprints", "dsir_log_weights", "dsir_select",
           "hashed_ngram_counts"]
