"""Text analysis for training-data pipelines: language id, quality scoring,
token counting, document fingerprinting."""

from .stats import (
    token_counts, quality_scores, langid_heuristic, fingerprints,
)

__all__ = ["token_counts", "quality_scores", "langid_heuristic", "fingerprints"]
