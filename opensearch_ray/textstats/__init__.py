"""Text analysis for training-data pipelines: language id, quality scoring,
token counting, document fingerprinting."""

from .stats import (
    token_counts, quality_scores, langid_heuristic, fingerprints,
)
from .dsir import dsir_log_weights, dsir_select, hashed_ngram_counts
from .nbayes import nb_predict, nb_train
from .bpe import apply_bpe, bpe_token_counts, bpe_train

__all__ = ["token_counts", "quality_scores", "langid_heuristic",
           "fingerprints", "dsir_log_weights", "dsir_select",
           "hashed_ngram_counts", "nb_train", "nb_predict",
           "bpe_train", "bpe_token_counts", "apply_bpe"]
