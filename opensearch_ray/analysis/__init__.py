"""Text analysis chain: char filters -> tokenizer -> token filters.

Mirrors the reference's analysis registry
(/root/reference/server/src/main/java/org/opensearch/index/analysis/AnalysisRegistry.java
and modules/analysis-common/.../CommonAnalysisModulePlugin.java:204-411) as plain
Python registries of composable pure functions — the whole analyzer is a pure
per-batch map, applied with ``ds.map_batches(..., batch_format="pyarrow")``.
"""

from .analyzer import (
    Analyzer,
    ANALYZERS,
    get_analyzer,
    standard_analyzer,
    analyze,
    analyze_batch,
)
from .stopwords import ENGLISH_STOP_WORDS
from .tokenizers import TOKENIZERS, standard_tokenizer
from .token_filters import TOKEN_FILTERS
from .char_filters import CHAR_FILTERS

__all__ = [
    "Analyzer",
    "ANALYZERS",
    "get_analyzer",
    "standard_analyzer",
    "analyze",
    "analyze_batch",
    "ENGLISH_STOP_WORDS",
    "TOKENIZERS",
    "standard_tokenizer",
    "TOKEN_FILTERS",
    "CHAR_FILTERS",
]
