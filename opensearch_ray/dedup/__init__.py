"""Deduplication for training-data pipelines: exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

The reference's own surface is exact `_id` overwrite (LiveVersionMap) plus the
`min_hash` token filter / `fingerprint` analyzer
(modules/analysis-common/MinHashTokenFilterFactory.java); these generalize
that to corpus-level dedup, the core extra operators a 100 TB training-data
engine needs.
"""

from .exact import dedup_exact, content_hashes
from .minhash import minhash_signatures, lsh_candidate_pairs, minhash_dedup_pairs
from .simhash import simhash_values, simhash_dedup_pairs
from .ngram import ngram_jaccard_pairs
from .embed import embedding_dedup_pairs
from .substring import duplicated_window_stats, decontaminate
from .semantic import semantic_dedup
from .lines import line_dedup

__all__ = [
    "dedup_exact", "content_hashes",
    "minhash_signatures", "lsh_candidate_pairs", "minhash_dedup_pairs",
    "simhash_values", "simhash_dedup_pairs",
    "ngram_jaccard_pairs", "embedding_dedup_pairs",
    "duplicated_window_stats", "decontaminate", "semantic_dedup",
    "line_dedup",
]
