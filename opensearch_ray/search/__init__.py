"""Query engine: BM25 scoring, term/match/bool queries, top-k merge."""

from .bm25 import BM25Params, bm25_idf, make_norm_cache
from .searcher import Searcher, SearchHit
from .oracle import BruteForceOracle
from .cluster import SearchCluster
from .multifield import MultiFieldSearcher, build_multi_field_index

__all__ = ["BM25Params", "bm25_idf", "make_norm_cache", "Searcher", "SearchHit",
           "BruteForceOracle", "SearchCluster", "MultiFieldSearcher",
           "build_multi_field_index"]
