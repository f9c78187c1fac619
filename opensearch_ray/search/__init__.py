"""Query engine: BM25 scoring, term/match/bool queries, top-k merge."""

from .bm25 import BM25Params, bm25_idf, make_norm_cache
from .searcher import Searcher, SearchHit
from .oracle import BruteForceOracle
from .cluster import SearchCluster
from .multifield import MultiFieldSearcher, build_multi_field_index
from .queries import (exists_docs, expand_regexp, intervals_docs,
                      match_bool_prefix_docs, regexp_docs, span_first_docs,
                      span_not_docs, span_or_docs, terms_set_docs)

__all__ = ["BM25Params", "bm25_idf", "make_norm_cache", "Searcher", "SearchHit",
           "BruteForceOracle", "SearchCluster", "MultiFieldSearcher",
           "build_multi_field_index", "exists_docs", "expand_regexp",
           "intervals_docs", "match_bool_prefix_docs", "regexp_docs",
           "span_first_docs", "span_not_docs", "span_or_docs",
           "terms_set_docs"]
