"""User-extension registries — the plugin-SPI surface as plain dicts.

Ref: server/plugins/SearchPlugin.java (custom queries/aggs, consumed at
SearchModule.java:661,813), AnalysisPlugin (tokenizers/filters),
IngestPlugin. Register a callable under a name and it becomes available to
config-driven pipelines; entries are ordinary Python callables (the Painless
surface ≈ "pass a Python callable", SURVEY §2.10).
"""

from __future__ import annotations

from typing import Callable, Dict

from .analysis.analyzer import ANALYZERS
from .analysis.char_filters import CHAR_FILTERS
from .analysis.token_filters import TOKEN_FILTERS
from .analysis.tokenizers import TOKENIZERS
from .ingest.processors import PROCESSORS as INGEST_PROCESSORS

#: query-type name -> callable(searcher, **params) -> docids/hits
QUERY_TYPES: Dict[str, Callable] = {}

#: aggregation name -> callable(dataset, **params)
AGGREGATIONS: Dict[str, Callable] = {}


def register_tokenizer(name: str, fn: Callable) -> None:
    TOKENIZERS[name] = fn


def register_token_filter(name: str, fn: Callable) -> None:
    TOKEN_FILTERS[name] = fn


def register_char_filter(name: str, fn: Callable) -> None:
    CHAR_FILTERS[name] = fn


def register_analyzer(name: str, analyzer) -> None:
    ANALYZERS[name] = analyzer


def register_ingest_processor(name: str, factory: Callable) -> None:
    INGEST_PROCESSORS[name] = factory


def register_query_type(name: str, fn: Callable) -> None:
    QUERY_TYPES[name] = fn


def register_aggregation(name: str, fn: Callable) -> None:
    AGGREGATIONS[name] = fn


def _seed_builtins() -> None:
    """Expose the built-in query types / aggs through the registries."""
    from .aggs import (cardinality_exact, date_histogram_agg, histogram_agg,
                       multi_terms_agg, range_agg, stats_agg, terms_agg)
    from .search.searcher import Searcher

    QUERY_TYPES.update({
        "match": lambda s, **kw: s.search(**kw),
        "term": lambda s, term: s.term_docs(term),
        "bool": lambda s, **kw: s.bool_docs(**kw),
        "match_phrase": lambda s, text: s.match_phrase(text),
        "prefix": lambda s, prefix: s.prefix_docs(prefix),
        "wildcard": lambda s, pattern: s.wildcard_docs(pattern),
        "fuzzy": lambda s, term, **kw: s.fuzzy_docs(term, **kw),
    })
    AGGREGATIONS.update({
        "terms": terms_agg, "multi_terms": multi_terms_agg,
        "stats": stats_agg, "histogram": histogram_agg,
        "date_histogram": date_histogram_agg, "range": range_agg,
        "cardinality": cardinality_exact,
    })


_seed_builtins()
