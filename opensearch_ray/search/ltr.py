"""Learning-to-rank rescorer — the opensearch-learning-to-rank plugin's
`sltr` query surface (feature extraction + stored-model scoring +
feature logging), re-expressed for this engine.

Plugin shape (public repo: opensearch-project/opensearch-learning-to-rank
— LtrQueryBuilder / StoredLtrModel / LoggingSearchExtBuilder):
1. a FEATURE SET: named features, each a query or doc-value expression
   evaluated per (query, doc) pair;
2. a MODEL over the feature vector (linear / xgboost ensembles — linear
   here, Python callables for anything richer, the engine's UDF rule);
3. `sltr` runs as a RESCORER over the top window of a base query, and can
   LOG the feature matrix for offline training.

Features supported vectorized:
- ``{"bm25": query_text}``      — BM25 of a text query (float64 mode)
- ``{"field": column}``          — numeric doc-value, missing -> 0
- ``{"const": x}``               — bias column
- callables ``fn(searcher, docids) -> np.ndarray`` for anything else.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from .searcher import Searcher


def extract_features(s: Searcher, docids: np.ndarray,
                     feature_set: Dict[str, object]) -> pd.DataFrame:
    """Feature matrix for (query, doc) pairs — the feature-logging
    surface (LoggingSearchExtBuilder): one column per named feature,
    aligned to ``docids``."""
    from .sort_phase import gather_doc_values

    docids = np.asarray(docids, dtype=np.int64)
    out = {"_docid": docids}
    for name, spec in feature_set.items():
        if callable(spec):
            vals = np.asarray(spec(s, docids), dtype=np.float64)
        elif isinstance(spec, dict) and "bm25" in spec:
            hits = {h.docid: h.score
                    for h in s.search(spec["bm25"], k=len(docids),
                                      docs=np.sort(docids))}
            vals = np.array([hits.get(int(d), 0.0) for d in docids],
                            dtype=np.float64)
        elif isinstance(spec, dict) and "field" in spec:
            v = gather_doc_values(s, docids, spec["field"])
            vals = np.asarray(v, dtype=np.float64)
            vals = np.where(np.isnan(vals), 0.0, vals)
        elif isinstance(spec, dict) and "const" in spec:
            vals = np.full(len(docids), float(spec["const"]))
        else:
            raise ValueError(f"unknown feature spec for {name!r}: {spec!r}")
        out[name] = vals
    return pd.DataFrame(out)


def ltr_rescore(s: Searcher, query_text: str,
                feature_set: Dict[str, object],
                weights: Dict[str, float],
                window_size: int = 50, k: int = 10,
                log_features: bool = False):
    """`sltr` as a rescorer: take the base query's top ``window_size``
    (the QueryRescorer window discipline — the model never sees more than
    the window), score each with the linear model
    ``sum_f weights[f] * feature[f]``, return the re-ranked top ``k``
    (model score desc, docid asc). ``log_features=True`` additionally
    returns the feature matrix — the plugin's feature-logging mode."""
    base = s.search(query_text, k=window_size)
    if not base:
        empty = pd.DataFrame({"_docid": [], "ltr_score": []})
        return (empty, pd.DataFrame()) if log_features else empty
    docids = np.array([h.docid for h in base], dtype=np.int64)
    feats = extract_features(s, docids, feature_set)
    score = np.zeros(len(docids), dtype=np.float64)
    for name, w in weights.items():
        score = score + float(w) * feats[name].to_numpy()
    order = np.lexsort((docids, -score))[:k]
    out = pd.DataFrame({"_docid": docids[order],
                        "ltr_score": score[order]})
    if log_features:
        return out, feats
    return out
