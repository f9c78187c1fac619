"""Document repetition statistics — training-data quality signals.

The Gopher rules (Rae et al. 2021, "Scaling Language Models", table A1) and
RefinedWeb filter documents by repetition: the fraction of the document
covered by its most frequent n-gram and the fraction of duplicated n-grams.
This module computes the token-level variants over a Ray Dataset, one
vectorized pass per batch, no shuffle (map-only — every doc is scored
independently, the 100-TB shape is embarrassingly parallel):

- ``top_bigram_frac``: occurrences of the most frequent bigram / total
  bigram positions (0 when the doc has < 2 tokens)
- ``dup_trigram_frac``: fraction of trigram positions whose trigram occurs
  more than once in the doc

Tokens are RAW whitespace tokens (the quality literature operates on words,
not analyzer output); pair with textstats.stats for the analyzed variants.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _doc_repetition(tokens: list) -> tuple:
    n = len(tokens)
    if n < 2:
        return 0.0, 0.0
    # bigrams: most-frequent count over n-1 positions
    big = pd.Series([f"{a} {b}" for a, b in zip(tokens, tokens[1:])])
    top_bi = big.value_counts().iloc[0] / (n - 1)
    if n < 3:
        return float(top_bi), 0.0
    tri = pd.Series([f"{a} {b} {c}" for a, b, c in
                     zip(tokens, tokens[1:], tokens[2:])])
    counts = tri.map(tri.value_counts())
    dup_tri = float((counts > 1).sum()) / (n - 2)
    return float(top_bi), dup_tri


def repetition_stats(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """(id, n_tokens, top_bigram_frac, dup_trigram_frac) per document."""

    def batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        toks = pc.split_pattern_regex(t.column(text_col), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lists = toks.to_pylist()
        top_bi = np.empty(len(lists), np.float64)
        dup_tri = np.empty(len(lists), np.float64)
        n_tok = np.empty(len(lists), np.int64)
        for i, tk in enumerate(lists):
            tk = [w for w in tk if w]
            n_tok[i] = len(tk)
            top_bi[i], dup_tri[i] = _doc_repetition(tk)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok),
            "top_bigram_frac": pa.array(top_bi),
            "dup_trigram_frac": pa.array(dup_tri),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
