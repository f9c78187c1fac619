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

Implementation: the whole BATCH is processed as flat arrays — tokens hash
to uint64 once (pd.util.hash_array), n-grams combine hashes with a
golden-ratio mix, and per-(doc, n-gram) counts come from one lexsort +
run-length pass with segmented np.maximum.at / np.add.at reductions. No
per-document Python objects (the earlier two-pd.Series-per-doc kernel was
~10x more constant factor on the pipeline that runs over every document).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _run_counts(doc: np.ndarray, gram: np.ndarray):
    """(run doc id, run length) for each distinct (doc, gram) pair."""
    order = np.lexsort((gram, doc))
    d, g = doc[order], gram[order]
    new = np.concatenate(([True], (d[1:] != d[:-1]) | (g[1:] != g[:-1])))
    starts = np.flatnonzero(new)
    lengths = np.diff(np.concatenate((starts, [d.size])))
    return d[starts], lengths


def repetition_stats(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """(id, n_tokens, top_bigram_frac, dup_trigram_frac) per document."""

    def batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ndocs = t.num_rows
        toks = pc.split_pattern_regex(
            pc.fill_null(t.column(text_col), ""), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = toks.flatten()
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64),
                           np.diff(offsets))
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""  # split("\\s+") yields empties at text edges
        h = pd.util.hash_array(words[keep].astype(object))
        doc_of = doc_of[keep]
        n_tok = np.bincount(doc_of, minlength=ndocs).astype(np.int64)

        top_bi = np.zeros(ndocs, np.float64)
        dup_tri = np.zeros(ndocs, np.float64)
        if h.size >= 2:
            same2 = doc_of[1:] == doc_of[:-1]
            hb_all = (h[:-1] * _MIX) ^ h[1:]
            bd, bg = doc_of[:-1][same2], hb_all[same2]
            if bd.size:
                run_doc, run_len = _run_counts(bd, bg)
                top_cnt = np.zeros(ndocs, np.int64)
                np.maximum.at(top_cnt, run_doc, run_len)
                m2 = n_tok >= 2
                top_bi[m2] = top_cnt[m2] / (n_tok[m2] - 1)
        if h.size >= 3:
            same3 = doc_of[2:] == doc_of[:-2]
            ht_all = (hb_all[:-1] * _MIX) ^ h[2:]
            td, tg = doc_of[:-2][same3], ht_all[same3]
            if td.size:
                run_doc, run_len = _run_counts(td, tg)
                dup_cnt = np.zeros(ndocs, np.int64)
                dup_runs = run_len > 1
                np.add.at(dup_cnt, run_doc[dup_runs], run_len[dup_runs])
                m3 = n_tok >= 3
                dup_tri[m3] = dup_cnt[m3] / (n_tok[m3] - 2)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok),
            "top_bigram_frac": pa.array(top_bi),
            "dup_trigram_frac": pa.array(dup_tri),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
