"""Character-trigram language-model quality scoring (CCNet-shape).

CCNet (Wenzek et al., LREC 2020) filters web text by the perplexity of a
KenLM model; no pretrained LM ships in this environment, so the same
shape is built honestly: a char-trigram model TRAINED ON THE CORPUS
ITSELF (two streaming passes), scoring each doc by its mean smoothed
log-probability

    lm_score(d) = mean_i ln( (c3(tri_i) + 1) / (c2(prefix_i) + V3) )

where c3 = global trigram count, c2 = count of the trigram's 2-char
PREFIX as a context (derivable from c3 by key truncation), and V3 = the
distinct-trigram count (Laplace smoothing). Low scores = improbable
character sequences (boilerplate, encoding damage, non-language).

Scale shape (100 TB): pass 1 is map-side `np.unique` partials coalesced
to <=16 blocks and reduced in ONE remote task (vocab-bounded, never the
corpus); the model (two sorted arrays) broadcasts via `ray.put`; pass 2
is map-only — per batch, all docs flatten to one codepoint array,
trigram keys pack into uint64 (3 x 21-bit codepoints), counts come from
`searchsorted` lookups, per-doc means from segmented reductions. No
per-character Python anywhere.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

_SHIFT = 21  # max unicode codepoint 0x10FFFF < 2^21


def _flat_trigrams(texts) -> Tuple[np.ndarray, np.ndarray, int]:
    """All docs' trigram keys in one flat array.

    Returns (keys uint64, doc_index per trigram, n_docs)."""
    n = len(texts)
    joined = "".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    if codes.size < 3:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n
    keys = ((codes[:-2] << np.uint64(2 * _SHIFT))
            | (codes[1:-1] << np.uint64(_SHIFT)) | codes[2:])
    valid = doc_of[:-2] == doc_of[2:]  # window stays inside one doc
    return keys[valid], doc_of[:-2][valid], n


def train_char_trigram_model(ds: Dataset, text_col: str = "text"):
    """Pass 1: corpus trigram counts -> broadcast handle
    (ray.ObjectRef of (sorted keys uint64, counts int64))."""
    def partial(t: pa.Table) -> pa.Table:
        keys, _, _ = _flat_trigrams(
            t.column(text_col).to_pylist())
        u, c = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(u, pa.uint64()),
                         "cnt": pa.array(c.astype(np.int64))})

    # partials are vocab-bounded per block; ONE remote task concatenates
    # and reduces them (the keep_best object-store-coalesce discipline —
    # no groupby shuffle, no driver bytes)
    parts = ds.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def reduce(*tbls):
        tbl = pa.concat_tables([t for t in tbls if t.num_rows])
        k = tbl.column("key").to_numpy(zero_copy_only=False)
        c = tbl.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1])))
        return k[starts], np.add.reduceat(c, starts)

    return reduce.remote(*parts.to_arrow_refs())


def lm_quality_scores(ds: Dataset, model_ref=None,
                      text_col: str = "text") -> Dataset:
    """Pass 2: append ``lm_score`` (mean smoothed trigram log-prob;
    docs with <3 chars score NaN). Trains the model on ``ds`` itself
    when ``model_ref`` is None."""
    if model_ref is None:
        model_ref = train_char_trigram_model(ds, text_col)

    def score(t: pa.Table) -> pa.Table:
        keys, cnts = ray.get(model_ref)  # plasma zero-copy per task
        v3 = float(len(keys))
        # context (prefix-bigram) counts by key truncation: keys are
        # sorted, so the truncated keys stay sorted and reduce in place
        bk = keys >> np.uint64(_SHIFT)
        bs = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
        bkeys, bcnts = bk[bs], np.add.reduceat(cnts, bs)

        def lookup(sorted_keys, sorted_cnts, want):
            # unseen n-grams (foreign text) count 0 under the smoothing
            idx = np.searchsorted(sorted_keys, want)
            idx = np.minimum(idx, len(sorted_keys) - 1)
            hit = sorted_keys[idx] == want
            return np.where(hit, sorted_cnts[idx], 0)

        tri, doc_of, n = _flat_trigrams(t.column(text_col).to_pylist())
        out = np.full(n, np.nan)
        if tri.size:
            c3 = lookup(keys, cnts, tri)
            c2 = lookup(bkeys, bcnts, tri >> np.uint64(_SHIFT))
            lp = np.log((c3 + 1.0) / (c2 + v3))
            starts = np.flatnonzero(
                np.concatenate(([True], doc_of[1:] != doc_of[:-1])))
            sums = np.add.reduceat(lp, starts)
            lens = np.diff(np.concatenate((starts, [lp.size])))
            out[doc_of[starts]] = sums / lens
        return t.append_column("lm_score", pa.array(out))

    return ds.map_batches(score, batch_format="pyarrow")
