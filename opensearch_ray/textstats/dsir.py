"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

Selects raw-corpus documents that look like a TARGET distribution by
importance weighting in a hashed n-gram feature space:

    log w(d) = sum_{g in grams(d)} [ ln p_target(b(g)) - ln q_raw(b(g)) ]

where grams = word unigrams + bigrams, b() hashes a gram into one of
``buckets`` cells, and p / q are Laplace-smoothed bag-of-hashed-ngram
bucket models fit on the target subset and the whole raw corpus
respectively.  High log w = "looks like the target"; DSIR keeps the
top-k (the paper's ranked variant; Gumbel-noise resampling is a
seed-parameterised option).

Hash (reproducible in SQL for the oracle): per token a rolling
polynomial over unicode codepoints, ``acc = (acc*31 + cp) % 1000003``;
bigram = ``(h1*8191 + h2) % 1000003``; bucket = ``h % buckets``.

Scale shape (100 TB): pass 1 emits per-block NONZERO (bucket, count)
pairs — bounded by ``buckets``, never the corpus — reduced in ONE
remote task (no groupby shuffle, no driver bytes); the log-likelihood-
ratio vector (``buckets`` float64s) broadcasts via ``ray.put``; pass 2
is map-only (flat codepoint arrays, vectorised rolling hash over char
positions, ``np.bincount`` per-doc sums).  Selection is per-block
top-k partials merged k-bounded on the driver.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

_M = 1000003        # rolling-hash modulus (prime, fits 31*M+cp in int64)
_BI = 8191          # bigram combiner multiplier


def _token_hashes(texts) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token rolling hashes for all docs, vectorised.

    Returns (hash int64 per token, doc_index int64 per token); empty
    tokens (split artifacts) are dropped.
    """
    n = len(texts)
    toks: list = []
    doc_lens = np.empty(n, np.int64)
    for i, t in enumerate(texts):
        w = [x for x in t.split(" ") if x]
        toks.extend(w)
        doc_lens[i] = len(w)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), doc_lens)
    if not toks:
        return np.empty(0, np.int64), doc_of
    codes = np.frombuffer("".join(toks).encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    lens = np.fromiter((len(t) for t in toks), np.int64, count=len(toks))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    acc = np.zeros(len(toks), np.int64)
    for p in range(int(lens.max())):
        m = lens > p
        acc[m] = (acc[m] * 31 + codes[starts[m] + p]) % _M
    return acc, doc_of


def _gram_buckets(texts, buckets: int) -> Tuple[np.ndarray, np.ndarray]:
    """(bucket id, doc index) for every unigram + bigram feature."""
    h, doc_of = _token_hashes(texts)
    uni = h % buckets
    same = doc_of[:-1] == doc_of[1:] if h.size > 1 \
        else np.empty(0, bool)
    bi = ((h[:-1][same] * _BI + h[1:][same]) % _M) % buckets
    return (np.concatenate((uni, bi)),
            np.concatenate((doc_of, doc_of[:-1][same])))


def hashed_ngram_counts(ds: Dataset, text_col: str = "text",
                        buckets: int = 4096):
    """Pass 1: bag-of-hashed-ngram bucket counts over ``ds``.

    Returns a ray.ObjectRef of a dense int64 array of length
    ``buckets`` (per-block nonzero partials, one remote reduce).
    """
    def partial(t: pa.Table) -> pa.Table:
        b, _ = _gram_buckets(t.column(text_col).to_pylist(), buckets)
        cnt = np.bincount(b, minlength=buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def reduce(*tbls):
        dense = np.zeros(buckets, np.int64)
        for t in tbls:
            if t.num_rows:
                np.add.at(dense,
                          t.column("bucket").to_numpy(zero_copy_only=False),
                          t.column("cnt").to_numpy(zero_copy_only=False))
        return dense

    return reduce.remote(*parts.to_arrow_refs())


def dsir_log_weights(raw: Dataset, target: Dataset,
                     text_col: str = "text", buckets: int = 4096,
                     alpha: float = 1.0) -> Dataset:
    """Append ``dsir_logw`` to ``raw``: the DSIR importance log-weight
    of each doc under (target || raw) hashed-ngram models."""
    tgt_ref = hashed_ngram_counts(target, text_col, buckets)
    raw_ref = hashed_ngram_counts(raw, text_col, buckets)

    @ray.remote
    def llr_of(tc, rc):
        lt = np.log((tc + alpha) / (tc.sum() + alpha * buckets))
        lr = np.log((rc + alpha) / (rc.sum() + alpha * buckets))
        return lt - lr

    llr_ref = llr_of.remote(tgt_ref, raw_ref)

    def score(t: pa.Table) -> pa.Table:
        llr = ray.get(llr_ref)          # plasma zero-copy per task
        b, doc_of = _gram_buckets(t.column(text_col).to_pylist(), buckets)
        w = np.bincount(doc_of, weights=llr[b], minlength=t.num_rows)
        return t.append_column("dsir_logw", pa.array(w))

    return raw.map_batches(score, batch_format="pyarrow")


def dsir_select(scored: Dataset, k: int, id_col: str = "doc_id",
                seed: Optional[int] = None) -> "pa.Table":
    """Top-k selection by ``dsir_logw`` (desc, id asc tie-break).

    ``seed`` switches to the paper's Gumbel-top-k resampling without
    replacement: rank by logw + Gumbel(0,1) noise keyed
    deterministically on (seed, doc id), so results are stable across
    runs and partitionings.  Per-block partial top-k, k-bounded merge.
    """
    def partial(t: pa.Table) -> pa.Table:
        w = t.column("dsir_logw").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if seed is not None:
            import pandas as pd
            h = pd.util.hash_array(
                ids.astype(np.uint64) * np.uint64(2654435761)
                + np.uint64(seed))
            unif = (h.astype(np.float64) + 0.5) / 2.0 ** 64
            w = w - np.log(-np.log(unif))
        take = min(k, w.size)
        idx = np.lexsort((ids, -w))[:take]
        return pa.table({id_col: pa.array(ids[idx]),
                         "dsir_logw": pa.array(w[idx])})

    parts = scored.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    tbl = pa.concat_tables([t for t in ray.get(parts) if t.num_rows])
    w = tbl.column("dsir_logw").to_numpy(zero_copy_only=False)
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    idx = np.lexsort((ids, -w))[:k]
    return pa.table({id_col: pa.array(ids[idx]),
                     "dsir_logw": pa.array(w[idx])})
