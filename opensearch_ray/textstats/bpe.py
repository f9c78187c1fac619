"""BPE tokenizer: corpus-trained merges + token counting.

Tokenizer training is a first-class step of an LLM data pipeline (the
token budget IS the unit of account); this replaces a "BPE-ish regex"
count with a real byte-pair-encoding tokenizer (Sennrich, Haddow & Birch,
ACL 2016, arXiv:1508.07909 — the GPT-2 merge-rank application scheme).

Scale shape (100 TB):
- ``bpe_train`` counts word types on a deterministic hash-stride SAMPLE
  (tokenizers are always trained on samples): per-block (word, count)
  partials capped to the block's top types, ONE remote reduce keeping the
  global top ``max_word_types`` — the merge learner sees a bounded
  frequency table, never the corpus.
- Merge learning is vectorized: one flat int32 symbol array over all
  sampled word types, pair counts via np.unique with word-frequency
  weights, greedy left-to-right overlap resolution by run parity.
  Deterministic tie-break: (count desc, pair ids asc).
- ``bpe_token_counts`` is map-only: merges broadcast via ``ray.put``,
  each batch encodes only its UNIQUE words (memoized per batch) and
  np.bincount maps piece counts back to docs.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_EOW = "▁"          # end-of-word sentinel symbol


def _word_sample_counts(ds: Dataset, text_col: str, stride: int,
                        max_word_types: int, per_block_cap: int):
    """Per-block word counts over the hash-stride doc sample, reduced to
    the global top word types in one remote task."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        # deterministic doc sample: hash the TEXT itself (no id column
        # required), stride-selected
        h = pd.util.hash_array(np.asarray(texts, object))
        keep = np.flatnonzero(h % np.uint64(stride) == 0)
        words: List[str] = []
        for i in keep:
            words.extend(x for x in (texts[i] or "").split() if x)
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        uniq, counts = np.unique(np.asarray(words, object),
                                 return_counts=True)
        if uniq.size > per_block_cap:
            top = np.argsort(-counts, kind="stable")[:per_block_cap]
            uniq, counts = uniq[top], counts[top]
        return pa.table({"word": pa.array(uniq.astype(str)),
                         "cnt": pa.array(counts.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def reduce(*tbls):
        acc: Dict[str, int] = {}

        def prune():
            keep = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            return dict(keep[:max_word_types])

        for t in tbls:
            for w, c in zip(t.column("word").to_pylist(),
                            t.column("cnt").to_pylist()):
                acc[w] = acc.get(w, 0) + int(c)
            # crawl-scale guard: never hold more than 4x the target word
            # types (space-saving-style eviction; tail types whose global
            # count could still beat the cut are rare under Zipf and
            # irrelevant to merge learning)
            if len(acc) > 4 * max_word_types:
                acc = prune()
        if len(acc) > max_word_types:
            acc = prune()
        return acc

    return ray.get(reduce.remote(*parts.to_arrow_refs()))


def _learn_merges(word_freq: Dict[str, int], n_merges: int
                  ) -> List[Tuple[str, str]]:
    """Classic BPE merge learning, vectorized over one flat symbol array.

    Symbols start as characters + an end-of-word sentinel; each round
    merges the highest-weighted adjacent pair everywhere (greedy
    left-to-right inside overlap runs, the reference algorithm's
    behavior on e.g. 'aaa')."""
    if not word_freq:
        return []
    words = sorted(word_freq)           # deterministic layout
    sym2id: Dict[str, int] = {}
    syms: List[int] = []
    word_of: List[int] = []
    freqs = np.array([word_freq[w] for w in words], np.int64)
    for wi, w in enumerate(words):
        for ch in list(w) + [_EOW]:
            sid = sym2id.setdefault(ch, len(sym2id))
            syms.append(sid)
            word_of.append(wi)
    id2sym = {v: k for k, v in sym2id.items()}
    sym = np.asarray(syms, np.int64)
    wof = np.asarray(word_of, np.int64)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        if sym.size < 2:
            break
        adj = wof[:-1] == wof[1:]
        if not adj.any():
            break
        a, b = sym[:-1][adj], sym[1:][adj]
        S = len(sym2id)
        key = a * S + b
        w = freqs[wof[:-1][adj]]
        uniq, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=w).astype(np.int64)
        best_cnt = cnt.max()
        if best_cnt < 2:                # nothing repeats: stop
            break
        cand = uniq[cnt == best_cnt]
        bk = int(cand.min())            # tie: smallest (a, b) id pair
        ba, bb = bk // S, bk % S
        pa_, pb_ = id2sym[ba], id2sym[bb]
        merges.append((pa_, pb_))
        new_sym = pa_ + pb_
        nid = sym2id.setdefault(new_sym, len(sym2id))
        id2sym[nid] = new_sym
        # positions where (ba, bb) are adjacent within one word
        m = np.zeros(sym.size, bool)
        m[:-1] = (sym[:-1] == ba) & (sym[1:] == bb) & adj
        # greedy left-to-right overlap resolution ('aaa' + (a,a) -> one
        # merge): inside each run of consecutive matches keep every 2nd
        idx = np.flatnonzero(m)
        if idx.size == 0:
            continue
        run_start = np.concatenate(([True], np.diff(idx) != 1))
        run_id = np.cumsum(run_start) - 1
        # offset within run = position - run's first position
        first_of_run = idx[np.flatnonzero(run_start)]
        offset = idx - first_of_run[run_id]
        keep = idx[offset % 2 == 0]
        sym[keep] = nid
        drop = np.zeros(sym.size, bool)
        drop[keep + 1] = True
        sym = sym[~drop]
        wof = wof[~drop]
    return merges


def apply_bpe(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Encode one word by merge rank (the GPT-2 bpe() loop): repeatedly
    merge the lowest-ranked adjacent pair present."""
    pieces = list(word) + [_EOW]
    while len(pieces) > 1:
        best_rank, best_i = None, -1
        for i in range(len(pieces) - 1):
            r = ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pieces[best_i:best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]
    return pieces


def bpe_train(ds: Dataset, text_col: str = "text", n_merges: int = 512,
              stride: int = 1, max_word_types: int = 65536,
              per_block_cap: int = 65536) -> "ray.ObjectRef":
    """Learn a BPE merge list from a hash-stride sample of ``ds``.
    Returns an ObjectRef of the ordered merge list (broadcast handle)."""
    wf = _word_sample_counts(ds, text_col, max(1, stride),
                             max_word_types, per_block_cap)
    return ray.put(_learn_merges(wf, n_merges))


def bpe_token_counts(ds: Dataset, merges_ref, text_col: str = "text",
                     out_col: str = "bpe_tokens") -> Dataset:
    """Map-only: append the BPE token count per doc. Encoding is memoized
    over the batch's unique words — Zipf makes the cache hit rate ~95 %."""

    def count(t: pa.Table) -> pa.Table:
        merges = ray.get(merges_ref)
        ranks = {p: i for i, p in enumerate(merges)}
        texts = t.column(text_col).to_pylist()
        words: List[str] = []
        doc_lens = np.empty(len(texts), np.int64)
        for i, txt in enumerate(texts):
            ws = [x for x in (txt or "").split() if x]
            words.extend(ws)
            doc_lens[i] = len(ws)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), doc_lens)
        if words:
            arr = np.asarray(words, object)
            uniq, inv = np.unique(arr, return_inverse=True)
            pieces_per = np.array([len(apply_bpe(w, ranks)) for w in uniq],
                                  np.int64)
            per_word = pieces_per[inv]
            counts = np.bincount(doc_of, weights=per_word,
                                 minlength=len(texts)).astype(np.int64)
        else:
            counts = np.zeros(len(texts), np.int64)
        return t.append_column(out_col, pa.array(counts))

    return ds.map_batches(count, batch_format="pyarrow")
