"""Per-document text statistics, all vectorized map_batches stages.

- token_counts: whitespace tokens + a BPE-ish subword regex count (the
  reference's ``token_count`` field type, modules/mapper-extras).
- quality_scores: length / punctuation / stopword-ratio heuristics.
- langid_heuristic: character-n-gram stopword-profile language guesser
  (en/de/fr/es + CJK by script) — a deterministic heuristic, not a model.
- fingerprints: the reference's ``fingerprint`` analyzer output (lowercase,
  unique, sort, join — modules/analysis-common FingerprintAnalyzer).
"""

from __future__ import annotations

import re
import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..analysis.stopwords import ENGLISH_STOP_WORDS

_BPE_ISH = re.compile(r"\w+|[^\w\s]")
_PUNCT = re.compile(r"[^\w\s]")

_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "por", "que", "con"},
}
_CJK_RE = re.compile(r"[㐀-䶿一-鿿豈-﫿]")


def token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append whitespace_tokens + subword_tokens (int32) columns."""

    def add(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ws = np.fromiter((len((s or "").split()) for s in texts),
                         dtype=np.int32, count=len(texts))
        sub = np.fromiter((len(_BPE_ISH.findall(s or "")) for s in texts),
                          dtype=np.int32, count=len(texts))
        return (t.append_column("whitespace_tokens", pa.array(ws))
                 .append_column("subword_tokens", pa.array(sub)))

    return ds.map_batches(add, batch_format="pyarrow")


def quality_scores(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    quality (a simple composite in [0,1])."""

    def add(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, np.int32)
        mean_len = np.zeros(n, np.float64)
        punct = np.zeros(n, np.float64)
        stop = np.zeros(n, np.float64)
        for i, s in enumerate(texts):
            s = s or ""
            toks = s.split()
            n_tok[i] = len(toks)
            if toks:
                mean_len[i] = sum(len(w) for w in toks) / len(toks)
                stop[i] = sum(w.lower() in ENGLISH_STOP_WORDS for w in toks) / len(toks)
            if s:
                punct[i] = len(_PUNCT.findall(s)) / len(s)
        quality = np.clip(
            (np.clip(n_tok / 20.0, 0, 1)            # enough words
             * (1.0 - np.clip(punct * 3, 0, 1))      # not mostly punctuation
             * np.clip(1.0 - np.abs(stop - 0.4), 0, 1)),  # natural stopword rate
            0, 1)
        return (t.append_column("n_tokens", pa.array(n_tok))
                 .append_column("mean_token_len", pa.array(mean_len))
                 .append_column("punct_ratio", pa.array(punct))
                 .append_column("stopword_ratio", pa.array(stop))
                 .append_column("quality", pa.array(quality)))

    return ds.map_batches(add, batch_format="pyarrow")


def langid_heuristic(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append a predicted_lang column (stopword-profile voting; `und` when no
    profile hits; CJK script short-circuits to `zh`)."""

    def add(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        out = []
        for s in texts:
            s = s or ""
            if _CJK_RE.search(s):
                out.append("zh")
                continue
            toks = set(w.lower() for w in s.split())
            scores = {lg: len(toks & prof) for lg, prof in _PROFILES.items()}
            best = max(scores, key=lambda lg: (scores[lg], lg))
            out.append(best if scores[best] > 0 else "und")
        return t.append_column("predicted_lang", pa.array(out, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def fingerprints(ds: Dataset, text_col: str = "text") -> Dataset:
    """Append the fingerprint-analyzer output: lowercase, split, unique, sort,
    space-join (+ a stable 64-bit hash of it)."""

    def add(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        fps = [" ".join(sorted(set((s or "").lower().split()))) for s in texts]
        h = pd.util.hash_array(np.asarray(fps, dtype=object)).astype(np.int64)
        return (t.append_column("fingerprint", pa.array(fps, pa.string()))
                 .append_column("fingerprint_hash", pa.array(h)))

    return ds.map_batches(add, batch_format="pyarrow")
