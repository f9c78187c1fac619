"""Multinomial Naive Bayes text classifier over hashed token features.

The fastText-style supervised filter every large pretraining pipeline
carries: GPT-3's WebText-vs-CommonCrawl quality classifier, CCNet's
language/quality routing, RedPajama-v2's model signals. A linear
bag-of-features classifier is exactly Multinomial NB here — trained and
applied as two map-only Ray passes, no labeled-data library needed.

Features are the SAME SQL-reproducible rolling token hash as DSIR
(``dsir._token_hashes``: acc = (acc*31 + codepoint) % 1000003 per token,
bucket = h % buckets), so the whole train+predict round-trips through a
DuckDB oracle.

Scale shape (100 TB): pass 1 emits per-block nonzero (label, bucket,
count) partials — bounded by n_classes × buckets, never the corpus —
reduced in ONE remote task (no groupby shuffle); the model (priors +
per-class log-likelihood matrix, C × buckets float64) broadcasts via
``ray.put``; pass 2 is map-only vectorized bincount + matmul per batch.

    score(d, c) = ln P(c) + Σ_{tok ∈ d} ln P(bucket(tok) | c)
    P(b|c) = (count(b,c) + α) / (count(·,c) + α·buckets)   (Laplace)

Prediction = argmax over classes, ties broken by label order (ascending,
deterministic).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .dsir import _token_hashes


def nb_train(ds: Dataset, text_col: str = "text",
             label_col: str = "lang", buckets: int = 4096,
             alpha: float = 1.0) -> "ray.ObjectRef":
    """Train: per-class hashed-unigram counts + doc priors.

    Returns an ObjectRef of a model dict {labels, logprior, loglik}
    (loglik: [n_classes, buckets] float64)."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        labels = np.asarray(t.column(label_col).to_pylist(), object)
        h, doc_of = _token_hashes([x or "" for x in texts])
        b = h % buckets
        lab_of_tok = labels[doc_of] if h.size else np.empty(0, object)
        out_lab: List[str] = []
        out_b: List[np.ndarray] = []
        out_c: List[np.ndarray] = []
        prior_lab, prior_n = np.unique(labels.astype(str),
                                       return_counts=True)
        for lab in np.unique(lab_of_tok.astype(str)) if h.size else []:
            m = lab_of_tok == lab
            cnt = np.bincount(b[m], minlength=buckets)
            nz = np.flatnonzero(cnt)
            out_lab.extend([lab] * nz.size)
            out_b.append(nz.astype(np.int64))
            out_c.append(cnt[nz].astype(np.int64))
        return pa.table({
            "label": pa.array(out_lab + prior_lab.tolist(), pa.string()),
            "bucket": pa.array(np.concatenate(
                out_b + [np.full(prior_lab.size, -1, np.int64)])
                if out_b or prior_lab.size else
                np.empty(0, np.int64)),
            "cnt": pa.array(np.concatenate(
                out_c + [prior_n.astype(np.int64)])
                if out_c or prior_lab.size else
                np.empty(0, np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def reduce(*tbls):
        tok_counts: dict = {}
        doc_counts: dict = {}
        for t in tbls:
            if not t.num_rows:
                continue
            labs = t.column("label").to_pylist()
            bks = t.column("bucket").to_numpy(zero_copy_only=False)
            cts = t.column("cnt").to_numpy(zero_copy_only=False)
            for lab, bk, c in zip(labs, bks, cts):
                if bk < 0:          # prior row (doc count)
                    doc_counts[lab] = doc_counts.get(lab, 0) + int(c)
                else:
                    dense = tok_counts.setdefault(
                        lab, np.zeros(buckets, np.int64))
                    dense[bk] += int(c)
        labels = sorted(doc_counts)
        total = sum(doc_counts.values())
        logprior = np.array([np.log(doc_counts[lb] / total)
                             for lb in labels])
        loglik = np.zeros((len(labels), buckets))
        for i, lb in enumerate(labels):
            cnt = tok_counts.get(lb, np.zeros(buckets, np.int64))
            loglik[i] = np.log((cnt + alpha)
                               / (cnt.sum() + alpha * buckets))
        return {"labels": labels, "logprior": logprior, "loglik": loglik,
                "buckets": buckets}

    return reduce.remote(*parts.to_arrow_refs())


def nb_predict(ds: Dataset, model_ref, text_col: str = "text",
               out_col: str = "nb_pred",
               score_label: Optional[str] = None,
               score_col: str = "nb_score") -> Dataset:
    """Map-only scoring: append the argmax class (ties -> first label in
    sorted order); ``score_label`` optionally appends that one class's
    raw log-score column too."""

    def score(t: pa.Table) -> pa.Table:
        model = ray.get(model_ref)      # plasma zero-copy per task
        buckets = model["buckets"]
        texts = [x or "" for x in t.column(text_col).to_pylist()]
        h, doc_of = _token_hashes(texts)
        b = h % buckets
        n = t.num_rows
        # [n_docs, buckets] sparse-as-bincount per class via weights
        scores = np.tile(model["logprior"], (n, 1))
        for i in range(len(model["labels"])):
            w = model["loglik"][i][b]
            scores[:, i] += np.bincount(doc_of, weights=w, minlength=n)
        pred_i = scores.argmax(axis=1)   # argmax takes FIRST on ties
        labels = np.asarray(model["labels"], object)
        t = t.append_column(out_col,
                            pa.array(labels[pred_i].astype(str)))
        if score_label is not None:
            si = model["labels"].index(score_label)
            t = t.append_column(score_col, pa.array(scores[:, si]))
        return t

    return ds.map_batches(score, batch_format="pyarrow")
