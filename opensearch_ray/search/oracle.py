"""Brute-force BM25 oracle — an INDEPENDENT scorer for rank-identity tests.

Mirrors the conformance idea of the reference's REST YAML golden suite
(/root/reference/rest-api-spec/src/main/resources/rest-api-spec/test/search/20_default_values.yml
et al.): index a corpus, run queries, assert exact hit lists.

This implementation shares only the analyzer and the norm-quantization /
BM25 formula DEFINITIONS with the engine — no postings, no codec, no
pruning: it scores every document with python dicts + numpy, accumulating
per-term float32 contributions in float64 (Lucene's double accumulator),
then casting to float32. ``Searcher.search`` must produce the exact same
(docid, score) sequences.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..analysis import get_analyzer
from ..index.norms import decode_norm_byte, encode_norms
from .bm25 import BM25Params


class BruteForceOracle:
    """Exact scorer over an in-memory corpus ordered the same way the index
    orders docs (global docid = position in the given table order)."""

    def __init__(self, table: pa.Table, text_col: str = "text",
                 analyzer="default", params: BM25Params = BM25Params()):
        self.params = params
        an = get_analyzer(analyzer)
        texts = table.column(text_col).to_pylist()
        self.n_docs = len(texts)
        self.doc_tfs: List[Dict[str, int]] = []
        dls = np.empty(self.n_docs, dtype=np.int64)
        self.df: Dict[str, int] = {}
        for i, s in enumerate(texts):
            toks = an.tokens(s) if s else []
            tf = Counter(toks)
            self.doc_tfs.append(dict(tf))
            dls[i] = len(toks)
            for t in tf:
                self.df[t] = self.df.get(t, 0) + 1
        self.sum_dl = int(dls.sum())
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 0.0
        # quantized doc lengths (norm byte round trip)
        self.dl_q = decode_norm_byte(encode_norms(dls)).astype(np.float64)
        self.analyzer = an

    def idf(self, term: str) -> np.float32:
        df = self.df.get(term, 0)
        return np.float32(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def search(self, query_text: str, k: int = 10, operator: str = "or",
               ) -> List[Tuple[int, float]]:
        terms = self.analyzer.tokens(query_text)
        if not terms:
            return []
        mult = Counter(terms)
        live = [t for t in mult if self.df.get(t, 0) > 0]
        if not live or (operator == "and" and len(live) < len(mult)):
            return []
        k1, b = self.params.k1, self.params.b
        acc = np.zeros(self.n_docs, dtype=np.float64)
        hit_counts = np.zeros(self.n_docs, dtype=np.int64)
        cache64 = k1 * ((1.0 - b) + b * self.dl_q / self.avgdl)
        cache = cache64.astype(np.float32)
        for t in live:
            w = np.float32(np.float32(mult[t]) * self.idf(t) * np.float32(k1 + 1.0))
            for d in range(self.n_docs):
                tf = self.doc_tfs[d].get(t)
                if tf:
                    tff = np.float32(tf)
                    contrib = np.float32(w * (tff / (tff + cache[d])))
                    acc[d] += float(contrib)
                    hit_counts[d] += 1
        mask = hit_counts >= (len(live) if operator == "and" else 1)
        docs = np.flatnonzero(mask)
        scores = acc[docs].astype(np.float32)
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return [(int(docs[i]), float(scores[i])) for i in order]
