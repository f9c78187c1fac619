"""Exact n-gram Jaccard similarity for given / discovered pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _ngram_set(text: str, n: int) -> set:
    toks = (text or "").split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard_pairs(ds: Dataset, pairs: pd.DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.0) -> pd.DataFrame:
    """Exact word-n-gram Jaccard for candidate (a, b) pairs.

    The texts of the (small) candidate id set are fetched with predicate
    pushdown and broadcast — candidates are assumed << corpus (they come from
    an LSH pass); at scale this is the broadcast-small-side join pattern.
    """
    import pyarrow.compute as pc

    if pairs.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    need = set(pairs["a"]) | set(pairs["b"])

    def pick(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column(id_col), value_set=pa.array(sorted(need)))
        return t.filter(m).select([id_col, text_col])

    small = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    texts = dict(zip(small[id_col], small[text_col]))
    sets = {i: _ngram_set(texts.get(i, ""), n) for i in need}
    jac = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sets[a], sets[b]
        u = len(sa | sb)
        jac.append(len(sa & sb) / u if u else 0.0)
    out = pairs.assign(jaccard=np.array(jac))
    out = out[out["jaccard"] >= threshold]
    return out[["a", "b", "jaccard"]].sort_values(["a", "b"]).reset_index(drop=True)
