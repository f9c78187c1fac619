"""Exact dedup: content hash -> hash-partitioned keep-first.

Batch analogue of the reference's `_id` overwrite semantics
(InternalEngine.planIndexingAsPrimary, InternalEngine.java:1036-1105): the
first (lowest-key) doc wins; later duplicates are dropped at merge, here in
one groupby over the hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from opensearch_ray.arrowutil import nometa


def content_hashes(ds: Dataset, text_col: str = "text",
                   out_col: str = "_content_hash") -> Dataset:
    """Vectorized stable 64-bit content hash per row (pandas siphash)."""

    def add_hash(t: pa.Table) -> pa.Table:
        vals = np.asarray(t.column(text_col).to_pylist(), dtype=object)
        h = pd.util.hash_array(vals).astype(np.uint64)
        return nometa(t.append_column(out_col, pa.array(h.astype(np.int64))))

    return ds.map_batches(add_hash, batch_format="pyarrow")


def dedup_exact(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Keep the lowest ``id_col`` row per distinct ``text_col`` value.

    Shuffle key = 64-bit content hash (tiny vs full text); within-group
    keep-first is deterministic. Hash collisions are disambiguated by
    grouping on the actual text within the (tiny) group.
    """
    hashed = content_hashes(ds, text_col)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(id_col, kind="mergesort")
                 .drop_duplicates(subset=[text_col], keep="first")
                 .drop(columns=["_content_hash"]))

    return hashed.groupby("_content_hash").map_groups(keep_first, batch_format="pandas")
