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


def dedup_exact(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                P: int = 64) -> Dataset:
    """Keep the lowest ``id_col`` row per distinct ``text_col`` value.

    Shuffle key = hash(content-hash) % ``P`` — a LOW-CARDINALITY uniform
    partition instead of a groupby over millions of distinct hashes (the
    full-key sort at corpus scale leaks per-partition sub-blocks into
    the driver; measured 1.3 GB at 1M docs before this change). Each
    partition resolves keep-first locally with a vectorized pandas
    dedup; hash collisions are disambiguated on the actual text."""
    hashed = content_hashes(ds, text_col)

    def add_part(t: pa.Table) -> pa.Table:
        h = t.column("_content_hash").to_numpy(zero_copy_only=False)
        return t.append_column(
            "_dpart", pa.array((h.astype(np.uint64) % np.uint64(P))
                               .astype(np.int32)))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(id_col, kind="mergesort")
                 .drop_duplicates(subset=[text_col], keep="first")
                 .drop(columns=["_content_hash", "_dpart"]))

    return (hashed.map_batches(add_part, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_dpart").map_groups(keep_first,
                                          batch_format="pandas"))
