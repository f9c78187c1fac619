"""Fetch sub-phases: _source filtering, docvalue_fields, script_fields.

Reference behavior: server/search/fetch/subphase/FetchSourcePhase.java
(_source includes/excludes wildcard patterns), FetchDocValuesPhase.java
(columnar doc-values read, no stored-source decode), ScriptFieldsPhase.java
(per-hit script outputs). Our doc store is columnar parquet, so _source
filtering is wildcard column selection and docvalue_fields is a per-segment
numpy gather that never touches the stored-fields file beyond the requested
columns.
"""
from __future__ import annotations

import fnmatch
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .searcher import Searcher


def stored_field_names(searcher: Searcher) -> List[str]:
    """Stored-fields schema from parquet footer metadata only (no data read)."""
    seg0 = searcher._seg_dir(int(searcher._seg_ids[0]))
    schema = pq.read_schema(os.path.join(seg0, "docs.parquet"))
    return [c for c in schema.names if c != "docid"]


def source_filter_columns(all_columns: Sequence[str],
                          includes: Optional[Sequence[str]] = None,
                          excludes: Optional[Sequence[str]] = None,
                          ) -> List[str]:
    """Resolve `_source: {includes, excludes}` wildcard patterns to a column
    list (FetchSourcePhase semantics: include-first, then subtract excludes;
    empty includes = everything). Order follows the stored schema."""
    cols = [c for c in all_columns if c != "_docid"]
    if includes:
        cols = [c for c in cols
                if any(fnmatch.fnmatchcase(c, p) for p in includes)]
    if excludes:
        cols = [c for c in cols
                if not any(fnmatch.fnmatchcase(c, p) for p in excludes)]
    return cols


def fetch_source(searcher: Searcher, docids: Sequence[int],
                 includes: Optional[Sequence[str]] = None,
                 excludes: Optional[Sequence[str]] = None) -> pa.Table:
    """Stored-fields fetch with _source filtering: only the resolved columns
    are read from the doc-store parquet (column pruning at the read)."""
    cols = source_filter_columns(stored_field_names(searcher),
                                 includes, excludes)
    return searcher.fetch(docids, columns=cols)


def docvalue_fields(searcher: Searcher, docids: Sequence[int],
                    fields: Sequence[str]) -> pd.DataFrame:
    """docvalue_fields: per-segment doc-values gather for the requested
    fields — no stored-source read at all (FetchDocValuesPhase). Returns one
    row per docid (sorted asc) with `_docid` + the fields."""
    g = np.asarray(sorted(set(int(d) for d in docids)), dtype=np.int64)
    out: Dict[str, list] = {f: [] for f in fields}
    ids: List[np.ndarray] = []
    if g.size:
        seg_idx = np.searchsorted(searcher._bases, g, side="right") - 1
        for si in np.unique(seg_idx):
            seg_id = int(searcher._seg_ids[si])
            base = int(searcher._bases[si])
            local = g[seg_idx == si] - base
            ids.append(local + base)
            for f in fields:
                out[f].append(searcher.doc_values(seg_id, f)[local])
    frame = {"_docid": np.concatenate(ids) if ids
             else np.empty(0, np.int64)}
    for f in fields:
        frame[f] = (np.concatenate(out[f]) if out[f]
                    else np.empty(0, np.float64))
    return pd.DataFrame(frame)


def script_fields(searcher: Searcher, docids: Sequence[int],
                  scripts: Dict[str, Callable[[pa.Table], np.ndarray]],
                  source_columns: Optional[List[str]] = None) -> pd.DataFrame:
    """script_fields: computed per-hit columns (ScriptFieldsPhase; Painless ≈
    a Python callable over the fetched Arrow table). Each callable receives
    the stored-fields table and returns one value per row."""
    t = searcher.fetch(docids, columns=source_columns)
    frame = {"_docid": t.column("_docid").to_numpy(zero_copy_only=False)}
    for name, fn in scripts.items():
        vals = np.asarray(fn(t))
        if len(vals) != t.num_rows:
            raise ValueError(f"script field {name!r}: {len(vals)} values "
                             f"for {t.num_rows} rows")
        frame[name] = vals
    return pd.DataFrame(frame)
