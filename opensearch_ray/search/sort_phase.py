"""Sort phase: field sort with `missing` placement and multi-value modes,
geo_distance sort, and script sort.

Reference behavior: server/search/sort/FieldSortBuilder.java (order,
missing _first/_last/literal, sort mode min/max/sum/avg/median over
multi-valued fields), GeoDistanceSortBuilder.java (haversine meters),
ScriptSortBuilder.java (computed sort key). Doc values come from the
columnar per-segment store (Searcher.doc_values) — the sort never decodes
stored _source. The final tie-break is always `_docid` ascending, matching
the engine's (score desc, docid asc) discipline.

At scale the candidate doc-set arrives per segment; the gather below is
already per-segment, and a cluster deployment reduces per-shard top-(from+
size) partials exactly like `cluster.py` does for scores.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..aggs.geo import haversine_m
from .searcher import Searcher

_MODES: Dict[str, Callable] = {
    "min": min, "max": max,
    "sum": lambda v: float(np.sum(v)),
    "avg": lambda v: float(np.mean(v)),
    "median": lambda v: float(np.median(v)),
}


def gather_doc_values(searcher: Searcher, docids: np.ndarray,
                      field: str) -> np.ndarray:
    """Per-segment doc-values gather aligned to `docids` (any order)."""
    seg_idx = np.searchsorted(searcher._bases, docids, side="right") - 1
    out: Optional[np.ndarray] = None
    for si in np.unique(seg_idx):
        seg_id = int(searcher._seg_ids[si])
        mask = seg_idx == si
        local = docids[mask] - int(searcher._bases[si])
        vals = searcher.doc_values(seg_id, field)[local]
        if out is None:
            out = np.empty(len(docids), dtype=vals.dtype)
        out[mask] = vals
    return out if out is not None else np.empty(0, np.float64)


def _mode_reduce(vals: np.ndarray, mode: str) -> np.ndarray:
    """Multi-valued field (object array of lists) -> one sort key per doc."""
    fn = _MODES[mode]
    out = np.full(len(vals), np.nan)
    for i, v in enumerate(vals):
        if v is not None and len(v):
            out[i] = fn(np.asarray(v, dtype=np.float64))
    return out


def _sort_key(vals: np.ndarray, order: str, missing) -> np.ndarray:
    """Numeric lexsort key: desc negates; missing docs go _first/_last or
    take a literal substitute value (FieldSortBuilder missing semantics)."""
    if vals.dtype.kind == "M":                     # datetime64 -> int64 ns
        null = np.isnat(vals)
        v = vals.astype("datetime64[ns]").astype(np.int64).astype(np.float64)
    elif vals.dtype == object:                     # strings -> ordinal codes
        null = np.array([x is None for x in vals])
        uniq = np.unique(vals[~null].astype(str)) if (~null).any() else \
            np.empty(0, dtype=str)
        v = np.zeros(len(vals))
        if uniq.size:
            v[~null] = np.searchsorted(uniq, vals[~null].astype(str))
    else:
        v = vals.astype(np.float64, copy=True)
        null = np.isnan(v)
    if missing not in ("_first", "_last", None):
        v[null] = float(missing)
        null = np.zeros(len(v), dtype=bool)
    if order == "desc":
        v = -v
    # after direction flip, +inf sinks to the end of the output either way
    v[null] = np.inf if (missing or "_last") == "_last" else -np.inf
    return v


def sort_hits(searcher: Searcher, docids: Sequence[int],
              specs: Sequence[dict], size: int = 10, from_: int = 0,
              ) -> pd.DataFrame:
    """Sort a candidate doc set by a list of sort specs and return the
    [from_, from_+size) page as a DataFrame of `_docid` + `sort_i` columns
    (the original, un-negated sort values, like the hit's `sort` array).

    Spec shapes (mirroring the reference's builders):
      {"field": name, "order": "asc"|"desc", "missing": "_first"|"_last"|lit,
       "mode": "min"|"max"|"sum"|"avg"|"median"}   # mode for list fields
      {"geo_distance": {"fields": (lat_f, lon_f), "origin": (lat, lon)}}
      {"script": fn, "source_columns": [...]}      # fn(pa.Table)->values
    """
    g = np.asarray(sorted(set(int(d) for d in docids)), dtype=np.int64)
    if g.size == 0:
        cols = {"_docid": np.empty(0, np.int64)}
        cols.update({f"sort_{i}": np.empty(0) for i in range(len(specs))})
        return pd.DataFrame(cols)
    keys: List[np.ndarray] = []
    shown: List[np.ndarray] = []
    fetched: Optional[pa.Table] = None
    for spec in specs:
        order = spec.get("order", "asc")
        if "geo_distance" in spec:
            geo = spec["geo_distance"]
            lat_f, lon_f = geo["fields"]
            olat, olon = geo["origin"]
            vals = haversine_m(olat, olon,
                               gather_doc_values(searcher, g, lat_f),
                               gather_doc_values(searcher, g, lon_f))
        elif "script" in spec:
            if fetched is None:
                fetched = searcher.fetch(
                    g.tolist(), columns=spec.get("source_columns"))
            vals = np.asarray(spec["script"](fetched))
        else:
            vals = gather_doc_values(searcher, g, spec["field"])
            if spec.get("mode") and vals.dtype == object:
                vals = _mode_reduce(vals, spec["mode"])
        keys.append(_sort_key(vals, order, spec.get("missing")))
        shown.append(vals)
    # lexsort: primary = last element -> reverse spec order, docid last tie
    order_idx = np.lexsort(tuple([g] + keys[::-1]))[from_:from_ + size]
    frame = {"_docid": g[order_idx]}
    for i, vals in enumerate(shown):
        frame[f"sort_{i}"] = vals[order_idx]
    return pd.DataFrame(frame)


def geo_distance_sort(ds, lat_col: str, lon_col: str, origin, k: int,
                      id_col: str = "event_id") -> pd.DataFrame:
    """Dataset-level geo_distance sort: add haversine meters from `origin`
    per batch (vectorized), then a distributed sort + limit — the Ray-Data
    shape of GeoDistanceSortBuilder over a whole table."""
    olat, olon = origin

    def add_dist(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        return t.append_column("_distance",
                               pa.array(haversine_m(olat, olon, lat, lon)))

    rows = (ds.map_batches(add_dist, batch_format="pyarrow")
            .sort(["_distance", id_col]).limit(k).take_all())
    return pd.DataFrame(rows)[[id_col, "_distance"]]
