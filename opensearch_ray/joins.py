"""Joins the Dataset API lacks: as-of, range, and partitioned hash join.

Patterns per the guide: co-partition both sides on the key with an explicit
bucket column, union them (schemas padded to the union with typed nulls),
group per bucket, and join the bucket's two sides inside ``map_groups`` —
as-of uses ``pd.merge_asof`` over (key, ts)-sorted frames. Partitioning
assumption: each bucket's pair of sides fits one worker; bucket count B is
the lever (salt hot keys into sub-buckets when a single key outgrows it).

Column conventions: join-key (and for as-of the ts column) must share names
across sides; other shared names get ``suffix`` on the right side BEFORE the
union, so schemas stay unambiguous.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from opensearch_ray.arrowutil import nometa


def _prep(left: Dataset, right: Dataset, shared: List[str], suffix: str,
          key_col: str, B: int) -> Tuple[Dataset, List[str], List[str]]:
    """Rename right-side collisions, pad both sides to the union schema with
    typed nulls, add _bucket/_side, union. Returns (union_ds, lcols, rcols)."""
    ls, rs = left.schema(), right.schema()
    lcols = list(ls.names)
    # suffix ONLY right-side names that collide with a left column (the join
    # key and, for as-of, the ts column stay shared)
    ren = {n: (n + suffix if n in lcols and n not in shared else n)
           for n in rs.names}
    rcols = [ren[n] for n in rs.names]

    def _as_pa_type(t) -> pa.DataType:
        # Dataset.schema().types may yield numpy dtypes / python classes for
        # pandas-backed datasets instead of Arrow DataTypes
        if isinstance(t, pa.DataType):
            return t
        try:
            dt = np.dtype(t)
        except TypeError:
            return pa.string()
        if dt == np.dtype(object):
            return pa.string()
        try:
            return pa.from_numpy_dtype(dt)
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    fields: Dict[str, pa.DataType] = {}
    for n, t in zip(ls.names, ls.types):
        fields[n] = _as_pa_type(t)
    for n, t in zip(rs.names, rs.types):
        fields.setdefault(ren[n], _as_pa_type(t))
    all_cols = list(fields)
    target = pa.schema([(n, fields[n]) for n in all_cols])

    def make_pad(side: str, rename: Optional[dict]):
        def pad(t: pa.Table) -> pa.Table:
            if rename:
                t = t.rename_columns([rename.get(c, c) for c in t.column_names])
            k = t.column(key_col).to_numpy(zero_copy_only=False)
            b = (pd.util.hash_array(k if k.dtype == object else k.astype(object))
                 % np.uint64(B)).astype(np.int64)
            for n in all_cols:
                if n not in t.column_names:
                    t = t.append_column(n, pa.nulls(t.num_rows, type=fields[n]))
            # cast both sides to the SAME schema so union block types agree
            t = t.select(all_cols).cast(target)
            t = t.append_column("_bucket", pa.array(b))
            return nometa(t.append_column(
                "_side", pa.array(np.full(len(b), side, dtype=object), type=pa.string())))
        return pad

    both = (left.map_batches(make_pad("l", None), batch_format="pyarrow")
            .union(right.map_batches(make_pad("r", ren), batch_format="pyarrow")))
    # pandas dtype each column must carry INSIDE per-bucket frames: the pad
    # nulls make Arrow->pandas widen int64 columns to float64 on the side
    # that lacks them — per_bucket casts its own side's columns back so the
    # joined output keeps the input dtypes (and empty groups stay typed)
    dtypes = {}
    for n, t in fields.items():
        try:
            dtypes[n] = np.dtype(t.to_pandas_dtype())
        except (TypeError, NotImplementedError):
            dtypes[n] = np.dtype(object)
    return both, lcols, rcols, dtypes


def _restore(df: pd.DataFrame, cols: List[str],
             dtypes: Dict[str, np.dtype]) -> pd.DataFrame:
    """Slice one side's columns out of a bucket frame and undo the
    nullable-int widening (the side's own columns hold no nulls)."""
    out = df[cols]
    cast = {c: dtypes[c] for c in cols
            if c in dtypes and out[c].dtype != dtypes[c]}
    return out.astype(cast) if cast else out


def asof_join(left: Dataset, right: Dataset, key_col: str, ts_col: str,
              B: int = 16, direction: str = "backward",
              suffix: str = "_r") -> Dataset:
    """For each left row: the latest right row with the same key and
    right.ts <= left.ts (direction=backward; 'forward' = earliest >=).
    ``ts_col`` must exist on both sides under the same name."""
    both, lcols, rcols, dtypes = _prep(left, right, shared=[key_col, ts_col],
                                       suffix=suffix, key_col=key_col, B=B)
    r_val_cols = [c for c in rcols if c not in (key_col, ts_col)]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = _restore(g[g["_side"] == "l"], lcols, dtypes) \
            .sort_values(ts_col, kind="mergesort")
        rf = _restore(g[g["_side"] == "r"], [key_col, ts_col] + r_val_cols,
                      dtypes).sort_values(ts_col, kind="mergesort")
        out = pd.merge_asof(lf, rf, on=ts_col, by=key_col,
                            direction=direction, suffixes=("", "_asof"))
        # left-asof misses put NaN in right value columns; pin integer right
        # columns to float64 in EVERY group so block schemas never drift
        # between all-matched and partially-matched buckets
        for c in r_val_cols:
            if np.issubdtype(dtypes.get(c, np.dtype(object)), np.integer):
                out[c] = out[c].astype(np.float64)
        return out.reset_index(drop=True)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def range_join(left: Dataset, right: Dataset, key_col: str,
               left_ts: str, right_lo: str, right_hi: str,
               B: int = 16, suffix: str = "_r") -> Dataset:
    """left row x every right row with the same key and
    right_lo <= left_ts < right_hi (interval join), per key-bucket."""
    both, lcols, rcols, dtypes = _prep(left, right, shared=[key_col],
                                       suffix=suffix, key_col=key_col, B=B)
    lo = right_lo if right_lo in rcols else right_lo + suffix
    hi = right_hi if right_hi in rcols else right_hi + suffix

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = _restore(g[g["_side"] == "l"], lcols, dtypes)
        rf = _restore(g[g["_side"] == "r"], rcols, dtypes)
        m = lf.merge(rf, on=key_col)  # typed even when a side is empty
        m = m[(m[lo] <= m[left_ts]) & (m[left_ts] < m[hi])]
        return m.reset_index(drop=True)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def hash_join(left: Dataset, right: Dataset, key_col: str, B: int = 32,
              how: str = "inner", suffix: str = "_r") -> Dataset:
    """Explicit partitioned hash join (both sides large): bucket on
    hash(key) % B, join matching buckets pairwise inside map_groups."""
    both, lcols, rcols, dtypes = _prep(left, right, shared=[key_col],
                                       suffix=suffix, key_col=key_col, B=B)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = _restore(g[g["_side"] == "l"], lcols, dtypes)
        rf = _restore(g[g["_side"] == "r"], rcols, dtypes)
        out = lf.merge(rf, on=key_col, how=how)
        if how != "inner":
            # outer misses put NaN in the other side's int columns: pin them
            # to float64 in every group so block schemas never drift
            other = (rcols if how == "left" else lcols) if how != "outer" \
                else lcols + rcols
            for c in other:
                if c != key_col and np.issubdtype(
                        dtypes.get(c, np.dtype(object)), np.integer):
                    out[c] = out[c].astype(np.float64)
        return out.reset_index(drop=True)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
