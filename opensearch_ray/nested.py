"""Nested fields: list<struct> columns + block-join query/agg semantics.

Reference: nested documents are indexed as hidden child Lucene docs adjacent
to their parent, and `nested` queries block-join them back
(server/index/query/NestedQueryBuilder.java, ToParentBlockJoinQuery;
mapper/ObjectMapper nested=true). The Ray-Data-native shape keeps children
INLINE as a ``list<struct>`` column — the columnar equivalent of the doc
block — and evaluates inner predicates VECTORIZED over the flattened child
table, reducing child hits back to parents through the list offsets (the
block-join), all inside ``map_batches``.

- :func:`nest_children`   parent ⟵ groupby-collected child rows (one shuffle)
- :func:`nested_filter`   `nested` query: parent survives if ANY child
                          matches (score_mode is count-agnostic here)
- :func:`nested_flat_agg` `nested` aggregation context: explode children of
                          (optionally pre-filtered) parents for child-level
                          aggs
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from opensearch_ray.arrowutil import nometa


def nest_children(parent_ds: Dataset, child_ds: Dataset, parent_key: str,
                  child_key: str, child_cols: Sequence[str],
                  list_col: str = "children", B: int = 32) -> Dataset:
    """Attach each parent's child rows as a ``list<struct>`` column: bucket
    both sides on hash(key) % B (one co-partitioning shuffle), build the
    lists per bucket with a vectorized sort + offsets split. Parents with no
    children get an empty list."""

    def pad_parent(t: pa.Table) -> pa.Table:
        k = t.column(parent_key).to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(k.astype(object)) % np.uint64(B)).astype(np.int64)
        t = t.append_column("_bucket", pa.array(b))
        return nometa(t.append_column("_is_child",
                                      pa.array(np.zeros(t.num_rows, np.int8))))

    child_struct_cols = [c for c in child_cols if c != child_key]

    def pad_child(t: pa.Table) -> pa.Table:
        k = t.column(child_key).to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(k.astype(object)) % np.uint64(B)).astype(np.int64)
        cols = {parent_key: t.column(child_key)}
        for c in child_struct_cols:
            cols["_c_" + c] = t.column(c)
        out = pa.table(cols)
        out = out.append_column("_bucket", pa.array(b))
        return out.append_column("_is_child", pa.array(np.ones(t.num_rows, np.int8)))

    parent_schema = parent_ds.schema()
    parent_names = list(parent_schema.names)

    # union needs identical schemas: give parents null child cols and
    # children null parent cols
    child_schema = child_ds.schema()
    ctypes = {n: t for n, t in zip(child_schema.names, child_schema.types)}
    ptypes = {n: t for n, t in zip(parent_schema.names, parent_schema.types)}

    def pad_p(t: pa.Table) -> pa.Table:
        t = pad_parent(t)
        for c in child_struct_cols:
            t = t.append_column("_c_" + c, pa.nulls(t.num_rows, ctypes[c]))
        order = parent_names + ["_c_" + c for c in child_struct_cols] + \
            ["_bucket", "_is_child"]
        return t.select(order)

    def pad_c(t: pa.Table) -> pa.Table:
        t = pad_child(t)
        for c in parent_names:
            if c != parent_key:
                t = t.append_column(c, pa.nulls(t.num_rows, ptypes[c]))
        order = parent_names + ["_c_" + c for c in child_struct_cols] + \
            ["_bucket", "_is_child"]
        return t.select(order)

    both = (parent_ds.map_batches(pad_p, batch_format="pyarrow")
            .union(child_ds.map_batches(pad_c, batch_format="pyarrow")))

    def assemble(g: pa.Table) -> pa.Table:
        is_child = g.column("_is_child").to_numpy(zero_copy_only=False) == 1
        parents = g.filter(pa.array(~is_child)).select(parent_names)
        children = g.filter(pa.array(is_child))
        pk = parents.column(parent_key).to_numpy(zero_copy_only=False)
        ck = children.column(parent_key).to_numpy(zero_copy_only=False)
        p_order = np.argsort(pk, kind="stable")
        c_order = np.argsort(ck, kind="stable")
        parents = parents.take(pa.array(p_order))
        children = children.take(pa.array(c_order))
        pk_s, ck_s = pk[p_order], ck[c_order]
        # per-parent child counts -> list offsets; orphan children (no parent
        # row) are dropped, matching the hidden-child-doc model
        counts = np.zeros(len(pk_s), dtype=np.int64)
        if len(ck_s):
            pos = np.searchsorted(pk_s, ck_s)
            posc = np.clip(pos, 0, max(len(pk_s) - 1, 0))
            valid = (pk_s[posc] == ck_s) if len(pk_s) else np.zeros(
                len(ck_s), dtype=bool)
            if not valid.all():
                children = children.filter(pa.array(valid))
                ck_s = ck_s[valid]
                posc = posc[valid]
            np.add.at(counts, posc, 1)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [children.column("_c_" + c).combine_chunks()
             for c in child_struct_cols],
            names=child_struct_cols)
        lists = pa.ListArray.from_arrays(pa.array(offsets), struct)
        return parents.append_column(list_col, lists)

    return both.groupby("_bucket").map_groups(assemble, batch_format="pyarrow")


def _flatten(t: pa.Table, list_col: str):
    col = t.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.flatten()  # StructArray of children
    names = [f.name for f in flat.type]
    child_tbl = pa.table({n: flat.field(n) for n in names})
    return child_tbl, offsets


def nested_filter(ds: Dataset, list_col: str,
                  predicate: Callable[[pa.Table], pa.Array]) -> Dataset:
    """`nested` query: keep parents where ANY child satisfies ``predicate``
    (a vectorized Arrow predicate over the FLATTENED child table). The
    child->parent reduction is a segmented any() over the list offsets —
    the ToParentBlockJoinQuery in columnar form."""

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        child_tbl, offsets = _flatten(t, list_col)
        if child_tbl.num_rows == 0:
            return t.slice(0, 0)
        m = pc.fill_null(pc.cast(predicate(child_tbl), pa.bool_()),
                         False).to_numpy(zero_copy_only=False).astype(bool)
        csum = np.concatenate(([0], np.cumsum(m.astype(np.int64))))
        per_parent = csum[offsets[1:]] - csum[offsets[:-1]]
        return t.filter(pa.array(per_parent > 0))

    return ds.map_batches(filt, batch_format="pyarrow")


def nested_flat_agg(ds: Dataset, list_col: str,
                    parent_cols: Optional[List[str]] = None) -> Dataset:
    """`nested` aggregation context: one row per CHILD, carrying the chosen
    parent columns — downstream aggs then run over child rows."""
    parent_cols = parent_cols or []

    def explode(t: pa.Table) -> pa.Table:
        child_tbl, offsets = _flatten(t, list_col)
        n_per = np.diff(offsets)
        cols = dict(zip(child_tbl.column_names, child_tbl.columns))
        for c in parent_cols:
            vals = t.column(c).combine_chunks() if isinstance(
                t.column(c), pa.ChunkedArray) else t.column(c)
            cols[c] = vals.take(pa.array(np.repeat(
                np.arange(t.num_rows, dtype=np.int64), n_per)))
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def nested_inner_hits(ds: Dataset, list_col: str,
                      predicate: Callable[[pa.Table], pa.Array],
                      parent_cols: Sequence[str], size: int = 3,
                      sort_col: Optional[str] = None) -> Dataset:
    """inner_hits on a `nested` query (NestedQueryBuilder.innerHit;
    search/fetch/subphase/InnerHitsPhase.java, InnerHitBuilder
    DEFAULT_SIZE=3): for every parent with >= 1 matching child, the top
    ``size`` MATCHING children — in list order by default (the indexed doc
    order, the reference's _doc tiebreak in filter context) or ordered by
    a child field when ``sort_col`` is given (InnerHitBuilder.setSort).

    Exploded layout: one row per inner hit = the child struct fields +
    ``parent_cols`` + ``_inner_rank`` (1-based within the parent) — group by
    the parent key downstream to reassemble hits.hits[n].inner_hits."""

    def inner(t: pa.Table) -> pa.Table:
        child_tbl, offsets = _flatten(t, list_col)
        names = child_tbl.column_names

        def empty() -> pa.Table:
            cols = {n: child_tbl.column(n).slice(0, 0) for n in names}
            for c in parent_cols:
                cols[c] = t.column(c).slice(0, 0)
            cols["_inner_rank"] = pa.array([], pa.int64())
            return pa.table(cols)

        if child_tbl.num_rows == 0:
            return empty()
        m = pc.fill_null(pc.cast(predicate(child_tbl), pa.bool_()),
                         False).to_numpy(zero_copy_only=False).astype(bool)
        if not m.any():
            return empty()
        parent_of = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                              np.diff(offsets))
        midx = np.flatnonzero(m)
        keys = parent_of[midx]
        if sort_col is not None:
            vals = child_tbl.column(sort_col) \
                .to_numpy(zero_copy_only=False)[midx]
            order = np.lexsort((vals, keys))
        else:
            order = np.arange(midx.size)  # list order IS doc order
        keys_s = keys[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], keys_s[1:] != keys_s[:-1])))
        seg_len = np.diff(np.concatenate((starts, [keys_s.size])))
        rank = np.arange(keys_s.size, dtype=np.int64) - np.repeat(
            starts, seg_len)
        keep = rank < size
        idx = midx[order[keep]]
        out = {n: child_tbl.column(n).take(pa.array(idx)) for n in names}
        for c in parent_cols:
            col = t.column(c)
            col = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
            out[c] = col.take(pa.array(parent_of[idx]))
        out["_inner_rank"] = pa.array(rank[keep] + 1)
        return pa.table(out)

    return ds.map_batches(inner, batch_format="pyarrow")


def nested_sort_key(ds: Dataset, list_col: str, field: str,
                    predicate: Optional[Callable[[pa.Table], pa.Array]]
                    = None, mode: Optional[str] = None,
                    order: str = "asc",
                    key_col: str = "_nested_sort") -> Dataset:
    """Per-parent sort key over a nested field — the `nested` context on a
    field sort (server/search/sort/FieldSortBuilder.java:122 nestedSort,
    NestedSortBuilder.java): reduce each parent's children MATCHING the
    nested filter to one value via ``mode`` (min/max/sum/avg/median;
    default min for asc, max for desc — the reference's defaultOrder), as
    a new float64 column. Parents with no matching children get null
    (``missing: _last`` downstream). All segmented-reduce vectorized
    inside ``map_batches`` — children never shuffle."""
    if mode is None:
        mode = "min" if order == "asc" else "max"
    if mode not in ("min", "max", "sum", "avg", "median"):
        raise ValueError(f"unsupported nested sort mode: {mode}")

    def add_key(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(key_col, pa.array([], pa.float64()))
        child_tbl, offsets = _flatten(t, list_col)
        vals = child_tbl.column(field).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if predicate is not None and child_tbl.num_rows:
            m = pc.fill_null(pc.cast(predicate(child_tbl), pa.bool_()),
                             False).to_numpy(zero_copy_only=False) \
                .astype(bool)
        else:
            m = np.ones(child_tbl.num_rows, bool)
        m &= ~np.isnan(vals)
        parent_of = np.repeat(np.arange(n, dtype=np.int64),
                              np.diff(offsets))
        keys = np.full(n, np.nan)
        midx = np.flatnonzero(m)
        if midx.size:
            p, v = parent_of[midx], vals[midx]
            o = np.lexsort((v, p))
            p_s, v_s = p[o], v[o]
            starts = np.flatnonzero(np.concatenate(
                ([True], p_s[1:] != p_s[:-1])))
            sizes = np.diff(np.append(starts, p_s.size))
            if mode == "min":
                red = v_s[starts]  # sorted within parent
            elif mode == "max":
                red = v_s[starts + sizes - 1]
            elif mode == "sum":
                red = np.add.reduceat(v_s, starts)
            elif mode == "avg":
                red = np.add.reduceat(v_s, starts) / sizes
            else:  # median over the sorted segment
                lo = starts + (sizes - 1) // 2
                hi = starts + sizes // 2
                red = (v_s[lo] + v_s[hi]) / 2.0
            keys[p_s[starts]] = red
        return t.append_column(
            key_col, pa.array(keys, pa.float64(), from_pandas=True))

    return ds.map_batches(add_key, batch_format="pyarrow")


def nested_field_sort(ds: Dataset, list_col: str, field: str,
                      predicate: Optional[Callable[[pa.Table], pa.Array]]
                      = None, mode: Optional[str] = None,
                      order: str = "asc", missing: str = "_last",
                      key_col: str = "_nested_sort") -> Dataset:
    """Sort parents by a nested-field reduce (FieldSortBuilder with a
    NestedSortBuilder): attaches the per-parent key, places missing
    parents per ``missing`` (_first/_last), then one distributed
    ``Dataset.sort`` on the key. The returned dataset keeps ``key_col``
    so callers can page on it (search_after over the nested key)."""
    keyed = nested_sort_key(ds, list_col, field, predicate=predicate,
                            mode=mode, order=order, key_col=key_col)
    desc = order == "desc"
    sentinel = (np.inf if (missing == "_last") != desc else -np.inf)

    def place_missing(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        k = np.where(np.isnan(k), sentinel, k)
        i = t.schema.get_field_index(key_col)
        return t.set_column(i, key_col, pa.array(k))

    return (keyed.map_batches(place_missing, batch_format="pyarrow")
            .sort(key_col, descending=desc))


def reverse_nested_agg(ds: Dataset, list_col: str, child_key: str,
                       parent_key: str) -> Dataset:
    """`reverse_nested` aggregation
    (server/.../bucket/nested/ReverseNestedAggregator.java): bucket by a
    CHILD field, then step back out of the nested scope — each bucket's
    doc_count is the number of PARENT docs with at least one child in the
    bucket (not the child count the plain nested agg reports).

    Distributed shape: all children of a parent live in that parent's block
    (the _flatten explode never splits a row), so a per-block
    (child_key, parent_key) dedup yields GLOBALLY unique pairs; the only
    shuffle is the final small groupby over child_key partial counts."""

    flat = nested_flat_agg(ds, list_col, parent_cols=[parent_key])

    def parent_partial(t: pa.Table) -> pa.Table:
        pairs = t.select([child_key, parent_key]).group_by(
            [child_key, parent_key]).aggregate([])
        return (pairs.group_by([child_key])
                .aggregate([([], "count_all")])
                .rename_columns([child_key, "doc_count"]))

    from ray.data.aggregate import Sum
    return (flat.map_batches(parent_partial, batch_format="pyarrow")
            .groupby(child_key)
            .aggregate(Sum("doc_count", alias_name="doc_count")))
