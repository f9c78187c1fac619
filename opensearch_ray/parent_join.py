"""parent-join field + has_child / has_parent / parent_id queries.

Reference: the parent-join module — ParentJoinFieldMapper.java (the `join`
field: ONE index holds both parent and child docs, children routed to the
parent's shard by the parent id), HasChildQueryBuilder.java,
HasParentQueryBuilder.java, ParentIdQueryBuilder.java; conformance
modules/parent-join/src/yamlRestTest/resources/rest-api-spec/test/
20_parent_child.yml. score_mode + min_children/max_children follow
HasChildQueryBuilder (DEFAULT_MIN_CHILDREN=0-effective-1, score mode
none/min/max/sum/avg).

Ray-Data-native shape: one Dataset whose rows carry a RELATION column (the
join-field value, e.g. "order" / "lineitem") and a JOIN-KEY column
(children store their parent's key — the reference's routing value).
has_child / has_parent co-partition the dataset by ``hash(join_key) % B``
— ONE shuffle, the same low-cardinality-bucket trick as
``nested.nest_children`` — and evaluate both sides vectorized per bucket
with numpy segmented reductions (never a per-doc loop).

Partitioning assumption (documented per the graft contract): every doc of
one join family lands in the same bucket because both sides hash the SAME
join key — each ``map_groups`` group is therefore self-contained, exactly
the reference's same-shard routing invariant. At 100 TB the bucketed
layout is a ``partition_cols=["_bucket"]`` parquet dir reused across
queries (co-locate once, join many times).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_SCORE_MODES = ("none", "sum", "min", "max", "avg")


def _with_bucket(ds: Dataset, key_col: str, B: int) -> Dataset:
    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        # int() the hash before %: np.uint64 % python-int promotes to float
        b = (pd.util.hash_array(k.astype(object)) % np.uint64(B)).astype(
            np.int64)
        return t.append_column("_bucket", pa.array(b))

    return ds.map_batches(tag, batch_format="pyarrow")


def _mask(predicate: Callable[[pa.Table], pa.Array], t: pa.Table
          ) -> np.ndarray:
    return pc.fill_null(pc.cast(predicate(t), pa.bool_()), False) \
        .to_numpy(zero_copy_only=False).astype(bool)


def has_child_filter(ds: Dataset, rel_col: str, parent_rel: str,
                     child_rel: str, key_col: str,
                     child_predicate: Callable[[pa.Table], pa.Array],
                     min_children: int = 1,
                     max_children: Optional[int] = None,
                     score_mode: str = "none",
                     child_score_fn: Optional[
                         Callable[[pa.Table], np.ndarray]] = None,
                     B: int = 64) -> Dataset:
    """has_child query: PARENT rows having between ``min_children`` and
    ``max_children`` children matching ``child_predicate`` (a vectorized
    Arrow predicate over the child rows). ``score_mode`` != "none" appends
    a ``_score`` column reduced from ``child_score_fn`` over the MATCHING
    children (ScoreMode.{Sum,Min,Max,Avg} of ParentJoinQueryBuilder)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"unknown score_mode: {score_mode}")
    if score_mode != "none" and child_score_fn is None:
        raise ValueError("score_mode needs child_score_fn")

    def join_group(g: pa.Table) -> pa.Table:
        rel = g.column(rel_col).to_numpy(zero_copy_only=False)
        parents = g.filter(pa.array(rel == parent_rel)).drop(["_bucket"])
        children = g.filter(pa.array(rel == child_rel))

        def emit(tbl: pa.Table) -> pa.Table:
            if score_mode == "none":
                return tbl
            return tbl if "_score" in tbl.column_names else \
                tbl.append_column("_score",
                                  pa.nulls(tbl.num_rows, pa.float64()))

        if parents.num_rows == 0:
            return emit(parents)
        pk = parents.column(key_col).to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk_s = pk[order]
        counts = np.zeros(len(pk_s), np.int64)
        scores = np.zeros(len(pk_s), np.float64)
        if score_mode == "min":
            scores[:] = np.inf
        elif score_mode == "max":
            scores[:] = -np.inf
        if children.num_rows:
            m = _mask(child_predicate, children)
            matched = children.filter(pa.array(m))
            if matched.num_rows:
                ck = matched.column(key_col).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(pk_s, ck)
                posc = np.clip(pos, 0, len(pk_s) - 1)
                valid = pk_s[posc] == ck  # orphan children never count
                posc = posc[valid]
                np.add.at(counts, posc, 1)
                if score_mode != "none":
                    sc = np.asarray(child_score_fn(matched),
                                    np.float64)[valid]
                    if score_mode in ("sum", "avg"):
                        np.add.at(scores, posc, sc)
                    elif score_mode == "min":
                        np.minimum.at(scores, posc, sc)
                    else:
                        np.maximum.at(scores, posc, sc)
        keep = counts >= max(min_children, 1)
        if max_children is not None:
            keep &= counts <= max_children
        out = parents.take(pa.array(order[keep]))
        if score_mode == "none":
            return out
        s = scores[keep]
        if score_mode == "avg":
            s = s / np.maximum(counts[keep], 1)
        return out.append_column("_score", pa.array(s))

    return (_with_bucket(ds, key_col, B).groupby("_bucket")
            .map_groups(join_group, batch_format="pyarrow"))


def has_parent_filter(ds: Dataset, rel_col: str, parent_rel: str,
                      child_rel: str, key_col: str,
                      parent_predicate: Callable[[pa.Table], pa.Array],
                      B: int = 64) -> Dataset:
    """has_parent query: CHILD rows whose parent matches
    ``parent_predicate`` (HasParentQueryBuilder; score=false default — the
    constant-score filter context). This is also the `children` agg's
    child-scope selector: aggregate downstream over the returned rows."""

    def join_group(g: pa.Table) -> pa.Table:
        rel = g.column(rel_col).to_numpy(zero_copy_only=False)
        parents = g.filter(pa.array(rel == parent_rel))
        children = g.filter(pa.array(rel == child_rel)).drop(["_bucket"])
        if children.num_rows == 0 or parents.num_rows == 0:
            return children.slice(0, 0)
        pm = _mask(parent_predicate, parents)
        mk = np.sort(parents.filter(pa.array(pm))
                     .column(key_col).to_numpy(zero_copy_only=False))
        if mk.size == 0:
            return children.slice(0, 0)
        ck = children.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(mk, ck), 0, mk.size - 1)
        return children.filter(pa.array(mk[pos] == ck))

    return (_with_bucket(ds, key_col, B).groupby("_bucket")
            .map_groups(join_group, batch_format="pyarrow"))


def has_child_inner_hits(ds: Dataset, rel_col: str, parent_rel: str,
                         child_rel: str, key_col: str,
                         child_predicate: Callable[[pa.Table], pa.Array],
                         inner_sort_col: str, size: int = 3,
                         min_children: int = 1,
                         max_children: Optional[int] = None,
                         B: int = 64) -> Dataset:
    """inner_hits for has_child (search/fetch/subphase/InnerHitsPhase.java;
    InnerHitBuilder DEFAULT_SIZE=3): the matching CHILD rows of every
    qualifying parent, ranked within the parent by ``inner_sort_col`` (the
    filter context scores constant, so the reference's score order reduces
    to an explicit sort key) and truncated to ``size`` per parent.

    Exploded layout — one row per inner hit carrying ``_inner_rank`` — the
    columnar equivalent of ``hits.hits[n].inner_hits.<name>.hits``: group
    by the join key downstream to reassemble per-parent lists."""

    def join_group(g: pa.Table) -> pa.Table:
        rel = g.column(rel_col).to_numpy(zero_copy_only=False)
        parents = g.filter(pa.array(rel == parent_rel))
        children = g.filter(pa.array(rel == child_rel)).drop(["_bucket"])

        def empty() -> pa.Table:
            return children.slice(0, 0).append_column(
                "_inner_rank", pa.array([], pa.int64()))

        if parents.num_rows == 0 or children.num_rows == 0:
            return empty()
        pk_s = np.sort(parents.column(key_col)
                       .to_numpy(zero_copy_only=False))
        m = _mask(child_predicate, children)
        matched = children.filter(pa.array(m))
        if matched.num_rows == 0:
            return empty()
        ck = matched.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pk_s, ck), 0, len(pk_s) - 1)
        valid = pk_s[pos] == ck
        matched = matched.filter(pa.array(valid))
        ck = ck[valid]
        # per-parent match counts gate min/max_children
        uk, inv, counts = np.unique(ck, return_inverse=True,
                                    return_counts=True)
        ok = counts >= max(min_children, 1)
        if max_children is not None:
            ok &= counts <= max_children
        matched = matched.filter(pa.array(ok[inv]))
        if matched.num_rows == 0:
            return empty()
        ck = matched.column(key_col).to_numpy(zero_copy_only=False)
        sk = matched.column(inner_sort_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ck))
        ck_s = ck[order]
        starts = np.concatenate(([0], np.flatnonzero(
            ck_s[1:] != ck_s[:-1]) + 1))
        rank = np.arange(len(ck_s), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(ck_s)]))))
        keep = rank < size
        out = matched.take(pa.array(order[keep]))
        return out.append_column("_inner_rank", pa.array(rank[keep] + 1))

    return (_with_bucket(ds, key_col, B).groupby("_bucket")
            .map_groups(join_group, batch_format="pyarrow"))


def parent_id_filter(ds: Dataset, rel_col: str, child_rel: str,
                     key_col: str, parent_value) -> Dataset:
    """parent_id query (ParentIdQueryBuilder): the children of ONE parent —
    a map-only vectorized filter, no shuffle (the reference routes the
    lookup to the parent's shard; here every block filters in place)."""

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(
            pc.equal(t.column(rel_col), pa.scalar(child_rel)),
            pc.equal(t.column(key_col), pa.scalar(parent_value))))

    return ds.map_batches(filt, batch_format="pyarrow")


def children_agg(ds: Dataset, rel_col: str, parent_rel: str,
                 child_rel: str, key_col: str, group_col: str,
                 value_col: Optional[str] = None,
                 parent_predicate: Optional[
                     Callable[[pa.Table], pa.Array]] = None,
                 B: int = 64) -> pd.DataFrame:
    """`children` aggregation (parent-join module,
    ChildrenAggregationBuilder / ParentToChildrenAggregator): buckets of
    PARENT docs (grouped by ``group_col``, optionally pre-filtered)
    transition to their CHILD docs — ``doc_count`` counts children, the
    optional metric sums ``value_col`` over children.

    Same co-partitioned one-shuffle shape as has_child: per bucket,
    children inherit their parent's group value via searchsorted, then a
    bounded per-bucket groupby partial; the driver merges #groups×B rows.
    """

    def partial(g: pa.Table) -> pa.Table:
        rel = g.column(rel_col).to_numpy(zero_copy_only=False)
        parents = g.filter(pa.array(rel == parent_rel))
        if parent_predicate is not None and parents.num_rows:
            parents = parents.filter(
                pa.array(_mask(parent_predicate, parents)))
        children = g.filter(pa.array(rel == child_rel))
        empty = pa.table({"key": pa.array([], pa.string()),
                          "doc_count": pa.array([], pa.int64()),
                          "_sum": pa.array([], pa.float64())})
        if parents.num_rows == 0 or children.num_rows == 0:
            return empty
        pk = parents.column(key_col).to_numpy(zero_copy_only=False)
        pg = parents.column(group_col).to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk_s, pg_s = pk[order], pg[order]
        ck = children.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_s, ck)
        posc = np.clip(pos, 0, len(pk_s) - 1)
        valid = pk_s[posc] == ck  # orphans / filtered-out parents drop
        posc = posc[valid]
        df = pd.DataFrame({"key": pg_s[posc].astype(str)})
        if value_col is not None:
            df["_v"] = children.column(value_col).to_numpy(
                zero_copy_only=False)[valid]
        else:
            df["_v"] = 0.0
        out = df.groupby("key", sort=False).agg(
            doc_count=("_v", "size"), _sum=("_v", "sum")).reset_index()
        return pa.table({"key": pa.array(out["key"], pa.string()),
                         "doc_count": pa.array(out["doc_count"], pa.int64()),
                         "_sum": pa.array(out["_sum"], pa.float64())})

    parts = (_with_bucket(ds, key_col, B).groupby("_bucket")
             .map_groups(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pd.DataFrame({"key": [], "doc_count": [], "sum": []})
    out = parts.groupby("key", sort=True).agg(
        doc_count=("doc_count", "sum"), sum=("_sum", "sum")).reset_index()
    if value_col is None:
        out = out.drop(columns=["sum"])
    return out


def parent_agg(ds: Dataset, rel_col: str, parent_rel: str,
               child_rel: str, key_col: str, group_col: str,
               child_predicate: Optional[
                   Callable[[pa.Table], pa.Array]] = None,
               B: int = 64) -> pd.DataFrame:
    """`parent` aggregation (ParentAggregationBuilder / 2.x
    ChildrenToParentAggregator): from CHILD docs (optionally filtered) up
    to their DISTINCT parents, bucketed by a parent field — ``doc_count``
    counts each parent once no matter how many children matched.

    Per co-partitioned bucket the parent set is exact (same-key routing
    invariant), so partials are (group value, distinct-parent count) and
    the driver merge is a plain sum over #groups×B rows."""

    def partial(g: pa.Table) -> pa.Table:
        rel = g.column(rel_col).to_numpy(zero_copy_only=False)
        parents = g.filter(pa.array(rel == parent_rel))
        children = g.filter(pa.array(rel == child_rel))
        empty = pa.table({"key": pa.array([], pa.string()),
                          "doc_count": pa.array([], pa.int64())})
        if parents.num_rows == 0 or children.num_rows == 0:
            return empty
        if child_predicate is not None:
            children = children.filter(
                pa.array(_mask(child_predicate, children)))
            if children.num_rows == 0:
                return empty
        ck = np.unique(
            children.column(key_col).to_numpy(zero_copy_only=False))
        pk = parents.column(key_col).to_numpy(zero_copy_only=False)
        hit = np.isin(pk, ck)
        if not hit.any():
            return empty
        pg = parents.column(group_col).to_numpy(
            zero_copy_only=False)[hit].astype(str)
        uniq, counts = np.unique(pg, return_counts=True)
        return pa.table({"key": pa.array(uniq, pa.string()),
                         "doc_count": pa.array(counts, pa.int64())})

    parts = (_with_bucket(ds, key_col, B).groupby("_bucket")
             .map_groups(partial, batch_format="pyarrow").to_pandas())
    if parts.empty:
        return pd.DataFrame({"key": [], "doc_count": []})
    return parts.groupby("key", sort=True).agg(
        doc_count=("doc_count", "sum")).reset_index()
