"""Bucket aggregations (ref: server/search/aggregations/bucket/).

Every agg pre-aggregates per batch (one partial row per key per batch) before
the small groupby — the combiner pattern the reference uses per shard — so the
shuffle moves key-cardinality rows, not data rows.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def _partial_counts(ds: Dataset, keys: List[str],
                    sum_cols: Optional[Dict[str, str]] = None) -> Dataset:
    """map-side combine: per-batch groupby -> (keys, doc_count, sums...)."""
    sum_cols = sum_cols or {}

    def partial(t: pa.Table) -> pa.Table:
        aggs = [([], "count_all")] + [(src, "sum") for src in sum_cols.values()]
        res = t.group_by(keys).aggregate(aggs)
        ren = {"count_all": "doc_count"}
        for src in sum_cols.values():
            ren[f"{src}_sum"] = f"sum_{src}"
        return res.rename_columns([ren.get(c, c) for c in res.column_names])

    return ds.map_batches(partial, batch_format="pyarrow")


def _topn_buckets(merged: Dataset, count_col: str, key_fields: List[str],
                  size: int) -> pd.DataFrame:
    """Bounded final reduce: per-BLOCK top-``size`` partials (exact after the
    global groupby — every key's total lives in exactly one block) followed
    by a driver merge of only n_blocks*size rows. The driver never holds the
    full key cardinality (the shard_size/TermsAggregator concern)."""
    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values([count_col] + key_fields,
                              ascending=[False] + [True] * len(key_fields),
                              kind="mergesort").head(size)

    tops = merged.map_batches(block_top, batch_format="pandas").to_pandas()
    tops = tops.sort_values([count_col] + key_fields,
                            ascending=[False] + [True] * len(key_fields),
                            kind="mergesort")
    return tops.head(size).reset_index(drop=True)


def terms_agg(ds: Dataset, field: str, size: int = 10,
              sum_col: Optional[str] = None) -> pd.DataFrame:
    """terms: top-N keys by doc_count (desc), key asc tie-break — the
    reference's order (InternalTerms reduce + BucketOrder.count(false)).
    Exact at any cardinality: the post-groupby reduce is per-block top-N
    partials + a bounded driver merge, not a full-cardinality to_pandas."""
    parts = _partial_counts(ds, [field], {"s": sum_col} if sum_col else None)
    aggs = [Sum("doc_count", alias_name="doc_count")]
    if sum_col:
        aggs.append(Sum(f"sum_{sum_col}", alias_name=f"sum_{sum_col}"))
    merged = parts.groupby(field).aggregate(*aggs)
    return _topn_buckets(merged, "doc_count", [field], size)


def multi_terms_agg(ds: Dataset, fields: List[str], size: int = 10) -> pd.DataFrame:
    parts = _partial_counts(ds, fields)
    merged = parts.groupby(fields).aggregate(Sum("doc_count", alias_name="doc_count"))
    return _topn_buckets(merged, "doc_count", fields, size)


def rare_terms_agg(ds: Dataset, field: str, max_doc_count: int = 1) -> pd.DataFrame:
    """rare_terms: keys with doc_count <= threshold, key asc. The threshold
    filter runs distributed BEFORE collection, so the driver sees only the
    rare tail."""
    parts = _partial_counts(ds, [field])
    merged = parts.groupby(field).aggregate(Sum("doc_count", alias_name="doc_count"))

    def rare_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("doc_count"),
                                      pa.scalar(max_doc_count)))

    out = merged.map_batches(rare_only, batch_format="pyarrow").to_pandas()
    return out.sort_values(field).reset_index(drop=True)


def histogram_agg(ds: Dataset, field: str, interval: float,
                  sum_col: Optional[str] = None) -> pd.DataFrame:
    """histogram: bucket key = floor(value/interval)*interval."""

    def keyed(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        key = np.floor(v / interval) * interval
        return t.append_column("_bucket", pa.array(key))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    parts = _partial_counts(keyed_ds, ["_bucket"], {"s": sum_col} if sum_col else None)
    aggs = [Sum("doc_count", alias_name="doc_count")]
    if sum_col:
        aggs.append(Sum(f"sum_{sum_col}", alias_name=f"sum_{sum_col}"))
    out = parts.groupby("_bucket").aggregate(*aggs).to_pandas()
    return (out.rename(columns={"_bucket": "key"})
            .sort_values("key").reset_index(drop=True))


_CAL = {"year": "Y", "month": "M", "week": "W", "day": "D", "hour": "h", "minute": "m"}


def date_histogram_agg(ds: Dataset, field: str, calendar_interval: str = "month",
                       sum_col: Optional[str] = None) -> pd.DataFrame:
    """date_histogram with calendar rounding (Rounding.java semantics via
    numpy datetime64 truncation)."""
    unit = _CAL[calendar_interval]

    def keyed(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False)
        if unit == "W":
            # Calendar weeks start Monday (Rounding.java WEEK_OF_WEEKYEAR),
            # but numpy datetime64[W] weeks are epoch-aligned (Thursday
            # 1970-01-01) — round down to Monday explicitly.
            d = v.astype("datetime64[D]")
            dow = (d.astype("int64") + 3) % 7  # Monday == 0
            key = (d - dow.astype("timedelta64[D]")).astype("datetime64[us]")
        else:
            key = v.astype(f"datetime64[{unit}]").astype("datetime64[us]")
        return t.append_column("_bucket", pa.array(key))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    parts = _partial_counts(keyed_ds, ["_bucket"], {"s": sum_col} if sum_col else None)
    aggs = [Sum("doc_count", alias_name="doc_count")]
    if sum_col:
        aggs.append(Sum(f"sum_{sum_col}", alias_name=f"sum_{sum_col}"))
    out = parts.groupby("_bucket").aggregate(*aggs).to_pandas()
    return (out.rename(columns={"_bucket": "key"})
            .sort_values("key").reset_index(drop=True))


def range_agg(ds: Dataset, field: str,
              ranges: Sequence[Tuple[Optional[float], Optional[float]]]) -> pd.DataFrame:
    """range: [from, to) buckets, reported in given order (RangeAggregator)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        counts = []
        for lo, hi in ranges:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v < hi
            counts.append(int(m.sum()))
        return pa.table({"idx": pa.array(range(len(ranges)), pa.int64()),
                         "doc_count": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("idx")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas()
              .sort_values("idx"))
    merged["key"] = [
        f"{'*' if lo is None else lo}-{'*' if hi is None else hi}" for lo, hi in ranges
    ]
    return merged[["key", "doc_count"]].reset_index(drop=True)


def date_range_agg(ds: Dataset, field: str,
                   ranges: Sequence[Tuple[Optional[str], Optional[str]]]
                   ) -> pd.DataFrame:
    """date_range: [from, to) buckets over a timestamp field, bounds as ISO
    strings (DateRangeAggregationBuilder semantics: from inclusive, to
    exclusive), reported in given order."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False)
        counts = []
        for lo, hi in ranges:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= v >= np.datetime64(lo)
            if hi is not None:
                m &= v < np.datetime64(hi)
            counts.append(int(m.sum()))
        return pa.table({"idx": pa.array(range(len(ranges)), pa.int64()),
                         "doc_count": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("idx")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas()
              .sort_values("idx"))
    merged["key"] = [
        f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        for lo, hi in ranges
    ]
    return merged[["key", "doc_count"]].reset_index(drop=True)


def _ipv4_to_u32(col: pa.ChunkedArray) -> np.ndarray:
    """Vectorized dotted-quad -> uint32 (Arrow split + one reshape matmul)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.split_pattern(col, ".")
    flat = pc.cast(parts.flatten(), pa.int64()).to_numpy(zero_copy_only=False)
    return (flat.reshape(-1, 4)
            @ np.array([1 << 24, 1 << 16, 1 << 8, 1], dtype=np.int64)
            ).astype(np.int64)


def ip_range_agg(ds: Dataset, field: str,
                 ranges: Sequence[Tuple[Optional[str], Optional[str]]]
                 ) -> pd.DataFrame:
    """ip_range: [from, to) buckets over dotted-quad IPv4 strings
    (BinaryRangeAggregator / ip_range semantics; CIDR masks expressible as
    their from/to bounds), reported in given order."""
    def ip_key(s: Optional[str]) -> Optional[int]:
        if s is None:
            return None
        a, b, c, d = (int(x) for x in s.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d

    bounds = [(ip_key(lo), ip_key(hi)) for lo, hi in ranges]

    def partial(t: pa.Table) -> pa.Table:
        v = _ipv4_to_u32(t.column(field))
        counts = []
        for lo, hi in bounds:
            m = np.ones(len(v), dtype=bool)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v < hi
            counts.append(int(m.sum()))
        return pa.table({"idx": pa.array(range(len(ranges)), pa.int64()),
                         "doc_count": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("idx")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas()
              .sort_values("idx"))
    merged["key"] = [f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
                     for lo, hi in ranges]
    return merged[["key", "doc_count"]].reset_index(drop=True)


def sampler_agg(ds: Dataset, by: str, shard_size: int = 100,
                tie_col: Optional[str] = None) -> Dataset:
    """sampler: restrict sub-aggregations to the best-scoring docs
    (bucket/sampler/SamplerAggregator — top shard_size by _score; here the
    score is an explicit column). Deterministic: (by desc, tie_col asc).
    Returns the sampled Dataset; run any agg on it. Per-block top partials
    keep the reduce bounded."""
    keys = [by] + ([tie_col] if tie_col else [])
    asc = [False] + ([True] if tie_col else [])

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(keys, ascending=asc,
                              kind="mergesort").head(shard_size)

    tops = ds.map_batches(block_top, batch_format="pandas").to_pandas()
    tops = tops.sort_values(keys, ascending=asc,
                            kind="mergesort").head(shard_size)
    import ray.data
    return ray.data.from_pandas(tops.reset_index(drop=True))


def diversified_sampler_agg(ds: Dataset, diversify_field: str, by: str,
                            shard_size: int = 100,
                            max_docs_per_value: int = 1,
                            tie_col: Optional[str] = None) -> Dataset:
    """diversified_sampler: like sampler but at most ``max_docs_per_value``
    docs per ``diversify_field`` value survive before the top-N cut
    (DiversifiedAggregatorFactory semantics)."""
    keys = [by] + ([tie_col] if tie_col else [])
    asc = [False] + ([True] if tie_col else [])

    def best_per_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(keys, ascending=asc,
                             kind="mergesort").head(max_docs_per_value)

    diverse = ds.groupby(diversify_field).map_groups(
        best_per_key, batch_format="pandas")

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(keys, ascending=asc,
                              kind="mergesort").head(shard_size)

    tops = diverse.map_batches(block_top, batch_format="pandas").to_pandas()
    tops = tops.sort_values(keys, ascending=asc,
                            kind="mergesort").head(shard_size)
    import ray.data
    return ray.data.from_pandas(tops.reset_index(drop=True))


def significant_text_agg(ds: Dataset, text_col: str, id_col: str,
                         foreground: Callable[[pa.Table], pa.Array],
                         analyzer: str = "default",
                         size: int = 10) -> pd.DataFrame:
    """significant_text: JLH-scored over-represented TERMS of an analyzed
    text field in the foreground docs vs the whole corpus
    (SignificantTextAggregationBuilder). Counts are document frequencies
    (each doc contributes a term once)."""
    from ..analysis import get_analyzer

    an = get_analyzer(analyzer)

    def explode(t: pa.Table) -> pa.Table:
        fg_mask = np.asarray(pc.cast(foreground(t), pa.bool_()).to_pylist(),
                             dtype=bool)
        terms, fgs = [], []
        for s, fg in zip(t.column(text_col).to_pylist(), fg_mask):
            uniq = set(an.tokens(s or ""))
            terms.extend(uniq)
            fgs.extend([1 if fg else 0] * len(uniq))
        tt = pa.table({"term": pa.array(terms, pa.string()),
                       "fg": pa.array(fgs, pa.int64()),
                       "bg": pa.array(np.ones(len(terms), np.int64))})
        # per-batch combine before the shuffle
        return (tt.group_by(["term"]).aggregate([("fg", "sum"), ("bg", "sum")])
                .rename_columns(["term", "fg", "bg"]))

    parts = ds.map_batches(explode, batch_format="pyarrow")
    p = (parts.groupby("term").aggregate(
        Sum("fg", alias_name="fg"), Sum("bg", alias_name="bg")).to_pandas())
    N_fg, N_bg = p["fg"].sum(), p["bg"].sum()
    eps = 1e-9
    fg_rate = p["fg"] / max(N_fg, 1)
    bg_rate = p["bg"] / max(N_bg, 1)
    p["score"] = np.where(
        fg_rate > bg_rate,
        (fg_rate - bg_rate) * (fg_rate / np.maximum(bg_rate, eps)),
        0.0)
    p = p[p["score"] > 0].sort_values(["score", "term"],
                                      ascending=[False, True])
    return p[["term", "fg", "bg", "score"]].head(size).reset_index(drop=True)


def variable_width_histogram_agg(ds: Dataset, field: str, buckets: int = 10,
                                 sample_size: int = 4096, seed: int = 17
                                 ) -> pd.DataFrame:
    """variable_width_histogram (VariableWidthHistogramAggregator): bucket
    boundaries ADAPT to the value distribution instead of a fixed interval.
    The reference clusters streamed values per shard and merges centroids;
    here a deterministic 1-D k-means on a hash-strided sample fixes the
    centroids (same sampling discipline as the IVF coarse quantizer), then
    one distributed pass assigns by nearest centroid (searchsorted on
    midpoints) and reduces (count, min, max, mean) per bucket."""
    import ray

    n = ds.count()
    stride = max(1, n // max(sample_size, 1))

    # deterministic sample: rows whose value-hash lands on the stride
    def pick2(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        h = pd.util.hash_array(v) % np.uint64(stride)
        return pa.table({field: pa.array(v[h == 0])})

    sample = np.sort(ds.map_batches(pick2, batch_format="pyarrow")
                     .to_pandas()[field].to_numpy())
    if sample.size == 0:
        return pd.DataFrame({"key": [], "doc_count": [], "min": [], "max": []})
    k = min(buckets, max(1, len(np.unique(sample))))
    # sorted-quantile init + a few Lloyd iterations (deterministic)
    C = np.unique(np.quantile(sample, np.linspace(0, 1, k)))
    for _ in range(10):
        mids = (C[:-1] + C[1:]) / 2.0
        assign = np.searchsorted(mids, sample)
        C_new = np.array([sample[assign == i].mean() if (assign == i).any()
                          else C[i] for i in range(len(C))])
        if np.allclose(C_new, C):
            break
        C = np.sort(C_new)
    mids = (C[:-1] + C[1:]) / 2.0
    mids_ref = ray.put(mids)

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(mids_ref)
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.searchsorted(m, v)
        nb = len(m) + 1
        cnt = np.bincount(a, minlength=nb)
        mn = np.full(nb, np.inf)
        mx = np.full(nb, -np.inf)
        sm = np.zeros(nb)
        np.minimum.at(mn, a, v)
        np.maximum.at(mx, a, v)
        np.add.at(sm, a, v)
        return pa.table({"bucket": pa.array(np.arange(nb, dtype=np.int64)),
                         "doc_count": pa.array(cnt.astype(np.int64)),
                         "min": pa.array(mn), "max": pa.array(mx),
                         "sum": pa.array(sm)})

    from ray.data.aggregate import Max, Min

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = (parts.groupby("bucket")
           .aggregate(Sum("doc_count", alias_name="doc_count"),
                      Min("min", alias_name="min"),
                      Max("max", alias_name="max"),
                      Sum("sum", alias_name="sum"))
           .to_pandas().sort_values("bucket"))
    out = out[out["doc_count"] > 0].reset_index(drop=True)
    out["key"] = out["sum"] / out["doc_count"]  # bucket centroid (mean)
    return out[["key", "doc_count", "min", "max"]]


def filters_agg(ds: Dataset, filters: Dict[str, Callable[[pa.Table], pa.Array]]
                ) -> pd.DataFrame:
    """filters: named-predicate doc counts (FiltersAggregator). Each filter is
    a vectorized Arrow predicate ``table -> bool array``."""
    names = list(filters)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "name": pa.array(names, pa.string()),
            "doc_count": pa.array(
                [int(pc.sum(pc.cast(filters[n](t), pa.int64())).as_py() or 0)
                 for n in names], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("name")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas())
    return merged.set_index("name").loc[names].reset_index()


def missing_agg(ds: Dataset, field: str) -> int:
    """missing: docs with null/empty field."""
    def partial(t: pa.Table) -> pa.Table:
        col = t.column(field)
        n = col.null_count
        if pa.types.is_string(col.type):
            n += int(pc.sum(pc.cast(pc.equal(col, ""), pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})
    return int(ds.map_batches(partial, batch_format="pyarrow").to_pandas()["n"].sum())


def composite_agg(ds: Dataset, sources: List[str], size: int = 10,
                  after: Optional[Tuple] = None) -> pd.DataFrame:
    """composite: paginated multi-source buckets in key order with after-key
    cursor (bucket/composite/CompositeAggregator.java)."""
    parts = _partial_counts(ds, sources)
    merged = (parts.groupby(sources)
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas())
    merged = merged.sort_values(sources, kind="mergesort").reset_index(drop=True)
    if after is not None:
        keys = [tuple(r) for r in merged[sources].itertuples(index=False)]
        merged = merged[[kk > tuple(after) for kk in keys]]
    return merged.head(size).reset_index(drop=True)


def auto_date_histogram_agg(ds: Dataset, field: str, target_buckets: int = 10,
                            sum_col: Optional[str] = None) -> pd.DataFrame:
    """auto_date_histogram: pick the coarsest calendar interval that yields
    <= target_buckets buckets (AutoDateHistogramAggregator's rounding ladder,
    coarse->fine)."""
    ladder = ["year", "month", "week", "day", "hour", "minute"]
    chosen = ladder[0]
    out = None
    for unit in ladder:
        cand = date_histogram_agg(ds, field, unit, sum_col=sum_col)
        if len(cand) > target_buckets:
            break
        chosen, out = unit, cand
    if out is None:
        out = date_histogram_agg(ds, field, ladder[0], sum_col=sum_col)
    out = out.copy()
    out["interval"] = chosen
    return out


def adjacency_matrix_agg(ds: Dataset,
                         filters: Dict[str, Callable[[pa.Table], pa.Array]]
                         ) -> pd.DataFrame:
    """adjacency_matrix: doc counts for each named filter and each pairwise
    intersection (key "a&b"), in key order (AdjacencyMatrixAggregator)."""
    names = sorted(filters)

    def partial(t: pa.Table) -> pa.Table:
        masks = {n: np.asarray(pc.cast(filters[n](t), pa.bool_()).to_pylist(),
                               dtype=bool) for n in names}
        keys, counts = [], []
        for i, a in enumerate(names):
            keys.append(a)
            counts.append(int(masks[a].sum()))
            for b in names[i + 1:]:
                keys.append(f"{a}&{b}")
                counts.append(int((masks[a] & masks[b]).sum()))
        return pa.table({"key": pa.array(keys, pa.string()),
                         "doc_count": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("key")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas())
    merged = merged[merged["doc_count"] > 0]
    return merged.sort_values("key").reset_index(drop=True)


def significant_terms_agg(ds: Dataset, field: str,
                          foreground: Callable[[pa.Table], pa.Array],
                          size: int = 10) -> pd.DataFrame:
    """significant_terms: keys over-represented in the foreground set vs the
    whole index, scored with the reference's default JLH heuristic
    (significant/heuristics/JLHScore.java)."""

    def partial(t: pa.Table) -> pa.Table:
        m = pc.cast(foreground(t), pa.bool_())
        fg = t.filter(m).group_by([field]).aggregate([([], "count_all")])
        fg = fg.rename_columns([field, "fg"])
        bg = t.group_by([field]).aggregate([([], "count_all")])
        bg = bg.rename_columns([field, "bg"])
        joined = bg.join(fg, keys=[field], join_type="left outer")
        return pa.table({
            field: joined.column(field),
            "fg": pc.fill_null(joined.column("fg"), 0),
            "bg": joined.column("bg"),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    p = (parts.groupby(field).aggregate(
        Sum("fg", alias_name="fg"), Sum("bg", alias_name="bg"),
    ).to_pandas())
    p["fg"] = p["fg"].fillna(0)
    N_fg, N_bg = p["fg"].sum(), p["bg"].sum()
    eps = 1e-9
    fg_rate = (p["fg"]) / max(N_fg, 1)
    bg_rate = (p["bg"]) / max(N_bg, 1)
    p["score"] = np.where(
        fg_rate > bg_rate,
        (fg_rate - bg_rate) * (fg_rate / np.maximum(bg_rate, eps)),  # JLH
        0.0,
    )
    p = p[p["score"] > 0].sort_values(["score", field], ascending=[False, True])
    return p[[field, "fg", "bg", "score"]].head(size).reset_index(drop=True)
