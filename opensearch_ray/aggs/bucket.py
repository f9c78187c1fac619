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


def _shuffle_blocks() -> int:
    """Pre-shuffle block count: enough blocks for sort parallelism, few
    enough that per-partition sub-blocks stay above Ray's in-process-store
    threshold (tiny sub-blocks accumulate in the driver — see the measured
    rationale in dedup/minhash.py)."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return int(min(256, max(16, cpus)))


def _topn_buckets(merged: Dataset, count_col: str, key_fields: List[str],
                  size: int, ascending: bool = False) -> pd.DataFrame:
    """Bounded final reduce: per-BLOCK top-``size`` partials (exact after the
    global groupby — every key's total lives in exactly one block) followed
    by a driver merge of only n_blocks*size rows. The driver never holds the
    full key cardinality (the shard_size/TermsAggregator concern)."""
    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        if count_col not in df.columns:  # schema-less empty block
            return df
        return df.sort_values([count_col] + key_fields,
                              ascending=[ascending] + [True] * len(key_fields),
                              kind="mergesort").head(size)

    tops = merged.map_batches(block_top, batch_format="pandas").to_pandas()
    if count_col not in tops.columns:
        # an EMPTY Ray result loses its schema in to_pandas (the typed-
        # empty pitfall) — hand back a correctly-shaped empty frame
        return pd.DataFrame(columns=key_fields + [count_col])
    tops = tops.sort_values([count_col] + key_fields,
                            ascending=[ascending] + [True] * len(key_fields),
                            kind="mergesort")
    return tops.head(size).reset_index(drop=True)


def terms_agg(ds: Dataset, field: str, size: int = 10,
              sum_col: Optional[str] = None,
              order: Optional[Tuple[str, str]] = None,
              missing=None, min_doc_count: int = 1,
              include: Optional[str] = None,
              exclude: Optional[str] = None,
              include_partition: Optional[Tuple[int, int]] = None
              ) -> pd.DataFrame:
    """terms: top-N keys by doc_count (desc), key asc tie-break — the
    reference's order (InternalTerms reduce + BucketOrder.count(false)).
    Exact at any cardinality: the post-groupby reduce is per-block top-N
    partials + a bounded driver merge, not a full-cardinality to_pandas.

    ``order``: BucketOrder options — ("_count", "asc"/"desc") (default
    desc), ("_key", "asc"/"desc") (BucketOrder.key), or ("sum", ...) to
    order by the sum_col metric (BucketOrder.aggregation). Key-ordered and
    metric-ordered variants keep the same bounded per-block reduce.

    ``missing``: bucket null values under this key instead of dropping
    them (TermsAggregationBuilder.missing). ``min_doc_count``: drop
    buckets below the floor AFTER the global reduce (the reference's
    coordinator-side prune — partials must still flow, a shard-local
    prune would undercount cross-shard keys).

    ``include``/``exclude``: anchored key regexes
    (IncludeExclude.filter); ``include_partition`` = (partition,
    num_partitions) iterates a high-cardinality key space in
    deterministic md5-hash slices (IncludeExclude partitioned mode) —
    the reference's recipe for walking millions of keys without a
    composite cursor. All three prune rows MAP-SIDE before any partial,
    so excluded keys never shuffle."""
    import pyarrow.compute as _pc

    if include or exclude or include_partition:
        inc_rx = "^(?:" + include + ")$" if include else None
        exc_rx = "^(?:" + exclude + ")$" if exclude else None

        def key_gate(t: pa.Table) -> pa.Table:
            col = t.column(field)
            mask = _pc.is_valid(col)
            if inc_rx:
                mask = _pc.and_(mask, _pc.match_substring_regex(
                    _pc.cast(col, pa.string()), inc_rx))
            if exc_rx:
                mask = _pc.and_(mask, _pc.invert(_pc.fill_null(
                    _pc.match_substring_regex(
                        _pc.cast(col, pa.string()), exc_rx), False)))
            if include_partition:
                import hashlib
                part, num = include_partition
                vals = col.to_pylist()
                uniq = set(v for v in vals if v is not None)
                keep_keys = {
                    v for v in uniq
                    if int(hashlib.md5(str(v).encode()).hexdigest()[:8],
                           16) % num == part}
                if keep_keys:
                    mask = _pc.and_(mask, _pc.is_in(
                        col, value_set=pa.array(sorted(keep_keys))))
                else:
                    mask = pa.array(np.zeros(t.num_rows, bool))
            return t.filter(_pc.fill_null(mask, False))

        ds = ds.map_batches(key_gate, batch_format="pyarrow")
    if missing is not None:
        def fill(t: pa.Table) -> pa.Table:
            col = t.column(field)
            i = t.schema.get_field_index(field)
            return t.set_column(
                i, field, _pc.fill_null(col, missing))

        ds = ds.map_batches(fill, batch_format="pyarrow")
    else:
        # the reference default: docs without a value simply don't
        # bucket (ValuesSourceAggregatorFactory missing-values handling)
        ds = ds.map_batches(
            lambda t: t.filter(_pc.is_valid(t.column(field))),
            batch_format="pyarrow")
    parts = _partial_counts(ds, [field], {"s": sum_col} if sum_col else None)
    aggs = [Sum("doc_count", alias_name="doc_count")]
    if sum_col:
        aggs.append(Sum(f"sum_{sum_col}", alias_name=f"sum_{sum_col}"))
    merged = parts.groupby(field).aggregate(*aggs)
    if min_doc_count > 1:
        import pyarrow.compute as _pc
        mdc = int(min_doc_count)
        merged = merged.map_batches(
            lambda t: t.filter(_pc.greater_equal(
                t.column("doc_count"), mdc)),
            batch_format="pyarrow")
    by, direction = order or ("_count", "desc")
    asc = direction == "asc"
    if by == "_count":
        return _topn_buckets(merged, "doc_count", [field], size, asc)
    if by == "_key":
        def block_top(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(field, ascending=asc,
                                  kind="mergesort").head(size)
        tops = (merged.map_batches(block_top, batch_format="pandas")
                .to_pandas().sort_values(field, ascending=asc,
                                         kind="mergesort"))
        return tops.head(size).reset_index(drop=True)
    if by == "sum" and sum_col:
        return _topn_buckets(merged, f"sum_{sum_col}", [field], size, asc)
    raise ValueError(f"unsupported terms order: {order}")


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
                  sum_col: Optional[str] = None, offset: float = 0.0,
                  extended_bounds: Optional[Tuple[float, float]] = None
                  ) -> pd.DataFrame:
    """histogram: bucket key = floor((value - offset)/interval)*interval
    + offset (HistogramAggregationBuilder.offset). ``extended_bounds``
    (min, max) forces empty buckets out to the given range — the
    min_doc_count=0 fill extended beyond the data (bounded by the
    reference's search.max_buckets discipline: 65536)."""

    def keyed(t: pa.Table) -> pa.Table:
        v = t.column(field).to_numpy(zero_copy_only=False).astype(np.float64)
        key = np.floor((v - offset) / interval) * interval + offset
        return t.append_column("_bucket", pa.array(key))

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    parts = _partial_counts(keyed_ds, ["_bucket"], {"s": sum_col} if sum_col else None)
    aggs = [Sum("doc_count", alias_name="doc_count")]
    if sum_col:
        aggs.append(Sum(f"sum_{sum_col}", alias_name=f"sum_{sum_col}"))
    out = parts.groupby("_bucket").aggregate(*aggs).to_pandas()
    out = (out.rename(columns={"_bucket": "key"})
           .sort_values("key").reset_index(drop=True))
    if extended_bounds is not None:
        lo = np.floor((extended_bounds[0] - offset) / interval) \
            * interval + offset
        hi = np.floor((extended_bounds[1] - offset) / interval) \
            * interval + offset
        if len(out):
            lo, hi = min(lo, out["key"].min()), max(hi, out["key"].max())
        n_buckets = int(round((hi - lo) / interval)) + 1
        if n_buckets > 65536:
            raise ValueError("too_many_buckets_exception: extended_bounds "
                             f"would create {n_buckets} buckets")
        keys = lo + interval * np.arange(n_buckets)
        out = out.set_index("key").reindex(keys).fillna(0).reset_index() \
            .rename(columns={"index": "key"})
        out["doc_count"] = out["doc_count"].astype(np.int64)
    return out


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


def ip_prefix_agg(ds: Dataset, field: str, prefix_length: int,
                  min_doc_count: int = 1,
                  append_prefix_length: bool = False) -> pd.DataFrame:
    """ip_prefix: bucket IPv4 addresses by their network prefix
    (bucket/terms/IpPrefixAggregator, OpenSearch 2.10+): key = the
    address masked to ``prefix_length`` bits, rendered dotted-quad
    (``append_prefix_length`` adds the ``/len`` suffix), buckets sorted
    by key ascending, ``min_doc_count`` filtering the tail.

    Distributed shape: per-block masked ``np.unique`` partials (bounded
    by distinct prefixes per block), one small groupby merge."""
    if not (0 <= prefix_length <= 32):
        raise ValueError("prefix_length must be in [0, 32]")
    mask = np.int64(((1 << prefix_length) - 1) << (32 - prefix_length)
                    if prefix_length else 0)

    def partial(t: pa.Table) -> pa.Table:
        v = _ipv4_to_u32(t.column(field)) & mask
        keys, counts = np.unique(v, return_counts=True)
        return pa.table({"net": pa.array(keys.astype(np.int64)),
                         "doc_count": pa.array(counts.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("net")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas()
              .sort_values("net"))
    merged = merged[merged["doc_count"] >= min_doc_count]
    nets = merged["net"].to_numpy(np.int64)
    quads = [f"{(n >> 24) & 255}.{(n >> 16) & 255}.{(n >> 8) & 255}.{n & 255}"
             for n in nets]
    if append_prefix_length:
        quads = [f"{q}/{prefix_length}" for q in quads]
    merged["key"] = quads
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


def _sig_scores(fg: np.ndarray, bg: np.ndarray, n_fg: float, n_bg: float,
                heuristic: str = "jlh") -> np.ndarray:
    """Significance score of (subsetFreq=fg, subsetSize=n_fg,
    supersetFreq=bg, supersetSize=n_bg) per key, vectorized. Heuristics from
    bucket/terms/heuristic/ (background_is_superset=true,
    include_negatives=false — the contingency table of
    NXYSignificanceHeuristic.computeNxys):

    - jlh     — JLHScore.java:74-108: (fgRate-bgRate)*(fgRate/bgRate), 0 when
                not over-represented
    - chi_square — ChiSquare.java:87-96: N*(N11*N00-N01*N10)^2/(N_1*N1_*N0_*N_0)
    - mutual_information — MutualInformation.java:89-135 (base-2, the four
                0-guarded terms)
    - gnd     — GND.java:95-115: exp(-(max(ln fx, ln fy)-ln fxy)
                /(ln N - min(ln fx, ln fy)))
    - percentage — PercentageScore.java:90-97: fg/bg
    - a CALLABLE — ScriptHeuristic.java (the `scripted` heuristic): a
      vectorized Python fn of (_subset_freq, _subset_size,
      _superset_freq, _superset_size), the script's variable names
    """
    fg = np.asarray(fg, dtype=np.float64)
    bg = np.asarray(bg, dtype=np.float64)
    n_fg = max(float(n_fg), 1.0)
    n_bg = max(float(n_bg), 1.0)
    if callable(heuristic):
        return np.asarray(heuristic(fg, n_fg, bg, n_bg), np.float64)
    if heuristic == "jlh":
        fg_rate, bg_rate = fg / n_fg, np.maximum(bg, 1.0) / n_bg
        return np.where(fg_rate > bg_rate,
                        (fg_rate - bg_rate) * (fg_rate / bg_rate), 0.0)
    if heuristic == "percentage":
        return np.divide(fg, bg, out=np.zeros_like(fg), where=bg > 0)
    # NXY contingency (backgroundIsSuperset branch)
    N11, N01 = fg, n_fg - fg
    N10, N00 = bg - fg, n_bg - bg - (n_fg - fg)
    N1_, N0_ = bg, n_bg - bg
    N_1, N_0, N = n_fg, n_bg - n_fg, n_bg
    negative = (N11 / np.maximum(N_1, 1e-12)) < (N10 / np.maximum(N_0, 1e-12))
    if heuristic == "chi_square":
        denom = np.maximum(N_1 * N1_ * N0_ * N_0, 1e-12)
        score = N * (N11 * N00 - N01 * N10) ** 2 / denom
        return np.where(negative, -np.inf, score)
    if heuristic == "mutual_information":
        def mi_term(nxy, nx_, n_y):
            num = np.abs(N * nxy)
            fac = np.abs(nxy / N)
            safe = ~((num < 1e-7) & (fac < 1e-7))
            val = np.zeros_like(nxy, dtype=np.float64)
            np.log(np.divide(num, np.maximum(np.abs(nx_ * n_y), 1e-300),
                             where=safe, out=np.ones_like(val)),
                   where=safe, out=val)
            return fac * val
        score = (mi_term(N00, N0_, N_0) + mi_term(N01, N0_, N_1)
                 + mi_term(N10, N1_, N_0) + mi_term(N11, N1_, N_1)) \
            / np.log(2.0)
        score = np.where(np.isnan(score), -np.inf, score)
        return np.where(negative, -np.inf, score)
    if heuristic == "gnd":
        fx, fy, fxy = N1_, np.full_like(fg, N_1), N11
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = (np.maximum(np.log(fx), np.log(fy)) - np.log(fxy)) \
                / np.maximum(np.log(N) - np.minimum(np.log(fx), np.log(fy)),
                             1e-12)
            score = np.exp(-raw)
        score = np.where(fxy == 0, 0.0, score)
        return np.where((fx == fy) & (fx == fxy), 1.0, score)
    raise ValueError(f"unknown significance heuristic: {heuristic}")


def _sig_reduce(parts: Dataset, key_col: str, size: int,
                heuristic: str) -> pd.DataFrame:
    """Bounded significance reduce: groupby(key) -> global totals (two
    scalars) -> per-BLOCK scored top-``size`` partials -> driver merge of
    n_blocks*size rows. Exact (each key's total lives in one block after the
    groupby) and the driver never holds the key/vocab cardinality — the
    shard_size discipline of SignificantTermsAggregatorFactory."""
    # vocabulary-sized partials: consolidate blocks before the shuffle
    # (driver-leak discipline, see composite_agg / dedup/minhash.py)
    merged = (parts.repartition(_shuffle_blocks()).groupby(key_col)
              .aggregate(Sum("fg", alias_name="fg"),
                         Sum("bg", alias_name="bg"))
              .materialize())  # consumed twice (totals + scoring)

    def totals(t: pa.Table) -> pa.Table:
        return pa.table({
            "fg": pa.array([pc.sum(t.column("fg")).as_py() or 0], pa.int64()),
            "bg": pa.array([pc.sum(t.column("bg")).as_py() or 0], pa.int64()),
        })

    tot = merged.map_batches(totals, batch_format="pyarrow").to_pandas()
    n_fg, n_bg = int(tot["fg"].sum()), int(tot["bg"].sum())

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fg"] = df["fg"].fillna(0)
        df["score"] = _sig_scores(df["fg"].to_numpy(), df["bg"].to_numpy(),
                                  n_fg, n_bg, heuristic)
        df = df[df["score"] > 0]
        return df.sort_values(["score", key_col], ascending=[False, True],
                              kind="mergesort").head(size)

    tops = merged.map_batches(block_top, batch_format="pandas").to_pandas()
    tops = tops.sort_values(["score", key_col], ascending=[False, True],
                            kind="mergesort").head(size)
    return tops[[key_col, "fg", "bg", "score"]].reset_index(drop=True)


def significant_text_agg(ds: Dataset, text_col: str, id_col: str,
                         foreground: Callable[[pa.Table], pa.Array],
                         analyzer: str = "default",
                         size: int = 10, heuristic: str = "jlh",
                         filter_duplicate_text: bool = False
                         ) -> pd.DataFrame:
    """significant_text: significance-scored over-represented TERMS of an
    analyzed text field in the foreground docs vs the whole corpus
    (SignificantTextAggregationBuilder). Counts are document frequencies
    (each doc contributes a term once). Tokenization is batched through
    analyze_batch (no per-doc Python tokenize loop) and the final reduce is
    bounded per-block top-N (driver memory independent of vocabulary size).

    ``filter_duplicate_text``: drop exact duplicate texts before counting
    (keep the lowest-id copy) — the reference option's goal of stopping
    copy-pasted boilerplate from dominating the statistics
    (SignificantTextAggregationBuilder#filterDuplicateText; the reference
    additionally prunes duplicate SEQUENCES via DeDuplicatingTokenFilter —
    this engine implements the whole-document level, documented subset)."""
    from ..analysis.analyzer import analyze_batch

    if filter_duplicate_text:
        from ..dedup.exact import dedup_exact
        ds = dedup_exact(ds, text_col=text_col, id_col=id_col)

    def explode(t: pa.Table) -> pa.Table:
        fg_mask = pc.cast(foreground(t), pa.int64())
        at = analyze_batch(t, text_column=text_col, analyzer=analyzer)
        toks = at.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n_per = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc_idx = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
        fg_doc = fg_mask.to_numpy(zero_copy_only=False)
        pairs = pa.table({
            "doc": pa.array(doc_idx),
            "term": toks.flatten(),
            "fg": pa.array(fg_doc[doc_idx]),
        })
        # doc-frequency dedup: one row per (doc, term), then the per-batch
        # combine — both vectorized Arrow group_bys
        dedup = (pairs.group_by(["doc", "term"])
                 .aggregate([("fg", "max")])
                 .rename_columns(["doc", "term", "fg"]))
        return (dedup.group_by(["term"])
                .aggregate([("fg", "sum"), ([], "count_all")])
                .rename_columns(["term", "fg", "bg"]))

    parts = ds.map_batches(explode, batch_format="pyarrow")
    return _sig_reduce(parts, "term", size, heuristic)


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


def filters_agg(ds: Dataset, filters: Dict[str, Callable[[pa.Table], pa.Array]],
                other_bucket: bool = False,
                other_bucket_key: str = "_other_") -> pd.DataFrame:
    """filters: named-predicate doc counts (FiltersAggregator). Each filter is
    a vectorized Arrow predicate ``table -> bool array``.

    ``other_bucket=True`` appends the catch-all bucket counting docs that
    match NO named filter (FiltersAggregator.OTHER_BUCKET_KEY)."""
    names = list(filters)

    def partial(t: pa.Table) -> pa.Table:
        counts, any_hit = [], None
        for n in names:
            m = pc.fill_null(pc.cast(filters[n](t), pa.bool_()), False)
            counts.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
            any_hit = m if any_hit is None else pc.or_(any_hit, m)
        out_names, out_counts = list(names), counts
        if other_bucket:
            other = t.num_rows - (int(pc.sum(pc.cast(
                any_hit, pa.int64())).as_py() or 0) if names else 0)
            out_names = names + [other_bucket_key]
            out_counts = counts + [other]
        return pa.table({
            "name": pa.array(out_names, pa.string()),
            "doc_count": pa.array(out_counts, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = (parts.groupby("name")
              .aggregate(Sum("doc_count", alias_name="doc_count")).to_pandas())
    order = names + ([other_bucket_key] if other_bucket else [])
    return merged.set_index("name").loc[order].reset_index()


def filter_agg(ds: Dataset, predicate: Callable[[pa.Table], pa.Array],
               value_col: Optional[str] = None) -> pd.DataFrame:
    """`filter` single-bucket agg (FilterAggregationBuilder): doc_count of
    docs matching the predicate, plus sum/avg of ``value_col`` inside the
    bucket when given — one-row combiner partials, no shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.cast(predicate(t), pa.bool_())
        n = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        cols = {"doc_count": pa.array([n], pa.int64())}
        if value_col is not None:
            v = t.column(value_col).filter(mask)
            cols["vsum"] = pa.array(
                [float(pc.sum(v).as_py() or 0.0)], pa.float64())
        return pa.table(cols)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["doc_count"].sum())
    row = {"doc_count": n}
    if value_col is not None:
        row["sum"] = float(p["vsum"].sum())
        row["avg"] = row["sum"] / n if n else float("nan")
    return pd.DataFrame([row])


def global_agg(ds: Dataset, scoped: Callable[[pa.Table], pa.Array],
               value_col: str) -> pd.DataFrame:
    """`global` agg (GlobalAggregationBuilder): a bucket that ESCAPES the
    request's query scope — sub-aggs run over ALL docs while sibling aggs
    stay query-scoped. Returns two rows (bucket = 'query'/'global') with
    doc_count + avg(value_col), computed in ONE pass (both partials per
    block; the scoped mask is the request's query as a filter predicate)."""

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.cast(scoped(t), pa.bool_())
        v = t.column(value_col)
        vq = v.filter(mask)
        return pa.table({
            "nq": pa.array([int(pc.sum(pc.cast(mask, pa.int64())).as_py()
                                or 0)], pa.int64()),
            "sq": pa.array([float(pc.sum(vq).as_py() or 0.0)], pa.float64()),
            "ng": pa.array([t.num_rows], pa.int64()),
            "sg": pa.array([float(pc.sum(v).as_py() or 0.0)], pa.float64()),
        })

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    nq, ng = int(p["nq"].sum()), int(p["ng"].sum())
    return pd.DataFrame([
        {"bucket": "query", "doc_count": nq,
         "avg": float(p["sq"].sum()) / nq if nq else float("nan")},
        {"bucket": "global", "doc_count": ng,
         "avg": float(p["sg"].sum()) / ng if ng else float("nan")},
    ])


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
                  after: Optional[Tuple] = None,
                  sub_aggs: Optional[Dict[str, Tuple[str, str]]] = None
                  ) -> pd.DataFrame:
    """composite: paginated multi-source buckets in key order with after-key
    cursor (bucket/composite/CompositeAggregator.java). Scale shape: the
    after-key predicate runs as a DISTRIBUTED lexicographic filter on the
    merged buckets and the page is collected via per-block first-``size``
    partials (exact: after the groupby each key lives in one block), so the
    driver holds n_blocks*size rows — never the full key cardinality
    (composite exists precisely to page millions of keys).

    ``sub_aggs``: {out_name: (op, col)} per-bucket metrics, op in
    sum/avg/min/max — computed as map-side combiner partials merged in the
    SAME shuffle as doc_count (the reference's sub-aggregation tree under
    each composite bucket)."""
    sub_aggs = dict(sub_aggs or {})
    bad = [o for o, (op, _) in sub_aggs.items()
           if op not in ("sum", "avg", "min", "max")]
    if bad:
        raise ValueError(f"unsupported composite sub-agg op for {bad}")

    # composite SOURCES beyond terms (CompositeValuesSourceBuilder):
    # {"field", "type": "histogram", "interval"} and {"field", "type":
    # "date_histogram", "calendar_interval"} derive a bucket-key column
    # map-only, then behave exactly like a terms source
    derived = [(i, s) for i, s in enumerate(sources)
               if isinstance(s, dict)]
    if derived:
        sources = list(sources)
        specs = []
        for i, s in derived:
            name = f"_src_{i}"
            specs.append((name, dict(s)))
            sources[i] = name

        def derive(t: pa.Table) -> pa.Table:
            for name, s in specs:
                if s.get("type") == "geotile_grid":
                    # the 4th composite source (GeoTileGridValuesSource-
                    # Builder): z/x/y web-mercator tile keys
                    from .geo import geotile_keys
                    la, lo = s["fields"]
                    key = geotile_keys(
                        t.column(la).to_numpy(zero_copy_only=False),
                        t.column(lo).to_numpy(zero_copy_only=False),
                        int(s.get("precision", 7)))
                    t = t.append_column(name, pa.array(key))
                    continue
                v = t.column(s["field"]).to_numpy(zero_copy_only=False)
                if s.get("type") == "date_histogram":
                    unit = {"year": "Y", "month": "M", "week": "W",
                            "day": "D", "hour": "h",
                            "minute": "m"}[s["calendar_interval"]]
                    d64 = v.astype("datetime64[ns]")
                    if unit == "W":
                        dd = d64.astype("datetime64[D]")
                        dow = (dd.astype(np.int64) + 3) % 7
                        key = (dd - dow.astype("timedelta64[D]")) \
                            .astype("datetime64[us]")
                    else:
                        key = d64.astype(f"datetime64[{unit}]") \
                            .astype("datetime64[us]")
                else:  # histogram
                    iv = float(s["interval"])
                    key = np.floor(v.astype(np.float64) / iv) * iv
                t = t.append_column(name, pa.array(key))
            return t

        ds = ds.map_batches(derive, batch_format="pyarrow")
    if sub_aggs:
        # partial columns: one per distinct (pa_op, col); avg rides on sum
        part_ops = sorted({("sum" if op == "avg" else op, col)
                           for op, col in sub_aggs.values()})

        def partial(t: pa.Table) -> pa.Table:
            res = t.group_by(sources).aggregate(
                [([], "count_all")] + [(col, op) for op, col in part_ops])
            ren = {"count_all": "doc_count"}
            for op, col in part_ops:
                ren[f"{col}_{op}"] = f"{op}_{col}"
            return res.rename_columns(
                [ren.get(c, c) for c in res.column_names])

        parts = ds.map_batches(partial, batch_format="pyarrow")
    else:
        parts = _partial_counts(ds, sources)
    # high-cardinality keys make partials ~input-sized: consolidate blocks
    # before the groupby shuffle — MANY small map blocks leak the sort's
    # per-partition sub-blocks into the DRIVER process (measured: 1M keys /
    # 64 input blocks -> +284 MB driver RSS; repartitioned -> +8 MB and a
    # faster shuffle). Block count tracks CPU count for sort parallelism.
    reducers = [Sum("doc_count", alias_name="doc_count")]
    if sub_aggs:
        from ray.data.aggregate import Max, Min
        for op, col in part_ops:
            name = f"{op}_{col}"
            red = {"sum": Sum, "min": Min, "max": Max}[op]
            reducers.append(red(name, alias_name=name))
    merged = (parts.repartition(_shuffle_blocks())
              .groupby(sources)
              .aggregate(*reducers))
    if after is not None:
        af = tuple(after)

        def after_filter(t: pa.Table) -> pa.Table:
            n = t.num_rows
            gt = np.zeros(n, dtype=bool)
            eq = np.ones(n, dtype=bool)
            for col, a in zip(sources, af):  # vectorized lexicographic >
                v = t.column(col).to_numpy(zero_copy_only=False)
                if v.dtype.kind == "M" and isinstance(a, str):
                    a = np.datetime64(a)
                gt |= eq & (v > a)
                eq &= v == a
            return t.filter(pa.array(gt))

        merged = merged.map_batches(after_filter, batch_format="pyarrow")

    def block_head(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sources, kind="mergesort").head(size)

    tops = merged.map_batches(block_head, batch_format="pandas").to_pandas()
    tops = tops.sort_values(sources, kind="mergesort").head(size)
    tops = tops.reset_index(drop=True)
    for out_name, (op, col) in sub_aggs.items():
        if op == "avg":
            tops[out_name] = tops[f"sum_{col}"] / tops["doc_count"]
        else:
            tops[out_name] = tops[f"{op}_{col}"]
    if sub_aggs:  # drop partial columns not requested by name
        keep = sources + ["doc_count"] + list(sub_aggs)
        tops = tops[keep]
    return tops


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
                          size: int = 10, heuristic: str = "jlh",
                          background_filter:
                          Optional[Callable[[pa.Table], pa.Array]] = None
                          ) -> pd.DataFrame:
    """significant_terms: keys over-represented in the foreground set vs the
    whole index (SignificantTermsAggregatorFactory). ``heuristic`` selects
    the scoring function (jlh default; chi_square / mutual_information /
    gnd / percentage — bucket/terms/heuristic/). The final reduce is
    bounded per-block top-N (see _sig_reduce).

    ``background_filter`` narrows the BACKGROUND set to the matching docs
    (SignificantTermsAggregationBuilder.backgroundFilter) — the
    "unusual vs this context" comparison instead of vs the whole index."""

    def partial(t: pa.Table) -> pa.Table:
        if background_filter is not None:
            t = t.filter(pc.fill_null(pc.cast(background_filter(t),
                                              pa.bool_()), False))
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
    return _sig_reduce(parts, field, size, heuristic)
