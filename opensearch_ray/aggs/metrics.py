"""Metric aggregations (ref: server/search/aggregations/metrics/).

Each mirrors the reference's collect/reduce split: vectorized per-batch
partials inside ``map_batches`` + a tiny final merge. Results come back as
small pandas DataFrames (they are coordinator-side reductions in the
reference too).
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def stats_agg(ds: Dataset, col: str) -> pd.DataFrame:
    """count/min/max/sum/avg — the `stats` agg (StatsAggregator)."""
    out = ds.aggregate(
        Count(alias_name="count"), Min(col, alias_name="min"),
        Max(col, alias_name="max"), Sum(col, alias_name="sum"),
        Mean(col, alias_name="avg"),
    )
    return pd.DataFrame([out])


def extended_stats_agg(ds: Dataset, col: str) -> pd.DataFrame:
    """extended_stats: + sum_of_squares, variance (population), std_deviation
    (ExtendedStatsAggregator uses population variance)."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([float(x.sum())]),
            "s2": pa.array([float((x * x).sum())]),
            "mn": pa.array([float(x.min()) if len(x) else math.inf]),
            "mx": pa.array([float(x.max()) if len(x) else -math.inf]),
        })

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, s, s2 = p["n"].sum(), p["s"].sum(), p["s2"].sum()
    avg = s / n
    var = s2 / n - avg * avg
    return pd.DataFrame([{
        "count": int(n), "min": p["mn"].min(), "max": p["mx"].max(),
        "sum": s, "avg": avg, "sum_of_squares": s2,
        "variance": var, "std_deviation": math.sqrt(max(var, 0.0)),
    }])


def value_count_agg(ds: Dataset, col: str) -> int:
    """value_count: number of non-null values."""
    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([len(t) - t.column(col).null_count], pa.int64())})
    return int(ds.map_batches(partial, batch_format="pyarrow").to_pandas()["n"].sum())


def weighted_avg_agg(ds: Dataset, value_col: str, weight_col: str) -> float:
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"vw": pa.array([float((v * w).sum())]),
                         "w": pa.array([float(w.sum())])})
    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return float(p["vw"].sum() / p["w"].sum())


def cardinality_exact(ds: Dataset, col: str) -> int:
    """Exact distinct count (shuffle of unique values only: per-batch dedup
    first, so the shuffle moves ≤ one value per distinct key per block)."""
    def local_unique(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t.column(col))})
    return ds.map_batches(local_unique, batch_format="pyarrow").unique(col).__len__()


# ----------------------------------------------------------- HyperLogLog++

_HLL_P = 14  # 2^14 registers, ~0.8% error — reference default precision
             # (CardinalityAggregator precision_threshold -> HLL++)


def _hll_partial(values: np.ndarray, p: int) -> np.ndarray:
    """Register array for one batch (mergeable by elementwise max)."""
    m = 1 << p
    h = pd.util.hash_array(values if values.dtype == object
                           else values.astype(object))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    v = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel keeps rho bounded
    # rho = leading zeros + 1. bit_length vectorized via frexp exponents:
    # values that ROUND UP to a power of two overstate by one — correct by
    # direct comparison (exact in uint64). v is never 0 (sentinel bit).
    _, e = np.frexp(v.astype(np.float64))
    bl = np.minimum(e.astype(np.int64), 64)  # top values round up past 2^64
    shift = np.clip(bl - 1, 0, 63).astype(np.uint64)
    bl = bl - (v < (np.uint64(1) << shift))
    rho = 64 - bl + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rho.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting, small range
    return est


def cardinality_hll(ds: Dataset, col: str, p: int = _HLL_P) -> int:
    """Approximate distinct via HyperLogLog: one register-array partial per
    batch, merged by elementwise max — the reference's cardinality agg shape
    (CardinalityAggregator.java, HLL++)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = np.asarray(t.column(col).to_pylist(), dtype=object)
        regs = _hll_partial(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(1 << p, dtype=np.int8)
    for b in parts["regs"]:
        merged = np.maximum(merged, np.frombuffer(b, dtype=np.int8))
    return int(round(_hll_estimate(merged)))


# --------------------------------------------------------------- t-digest

class _TDigest:
    """Small mergeable t-digest (Dunning) — the reference's percentiles
    sketch (TDigestPercentilesAggregator). Centroids kept sorted; compress
    with the k1 scale function."""

    def __init__(self, compression: float = 100.0):
        self.compression = compression
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)

    def add(self, xs: np.ndarray):
        xs = np.asarray(xs, dtype=np.float64)
        self.means = np.concatenate((self.means, xs))
        self.weights = np.concatenate((self.weights, np.ones(len(xs))))
        if len(self.means) > 20 * self.compression:
            self.compress()

    def merge(self, other: "_TDigest"):
        self.means = np.concatenate((self.means, other.means))
        self.weights = np.concatenate((self.weights, other.weights))
        self.compress()

    def compress(self):
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        # greedy merge into centroids bounded by the k1 scale function
        out_m, out_w = [], []
        cur_m, cur_w, seen = m[0], w[0], 0.0
        for i in range(1, len(m)):
            q = (seen + cur_w / 2) / total
            limit = 4 * total * q * (1 - q) / self.compression
            if cur_w + w[i] <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m[i] * w[i]) / (cur_w + w[i])
                cur_w += w[i]
            else:
                out_m.append(cur_m); out_w.append(cur_w); seen += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m); out_w.append(cur_w)
        self.means = np.array(out_m); self.weights = np.array(out_w)

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return math.nan
        self.compress()
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate((self.means, self.weights)).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, compression: float = 100.0) -> "_TDigest":
        a = np.frombuffer(b, dtype=np.float64)
        d = cls(compression)
        d.means, d.weights = a[: len(a) // 2].copy(), a[len(a) // 2:].copy()
        return d


def percentiles_tdigest(ds: Dataset, col: str,
                        qs: Sequence[float] = (1, 5, 25, 50, 75, 95, 99),
                        compression: float = 100.0) -> pd.DataFrame:
    """percentiles agg: one t-digest per batch, merged on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        d = _TDigest(compression)
        d.add(t.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        d.compress()
        return pa.table({"td": pa.array([d.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    acc = _TDigest(compression)
    for b in parts["td"]:
        acc.merge(_TDigest.from_bytes(b, compression))
    return pd.DataFrame([{f"p{q}": acc.quantile(q / 100.0) for q in qs}])


def percentile_ranks_tdigest(ds: Dataset, col: str,
                             values: Sequence[float],
                             compression: float = 100.0) -> pd.DataFrame:
    """percentile_ranks: the inverse CDF of the percentiles agg — for each
    given value, the percent of data at or below it
    (TDigestPercentileRanksAggregator / InternalTDigestPercentileRanks).
    Same distributed t-digest partials as percentiles_tdigest; the rank is
    the interpolated CDF of the merged digest."""

    def partial(t: pa.Table) -> pa.Table:
        d = _TDigest(compression)
        d.add(t.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        d.compress()
        return pa.table({"td": pa.array([d.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    acc = _TDigest(compression)
    for b in parts["td"]:
        acc.merge(_TDigest.from_bytes(b, compression))
    acc.compress()
    if len(acc.means) == 0:
        return pd.DataFrame([{f"rank_{v}": math.nan for v in values}])
    cum = np.cumsum(acc.weights) - acc.weights / 2
    total = acc.weights.sum()
    vs = np.asarray(list(values), dtype=np.float64)
    ranks = np.interp(vs, acc.means, cum / total,
                      left=0.0, right=1.0) * 100.0
    return pd.DataFrame([{f"rank_{v}": float(r)
                          for v, r in zip(values, ranks)}])


def _hdr_quantize(v: np.ndarray, digits: int) -> np.ndarray:
    """HDR-histogram value quantization: keep ceil(log2(10^digits)) mantissa
    bits, guaranteeing relative error <= 10^-digits — the DoubleHistogram
    precision contract (HDRPercentilesAggregator's
    numberOfSignificantValueDigits). Bit-masking the float64 mantissa is the
    binary sub-bucket scheme without the bucket bookkeeping; values whose
    integer part needs fewer bits (e.g. small ints at digits>=2) quantize to
    themselves. Non-negative values only (the reference rejects negatives)."""
    m_bits = int(np.ceil(np.log2(10 ** digits)))
    x = np.asarray(v, dtype=np.float64)
    if (x < 0).any():
        raise ValueError("HDR histogram requires non-negative values")
    bits = x.view(np.uint64)
    mask = ~np.uint64((1 << (52 - m_bits)) - 1)
    return (bits & mask).view(np.float64)


def _hdr_buckets(ds: Dataset, col: str, digits: int) -> pd.DataFrame:
    """Distributed HDR bucket counts: per-batch quantize + count, exact
    groupby merge. The driver-side result is BOUNDED by the histogram's
    fixed bucket count (~2^m_bits per binade — the HDR design point), not by
    the data cardinality."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        q = _hdr_quantize(
            t.column(col).to_numpy(zero_copy_only=False), digits)
        u, c = np.unique(q, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("v").aggregate(_Sum("cnt", alias_name="cnt"))
              .to_pandas())
    return merged.sort_values("v").reset_index(drop=True)


def hdr_percentiles(ds: Dataset, col: str,
                    qs: Sequence[float] = (1, 5, 25, 50, 75, 95, 99),
                    digits: int = 2) -> pd.DataFrame:
    """HDR-histogram percentiles (HDRPercentilesAggregator, conformance
    190_percentiles_hdr_metric.yml): exact bucket-count merge, percentile p
    = the smallest bucket value whose cumulative count reaches
    ceil(p/100 * n) (the lowest-equivalent-value convention)."""
    b = _hdr_buckets(ds, col, digits)
    if b.empty:
        return pd.DataFrame([{f"p{q}": math.nan for q in qs}])
    cum = b["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = b["v"].to_numpy()
    out = {}
    for q in qs:
        need = max(1, int(math.ceil(q / 100.0 * n)))
        out[f"p{q}"] = float(vals[int(np.searchsorted(cum, need))])
    return pd.DataFrame([out])


def hdr_percentile_ranks(ds: Dataset, col: str, values: Sequence[float],
                         digits: int = 2) -> pd.DataFrame:
    """HDR percentile_ranks (HDRPercentileRanksAggregator): rank(v) = 100 *
    count(x <= v) / n over the quantized buckets — the
    getPercentileAtOrBelowValue convention."""
    b = _hdr_buckets(ds, col, digits)
    if b.empty:
        return pd.DataFrame([{f"rank_{v}": math.nan for v in values}])
    cum = b["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = b["v"].to_numpy()
    out = {}
    for v in values:
        qv = float(_hdr_quantize(np.array([v]), digits)[0])
        idx = int(np.searchsorted(vals, qv, side="right"))
        out[f"rank_{v}"] = 100.0 * (int(cum[idx - 1]) if idx else 0) / n
    return pd.DataFrame([out])


def median_absolute_deviation_agg(ds: Dataset, col: str,
                                  compression: float = 100.0) -> float:
    """median_absolute_deviation: two t-digest passes (median of values,
    then median of |x - median|) — the reference's approximate MAD
    (MedianAbsoluteDeviationAggregator, t-digest based)."""

    def partial1(t: pa.Table) -> pa.Table:
        d = _TDigest(compression)
        d.add(t.column(col).to_numpy(zero_copy_only=False).astype(np.float64))
        d.compress()
        return pa.table({"td": pa.array([d.to_bytes()], pa.binary())})

    acc = _TDigest(compression)
    for b in ds.map_batches(partial1, batch_format="pyarrow").to_pandas()["td"]:
        acc.merge(_TDigest.from_bytes(b, compression))
    med = acc.quantile(0.5)

    def partial2(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        d = _TDigest(compression)
        d.add(np.abs(x - med))
        d.compress()
        return pa.table({"td": pa.array([d.to_bytes()], pa.binary())})

    acc2 = _TDigest(compression)
    for b in ds.map_batches(partial2, batch_format="pyarrow").to_pandas()["td"]:
        acc2.merge(_TDigest.from_bytes(b, compression))
    return float(acc2.quantile(0.5))


def matrix_stats_agg(ds: Dataset, cols: List[str]) -> pd.DataFrame:
    """matrix_stats (modules/aggs-matrix-stats): pairwise covariance /
    correlation from one pass of moment partials."""

    def partial(t: pa.Table) -> pa.Table:
        X = np.stack([t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                      for c in cols])
        out = {"n": pa.array([X.shape[1]], pa.int64())}
        for i, c in enumerate(cols):
            out[f"s_{c}"] = pa.array([float(X[i].sum())])
            for j, c2 in enumerate(cols):
                if j >= i:
                    out[f"sp_{c}_{c2}"] = pa.array([float((X[i] * X[j]).sum())])
        return pa.table(out)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = p["n"]
    rows = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if j < i:
                continue
            spk = f"sp_{a}_{b}" if f"sp_{a}_{b}" in p else f"sp_{b}_{a}"
            cov = p[spk] / n - (p[f"s_{a}"] / n) * (p[f"s_{b}"] / n)
            var_a = p[f"sp_{a}_{a}"] / n - (p[f"s_{a}"] / n) ** 2
            var_b = p[f"sp_{b}_{b}"] / n - (p[f"s_{b}"] / n) ** 2
            corr = cov / math.sqrt(var_a * var_b) if var_a > 0 and var_b > 0 else math.nan
            rows.append({"col_a": a, "col_b": b, "covariance": cov, "correlation": corr})
    return pd.DataFrame(rows)


def top_hits_agg(ds: Dataset, group_col: str, sort_col: str, k: int = 1,
                 descending: bool = True) -> Dataset:
    """top_hits: best k docs per bucket (per-group sort + head)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_col, ascending=not descending).head(k)

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")


def scripted_metric_agg(ds: Dataset, map_fn: Callable[[pa.Table], object],
                        combine_fn: Callable[[List[object]], object]):
    """scripted_metric: UDF map per batch + combine on the driver (the
    Painless map/combine/reduce surface as Python callables)."""
    def partial(t: pa.Table) -> pa.Table:
        import pickle
        return pa.table({"state": pa.array([pickle.dumps(map_fn(t))], pa.binary())})
    import pickle
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return combine_fn([pickle.loads(b) for b in parts["state"]])
