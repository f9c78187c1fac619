"""Pipeline aggregations (ref: server/search/aggregations/pipeline/).

These post-process an already-reduced bucket table — in the reference they run
on the coordinator after the final reduce, so here they are plain pandas over
the small DataFrame a bucket agg returned. No distributed work by design.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd


def cumulative_sum(buckets: pd.DataFrame, metric: str,
                   out: str = "cumulative_sum") -> pd.DataFrame:
    b = buckets.copy()
    b[out] = b[metric].cumsum()
    return b


def derivative(buckets: pd.DataFrame, metric: str,
               out: str = "derivative") -> pd.DataFrame:
    b = buckets.copy()
    b[out] = b[metric].diff()
    return b


def moving_fn(buckets: pd.DataFrame, metric: str, window: int,
              fn: Callable[[np.ndarray], float] = np.mean,
              out: str = "moving_fn") -> pd.DataFrame:
    """moving_fn / moving_avg: window ENDS at the previous bucket (the
    reference's MovFnPipelineAggregator uses the trailing window excluding
    the current bucket's own value by default shift=1... we follow the
    simpler inclusive window, shift=0, like moving_avg)."""
    b = buckets.copy()
    b[out] = b[metric].rolling(window, min_periods=1).apply(lambda s: fn(s.values))
    return b


def moving_percentiles(buckets: pd.DataFrame, metric: str, window: int,
                       percents=(50.0,)) -> pd.DataFrame:
    """moving_percentiles (MovingPercentilesPipelineAggregationBuilder):
    percentiles of the trailing inclusive window of a sibling metric,
    one output column per percent (``p<percent>``). The reference merges
    per-bucket t-digest sketches; driver-side windows are small, so the
    EXACT linear-interpolated percentile is used (the same convention the
    exact percentiles agg documents) — identical where the sketch is
    exact, tighter elsewhere."""
    b = buckets.copy()
    vals = b[metric].to_numpy(np.float64)
    for p in percents:
        col = np.empty(len(b))
        for i in range(len(b)):
            w = vals[max(0, i - window + 1):i + 1]
            col[i] = np.percentile(w, p)  # linear interpolation
        b[f"p{p:g}"] = col
    return b


def _mavg_simple(w: np.ndarray, **_) -> float:
    return float(np.mean(w))


def _mavg_linear(w: np.ndarray, **_) -> float:
    """LinearModel: linearly increasing weights toward the most recent."""
    k = np.arange(1, len(w) + 1, dtype=np.float64)
    return float((w * k).sum() / k.sum())


def _mavg_ewma(w: np.ndarray, alpha: float = 0.3, **_) -> float:
    """EwmaModel: forward exponential smoothing, avg0 = first value."""
    avg = float(w[0])
    for v in w[1:]:
        avg = float(v) * alpha + avg * (1.0 - alpha)
    return avg


def _mavg_holt(w: np.ndarray, alpha: float = 0.3, beta: float = 0.1, **_
               ) -> float:
    """HoltLinearModel: double exponential smoothing (level + trend),
    classic init level=w0, trend=w1-w0; returns the one-step forecast
    level+trend (on an exactly linear window this continues the line)."""
    if len(w) < 2:
        return float(w[0])
    s, b = float(w[0]), float(w[1]) - float(w[0])
    for v in w[1:]:
        s_new = alpha * float(v) + (1.0 - alpha) * (s + b)
        b = beta * (s_new - s) + (1.0 - beta) * b
        s = s_new
    return s + b


def _mavg_holt_winters(w: np.ndarray, alpha: float = 0.3, beta: float = 0.1,
                       gamma: float = 0.3, period: int = 1,
                       multiplicative: bool = False, **_) -> float:
    """HoltWintersModel: triple exponential smoothing with seasonality
    ``period`` (additive default; ``multiplicative`` per the reference's
    mult variant with its pad guard against zeros). Needs >= 2 full
    seasons, like the reference (it throws; we fall back to holt)."""
    m = int(period)
    if m < 2 or len(w) < 2 * m:
        return _mavg_holt(w, alpha=alpha, beta=beta)
    w = np.asarray(w, np.float64)
    if multiplicative:
        w = w + 1e-10 * (w == 0)  # the reference's zero padding
    level = float(w[:m].mean())
    trend = float((w[m:2 * m].mean() - w[:m].mean()) / m)
    season = (w[:m] / level).tolist() if multiplicative else \
        (w[:m] - level).tolist()
    for t in range(m, len(w)):
        v = float(w[t])
        si = t % m
        if multiplicative:
            new_level = alpha * (v / season[si]) \
                + (1 - alpha) * (level + trend)
        else:
            new_level = alpha * (v - season[si]) \
                + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        season[si] = (gamma * (v / new_level)
                      + (1 - gamma) * season[si]) if multiplicative else \
            (gamma * (v - new_level) + (1 - gamma) * season[si])
        level = new_level
    si = len(w) % m
    return (level + trend) * season[si] if multiplicative else \
        level + trend + season[si]


_MAVG_MODELS = {"simple": _mavg_simple, "linear": _mavg_linear,
                "ewma": _mavg_ewma, "holt": _mavg_holt,
                "holt_winters": _mavg_holt_winters}


def moving_avg_model(buckets: pd.DataFrame, metric: str, window: int,
                     model: str = "simple", out: str = "moving_avg",
                     **settings) -> pd.DataFrame:
    """moving_avg with the reference's model family
    (search/aggregations/pipeline/MovAvgModel.java + SimpleModel /
    LinearModel / EwmaModel / HoltLinearModel / HoltWintersModel):
    per bucket, the model evaluates the trailing inclusive window
    (min_periods=1, same convention as :func:`moving_fn`). Settings:
    alpha, beta, gamma, period, multiplicative."""
    if model not in _MAVG_MODELS:
        raise ValueError(f"unknown moving_avg model: {model}")
    fn = _MAVG_MODELS[model]
    b = buckets.copy()
    vals = b[metric].to_numpy(np.float64)
    out_v = np.empty(len(vals), np.float64)
    for i in range(len(vals)):
        out_v[i] = fn(vals[max(0, i - window + 1):i + 1], **settings)
    b[out] = out_v
    return b


def serial_diff(buckets: pd.DataFrame, metric: str, lag: int = 1,
                out: str = "serial_diff") -> pd.DataFrame:
    b = buckets.copy()
    b[out] = b[metric].diff(lag)
    return b


def bucket_script(buckets: pd.DataFrame, script: Callable[[pd.DataFrame], pd.Series],
                  out: str = "bucket_script") -> pd.DataFrame:
    b = buckets.copy()
    b[out] = script(b)
    return b


def bucket_selector(buckets: pd.DataFrame,
                    predicate: Callable[[pd.DataFrame], pd.Series]) -> pd.DataFrame:
    return buckets[predicate(buckets)].reset_index(drop=True)


def bucket_sort(buckets: pd.DataFrame, by: List[str],
                ascending=True, size: Optional[int] = None) -> pd.DataFrame:
    b = buckets.sort_values(by, ascending=ascending, kind="mergesort")
    if size is not None:
        b = b.head(size)
    return b.reset_index(drop=True)


def stats_bucket(buckets: pd.DataFrame, metric: str) -> Dict[str, float]:
    """{avg,sum,min,max,...}_bucket in one call."""
    v = buckets[metric].astype(float)
    return {
        "count": int(v.count()), "min": float(v.min()), "max": float(v.max()),
        "sum": float(v.sum()), "avg": float(v.mean()),
    }


def extended_stats_bucket(buckets: pd.DataFrame, metric: str,
                          sigma: float = 2.0) -> Dict[str, float]:
    """extended_stats_bucket (ref: pipeline/ExtendedStatsBucketPipelineAggregator.java):
    stats_bucket plus sum_of_squares, POPULATION variance/std_deviation and
    avg +/- sigma*std bounds, matching InternalExtendedStats math."""
    v = buckets[metric].astype(float).to_numpy()
    n = len(v)
    s = float(v.sum())
    ss = float(np.dot(v, v))
    avg = s / n if n else float("nan")
    var = max(ss / n - avg * avg, 0.0) if n else float("nan")
    std = float(np.sqrt(var))
    return {
        "count": n, "min": float(v.min()) if n else float("nan"),
        "max": float(v.max()) if n else float("nan"), "sum": s, "avg": avg,
        "sum_of_squares": ss, "variance": var, "std_deviation": std,
        "std_deviation_bounds_upper": avg + sigma * std,
        "std_deviation_bounds_lower": avg - sigma * std,
    }


def percentiles_bucket(buckets: pd.DataFrame, metric: str,
                       percents: List[float] = (1.0, 5.0, 25.0, 50.0,
                                                75.0, 95.0, 99.0)) -> pd.DataFrame:
    """percentiles_bucket (ref: pipeline/PercentilesBucketPipelineAggregator.java:83-93):
    sort the sibling-bucket metric values, then nearest-rank selection
    index = round(p/100 * (n-1)) — NOT interpolated like t-digest."""
    data = np.sort(buckets[metric].astype(float).to_numpy())
    n = len(data)
    vals = []
    for p in percents:
        if n == 0:
            vals.append(float("nan"))
        else:
            # Java Math.round = floor(x + 0.5)
            idx = int(np.floor((p / 100.0) * (n - 1) + 0.5))
            vals.append(float(data[idx]))
    return pd.DataFrame({"percent": list(percents), "value": vals})


def _extreme_bucket(buckets: pd.DataFrame, metric: str, key_col: str,
                    take_max: bool) -> Dict[str, object]:
    """min_bucket / max_bucket: extreme value plus the key LIST of every
    sibling bucket attaining it (ref: pipeline/InternalBucketMetricValue.java
    keeps String[] keys of all ties)."""
    v = buckets[metric].astype(float)
    if len(v) == 0:
        return {"value": float("nan"), "keys": []}
    ext = float(v.max() if take_max else v.min())
    keys = [str(k) for k in buckets.loc[v == ext, key_col]]
    return {"value": ext, "keys": keys}


def max_bucket(buckets: pd.DataFrame, metric: str, key_col: str = "key"):
    return _extreme_bucket(buckets, metric, key_col, True)


def min_bucket(buckets: pd.DataFrame, metric: str, key_col: str = "key"):
    return _extreme_bucket(buckets, metric, key_col, False)


def avg_bucket(buckets: pd.DataFrame, metric: str) -> float:
    return float(buckets[metric].astype(float).mean())


def sum_bucket(buckets: pd.DataFrame, metric: str) -> float:
    return float(buckets[metric].astype(float).sum())
