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
