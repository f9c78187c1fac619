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
