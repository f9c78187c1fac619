"""Windowed aggregates over event streams (the batch translation of §2.9).

The reference is not a stream processor; these are the windowed operators a
training-data/event pipeline needs, expressed per the stream-shaped-workload
pattern: the input is an ordered, partitioned log — partition by key, sort by
ts within the group, window with pandas inside ``groupby().map_groups``.
Ordering assumption: windows are computed per key over that key's complete,
ts-sorted history (delivered by the groupby shuffle); there is no event-time
watermarking (no late data in batch).

- tumbling_window: fixed, non-overlapping buckets of ``size``
- sliding_window:  overlapping buckets every ``slide`` (emitted per window start)
- session_window:  gap-based sessions (new session when ts-gap > ``gap``)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def _ts_us(ts: pd.Series) -> pd.Series:
    """Timestamps -> int64 MICROSECONDS regardless of the series' backing
    resolution (arrow hands pandas datetime64[us]; pd.to_datetime builds ns)."""
    return ts.astype("datetime64[us]").astype("int64")


def _floor_ts(ts: pd.Series, size_us: int) -> pd.Series:
    ival = _ts_us(ts)
    return pd.to_datetime((ival // size_us) * size_us, unit="us")


def tumbling_window(ds: Dataset, key_col: str, ts_col: str, value_col: str,
                    size: str = "1h") -> pd.DataFrame:
    """Per (key, floor(ts/size)): count + sum(value). This one needs no
    per-key sort at all — it is a pure keyed aggregate, so it runs as the
    partial-counts combiner pattern (map-side pre-agg, tiny shuffle)."""
    size_us = int(pd.Timedelta(size).value // 1000)

    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["window_start"] = _floor_ts(df[ts_col], size_us)
        g = (df.groupby([key_col, "window_start"])
             .agg(doc_count=(value_col, "size"), value_sum=(value_col, "sum"))
             .reset_index())
        # strip the b'pandas' schema metadata: its embedded dict makes the
        # schema unhashable and Ray's block dedup logs a warning per block
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = (parts.groupby([key_col, "window_start"])
           .aggregate(Sum("doc_count", alias_name="doc_count"),
                      Sum("value_sum", alias_name="value_sum"))
           .to_pandas())
    return (out.sort_values([key_col, "window_start"])
            .reset_index(drop=True))


def sliding_window(ds: Dataset, key_col: str, ts_col: str, value_col: str,
                   size: str = "1h", slide: str = "30min") -> pd.DataFrame:
    """Overlapping windows: each event lands in size/slide windows; emitted
    per (key, window_start). Implemented by replicating each row into its
    covering windows inside map_batches (vectorized), then the same tiny
    keyed aggregate as tumbling."""
    size_us = int(pd.Timedelta(size).value // 1000)
    slide_us = int(pd.Timedelta(slide).value // 1000)
    n_cover = (size_us + slide_us - 1) // slide_us

    import pyarrow as pa

    def explode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ts = _ts_us(df[ts_col])
        base = (ts // slide_us) * slide_us
        frames = []
        for i in range(n_cover):
            start = base - i * slide_us
            m = (ts >= start) & (ts < start + size_us)
            sub = df[m.values].copy()
            sub["window_start"] = pd.to_datetime(start[m.values], unit="us")
            frames.append(sub)
        out = pd.concat(frames, ignore_index=True)
        g = (out.groupby([key_col, "window_start"])
             .agg(doc_count=(value_col, "size"), value_sum=(value_col, "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    parts = ds.map_batches(explode, batch_format="pyarrow")
    out = (parts.groupby([key_col, "window_start"])
           .aggregate(Sum("doc_count", alias_name="doc_count"),
                      Sum("value_sum", alias_name="value_sum"))
           .to_pandas())
    return (out.sort_values([key_col, "window_start"])
            .reset_index(drop=True))


def session_window(ds: Dataset, key_col: str, ts_col: str, value_col: str,
                   gap: str = "30min") -> pd.DataFrame:
    """Gap-based sessions per key: sort the key's events by ts, start a new
    session when the gap exceeds ``gap``. Requires the per-key history in one
    place -> groupby(key).map_groups (the documented ordering assumption)."""
    gap_us = int(pd.Timedelta(gap).value // 1000)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = _ts_us(g[ts_col])
        new_sess = np.concatenate(([True], np.diff(ts) > gap_us))
        sess_id = np.cumsum(new_sess) - 1
        g = g.assign(_sess=sess_id)
        out = (g.groupby("_sess")
               .agg(session_start=(ts_col, "min"), session_end=(ts_col, "max"),
                    doc_count=(value_col, "size"), value_sum=(value_col, "sum"))
               .reset_index(drop=True))
        out[key_col] = g[key_col].iloc[0]
        return out[[key_col, "session_start", "session_end", "doc_count", "value_sum"]]

    out = ds.groupby(key_col).map_groups(sessions, batch_format="pandas").to_pandas()
    return (out.sort_values([key_col, "session_start"])
            .reset_index(drop=True))
