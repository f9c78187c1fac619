"""Geo aggregations over plain (lat, lon) double columns.

Reference: geo_distance range agg
(server/search/aggregations/bucket/range/GeoDistanceAggregationBuilder.java,
arc distance via Haversine on the sphere — GeoUtils.arcDistance) and
geo_centroid (metrics/GeoCentroidAggregator.java — running arithmetic mean of
lat/lon). No geo-point TYPE machinery (mapping, geohash) — the engine's
columnar model stores coordinates as two double columns, which is what the
doc-values of a geo_point hold anyway.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

EARTH_RADIUS_M = 6371008.7714  # GeoUtils.EARTH_MEAN_RADIUS


def haversine_m(lat1, lon1, lat2: np.ndarray, lon2: np.ndarray) -> np.ndarray:
    """Arc distance in meters (vectorized)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def geo_distance_agg(ds: Dataset, lat_col: str, lon_col: str,
                     origin: Tuple[float, float],
                     ranges: Sequence[Tuple[Optional[float], Optional[float]]]
                     ) -> pd.DataFrame:
    """geo_distance: [from, to) meter rings around origin, reported in given
    order (GeoDistanceAggregationBuilder semantics)."""
    olat, olon = origin

    def partial(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        d = haversine_m(olat, olon, lat, lon)
        counts = []
        for lo, hi in ranges:
            m = np.ones(len(d), dtype=bool)
            if lo is not None:
                m &= d >= lo
            if hi is not None:
                m &= d < hi
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


def geo_distance_filter(ds: Dataset, lat_col: str, lon_col: str,
                        origin: Tuple[float, float], distance_m: float
                        ) -> Dataset:
    """geo_distance QUERY (filter context, GeoDistanceQueryBuilder): rows
    within ``distance_m`` meters of origin (arc distance), vectorized."""
    olat, olon = origin

    def filt(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return t.filter(pa.array(haversine_m(olat, olon, lat, lon)
                                 <= distance_m))

    return ds.map_batches(filt, batch_format="pyarrow")


def geo_bounding_box_filter(ds: Dataset, lat_col: str, lon_col: str,
                            top_left: Tuple[float, float],
                            bottom_right: Tuple[float, float]) -> Dataset:
    """geo_bounding_box query (GeoBoundingBoxQueryBuilder): rows inside the
    [bottom, top] x [left, right] box (no dateline wrap)."""
    top, left = top_left
    bottom, right = bottom_right

    def filt(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        m = (lat <= top) & (lat >= bottom) & (lon >= left) & (lon <= right)
        return t.filter(pa.array(m))

    return ds.map_batches(filt, batch_format="pyarrow")


def geo_centroid_agg(ds: Dataset, lat_col: str, lon_col: str) -> dict:
    """geo_centroid: arithmetic mean of lat/lon over non-null points
    (GeoCentroidAggregator's running compensated mean, as sum/count here)."""

    def partial(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lat) | np.isnan(lon))
        return pa.table({
            "lat_sum": pa.array([float(lat[ok].sum())]),
            "lon_sum": pa.array([float(lon[ok].sum())]),
            "n": pa.array([int(ok.sum())], pa.int64()),
        })

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    if n == 0:
        return {"lat": None, "lon": None, "count": 0}
    return {"lat": float(p["lat_sum"].sum()) / n,
            "lon": float(p["lon_sum"].sum()) / n, "count": n}
