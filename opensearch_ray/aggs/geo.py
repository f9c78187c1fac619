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


def geo_bounds_agg(ds: Dataset, lat_col: str, lon_col: str) -> dict:
    """geo_bounds (metrics/GeoBoundsAggregator.java, wrap_longitude=false):
    bounding box of all non-null points — top_left=(max lat, min lon),
    bottom_right=(min lat, max lon)."""

    def partial(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(lat) | np.isnan(lon))
        if not ok.any():
            return pa.table({"top": pa.array([], pa.float64()),
                             "bottom": pa.array([], pa.float64()),
                             "left": pa.array([], pa.float64()),
                             "right": pa.array([], pa.float64())})
        return pa.table({"top": pa.array([float(lat[ok].max())]),
                         "bottom": pa.array([float(lat[ok].min())]),
                         "left": pa.array([float(lon[ok].min())]),
                         "right": pa.array([float(lon[ok].max())])})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if p.empty:
        return {"top": None, "bottom": None, "left": None, "right": None}
    return {"top": float(p["top"].max()), "bottom": float(p["bottom"].min()),
            "left": float(p["left"].min()), "right": float(p["right"].max())}


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
MERCATOR_MAX_LAT = 85.0511287798066  # GeoTileUtils.LATITUDE_MASK


def geotile_keys(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized slippy-map tile keys "z/x/y" (GeoTileUtils.getXTile/getYTile:
    web-mercator y, out-of-range tiles clamped to [0, tiles-1])."""
    tiles = 1 << precision
    x = np.floor((lon + 180.0) / 360.0 * tiles)
    s = np.sin(np.radians(lat))
    # 0.5 - ln((1+sin)/(1-sin)) / (4*pi)  — GeoTileUtils.getYTile's formula.
    y = np.floor((0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)) * tiles)
    x = np.clip(x, 0, tiles - 1).astype(np.int64)
    y = np.clip(np.nan_to_num(y, nan=0.0, posinf=tiles - 1, neginf=0.0),
                0, tiles - 1).astype(np.int64)
    z = np.char.add(f"{precision}/", x.astype(np.str_))
    return np.char.add(np.char.add(z, "/"), y.astype(np.str_))


def geohash_keys(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized base-32 geohash encode (Geohash.stringEncode semantics):
    5*precision bits, longitude first, bits interleaved lon/lat from the MSB."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    x = np.clip(np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)),
                0, (1 << lon_bits) - 1).astype(np.int64)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)),
                0, (1 << lat_bits) - 1).astype(np.int64)
    h = np.zeros(len(x), dtype=np.int64)
    # lon bit i lands at position 2i (odd nbits) / 2i+1 (even nbits); lat is
    # the complementary comb.  Derivation: MSB-first interleave lon,lat,...
    lon_off, lat_off = (0, 1) if nbits % 2 else (1, 0)
    for i in range(lon_bits):
        h |= ((x >> i) & 1) << (2 * i + lon_off)
    for i in range(lat_bits):
        h |= ((y >> i) & 1) << (2 * i + lat_off)
    alpha = np.frombuffer(GEOHASH_ALPHABET.encode(), dtype=np.uint8)
    chars = np.empty((len(h), precision), dtype=np.uint8)
    for c in range(precision):
        chars[:, c] = alpha[(h >> (5 * (precision - 1 - c))) & 31]
    return chars.reshape(-1).view(f"S{precision}").astype(str)


def _grid_agg(ds: Dataset, lat_col: str, lon_col: str, precision: int,
              size: int, keyfn) -> pd.DataFrame:
    """Shared geotile_grid/geohash_grid body: per-batch vectorized cell keys +
    combine, small groupby over cell cardinality, bounded top-N reduce
    (doc_count desc, key asc — InternalGeoGrid reduce order)."""
    from .bucket import _topn_buckets
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keys, counts = np.unique(keyfn(lat, lon, precision), return_counts=True)
        return pa.table({"key": pa.array(keys.astype(object), pa.string()),
                         "doc_count": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = parts.groupby("key").aggregate(_Sum("doc_count",
                                                 alias_name="doc_count"))
    return _topn_buckets(merged, "doc_count", ["key"], size)


def geotile_grid_agg(ds: Dataset, lat_col: str, lon_col: str,
                     precision: int = 7, size: int = 10000) -> pd.DataFrame:
    """geotile_grid (bucket/geogrid/GeoTileGridAggregationBuilder.java):
    buckets keyed "z/x/y", top ``size`` by doc_count desc then key asc."""
    return _grid_agg(ds, lat_col, lon_col, precision, size, geotile_keys)


def geohash_grid_agg(ds: Dataset, lat_col: str, lon_col: str,
                     precision: int = 5, size: int = 10000) -> pd.DataFrame:
    """geohash_grid (bucket/geogrid/GeoHashGridAggregationBuilder.java)."""
    return _grid_agg(ds, lat_col, lon_col, precision, size, geohash_keys)


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


def _point_in_polygon_mask(lat: np.ndarray, lon: np.ndarray,
                           polygon: "list[tuple]") -> np.ndarray:
    """Even-odd ray casting, vectorized over rows (vertex loop only)."""
    inside = np.zeros(len(lat), dtype=bool)
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= crosses & (lon < xint)
    return inside


def geo_shape_filter(ds: Dataset, lat_col: str, lon_col: str, shape: dict,
                     relation: str = "intersects") -> Dataset:
    """geo_shape query (server/index/query/GeoShapeQueryBuilder.java) for
    POINT documents against an ``envelope`` or ``polygon`` query shape with
    the four ShapeRelation values. For point docs, ``intersects`` ==
    ``within`` (a point intersects iff it lies inside), ``disjoint`` is the
    complement, and ``contains`` (doc geometry contains the query shape)
    can only hold for a degenerate point-sized shape.

    ``shape``: {"type": "envelope", "coordinates": [[lon_w, lat_n],
    [lon_e, lat_s]]} (GeoJSON-style, the reference's envelope order) or
    {"type": "polygon", "coordinates": [[[lon, lat], ...]]}."""
    typ = shape["type"].lower()
    rel = relation.lower()
    if rel not in ("intersects", "within", "disjoint", "contains"):
        raise ValueError(f"unknown relation: {relation}")

    def inside_mask(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        if typ == "envelope":
            (x_w, y_n), (x_e, y_s) = shape["coordinates"]
            return ((lat <= y_n) & (lat >= y_s)
                    & (lon >= x_w) & (lon <= x_e))
        if typ == "polygon":
            ring = [(y, x) for x, y in shape["coordinates"][0]]
            return _point_in_polygon_mask(lat, lon, ring)
        raise ValueError(f"unsupported shape type: {typ}")

    def filt(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        m = inside_mask(lat, lon)
        if rel == "disjoint":
            m = ~m
        elif rel == "contains":
            if typ == "envelope":
                (x_w, y_n), (x_e, y_s) = shape["coordinates"]
                pt = (x_w, y_n) if (x_w == x_e and y_n == y_s) else None
            else:
                pts = {tuple(p) for p in shape["coordinates"][0]}
                pt = next(iter(pts)) if len(pts) == 1 else None
            if pt is None:
                m = np.zeros(len(lat), bool)
            else:
                m = (lat == pt[1]) & (lon == pt[0])
        return t.filter(pa.array(m))

    return ds.map_batches(filt, batch_format="pyarrow")


def geo_polygon_filter(ds: Dataset, lat_col: str, lon_col: str,
                       polygon: "list[tuple]") -> Dataset:
    """geo_polygon query (server/index/query/GeoPolygonQueryBuilder.java):
    keep rows whose point lies inside the polygon — even-odd ray casting,
    vectorized over the batch (the loop is over polygon VERTICES, not rows).
    ``polygon``: [(lat, lon), ...]; closed implicitly. Points exactly on an
    edge follow the half-open crossing rule (same as Lucene's tangent
    handling at vertex latitudes)."""

    def filt(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        inside = np.zeros(len(lat), dtype=bool)
        n = len(polygon)
        for i in range(n):
            y1, x1 = polygon[i]
            y2, x2 = polygon[(i + 1) % n]
            crosses = (y1 > lat) != (y2 > lat)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            inside ^= crosses & (lon < xint)
        return t.filter(pa.array(inside))

    return ds.map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------- geo_shape over SHAPE docs

def _ring_xy(coords) -> np.ndarray:
    """GeoJSON ring [[lon, lat], ...] -> (k, 2) float array, closed."""
    r = np.asarray(coords, np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _edges(ring: np.ndarray) -> tuple:
    return ring[:-1], ring[1:]  # (k,2) starts, (k,2) ends


def _cross(o, a, b):
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _seg_hits(a0, a1, b0, b1) -> tuple:
    """All-pairs segment relation between edge sets A (n) and B (m):
    returns (any_contact, any_proper_crossing). Contact includes touches
    and collinear overlap; proper = interiors cross. Vectorized n x m."""
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]
    d1 = _cross(B0, B1, A0)
    d2 = _cross(B0, B1, A1)
    d3 = _cross(A0, A1, B0)
    d4 = _cross(A0, A1, B1)
    proper = (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
              & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0))

    def on_seg(p, s0, s1):
        return ((np.minimum(s0[..., 0], s1[..., 0]) <= p[..., 0])
                & (p[..., 0] <= np.maximum(s0[..., 0], s1[..., 0]))
                & (np.minimum(s0[..., 1], s1[..., 1]) <= p[..., 1])
                & (p[..., 1] <= np.maximum(s0[..., 1], s1[..., 1])))

    touch = (((d1 == 0) & on_seg(A0, B0, B1))
             | ((d2 == 0) & on_seg(A1, B0, B1))
             | ((d3 == 0) & on_seg(B0, A0, A1))
             | ((d4 == 0) & on_seg(B1, A0, A1)))
    crossing = (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)))
    return bool((crossing | touch).any()), bool(proper.any())


def _pip_pts(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd PIP for (n,2) lon/lat points against a closed ring."""
    return _point_in_polygon_mask(pts[:, 1], pts[:, 0],
                                  [(y, x) for x, y in ring[:-1]])


def _query_ring(shape: dict) -> np.ndarray:
    typ = shape["type"].lower()
    if typ == "envelope":
        (x_w, y_n), (x_e, y_s) = shape["coordinates"]
        return _ring_xy([[x_w, y_s], [x_e, y_s], [x_e, y_n], [x_w, y_n]])
    if typ == "polygon":
        return _ring_xy(shape["coordinates"][0])
    raise ValueError(f"unsupported query shape: {typ}")


def _relate_doc(geom: dict, q_ring: np.ndarray) -> tuple:
    """(intersects, within, contains) of one doc geometry vs the query
    ring. Simple (non-self-intersecting) geometries, outer rings only —
    holes and dateline/pole wrapping are out of scope (documented; the
    reference handles the dateline via its quadtree decomposition)."""
    typ = geom["type"].lower()
    q0, q1 = _edges(q_ring)
    if typ == "point":
        p = np.asarray([geom["coordinates"]], np.float64)
        inside = bool(_pip_pts(p, q_ring)[0])
        return inside, inside, False
    if typ == "linestring":
        pts = np.asarray(geom["coordinates"], np.float64)
        d0, d1 = pts[:-1], pts[1:]
        contact, proper = _seg_hits(d0, d1, q0, q1)
        v_in = _pip_pts(pts, q_ring)
        return (contact or bool(v_in.any()),
                bool(v_in.all()) and not proper, False)
    if typ == "polygon":
        ring = _ring_xy(geom["coordinates"][0])
        d0, d1 = _edges(ring)
        contact, proper = _seg_hits(d0, d1, q0, q1)
        doc_v_in = _pip_pts(ring[:-1], q_ring)
        q_v_in = _pip_pts(q_ring[:-1], ring)
        intersects = contact or bool(doc_v_in.any()) or bool(q_v_in.any())
        within = bool(doc_v_in.all()) and not proper
        contains = bool(q_v_in.all()) and not proper
        return intersects, within, contains
    raise ValueError(f"unsupported doc geometry: {typ}")


def geo_shape_docs_filter(ds: Dataset, shape_col: str, query_shape: dict,
                          relation: str = "intersects") -> Dataset:
    """geo_shape query over SHAPE-VALUED documents
    (modules/geo/.../GeoShapeFieldMapper.java + GeoShapeQueryBuilder):
    ``shape_col`` holds GeoJSON geometries (dict or JSON string) of type
    Point / LineString / Polygon; the query shape is an envelope or
    polygon; all four ShapeRelation values. Map-only — each batch parses
    and relates its own geometries (edge tests are vectorized all-pairs
    numpy per doc; vertex counts are small). The point-doc fast path stays
    in :func:`geo_shape_filter`."""
    rel = relation.lower()
    if rel not in ("intersects", "within", "disjoint", "contains"):
        raise ValueError(f"unknown relation: {relation}")
    q_ring = _query_ring(query_shape)

    def filt(t: pa.Table) -> pa.Table:
        import json as _json
        raw = t.column(shape_col).to_pylist()
        keep = np.zeros(len(raw), bool)
        for i, g in enumerate(raw):
            if g is None:
                continue
            if isinstance(g, str):
                g = _json.loads(g)
            inter, within, contains = _relate_doc(g, q_ring)
            keep[i] = {"intersects": inter, "disjoint": not inter,
                       "within": within, "contains": contains}[rel]
        return t.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")
