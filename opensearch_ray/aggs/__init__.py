"""Aggregations (ref: server/search/aggregations — the reference's largest
subsystem, 95k LoC; registered in SearchModule.java:383-816).

All aggs follow the reference's partial+final shape (per-shard collect ->
coordinator reduce, InternalAggregations.java:134-162): we pre-aggregate
inside ``map_batches`` (one partial row per key per batch) and finish with a
small ``groupby().aggregate()`` — never a raw-row shuffle. Sketches
(HyperLogLog, t-digest) are mergeable partials, exactly like the reference's
CardinalityAggregator / TDigestPercentilesAggregator.
"""

from .metrics import (
    stats_agg, extended_stats_agg, value_count_agg, weighted_avg_agg,
    cardinality_exact, cardinality_hll, percentiles_tdigest,
    percentile_ranks_tdigest, hdr_percentiles, hdr_percentile_ranks,
    median_absolute_deviation_agg,
    matrix_stats_agg, top_hits_agg, scripted_metric_agg,
)
from .bucket import (
    terms_agg, multi_terms_agg, rare_terms_agg, histogram_agg,
    date_histogram_agg, auto_date_histogram_agg, adjacency_matrix_agg,
    range_agg, filters_agg, missing_agg, composite_agg, significant_terms_agg,
    date_range_agg, sampler_agg, diversified_sampler_agg, significant_text_agg,
    ip_range_agg, ip_prefix_agg, variable_width_histogram_agg,
)
from .geo import geo_distance_agg, geo_centroid_agg
from .pipeline import (
    cumulative_sum, derivative, moving_fn, serial_diff,
    bucket_script, bucket_selector, bucket_sort, stats_bucket,
    extended_stats_bucket, percentiles_bucket,
    max_bucket, min_bucket, avg_bucket, sum_bucket,
)

__all__ = [n for n in dir() if not n.startswith("_")]
