"""Reindex: read -> (optional script) -> write, with slices = Ray parallelism.

Ref: modules/reindex/ (Reindexer.java, AbstractAsyncBulkByScrollAction.java):
scroll-read source -> per-doc script -> bulk-write dest, sliced N ways. This
IS Ray Data's native shape; slices are blocks, retries/backpressure are the
streaming executor's.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import pyarrow as pa

import ray.data


def reindex(
    source_path,
    dest_path: str,
    script: Optional[Callable[[pa.Table], pa.Table]] = None,
    query: Optional[Callable[[pa.Table], pa.Table]] = None,
    columns: Optional[List[str]] = None,
    batch_size: Optional[int] = 8192,
) -> int:
    """Returns docs written. ``query`` filters batches (the reindex source
    query), ``script`` transforms them (the Painless per-doc script)."""
    ds = ray.data.read_parquet(source_path, columns=columns)
    if query is not None:
        ds = ds.map_batches(query, batch_format="pyarrow", batch_size=batch_size)
    if script is not None:
        ds = ds.map_batches(script, batch_format="pyarrow", batch_size=batch_size)
    ds.write_parquet(dest_path)
    return ray.data.read_parquet(dest_path).count()
