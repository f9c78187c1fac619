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


def delete_by_query(
    source_path,
    dest_path: str,
    predicate: Callable[[pa.Table], "pa.ChunkedArray"],
    columns: Optional[List[str]] = None,
    batch_size: Optional[int] = 8192,
) -> dict:
    """``_delete_by_query`` analogue (modules/reindex/
    TransportDeleteByQueryAction.java): segments are immutable here, so
    "delete" = rewrite the corpus WITHOUT the matching docs (exactly what
    the reference's merge eventually does to deleted docs). ``predicate``
    returns a boolean mask of docs to DELETE per batch. Returns
    {"deleted", "remaining"}."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(source_path, columns=columns)
    total = ds.count()

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(predicate(t)))

    ds.map_batches(drop, batch_format="pyarrow",
                   batch_size=batch_size).write_parquet(dest_path)
    remaining = ray.data.read_parquet(dest_path).count()
    return {"deleted": total - remaining, "remaining": remaining}


def update_by_query(
    source_path,
    dest_path: str,
    script: Callable[[pa.Table], pa.Table],
    predicate: Optional[Callable[[pa.Table], "pa.ChunkedArray"]] = None,
    columns: Optional[List[str]] = None,
    batch_size: Optional[int] = 8192,
) -> dict:
    """``_update_by_query`` analogue (TransportUpdateByQueryAction.java):
    rewrite the corpus applying ``script`` to docs matching ``predicate``
    (all docs when None), passing the rest through unchanged — the
    immutable-segment translation of in-place update. Returns
    {"updated", "total"}."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(source_path, columns=columns)
    total = ds.count()

    if predicate is None:
        ds.map_batches(script, batch_format="pyarrow",
                       batch_size=batch_size).write_parquet(dest_path)
        return {"updated": total, "total": total}

    def apply(t: pa.Table) -> pa.Table:
        """Matched rows go through the script, the rest pass through.
        Row order within a batch is not preserved (hit rows first) —
        downstream index builds re-sort by sort_cols, matching the
        reference where update_by_query reorders doc ids too."""
        m = predicate(t)
        hit = t.filter(m)
        miss = t.filter(pc.invert(m))
        if hit.num_rows == 0:
            return t
        return pa.concat_tables([script(hit), miss]).combine_chunks()

    def cnt(t: pa.Table) -> pa.Table:
        n = pc.sum(predicate(t)).as_py() or 0
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    updated = int(ds.map_batches(cnt, batch_format="pyarrow",
                                 batch_size=batch_size).sum("n") or 0)
    ds.map_batches(apply, batch_format="pyarrow",
                   batch_size=batch_size).write_parquet(dest_path)
    return {"updated": updated, "total": total}
