"""End-to-end training-data preparation pipeline (the capstone composite).

Chains the training-data operators into ONE streaming Dataset pipeline over a
document corpus:

  read (pruned columns)
    -> quality scoring (vectorized map_batches)
    -> quality filter
    -> language id + filter (optional)
    -> exact dedup (content-hash groupby, keep-first)
    -> token counting
    -> resumable partitioned parquet write (one dir per shard; atomic
       rename + manifest so a rerun skips finished shards)

Near-dup removal (MinHash) runs as a SIDE pass producing a kill-list of doc
ids (the b-side of every near-dup pair), broadcast into a filter — the
broadcast-small-side pattern, no extra shuffle of the corpus.

Scale notes: the only all-to-all move is the content-hash groupby (64-bit
keys). Everything else is map-only and streams with backpressure.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..dedup import dedup_exact, minhash_dedup_pairs
from ..textstats import langid_heuristic, quality_scores, token_counts


def prepare_training_data(
    input_path: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.1,
    keep_langs: Optional[list] = None,
    near_dup_threshold: float = 0.8,
    n_shards: int = 8,
    force: bool = False,
) -> dict:
    """Returns a summary dict {input_rows, kept_rows, near_dups_removed,
    shards_written, resumed}. Output layout: out_dir/shard=NNN/part.parquet
    + _manifest.json (the resume unit)."""
    manifest_path = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest_path) and not force:
        m = json.load(open(manifest_path))
        m["resumed"] = True
        return m

    ds = ray.data.read_parquet(input_path)
    input_rows = ds.count()

    # --- near-dup kill list (side pass over id+text only)
    pairs = minhash_dedup_pairs(
        ray.data.read_parquet(input_path, columns=[id_col, text_col]),
        text_col=text_col, id_col=id_col, threshold=near_dup_threshold)
    kill = set(pairs["b"].tolist()) if len(pairs) else set()
    kill_ref = ray.put(pa.array(sorted(kill), type=pa.int64()))

    # --- main streaming pass
    ds = quality_scores(ds, text_col)
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("quality"),
                                            pa.scalar(min_quality))),
        batch_format="pyarrow")
    ds = langid_heuristic(ds, text_col)
    if keep_langs:
        keep_arr = pa.array(keep_langs)
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("predicted_lang"),
                                        value_set=keep_arr)),
            batch_format="pyarrow")

    def drop_near_dups(t: pa.Table) -> pa.Table:
        ks = ray.get(kill_ref)
        if len(ks) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t.column(id_col), value_set=ks)))

    ds = ds.map_batches(drop_near_dups, batch_format="pyarrow")
    ds = dedup_exact(ds, text_col, id_col)
    ds = token_counts(ds, text_col)

    # --- resumable sharded write: shard = hash(id) % n_shards, atomic rename
    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sh = (pd.util.hash_array(ids.astype(object)) % np.uint64(n_shards)
              ).astype(np.int32)
        return t.append_column("_shard", pa.array(sh))

    def write_shard(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        sh = int(g.column("_shard")[0].as_py())
        d = os.path.join(out_dir, f"shard={sh:03d}")
        if not os.path.exists(d):  # resume: finished shards are skipped
            tmp = d + f".tmp-{os.getpid()}"
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(g.drop_columns(["_shard"]).sort_by(id_col),
                           os.path.join(tmp, "part.parquet"),
                           compression="zstd")
            try:
                os.rename(tmp, d)
            except OSError:
                import shutil
                shutil.rmtree(tmp, ignore_errors=True)
        return pa.table({"shard": pa.array([sh], pa.int32()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    os.makedirs(out_dir, exist_ok=True)
    shard_rows = (ds.map_batches(add_shard, batch_format="pyarrow")
                  .groupby("_shard")
                  .map_groups(write_shard, batch_format="pyarrow")
                  .take_all())
    kept = int(sum(r["rows"] for r in shard_rows))
    summary = {
        "input_rows": int(input_rows),
        "kept_rows": kept,
        "near_dups_removed": len(kill),
        "shards_written": len(shard_rows),
        "resumed": False,
    }
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(summary, f)
    os.replace(manifest_path + ".tmp", manifest_path)
    return summary
