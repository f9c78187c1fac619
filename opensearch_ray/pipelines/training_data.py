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

from opensearch_ray.arrowutil import nometa

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
    n_shards: Optional[int] = None,
    force: bool = False,
    decontaminate_against: Optional[str] = None,
    sample_rates: Optional[dict] = None,
    sample_stratum_col: Optional[str] = None,
    pack_budget: Optional[int] = None,
    c4_heuristics: bool = False,
    lm_quality_min: Optional[float] = None,
    dsir_target: Optional[str] = None,
    dsir_logw_min: float = 0.0,
    dedup_lines_sep: Optional[str] = None,
    nb_keep: Optional[dict] = None,
    bpe_merges: int = 0,
    remove_spans_k: int = 0,
) -> dict:
    """Returns a summary dict {input_rows, kept_rows, near_dups_removed,
    shards_written, resumed}. Output layout: out_dir/shard=NNN/*.parquet
    + _manifest.json.

    ``n_shards`` defaults to input-size/256 MB (min 8) so shard count grows
    with the corpus instead of pinning write layout at a fixed fan-in. The
    write itself streams: ``write_parquet(partition_cols=)`` emits one file
    per (block, shard) — write parallelism = cluster width, no whole-shard
    task. Resume: completed runs short-circuit on the manifest; a crashed
    run leaves only the staging dir (wiped on rerun) and/or fully-renamed
    shard dirs (skipped on rerun — shard content is deterministic)."""
    manifest_path = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest_path) and not force:
        m = json.load(open(manifest_path))
        m["resumed"] = True
        return m

    ds = ray.data.read_parquet(input_path)
    input_rows = ds.count()
    if n_shards is None:
        try:
            in_bytes = ds.size_bytes() or 0
        except Exception:
            in_bytes = 0
        n_shards = max(8, int(in_bytes // (256 << 20)) + 1)

    # --- near-dup kill list (side pass over id+text only)
    pairs = minhash_dedup_pairs(
        ray.data.read_parquet(input_path, columns=[id_col, text_col]),
        text_col=text_col, id_col=id_col, threshold=near_dup_threshold)
    kill = set(pairs["b"].tolist()) if len(pairs) else set()
    kill_ref = ray.put(pa.array(sorted(kill), type=pa.int64()))

    # --- main streaming pass
    if dedup_lines_sep is not None:
        # CCNet/RefinedWeb paragraph dedup FIRST: rewrite text before
        # any scoring sees it (two low-cardinality partition shuffles;
        # passenger columns ride the marker rows)
        from ..dedup import line_dedup
        passengers = [c for c in ds.schema().names
                      if c not in (id_col, text_col)]
        ds = line_dedup(ds, text_col=text_col, id_col=id_col,
                        sep=dedup_lines_sep, keep_cols=passengers)
    if remove_spans_k:
        # ExactSubstr cut step (Lee et al. ACL'22): duplicated k-token
        # spans removed corpus-wide before any scoring sees the text
        from ..dedup.substring import remove_duplicated_spans
        passengers = [c for c in ds.schema().names
                      if c not in (id_col, text_col)]
        if passengers:
            cut = remove_duplicated_spans(
                ray.data.read_parquet(input_path,
                                      columns=[id_col, text_col]),
                text_col=text_col, id_col=id_col, k=remove_spans_k)
            rest = ds.drop_columns([text_col])
            from ..joins import hash_join
            ds = hash_join(cut, rest, key_col=id_col)
        else:
            ds = remove_duplicated_spans(ds, text_col=text_col,
                                         id_col=id_col, k=remove_spans_k)
    if c4_heuristics:
        # C4/Gopher shape drops first — cheapest rejection, map-only
        from ..textstats.heuristics import c4_filter
        ds = c4_filter(ds, text_col, min_words=1)
    if lm_quality_min is not None:
        # CCNet-shape LM filter: self-trained char-trigram model
        # (one object-store reduce + broadcast), then a map-only score
        # + threshold; the lm_score column rides into the output
        from ..textstats.lm_quality import lm_quality_scores
        ds = lm_quality_scores(ds, text_col=text_col)
        thr = float(lm_quality_min)
        ds = ds.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("lm_score"), pa.scalar(thr))),
            batch_format="pyarrow")
    if dsir_target:
        # DSIR (Xie et al. NeurIPS'23): importance weight vs a target
        # corpus — two bounded count passes + map-only scoring; the
        # threshold keeps the filter shuffle-free (the ranked top-k
        # variant is textstats.dsir.dsir_select for bounded k)
        from ..textstats.dsir import dsir_log_weights
        tgt = ray.data.read_parquet(dsir_target, columns=[text_col])
        ds = dsir_log_weights(ds, tgt, text_col=text_col)
        ds = ds.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("dsir_logw"),
                pa.scalar(float(dsir_logw_min)))),
            batch_format="pyarrow")
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

    if decontaminate_against:
        # eval-set leakage removal: broadcast benchmark window kill-set,
        # map-only corpus scan (dedup/substring.py)
        from ..dedup import decontaminate
        bench = ray.data.read_parquet(decontaminate_against)
        ds = decontaminate(ds, bench, text_col=text_col, id_col=id_col)
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(t.column("contaminated")))
            .drop_columns(["contaminated"]),
            batch_format="pyarrow")

    ds = dedup_exact(ds, text_col, id_col)

    if sample_rates:
        # deterministic mixture control (pipelines/sampling.py)
        from .sampling import stratified_sample
        ds = stratified_sample(ds, sample_stratum_col or "predicted_lang",
                               sample_rates, id_col=id_col,
                               default_rate=1.0)

    if nb_keep:
        # model-based filter (the fastText-shape quality classifier slot):
        # train NB on a LABELED side table {path, text_col, label_col},
        # broadcast, keep docs predicted in `keep` classes
        from ..textstats import nb_predict, nb_train
        labeled = ray.data.read_parquet(
            nb_keep["path"], columns=[text_col, nb_keep["label_col"]])
        model = nb_train(labeled, text_col, nb_keep["label_col"],
                         buckets=int(nb_keep.get("buckets", 4096)))
        keep_set = pa.array([str(x) for x in nb_keep["keep"]])
        ds = nb_predict(ds, model, text_col)
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("nb_pred"),
                                        value_set=keep_set)),
            batch_format="pyarrow")

    ds = token_counts(ds, text_col)
    if bpe_merges:
        # real token-budget accounting: corpus-trained BPE counts ride
        # next to the whitespace counts
        from ..textstats import bpe_token_counts, bpe_train
        merges = bpe_train(ds, text_col, n_merges=int(bpe_merges))
        ds = bpe_token_counts(ds, merges, text_col)

    # --- resumable sharded write: shard = hash(id) % n_shards, atomic rename
    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sh = (pd.util.hash_array(ids.astype(object)) % np.uint64(n_shards)
              ).astype(np.int32)
        return nometa(t.append_column("_shard", pa.array(sh)))

    import shutil

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(out_dir, "_staging")
    shutil.rmtree(staging, ignore_errors=True)
    # streaming partitioned write: every block writes its per-shard slices
    # directly (parallelism = block count, peak task memory = one block)
    (ds.map_batches(add_shard, batch_format="pyarrow")
       .write_parquet(staging, partition_cols=["_shard"], compression="zstd"))

    # atomic-ish commit: rename each finished partition dir into place;
    # the manifest written LAST is the commit point (an all-filtered run
    # writes no staging dir at all — that's a valid 0-shard result)
    os.makedirs(staging, exist_ok=True)
    kept = 0
    shards_written = 0
    for name in sorted(os.listdir(staging)):
        if not name.startswith("_shard="):
            continue
        sh = int(name.split("=", 1)[1])
        src = os.path.join(staging, name)
        dst = os.path.join(out_dir, f"shard={sh:03d}")
        if not os.path.exists(dst):
            os.rename(src, dst)
        shards_written += 1
        # row counts from parquet footers only (no data read)
        kept += sum(pq.read_metadata(os.path.join(dst, f)).num_rows
                    for f in os.listdir(dst) if f.endswith(".parquet"))
    shutil.rmtree(staging, ignore_errors=True)
    packed_seqs = 0
    if pack_budget:
        # sequence packing sidecar (concat-then-chunk; pipelines/sampling)
        from .sampling import pack_sequences
        shard_files = [os.path.join(out_dir, d, f)
                       for d in sorted(os.listdir(out_dir))
                       if d.startswith("shard=")
                       for f in sorted(os.listdir(os.path.join(out_dir, d)))
                       if f.endswith(".parquet")]
        pk = pack_sequences(
            ray.data.read_parquet(shard_files, columns=[id_col, text_col]),
            text_col=text_col, id_col=id_col, budget=pack_budget)
        pk_dir = os.path.join(out_dir, "_packing")
        shutil.rmtree(pk_dir, ignore_errors=True)
        pk.write_parquet(pk_dir, compression="zstd")
        import pyarrow.dataset as pds
        t = pds.dataset(pk_dir).to_table(columns=["group", "seq"])
        g = t.column("group").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sq = t.column("seq").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        packed_seqs = int(np.unique(g * np.int64(1 << 32) + sq).size)

    summary = {
        "input_rows": int(input_rows),
        "kept_rows": int(kept),
        "near_dups_removed": len(kill),
        "shards_written": shards_written,
        "packed_sequences": int(packed_seqs),
        "resumed": False,
    }
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(summary, f)
    os.replace(manifest_path + ".tmp", manifest_path)
    return summary
