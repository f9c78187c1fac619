"""Line-level (paragraph) dedup: corpus-wide keep-first over text lines.

The CCNet / RefinedWeb pre-training pipelines (Wenzek et al. LREC'20;
Penedo et al. NeurIPS'23) drop duplicated PARAGRAPHS rather than whole
documents — boilerplate (headers, nav, license blocks) repeats across
pages that are otherwise unique. Semantics here: split every doc on
``sep``, keep each distinct line's FIRST occurrence ordered by
(doc id, line position), drop every later occurrence, and re-join the
surviving lines per doc in their original order.

Distributed shape (100 TB): explode is map-only; dedup co-locates all
occurrences of a line via a LOW-CARDINALITY hash(line) % P partition
shuffle (never a groupby over distinct-line cardinality — the repo's
<=16-block shuffle discipline); reassembly is a second P-way partition
shuffle on hash(doc id). Line text crosses the exchange once per stage,
which is the floor for a rebuild. No driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from opensearch_ray.arrowutil import nometa


def line_dedup(ds: Dataset, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n",
               P: int = 64, keep_cols=()) -> Dataset:
    """-> Dataset(``id_col``, ``text_col``, *keep_cols, lines_removed):
    corpus-wide keep-first line dedup. Every input doc appears in the
    output (a doc whose every line occurred earlier keeps an empty
    text); splitting follows ``str.split(sep)`` (empty segments are
    lines too, so the result is reproducible in SQL via string_split).
    ``keep_cols`` ride the per-doc marker row through the shuffle — no
    extra join to rehydrate passenger columns."""
    keep_cols = list(keep_cols)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        lines: list = []
        n_lines = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            ls = s.split(sep)
            lines.extend(ls)
            n_lines[i] = len(ls)
        doc_of = np.repeat(ids, n_lines)
        pos = np.concatenate([np.arange(n, dtype=np.int64)
                              for n in n_lines]) if len(texts) else \
            np.empty(0, np.int64)
        lh = pd.util.hash_array(np.asarray(lines, dtype=object)) \
            .astype(np.uint64)
        # marker row per doc (pos = -1) rides along so empty survivors
        # keep their row; it carries the original line count and the
        # passenger columns (null on line rows)
        cols = {
            id_col: pa.array(np.concatenate((doc_of, ids))),
            "_pos": pa.array(np.concatenate(
                (pos, np.full(len(ids), -1, np.int64)))),
            "_line": pa.array(lines + [""] * len(ids), pa.string()),
            "_nl": pa.array(np.concatenate(
                (np.zeros(len(lines), np.int64), n_lines))),
            "_lpart": pa.array(np.concatenate((
                (lh % np.uint64(P)).astype(np.int32),
                # markers skip dedup; spread them uniformly by doc hash
                (pd.util.hash_array(ids.astype(np.uint64))
                 % np.uint64(P)).astype(np.int32)))),
        }
        for c in keep_cols:
            v = t.column(c).combine_chunks() if isinstance(
                t.column(c), pa.ChunkedArray) else t.column(c)
            cols[c] = pa.concat_arrays(
                [pa.nulls(len(lines), v.type), v])
        return nometa(pa.table(cols))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["_pos"] >= 0]
        kept = (real.sort_values([id_col, "_pos"], kind="mergesort")
                .drop_duplicates(subset=["_line"], keep="first"))
        return pd.concat((kept, g[g["_pos"] < 0]), ignore_index=True) \
            .drop(columns=["_lpart"])

    def add_dpart(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return nometa(t.append_column(
            "_dpart", pa.array((pd.util.hash_array(ids.astype(np.uint64))
                                % np.uint64(P)).astype(np.int32))))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "_pos"], kind="mergesort")
        marks = g[g["_pos"] < 0][[id_col, "_nl"] + keep_cols]
        real = g[g["_pos"] >= 0]
        joined = (real.groupby(id_col, sort=True)["_line"]
                  .agg(sep.join).rename(text_col).reset_index())
        kept_n = (real.groupby(id_col, sort=True).size()
                  .rename("_kept").reset_index())
        out = marks.merge(joined, on=id_col, how="left") \
                   .merge(kept_n, on=id_col, how="left")
        out[text_col] = out[text_col].fillna("")
        out["lines_removed"] = (out["_nl"]
                                - out["_kept"].fillna(0).astype(np.int64))
        return out[[id_col, text_col] + keep_cols + ["lines_removed"]]

    kept = (ds.map_batches(explode, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_lpart").map_groups(keep_first,
                                          batch_format="pandas"))
    return (kept.map_batches(add_dpart, batch_format="pyarrow")
            .repartition(16, shuffle=False)
            .groupby("_dpart").map_groups(reassemble,
                                          batch_format="pandas"))
