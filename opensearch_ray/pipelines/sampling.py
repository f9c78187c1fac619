"""Deterministic stratified sampling — training-data mixture control.

A web-scale corpus is mixed by DOMAIN (stratum) with per-stratum keep
rates ("20 % of commoncrawl, 100 % of wikipedia..."). The operator is
map-only and deterministic: each row's keep decision derives from its id
via Knuth's multiplicative hash (TAOCP vol. 3 §6.4, A = 2654435761 =
floor(2^32/phi)), NOT from a random stream — so reruns, retries and
resumed partitions keep exactly the same rows, and the decision is
reproducible in plain SQL (the oracle anchor).

No reference-engine counterpart (the `sampler` AGGREGATION is the
closest shape); this is the training-data family the graft brief adds.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_KNUTH_A = np.uint64(2654435761)
_MOD = np.uint64(1 << 32)


def _keep_mask(ids: np.ndarray, rate: float) -> np.ndarray:
    """keep iff (id * A mod 2^32) < rate * 2^32 — uniform over the
    multiplicative-hash ring, deterministic per id."""
    h = (ids.astype(np.uint64) * _KNUTH_A) % _MOD
    return h < np.uint64(min(max(rate, 0.0), 1.0) * float(_MOD))


def stratified_sample(ds: Dataset, stratum_col: str, rates: Dict[str, float],
                      id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      seed: Optional[int] = None) -> Dataset:
    """Keep each row with its stratum's rate (``default_rate`` for
    unlisted strata). ``seed`` offsets the id before hashing so
    independent samples can be drawn from the same corpus."""
    off = np.uint64(0 if seed is None else seed)

    def filt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64) + off
        strata = t.column(stratum_col).to_pylist()
        rate = np.fromiter((rates.get(s, default_rate) for s in strata),
                           np.float64, t.num_rows)
        h = (ids * _KNUTH_A) % _MOD
        keep = h.astype(np.float64) < rate * float(_MOD)
        return t.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def pack_sequences(ds: Dataset, text_col: str = "text",
                   id_col: str = "doc_id", budget: int = 512,
                   group_size: int = 1000) -> Dataset:
    """Concat-then-chunk sequence packing — the pretraining batch shape:
    documents are concatenated in id order and the token stream is cut
    into fixed-``budget`` sequences; a doc may straddle a boundary.
    -> Dataset[(id, n_tokens, group, seq, offset)] where ``seq`` is the
    sequence index within the group and ``offset`` the doc's first-token
    position inside that sequence.

    Distributed shape: groups are fixed id ranges (id // group_size), so
    assignment needs ONE low-cardinality groupby; inside a group the
    exclusive running token sum is a vectorized cumsum. Groups are
    independent packing domains (shard boundaries) — no global scan.
    Token count = whitespace tokens (packing happens pre-tokenizer in
    budget units; swap in an analyzer count upstream if needed)."""
    import pyarrow.compute as pc

    def count_and_group(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # token count = separator count + 1 on the trimmed text — equal
        # to len(split(' ')) WITHOUT materializing 60M token strings
        # (splitting to count measured ~10x this kernel at 1M docs)
        trimmed = pc.utf8_trim_whitespace(
            pc.fill_null(t.column(text_col), ""))
        seps = pc.count_substring(trimmed, " ") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.greater(pc.utf8_length(trimmed), 0) \
            .to_numpy(zero_copy_only=False)
        n = np.where(nonempty, seps + 1, 0)
        return pa.table({id_col: pa.array(ids),
                         "n_tokens": pa.array(n),
                         "group": pa.array(ids // group_size)})

    counted = (ds.map_batches(count_and_group, batch_format="pyarrow")
               .repartition(16, shuffle=False))  # <=16-block discipline

    def pack_group(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_s, n_s = ids[order], n[order]
        excl = np.concatenate(([0], np.cumsum(n_s)[:-1]))
        return pa.table({
            id_col: pa.array(ids_s),
            "n_tokens": pa.array(n_s),
            "group": g.column("group").take(pa.array(order)),
            "seq": pa.array(excl // budget),
            "offset": pa.array(excl % budget)})

    return counted.groupby("group").map_groups(pack_group,
                                               batch_format="pyarrow")
