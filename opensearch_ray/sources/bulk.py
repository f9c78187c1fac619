"""`_bulk` NDJSON source — the reference's ingestion wire format.

Reference: ``rest-api-spec/api/bulk.json`` + ``server/src/main/java/org/
opensearch/action/bulk/BulkRequestParser.java`` — newline-delimited JSON
where each operation is an ACTION line (``{"index": {"_id": ...}}``,
``create``, ``delete``; ``update`` = ``{"doc": {...}}`` overlay) optionally
followed by a SOURCE line.

Ray-Data-first shape: files stream through ``read_text`` (one block per
chunk), each batch parses its action/source pairs vectorized-ish (json
line loop — parse cost, not engine cost), and the DELETE/CREATE/UPDATE
semantics resolve in ONE deterministic pass per ``_id`` ordered by
(file, line): last surviving op wins, exactly the reference's
sequence-number ordering inside a bulk body.

Caveat for multi-file 100-TB runs: op ORDER is only defined within one
bulk body (one file); cross-file resolution uses (file order, line
order) — the same convention the corpus layout invariant gives docids.
"""
from __future__ import annotations

import json
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

_ACTIONS = ("index", "create", "delete", "update")


def parse_bulk_lines(lines: List[str], offset: int = 0) -> pd.DataFrame:
    """One bulk body -> rows (_id, _op, _seq, source-dict). Malformed
    pairs raise, like BulkRequestParser's strict mode."""
    rows = []
    i, seq = 0, offset
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        action = json.loads(line)
        (op, meta), = action.items()
        if op not in _ACTIONS:
            raise ValueError(f"unknown bulk action {op!r}")
        doc = None
        if op != "delete":
            if i >= len(lines):
                raise ValueError(f"action {op!r} missing its source line")
            doc = json.loads(lines[i])
            i += 1
            if op == "update":
                doc = doc.get("doc", doc)
        rows.append({"_id": meta.get("_id"), "_op": op, "_seq": seq,
                     "_doc": doc})
        seq += 1
    return pd.DataFrame(rows)


def read_bulk_ndjson(paths, columns: Optional[List[str]] = None) -> Dataset:
    """Stream `_bulk` NDJSON file(s) into a Dataset of live documents.

    Semantics per ``_id`` in (file, line) order — the reference's
    within-body op ordering:
      - ``index``  — upsert (replaces any earlier doc)
      - ``create`` — insert; IGNORED if the _id already exists
                     (version-conflict shape, the op simply loses)
      - ``update`` — partial doc overlay onto the current doc
      - ``delete`` — removes the doc (later ops may re-create)
    """
    files = sorted(paths) if isinstance(paths, (list, tuple)) else [paths]
    # one group per file preserves intra-file order; file index salts _seq
    per_file = []
    for fi, f in enumerate(files):
        txt = ray.data.read_text(f)
        n = txt.count()

        def parse(t: pa.Table, _fi=fi) -> pa.Table:
            df = parse_bulk_lines(t.column("text").to_pylist(),
                                  offset=_fi * (1 << 40))
            if not len(df):
                return pa.table({"_id": pa.array([], pa.string()),
                                 "_op": pa.array([], pa.string()),
                                 "_seq": pa.array([], pa.int64()),
                                 "_json": pa.array([], pa.string())})
            return pa.table({
                "_id": pa.array([str(x) for x in df["_id"]]),
                "_op": pa.array(df["_op"].tolist()),
                "_seq": pa.array(df["_seq"].to_numpy(np.int64)),
                "_json": pa.array([json.dumps(d) if d is not None else ""
                                   for d in df["_doc"]]),
            })

        # a bulk body's action/source pairing crosses block boundaries —
        # parse per FILE (repartition(1) per file keeps pairs together;
        # bulk bodies are bounded by the reference's http.max_content_length
        # =100 MB, so one block per body is the natural grain)
        per_file.append(txt.repartition(1).map_batches(
            parse, batch_format="pyarrow"))
    ds = per_file[0]
    for d in per_file[1:]:
        ds = ds.union(d)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_seq", kind="mergesort")
        doc, exists = None, False
        for op, js in zip(g["_op"], g["_json"]):
            if op == "delete":
                doc, exists = None, False
            elif op == "create":
                if not exists:
                    doc, exists = json.loads(js), True
            elif op == "index":
                doc, exists = json.loads(js), True
            elif op == "update" and exists:
                doc = {**doc, **json.loads(js)}
        if doc is None:
            return pd.DataFrame()
        row = {"_id": g["_id"].iloc[0], **doc}
        return pd.DataFrame([row])

    out = ds.groupby("_id").map_groups(resolve, batch_format="pandas")
    if columns:
        out = out.select_columns(columns)
    return out
