"""Deterministic synthetic transcript corpus (FIXTURES.md §1) + query set.

Schema matches BASELINE.json input_hint exactly:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp[us]

Properties exercised (all seed-fixed, seed=42 default; NO external data):
- Zipfian vocabulary (~5k terms, s≈1.1) with English stopwords interleaved
  (stopword removal + hot-term skew handling get real work),
- 5-120 tokens/turn (norm quantization sees varied lengths),
- edge rows: empty text, punctuation-only, mixed case, accented unicode,
  CJK ideographs, and a >255-char token (max_token_length split),
- unique (conv_id, turn_idx), contiguous turn_idx per conversation, global
  order by (conv_id, turn_idx) preserved across output files.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
    "pa", "qui", "ro", "su", "ta", "ve", "wi", "xo", "yu", "za",
    "bra", "cle", "dri", "flo", "gre",
]
_STOP = ["the", "and", "of", "to", "in", "a", "is", "that", "it", "for",
         "on", "with", "as", "at", "by", "this", "was", "are", "be", "or"]
_ROLES = ["user", "assistant", "user", "assistant", "system", "tool"]
_TOOLS = ["", "", "", "search", "code_exec", "browser", "file_read"]


def _vocab(n: int = 5000) -> List[str]:
    words = []
    i = 0
    while len(words) < n:
        a = _SYLLABLES[i % 25]
        b = _SYLLABLES[(i // 25) % 25]
        c = _SYLLABLES[(i // 625) % 25]
        words.append(a + b + (c if i >= 625 else ""))
        i += 1
    return words


def synthesize_transcripts(n_turns: int, seed: int = 42,
                           avg_turns_per_conv: int = 20) -> pa.Table:
    """Build the corpus as ONE Arrow table in stable (conv_id, turn_idx) order."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(5000), dtype=object)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()

    n_convs = max(1, n_turns // avg_turns_per_conv)
    conv_of_turn = np.sort(rng.integers(0, n_convs, size=n_turns))
    # contiguous turn_idx per conversation
    turn_idx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv_of_turn, return_index=True)
    turn_idx = np.arange(n_turns, dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate((starts, [n_turns])))
    )
    conv_ids = np.array([f"conv-{c:07d}" for c in conv_of_turn], dtype=object)

    lens = rng.integers(5, 121, size=n_turns)
    total = int(lens.sum())
    toks = vocab[rng.choice(len(vocab), size=total, p=p)]
    stop_mask = rng.random(total) < 0.3
    stop_words = np.array(_STOP, dtype=object)[rng.integers(0, len(_STOP), size=total)]
    toks = np.where(stop_mask, stop_words, toks)
    # mixed case on ~8% of tokens
    case_mask = rng.random(total) < 0.08
    upcased = np.array([t.capitalize() for t in toks[case_mask]], dtype=object)
    toks[case_mask] = upcased

    bounds = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(toks[bounds[i]:bounds[i + 1]]) for i in range(n_turns)]

    # deterministic edge rows
    long_tok = "x" * 300
    for i in range(n_turns):
        if i % 997 == 499:
            texts[i] = ""
        elif i % 613 == 100:
            texts[i] = "!!! ... ?? -- ##"
        elif i % 401 == 200:
            texts[i] = texts[i][:40] + " 漢字搜索引擎 カタカナ"
        elif i % 509 == 300:
            texts[i] = "café naïve résumé Zürich " + texts[i][:40]
        elif i % 701 == 350:
            texts[i] = long_tok + " " + texts[i][:40]
        elif i % 293 == 150:
            texts[i] = texts[i][:60] + " can't O'Brien 3.14 v2_beta foo-bar"

    roles = np.array(_ROLES, dtype=object)[
        (turn_idx % len(_ROLES)).astype(np.int64)]
    tools = np.array(_TOOLS, dtype=object)[rng.integers(0, len(_TOOLS), size=n_turns)]
    base_us = np.int64(1704067200_000000)  # 2024-01-01 UTC
    ts = base_us + conv_of_turn.astype(np.int64) * 3_600_000_000 + turn_idx.astype(np.int64) * 30_000_000

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx.astype(np.int32)),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def write_transcript_corpus(out_dir: str, n_turns: int, n_files: int = 8,
                            seed: int = 42, force: bool = False) -> List[str]:
    """Write the corpus as n_files parquet files, globally ordered by
    (conv_id, turn_idx) across the sorted file names (index-build invariant).
    Idempotent: returns existing files unless ``force``."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f".complete-{n_turns}-{n_files}-{seed}")
    existing = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    if os.path.exists(marker) and existing and not force:
        return existing
    for f in existing:
        os.remove(f)
    tbl = synthesize_transcripts(n_turns, seed=seed)
    # split on conversation boundaries so files don't split a conversation
    n = tbl.num_rows
    cuts = [round(i * n / n_files) for i in range(n_files + 1)]
    conv = tbl.column("conv_id").to_pylist()
    for i in range(1, n_files):
        c = cuts[i]
        while 0 < c < n and conv[c] == conv[c - 1]:
            c += 1
        cuts[i] = c
    paths = []
    for i in range(n_files):
        lo, hi = cuts[i], cuts[i + 1]
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"transcripts-{i:04d}.parquet")
        pq.write_table(tbl.slice(lo, hi - lo), path, compression="zstd")
        paths.append(path)
    open(marker, "w").close()
    return paths


def reference_queries() -> List[dict]:
    """The reference query set (FIXTURES.md §2): single/multi-term, rare +
    common + absent terms, stopword-only (=> zero terms => no hits), case
    variants, unicode."""
    qs = [
        ("q01", "bace", 10),
        ("q02", "bace cedi", 10),
        ("q03", "quiquixo zaza", 10),          # rare terms
        ("q04", "the and of", 10),             # stopword-only -> no hits
        ("q05", "BACE CeDi", 10),              # case variants
        ("q06", "nosuchtermxyz", 10),          # absent
        ("q07", "bace nosuchtermxyz", 10),     # mix present/absent
        ("q08", "漢字", 10),
        ("q09", "café", 10),
        ("q10", "cedi difo fogu guha", 20),    # multi-term OR
        ("q11", "bace bace", 10),              # duplicate term => boost 2
        ("q12", "can't", 10),
        ("q13", "3.14", 10),
        ("q14", "haki kilo", 5),
        ("q15", "suta tave vewi wixo xoyu", 10),
    ]
    return [{"query_id": q, "query_text": t, "k": k} for q, t, k in qs]
