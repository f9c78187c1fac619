"""C4 / Gopher-style heuristic quality filters (beyond-reference, the
LLM-training-data side of the engine).

Published rule sets re-expressed as ONE vectorized Arrow pass per batch:

- **C4** (Raffel et al., JMLR 2020 §2.2): terminal-punctuation line rule,
  the "lorem ipsum" and curly-brace page drops, short-line handling.
- **Gopher repetition lives in** ``textstats/repetition.py``; this module
  adds the Gopher/FineWeb document-shape signals: word count bounds,
  bullet-line and ellipsis-line ratios.

Design: ``c4_signals`` ANNOTATES (map-only, zero shuffles, one
pyarrow.compute chain per batch — no per-row Python); ``c4_filter``
applies the published thresholds on the annotated columns. Both stream:
at 100 TB these are pure map stages with per-batch flat arrays, segmented
reductions over line offsets, and no state.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

#: line counts as "terminally punctuated" when it ends in . ! ? possibly
#: followed by a closing quote — the C4 rule ("retained only lines that
#: ended in a terminal punctuation mark")
_TERMINAL_RE = r'[.!?]["”\']?$'
_BULLET_RE = r'^[-*•]'
_ELLIPSIS_RE = r'\.\.\.$'


def _line_ratio_signals(text: pa.ChunkedArray):
    """Per-doc (n_lines, punct_ratio, bullet_ratio, ellipsis_ratio) over
    NON-EMPTY trimmed lines, via one flatten + segmented reductions."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.utf8_trim_whitespace(lines.flatten())
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    punct = pc.match_substring_regex(flat, _TERMINAL_RE) \
        .to_numpy(zero_copy_only=False) & nonempty
    bullet = pc.match_substring_regex(flat, _BULLET_RE) \
        .to_numpy(zero_copy_only=False) & nonempty
    ellip = pc.match_substring_regex(flat, _ELLIPSIS_RE) \
        .to_numpy(zero_copy_only=False) & nonempty

    # segmented sums per doc (reduceat needs non-empty segments: docs with
    # zero lines cannot occur — split always yields >= 1 element)
    starts = offs[:-1]
    cum = np.concatenate(([0], np.cumsum(nonempty)))
    n_lines = cum[offs[1:]] - cum[starts]

    def seg(mask):
        c = np.concatenate(([0], np.cumsum(mask)))
        return c[offs[1:]] - c[starts]

    denom = np.maximum(n_lines, 1)
    return (n_lines.astype(np.int64),
            seg(punct) / denom, seg(bullet) / denom, seg(ellip) / denom)


def c4_signals_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Append the heuristic columns to one Arrow batch."""
    text = t.column(text_col)
    n_lines, punct_r, bullet_r, ellip_r = _line_ratio_signals(text)
    n_words = pc.count_substring_regex(text, r"\S+") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    lower = pc.utf8_lower(text)
    has_curly = pc.match_substring(text, "{")
    has_lorem = pc.match_substring(lower, "lorem ipsum")
    out = t
    for name, arr in (("n_lines", pa.array(n_lines)),
                      ("n_words", pa.array(n_words)),
                      ("punct_line_ratio", pa.array(punct_r)),
                      ("bullet_line_ratio", pa.array(bullet_r)),
                      ("ellipsis_line_ratio", pa.array(ellip_r)),
                      ("has_curly", has_curly),
                      ("has_lorem", has_lorem)):
        out = out.append_column(name, arr)
    return out


def c4_signals(ds: Dataset, text_col: str = "text") -> Dataset:
    """Annotate every doc with the C4/Gopher shape signals (map-only)."""
    return ds.map_batches(lambda t: c4_signals_table(t, text_col),
                          batch_format="pyarrow")


def c4_filter(ds: Dataset, text_col: str = "text",
              min_words: int = 50, max_words: int = 100_000,
              min_punct_line_ratio: float = 0.0,
              max_bullet_line_ratio: float = 0.9,
              max_ellipsis_line_ratio: float = 0.3,
              drop_curly: bool = True,
              drop_lorem: bool = True) -> Dataset:
    """Apply the published thresholds (C4: curly-brace + lorem-ipsum page
    drops; Gopher: 50..100k word bounds, bullet <= 90 %, ellipsis <= 30 %
    of lines) over the annotated signals. Pure filter — composes with the
    training-data capstone's kill-list stages."""
    def keep(t: pa.Table) -> pa.Table:
        orig_cols = t.column_names
        t = c4_signals_table(t, text_col)
        m = pc.and_(pc.greater_equal(t.column("n_words"),
                                     pa.scalar(min_words)),
                    pc.less_equal(t.column("n_words"),
                                  pa.scalar(max_words)))
        m = pc.and_(m, pc.greater_equal(t.column("punct_line_ratio"),
                                        pa.scalar(min_punct_line_ratio)))
        m = pc.and_(m, pc.less_equal(t.column("bullet_line_ratio"),
                                     pa.scalar(max_bullet_line_ratio)))
        m = pc.and_(m, pc.less_equal(t.column("ellipsis_line_ratio"),
                                     pa.scalar(max_ellipsis_line_ratio)))
        if drop_curly:
            m = pc.and_(m, pc.invert(t.column("has_curly")))
        if drop_lorem:
            m = pc.and_(m, pc.invert(t.column("has_lorem")))
        return t.filter(m).select(orig_cols)  # pure filter: same schema

    return ds.map_batches(keep, batch_format="pyarrow")
