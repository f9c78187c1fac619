"""Completion suggester with contexts + fuzzy prefix matching.

Reference: server/search/suggest/completion — CompletionSuggester over an
FST; context filtering via context/ContextMappings.java (category contexts:
suggestions carry context values, queries filter/boost by them) and fuzzy
prefix matching via FuzzyOptions.java (Lucene FuzzyCompletionQuery: the
query prefix may differ from the indexed prefix by <= max edits).

Ray-Data-native shape: the completion "FST" is a vocab-bounded
(term, context, weight) TABLE built with one distributed pass — per-batch
explode + distinct inside the batch (each doc lives in exactly one row, so
per-batch distinct-doc counts SUM exactly) and a (term, context) groupby.
Lookups are vectorized Arrow/pandas over the table, prefix-pruned by the
term-sorted layout (the same terms-dict discipline as
Searcher._vocab_range).
"""
from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis import get_analyzer


class CompletionIndex:
    """term-sorted (term, context, df) table; df = docs containing the term
    under that context (the completion weight analogue — popularity)."""

    def __init__(self, table: pa.Table):
        self.table = table.sort_by([("term", "ascending"),
                                    ("context", "ascending")])

    @classmethod
    def build(cls, ds, text_col: str, context_col: Optional[str] = None,
              analyzer: str = "standard") -> "CompletionIndex":
        an = get_analyzer(analyzer)

        def explode(t: pa.Table) -> pa.Table:
            terms, ctxs = [], []
            ctx_vals = (t.column(context_col).to_pylist()
                        if context_col else [""] * t.num_rows)
            for text, ctx in zip(t.column(text_col).to_pylist(), ctx_vals):
                for tok in set(an.tokens(text or "")):  # distinct per doc
                    terms.append(tok)
                    ctxs.append(ctx if ctx is not None else "")
            flat = pa.table({"term": pa.array(terms, pa.string()),
                             "context": pa.array(ctxs, pa.string())})
            # per-batch partial counts (docs never span batches, so the
            # downstream Sum is the exact distinct-doc count)
            return (flat.group_by(["term", "context"])
                    .aggregate([([], "count_all")])
                    .rename_columns(["term", "context", "df"]))

        from ray.data.aggregate import Sum
        out = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby(["term", "context"])
               .aggregate(Sum("df", alias_name="df")).to_arrow_refs())
        import ray as _ray
        # Ray's aggregate can emit schemaless EMPTY blocks; concat only
        # the real ones (ArrowInvalid "Schema at index N was different"
        # otherwise — block layout dependent, so intermittent)
        tbls = [t for t in (_ray.get(r) for r in out)
                if t.num_rows and t.num_columns]
        if not tbls:
            tbl = pa.table({"term": pa.array([], pa.string()),
                            "context": pa.array([], pa.string()),
                            "df": pa.array([], pa.int64())})
        else:
            tbl = pa.concat_tables(tbls)
            tbl = tbl.rename_columns(["term", "context", "df"])
        return cls(tbl)

    # ------------------------------------------------------------- lookup

    def complete(self, prefix: str, size: int = 5,
                 contexts: Optional[Iterable[str]] = None,
                 fuzzy_edits: int = 0,
                 min_fuzzy_length: int = 3) -> pd.DataFrame:
        """Suggestions for ``prefix``:

        - ``contexts``: keep only suggestions indexed under ANY of the
          given context values; weights SUM over the surviving contexts
          (CategoryContextMapping filter semantics).
        - ``fuzzy_edits``: a term also matches when SOME prefix of it is
          within ``fuzzy_edits`` Levenshtein edits of the query prefix
          (FuzzyCompletionQuery), gated by ``min_fuzzy_length`` (shorter
          inputs match exactly — FuzzyOptions.DEFAULT_MIN_FUZZY_LENGTH=3).

        Returns (suggestion, df, rank) ordered (df desc, suggestion asc).
        """
        t = self.table
        if contexts is not None:
            t = t.filter(pc.is_in(t.column("context"),
                                  value_set=pa.array(sorted(contexts),
                                                     pa.string())))
        if fuzzy_edits > 0 and len(prefix) >= min_fuzzy_length:
            from .features import _levenshtein
            # candidate band: terms at least (len(prefix)-edits) long
            cand = t.filter(pc.greater_equal(
                pc.utf8_length(t.column("term")),
                pa.scalar(len(prefix) - fuzzy_edits)))
            terms = cand.column("term").to_pylist()
            los = max(1, len(prefix) - fuzzy_edits)
            his = len(prefix) + fuzzy_edits
            keep = [any(_levenshtein(prefix, tm[:n], fuzzy_edits)
                        <= fuzzy_edits
                        for n in range(los, min(his, len(tm)) + 1))
                    for tm in terms]
            t = cand.filter(pa.array(keep, pa.bool_()))
        else:
            # sorted-range prefix prune (no full-vocab regex walk)
            m = pc.starts_with(t.column("term"), prefix)
            t = t.filter(m)
        if t.num_rows == 0:
            return pd.DataFrame({"suggestion": [], "df": [], "rank": []})
        agg = (t.group_by(["term"]).aggregate([("df", "sum")])
               .rename_columns(["suggestion", "df"]).to_pandas())
        agg = agg.sort_values(["df", "suggestion"],
                              ascending=[False, True],
                              kind="mergesort").head(size)
        agg["df"] = agg["df"].astype(np.int64)
        agg["rank"] = np.arange(1, len(agg) + 1, dtype=np.int64)
        return agg.reset_index(drop=True)
