"""Analyzer = char filters -> tokenizer -> token filters, plus batch appliers.

Reference: server/index/analysis/CustomAnalyzer.java (composition),
AnalysisRegistry.java:678-683 (default analyzer = ``standard``),
StandardAnalyzerProvider.java:46-57 (standard = StandardTokenizer + LowerCase
+ Stop; the *standard analyzer's* default stop set is EMPTY).

Our engine's default ("transcript") analyzer is standard tokenizer + lowercase
+ English stopwords — the configuration the north rule specifies. Position
increments are preserved across stop removal (gaps), so phrase queries work.

``analyze_batch`` is the hot path used by the index build: it runs once per
Arrow batch inside ``map_batches`` and returns ``list<string>`` token columns.
Tokenization is a compiled-regex ``findall`` per string (strings are opaque to
Arrow kernels; the regex + set lookup is the vectorized-enough inner loop),
with a fast path for the standard+lowercase+stop chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from .stopwords import ENGLISH_STOP_WORDS
from .token_filters import TOKEN_FILTERS, TokenFilter, make_stop_filter
from .tokenizers import TOKENIZERS, standard_tokenizer


@dataclass
class Analyzer:
    """A composed analysis chain; pure and picklable (ships to Ray workers)."""

    tokenizer: Callable[[str], List[str]] = standard_tokenizer
    char_filters: Sequence[Callable[[str], str]] = ()
    token_filters: Sequence[TokenFilter] = ()
    name: str = "custom"
    # fast-path flags (set for the common standard+lowercase(+stop) chains)
    _lower_fast: bool = field(default=False, repr=False)
    _stop_fast: Optional[frozenset] = field(default=None, repr=False)

    def analyze(self, text: str) -> Tuple[List[str], List[int]]:
        """-> (tokens, positions). Mirrors the `_analyze` API
        (ref server/action/admin/indices/analyze/TransportAnalyzeAction.java:151-258)."""
        if text is None:
            return [], []
        if self._lower_fast:
            toks = self.tokenizer(text.lower())
            sw = self._stop_fast
            if sw is None:
                return toks, list(range(len(toks)))
            out_t, out_p = [], []
            for p, t in enumerate(toks):
                if t not in sw:
                    out_t.append(t)
                    out_p.append(p)
            return out_t, out_p
        for cf in self.char_filters:
            text = cf(text)
        tokens = self.tokenizer(text)
        positions = list(range(len(tokens)))
        for tf in self.token_filters:
            tokens, positions = tf(tokens, positions)
        return tokens, positions

    def tokens(self, text: str) -> List[str]:
        return self.analyze(text)[0]


def _fast(name: str, stop: Optional[frozenset]) -> Analyzer:
    return Analyzer(
        tokenizer=standard_tokenizer,
        token_filters=(TOKEN_FILTERS["lowercase"],) if stop is None
        else (TOKEN_FILTERS["lowercase"], make_stop_filter(stop)),
        name=name,
        _lower_fast=True,
        _stop_fast=stop,
    )


# The tokenizer regex is case-insensitive in effect (letters stay letters under
# lower()), so lowercasing the whole string first is equivalent to a per-token
# LowerCaseFilter — that's the _lower_fast path.
standard_analyzer = _fast("standard", None)  # OpenSearch standard: EMPTY stop set
english_stop_analyzer = _fast("english_stop", frozenset(ENGLISH_STOP_WORDS))
#: The engine default per the north rule: standard tokenizer + lowercase + English stop.
transcript_analyzer = english_stop_analyzer

simple_analyzer = Analyzer(tokenizer=TOKENIZERS["lowercase"], name="simple")
whitespace_analyzer = Analyzer(tokenizer=TOKENIZERS["whitespace"], name="whitespace")
keyword_analyzer = Analyzer(tokenizer=TOKENIZERS["keyword"], name="keyword")
stop_analyzer = Analyzer(
    tokenizer=TOKENIZERS["lowercase"],
    token_filters=(make_stop_filter(ENGLISH_STOP_WORDS),),
    name="stop",
)
fingerprint_analyzer = Analyzer(
    tokenizer=standard_tokenizer,
    token_filters=(
        TOKEN_FILTERS["lowercase"],
        TOKEN_FILTERS["asciifolding"],
        TOKEN_FILTERS["fingerprint"](),
    ),
    name="fingerprint",
)

pattern_analyzer = Analyzer(
    tokenizer=TOKENIZERS["pattern"](),  # default \W+ split
    token_filters=(TOKEN_FILTERS["lowercase"],),
    name="pattern",
)


def make_language_analyzer(lang: str) -> Analyzer:
    """Prebuilt language analyzers (CommonAnalysisModulePlugin.java:204-244):
    standard tokenizer + lowercase + language stop set + language stemmer,
    elision for French/Italian, possessive stripping for English. Stemmers
    are the LIGHT variants for non-English (see analysis.lang docstring)."""
    from .lang import LANG_STOPWORDS, english_possessive_strip, make_stemmer
    from .token_filters import make_stemmer_filter, per_token

    from .lang import (greek_lower, irish_lower, persian_normalize)
    from .token_filters import cjk_bigram_filter

    tokenizer = standard_tokenizer
    if lang == "english":
        filters = (TOKEN_FILTERS["lowercase"],
                   per_token(english_possessive_strip),
                   make_stop_filter(ENGLISH_STOP_WORDS),
                   make_stemmer_filter("english"))
    elif lang == "cjk":
        # CjkAnalyzerProvider: standard tokens -> han bigrams -> stop
        filters = (cjk_bigram_filter, TOKEN_FILTERS["lowercase"],
                   make_stop_filter(LANG_STOPWORDS["cjk"]))
    elif lang == "chinese":
        # ChineseAnalyzerProvider is an alias of standard+english stop
        # (the legacy ChineseAnalyzer was removed upstream)
        filters = (TOKEN_FILTERS["lowercase"],
                   make_stop_filter(ENGLISH_STOP_WORDS))
    elif lang == "thai":
        from .tokenizers import thai_tokenizer
        tokenizer = thai_tokenizer
        filters = (TOKEN_FILTERS["lowercase"],
                   make_stop_filter(LANG_STOPWORDS["thai"]))
    elif lang == "persian":
        # PersianAnalyzerProvider: normalization, stop, NO stemmer
        filters = (TOKEN_FILTERS["lowercase"],
                   per_token(persian_normalize),
                   make_stop_filter(LANG_STOPWORDS["persian"]))
    elif lang in ("hindi", "bengali"):
        from .tokenizers import indic_tokenizer
        tokenizer = indic_tokenizer
        filters = (TOKEN_FILTERS["lowercase"],
                   make_stop_filter(LANG_STOPWORDS[lang]),
                   make_stemmer_filter(lang))
    elif lang == "greek":
        filters = (per_token(greek_lower),
                   make_stop_filter(LANG_STOPWORDS["greek"]),
                   make_stemmer_filter("greek"))
    elif lang == "irish":
        # strip initial-mutation prefixes BEFORE tokenizing (the standard
        # tokenizer would split "t-uisce" and leak a lone "t")
        from .char_filters import make_pattern_replace
        char_filters = (make_pattern_replace(r"\b([tn])-", ""),)
        filters = (per_token(irish_lower),
                   make_stop_filter(LANG_STOPWORDS["irish"]),
                   make_stemmer_filter("irish"))
        return Analyzer(tokenizer=tokenizer, char_filters=char_filters,
                        token_filters=filters, name=lang)
    else:
        pre = ()
        if lang in ("french", "italian", "catalan"):
            pre = (TOKEN_FILTERS["elision"](),)
        filters = ((TOKEN_FILTERS["lowercase"],) + pre
                   + (make_stop_filter(LANG_STOPWORDS[lang]),
                      make_stemmer_filter(lang)))
    return Analyzer(tokenizer=tokenizer, token_filters=filters,
                    name=lang)


ANALYZERS = {
    "standard": standard_analyzer,
    "english_stop": english_stop_analyzer,
    "transcript": transcript_analyzer,
    "default": transcript_analyzer,
    "simple": simple_analyzer,
    "whitespace": whitespace_analyzer,
    "keyword": keyword_analyzer,
    "stop": stop_analyzer,
    "fingerprint": fingerprint_analyzer,
    "pattern": pattern_analyzer,
}
for _lang in ("english", "german", "french", "spanish", "italian",
              "portuguese", "brazilian", "dutch", "russian", "swedish",
              "norwegian", "danish", "finnish", "hungarian", "czech",
              "romanian", "bulgarian", "indonesian", "turkish", "catalan",
              # round-3 tail: the remaining CommonAnalysisModulePlugin set
              "arabic", "persian", "sorani", "hindi", "bengali", "greek",
              "armenian", "basque", "estonian", "galician", "irish",
              "latvian", "lithuanian", "cjk", "chinese", "thai"):
    ANALYZERS[_lang] = make_language_analyzer(_lang)


def get_analyzer(name_or_analyzer) -> Analyzer:
    if isinstance(name_or_analyzer, Analyzer):
        return name_or_analyzer
    if isinstance(name_or_analyzer, dict):  # inline custom chain
        return build_custom_analyzer(name_or_analyzer)
    if (name_or_analyzer == "annotated_text"
            and "annotated_text" not in ANALYZERS):
        from .annotated import annotated_text_analyzer  # lazy: avoids cycle
        ANALYZERS["annotated_text"] = annotated_text_analyzer
    return ANALYZERS[name_or_analyzer]


def analyze(text: str, analyzer="default") -> List[str]:
    """Pure-function mirror of the `_analyze` debug API."""
    return get_analyzer(analyzer).tokens(text)


def analyze_batch(
    batch: pa.Table,
    text_column: str = "text",
    analyzer="default",
    tokens_column: str = "tokens",
    positions_column: Optional[str] = None,
) -> pa.Table:
    """Per-batch analysis for ``ds.map_batches(..., batch_format="pyarrow")``.

    Appends a ``list<string>`` tokens column (and optionally ``list<int32>``
    positions). Builds the list column via flat values + offsets so no
    per-row Python list materialization beyond the tokenizer output itself.
    """
    an = get_analyzer(analyzer)
    col = batch.column(text_column)
    n = len(col)
    flat: List[str] = []
    offsets = np.empty(n + 1, dtype=np.int32)
    offsets[0] = 0
    if positions_column is None and an._lower_fast:
        tokenizer = an.tokenizer
        sw = an._stop_fast
        i = 0
        for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
            for v in chunk:
                s = v.as_py()
                if s:
                    toks = tokenizer(s.lower())
                    if sw is not None:
                        toks = [t for t in toks if t not in sw]
                    flat.extend(toks)
                offsets[i + 1] = len(flat)
                i += 1
        tok_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.string()))
        return batch.append_column(tokens_column, tok_arr)

    flat_pos: List[int] = []
    i = 0
    for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
        for v in chunk:
            s = v.as_py()
            if s:
                toks, poss = an.analyze(s)
                flat.extend(toks)
                flat_pos.extend(poss)
            offsets[i + 1] = len(flat)
            i += 1
    off = pa.array(offsets)
    out = batch.append_column(
        tokens_column, pa.ListArray.from_arrays(off, pa.array(flat, type=pa.string()))
    )
    if positions_column is not None:
        out = out.append_column(
            positions_column,
            pa.ListArray.from_arrays(off, pa.array(flat_pos, type=pa.int32())),
        )
    return out


def build_custom_analyzer(spec: dict) -> Analyzer:
    """Inline custom analysis chain — the `_analyze` API's request-body
    definition (TransportAnalyzeAction.java:151-258): ``tokenizer`` +
    ``char_filter`` + ``filter`` lists, each item a registered NAME or a
    ``{"type": name, ...params}`` object. Zero-arg factory entries (e.g.
    ``fingerprint``) are instantiated with defaults when referenced by
    bare name; parameterized entries take their params from the object
    form. The result is a plain picklable Analyzer, usable anywhere a
    named one is (build_index(analyzer=...), Searcher(analyzer=...))."""
    import inspect

    from .char_filters import CHAR_FILTERS
    from .tokenizers import TOKENIZERS

    def resolve(registry, item, direct_params):
        if isinstance(item, dict):
            d = dict(item)
            typ = d.pop("type")
            return registry[typ](**d)
        v = registry[item]
        params = list(inspect.signature(v).parameters)
        return (v if params[:len(direct_params)] == direct_params
                else v())

    tokenizer = resolve(TOKENIZERS, spec.get("tokenizer", "standard"),
                        ["text"])
    cfs = tuple(resolve(CHAR_FILTERS, c, ["text"])
                for c in spec.get("char_filter", []))
    tfs = tuple(resolve(TOKEN_FILTERS, f, ["tokens", "positions"])
                for f in spec.get("filter", []))
    return Analyzer(tokenizer=tokenizer, char_filters=cfs,
                    token_filters=tfs, name="__inline__")
