"""Token filters.

Reference registrations: modules/analysis-common/.../CommonAnalysisModulePlugin.java:251-340
(~90 filters) plus server-side StopTokenFilterFactory / ShingleTokenFilterFactory.

A token filter is a callable ``(tokens: list[str], positions: list[int]) ->
(list[str], list[int])``. Positions carry Lucene position-increment semantics:
the ``stop`` filter REMOVES tokens but leaves gaps in the position sequence
(ref Lucene StopFilter enablePositionIncrements=true), which phrase queries
rely on. Per-token filters are lifted via :func:`per_token`.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable, Iterable, List, Optional, Tuple

from .stopwords import ENGLISH_STOP_WORDS

TokenStream = Tuple[List[str], List[int]]
TokenFilter = Callable[[List[str], List[int]], TokenStream]


def per_token(fn: Callable[[str], Optional[str]]) -> TokenFilter:
    """Lift a per-token map into a filter. ``None``/empty output drops the
    token WITHOUT leaving a position gap (Lucene's behavior for e.g. length)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t: List[str] = []
        out_p: List[int] = []
        for t, p in zip(tokens, positions):
            r = fn(t)
            if r:
                out_t.append(r)
                out_p.append(p)
        return out_t, out_p
    return filt


# ---------------------------------------------------------------- basic maps

def lowercase_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    return [t.lower() for t in tokens], positions


def uppercase_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    return [t.upper() for t in tokens], positions


def reverse_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    return [t[::-1] for t in tokens], positions


def trim_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    return [t.strip() for t in tokens], positions


def asciifolding_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """Strip diacritics: NFKD-decompose and drop combining marks."""
    out = []
    for t in tokens:
        if t.isascii():
            out.append(t)
        else:
            out.append(
                "".join(c for c in unicodedata.normalize("NFKD", t)
                        if not unicodedata.combining(c))
            )
    return out, positions


def decimal_digit_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """Fold unicode digits to latin 0-9."""
    out = []
    for t in tokens:
        if t.isascii():
            out.append(t)
        else:
            out.append("".join(str(unicodedata.digit(c)) if c.isdigit() else c for c in t))
    return out, positions


# ----------------------------------------------------------------- stopwords

def make_stop_filter(stopwords: Iterable[str] = ENGLISH_STOP_WORDS,
                     ignore_case: bool = False) -> TokenFilter:
    """``stop`` filter; leaves position gaps (Lucene StopFilter semantics).
    Default word list = Lucene English, ref StopTokenFilterFactory.java:59-76."""
    sw = frozenset(w.lower() for w in stopwords) if ignore_case else frozenset(stopwords)
    if ignore_case:
        def filt(tokens: List[str], positions: List[int]) -> TokenStream:
            keep = [i for i, t in enumerate(tokens) if t.lower() not in sw]
            return [tokens[i] for i in keep], [positions[i] for i in keep]
    else:
        def filt(tokens: List[str], positions: List[int]) -> TokenStream:
            keep = [i for i, t in enumerate(tokens) if t not in sw]
            return [tokens[i] for i in keep], [positions[i] for i in keep]
    return filt


stop_filter = make_stop_filter()


# ------------------------------------------------------------- length / keep

def make_length_filter(min_len: int = 0, max_len: int = 2 ** 31 - 1) -> TokenFilter:
    return per_token(lambda t: t if min_len <= len(t) <= max_len else None)


def make_truncate_filter(length: int = 10) -> TokenFilter:
    return per_token(lambda t: t[:length])


def make_limit_filter(max_token_count: int = 1) -> TokenFilter:
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        return tokens[:max_token_count], positions[:max_token_count]
    return filt


def make_keep_filter(keep_words: Iterable[str]) -> TokenFilter:
    kw = frozenset(keep_words)
    return per_token(lambda t: t if t in kw else None)


def unique_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """Drop duplicate tokens (first occurrence kept), like ``unique``."""
    seen = set()
    keep = []
    for i, t in enumerate(tokens):
        if t not in seen:
            seen.add(t)
            keep.append(i)
    return [tokens[i] for i in keep], [positions[i] for i in keep]


# ------------------------------------------------------------------ stemming

_V = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _V:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences."""
    m = 0
    prev_c = True
    started_v = False
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if not c:
            started_v = True
        elif started_v:
            m += 1
            started_v = False
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1))


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if (_is_cons(word, len(word) - 3) and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)):
        return word[-1] not in "wxy"
    return False


def porter_stem(word: str) -> str:
    """Classic Porter (1980) stemmer — the algorithm behind the reference's
    ``porter_stem`` filter (public-domain algorithm)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
             ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
             ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
             ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
             ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
             ("logi", "log")]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
             ("ical", "ic"), ("ful", ""), ("ness", "")]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    step4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
             "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


porter_stem_filter = per_token(porter_stem)


# ----------------------------------------------------------- shingle / ngram

def make_shingle_filter(min_size: int = 2, max_size: int = 2,
                        output_unigrams: bool = True, sep: str = " ") -> TokenFilter:
    """``shingle`` filter (ref server/index/analysis/ShingleTokenFilterFactory.java)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        n = len(tokens)
        for i in range(n):
            if output_unigrams:
                out_t.append(tokens[i])
                out_p.append(positions[i])
            for size in range(min_size, max_size + 1):
                if i + size <= n:
                    out_t.append(sep.join(tokens[i : i + size]))
                    out_p.append(positions[i])
        return out_t, out_p
    return filt


def make_ngram_filter(min_gram: int = 1, max_gram: int = 2) -> TokenFilter:
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            for i in range(len(t)):
                for g in range(min_gram, max_gram + 1):
                    if i + g <= len(t):
                        out_t.append(t[i : i + g])
                        out_p.append(p)
        return out_t, out_p
    return filt


def make_edge_ngram_filter(min_gram: int = 1, max_gram: int = 2) -> TokenFilter:
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            for g in range(min_gram, min(max_gram, len(t)) + 1):
                out_t.append(t[:g])
                out_p.append(p)
        return out_t, out_p
    return filt


# ------------------------------------------------------------------- synonym

def make_synonym_filter(synonyms: dict) -> TokenFilter:
    """Simple (non-graph) synonym expansion: token -> [token, *synonyms[token]]
    all at the same position (Lucene synonym posinc=0 semantics)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            out_t.append(t)
            out_p.append(p)
            for s in synonyms.get(t, ()):
                out_t.append(s)
                out_p.append(p)
        return out_t, out_p
    return filt


# ------------------------------------------------------------------- elision

def make_elision_filter(articles: Iterable[str] = ("l", "m", "t", "qu", "n", "s", "j")) -> TokenFilter:
    arts = tuple(a.lower() + "'" for a in articles) + tuple(a.lower() + "’" for a in articles)
    def strip(t: str) -> str:
        low = t.lower()
        for a in arts:
            if low.startswith(a):
                return t[len(a):]
        return t
    return per_token(strip)


# ----------------------------------------------------------- word delimiter

_WD_SPLIT_RE = re.compile(r"[^a-zA-Z0-9]+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)|(?<=\d)(?=[A-Za-z])")


def word_delimiter_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """Split on case transitions, letter/digit transitions and non-alnum
    (``word_delimiter`` with default flags, catenate off)."""
    out_t, out_p = [], []
    for t, p in zip(tokens, positions):
        parts = [s for s in _WD_SPLIT_RE.split(t) if s]
        for s in parts:
            out_t.append(s)
            out_p.append(p)
    return out_t, out_p


def word_delimiter_graph_filter(tokens: List[str], positions: List[int]
                                ) -> TokenStream:
    """``word_delimiter_graph``: like word_delimiter but ALSO emits the
    catenated whole (catenate_all) at the first part's position — the graph
    shape flattened onto our (token, position) stream, a documented
    approximation of Lucene's position-length graph
    (CommonAnalysisModulePlugin.java word_delimiter_graph)."""
    out_t, out_p = [], []
    for t, p in zip(tokens, positions):
        parts = [s for s in _WD_SPLIT_RE.split(t) if s]
        if len(parts) > 1:
            cat = "".join(parts)
            out_t.append(cat)
            out_p.append(p)
        for s in parts:
            out_t.append(s)
            out_p.append(p)
    return out_t, out_p


def make_synonym_graph_filter(synonyms: dict) -> TokenFilter:
    """``synonym_graph``: single-token keys expand to their synonyms; a
    MULTI-WORD synonym's tokens are emitted at consecutive positions starting
    at the matched token (so phrase queries over the expansion align) —
    flattened approximation of the reference's graph positions."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            out_t.append(t)
            out_p.append(p)
            for syn in synonyms.get(t, ()):
                for j, part in enumerate(syn.split()):
                    out_t.append(part)
                    out_p.append(p + j)
        return out_t, out_p
    return filt


def make_multiplexer_filter(chains: List[List[TokenFilter]]) -> TokenFilter:
    """``multiplexer``: run each filter chain over every token, emit all
    distinct outputs at the SAME position (preserving first-seen order)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            seen = set()
            for chain in chains:
                ts, ps = [t], [p]
                for f in chain:
                    ts, ps = f(ts, ps)
                for res in ts:
                    if res and res not in seen:
                        seen.add(res)
                        out_t.append(res)
                        out_p.append(p)
        return out_t, out_p
    return filt


def make_stemmer_filter(language: str = "english") -> TokenFilter:
    """``stemmer`` filter with a language parameter
    (StemmerTokenFilterFactory): english = full Porter, others = light
    suffix-strippers (see analysis.lang)."""
    from .lang import make_stemmer
    return per_token(make_stemmer(language))


# ---------------------------------------------------------------- fingerprint

def make_fingerprint_filter(sep: str = " ", max_output_size: int = 255) -> TokenFilter:
    """``fingerprint`` filter: sort unique tokens, join into ONE token."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        if not tokens:
            return [], []
        joined = sep.join(sorted(set(tokens)))
        if len(joined) > max_output_size:
            return [], []
        return [joined], [0]
    return filt


TOKEN_FILTERS = {
    "lowercase": lowercase_filter,
    "uppercase": uppercase_filter,
    "reverse": reverse_filter,
    "trim": trim_filter,
    "asciifolding": asciifolding_filter,
    "decimal_digit": decimal_digit_filter,
    "stop": stop_filter,
    "unique": unique_filter,
    "porter_stem": porter_stem_filter,
    "word_delimiter": word_delimiter_filter,
    "word_delimiter_graph": word_delimiter_graph_filter,
    # parameterized factories
    "stemmer": make_stemmer_filter,
    "synonym_graph": make_synonym_graph_filter,
    "multiplexer": make_multiplexer_filter,
    "stop_with": make_stop_filter,
    "length": make_length_filter,
    "truncate": make_truncate_filter,
    "limit": make_limit_filter,
    "keep": make_keep_filter,
    "shingle": make_shingle_filter,
    "ngram": make_ngram_filter,
    "edge_ngram": make_edge_ngram_filter,
    "synonym": make_synonym_filter,
    "elision": make_elision_filter,
    "fingerprint": make_fingerprint_filter,
}
