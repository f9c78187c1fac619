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


def _is_han(t: str) -> bool:
    return len(t) == 1 and ("㐀" <= t <= "鿿"
                            or "豈" <= t <= "﫿")


def cjk_bigram_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """``cjk_bigram`` (CJKBigramFilter): adjacent single-ideograph tokens
    (as the standard tokenizer emits them) become overlapping bigrams;
    isolated ideographs stay unigrams; non-CJK tokens pass through."""
    out_t: List[str] = []
    out_p: List[int] = []
    n = len(tokens)
    for i, (t, p) in enumerate(zip(tokens, positions)):
        if not _is_han(t):
            out_t.append(t)
            out_p.append(p)
            continue
        nxt = (i + 1 < n and _is_han(tokens[i + 1])
               and positions[i + 1] == p + 1)
        prv = (i > 0 and _is_han(tokens[i - 1]) and positions[i - 1] == p - 1)
        if nxt:
            out_t.append(t + tokens[i + 1])
            out_p.append(p)
        elif not prv:  # isolated ideograph -> unigram
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


# ------------------------------------------------------------- length / keep

def make_length_filter(min_len: int = 0, max_len: int = 2 ** 31 - 1,
                       **kw) -> TokenFilter:
    # LengthTokenFilterFactory.java reads settings named `min` / `max`;
    # accept both spellings so inline `_analyze` filter defs resolve.
    min_len = kw.get("min", min_len)
    max_len = kw.get("max", max_len)
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


def make_edge_ngram_filter(min_gram: int = 1, max_gram: int = 2,
                           preserve_original: bool = False) -> TokenFilter:
    """``edge_ngram`` filter; ``preserve_original`` additionally emits tokens
    LONGER than max_gram unchanged (Lucene EdgeNGramTokenFilter's
    preserveOriginal flag, used by search_as_you_type's prefix subfield)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            for g in range(min_gram, min(max_gram, len(t)) + 1):
                out_t.append(t[:g])
                out_p.append(p)
            if preserve_original and len(t) > max_gram:
                out_t.append(t)
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


# ------------------------------------------------------------ snowball (en)

_P2_V = "aeiouy"


def _p2_regions(w: str) -> Tuple[int, int]:
    """Porter2 R1/R2 start offsets (special-cased gener/commun/arsen)."""
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        r1 = len(w)
        for i in range(1, len(w)):
            if w[i] not in _P2_V and w[i - 1] in _P2_V:
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _P2_V and w[i - 1] in _P2_V:
            r2 = i + 1
            break
    return r1, r2


def _p2_short(w: str, r1: int) -> bool:
    """Word ends in a short syllable and R1 == end (Porter2 'short word')."""
    if r1 < len(w):
        return False
    n = len(w)
    if n >= 3:
        c, v, c2 = w[-1], w[-2], w[-3]
        return (c not in _P2_V and c not in "wxY" and v in _P2_V
                and c2 not in _P2_V)
    if n == 2:
        return w[0] in _P2_V and w[1] not in _P2_V
    return False


def snowball_english(word: str) -> str:
    """Snowball English (Porter2) stemmer — the algorithm published at
    snowballstem.org (what the reference's ``snowball``/``stemmer(english)``
    Lucene SnowballFilter runs), implemented directly from the published
    step list."""
    w = word.lower()
    if len(w) <= 2:
        return w
    exceptions = {"skis": "ski", "skies": "sky", "dying": "die",
                  "lying": "lie", "tying": "tie", "idly": "idl",
                  "gently": "gentl", "ugly": "ugli", "early": "earli",
                  "only": "onli", "singly": "singl", "sky": "sky",
                  "news": "news", "howe": "howe", "atlas": "atlas",
                  "cosmos": "cosmos", "bias": "bias", "andes": "andes"}
    if w in exceptions:
        return exceptions[w]
    if w.startswith("'"):
        w = w[1:]
    # mark consonant-y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = re.sub(r"([aeiouy])y", lambda m: m.group(1) + "Y", w)
    r1, r2 = _p2_regions(w)
    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and any(c in _P2_V for c in w[:-2]):
        w = w[:-1]
    if w in ("inning", "outing", "canning", "herring", "earring",
             "proceed", "exceed", "succeed"):
        return w.lower()
    # step 1b
    done_1b = False
    for suf, rep in (("eedly", "ee"), ("eed", "ee")):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            done_1b = True
            break
    if not done_1b:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf) and any(c in _P2_V for c in w[: -len(suf)]):
                w = w[: -len(suf)]
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                elif (len(w) >= 2 and w[-1] == w[-2]
                      and w[-1] in "bdfgmnprt"):
                    w = w[:-1]
                elif _p2_short(w, _p2_regions(w)[0]):
                    w += "e"
                break
    # step 1c
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _P2_V):
        w = w[:-1] + "i"
    r1, r2 = _p2_regions(w)
    # step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("abli", "able"), ("entli", "ent"),
                     ("izer", "ize"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("aliti", "al"),
                     ("alli", "al"), ("fulness", "ful"), ("ousli", "ous"),
                     ("ousness", "ous"), ("iveness", "ive"), ("iviti", "ive"),
                     ("biliti", "ble"), ("bli", "ble"), ("fulli", "ful"),
                     ("lessli", "less"), ("ogi", "og"), ("li", "")):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if w[-3:-2] in ("c", "d", "e", "g", "h", "k", "m",
                                    "n", "r", "t"):
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break
    r1, r2 = _p2_regions(w)
    # step 3
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("alize", "al"),
                     ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
                     ("ful", ""), ("ness", ""), ("ative", "")):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break
    r1, r2 = _p2_regions(w)
    # step 4
    for suf in ("ement", "ance", "ence", "able", "ible", "ment", "ant",
                "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
                "al", "er", "ic"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if w[-4:-3] in ("s", "t"):
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    r1, r2 = _p2_regions(w)
    # step 5
    if w.endswith("e") and (len(w) - 1 >= r2
                            or (len(w) - 1 >= r1
                                and not _p2_short(w[:-1], 10**9))):
        # the short-syllable test here is on the stem BEFORE the e, with no
        # R1-end requirement (Porter2 step 5a)
        stem = w[:-1]
        n = len(stem)
        short_syl = (n >= 3 and stem[-1] not in _P2_V
                     and stem[-1] not in "wxY" and stem[-2] in _P2_V
                     and stem[-3] not in _P2_V) or \
                    (n == 2 and stem[0] in _P2_V and stem[1] not in _P2_V)
        if len(w) - 1 >= r2 or not short_syl:
            w = stem
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]
    return w.lower()


snowball_filter = per_token(snowball_english)


# --------------------------------------------------------------------- kstem

_KSTEM_PROTECT = frozenset((
    "is", "as", "this", "has", "was", "during", "something", "nothing",
    "anything", "everything", "sing", "bring", "ring", "thing", "king",
    "spring", "string", "wing", "morning", "evening",
))


def kstem(word: str) -> str:
    """kstem-LIKE light English stemmer: the KStem rule steps (plural
    reduction, -ied/-ies, -ing, -ed, -ly, -ness/-ful) WITHOUT the KStem
    head-word lexicon the reference ships (Lucene KStemmer) — flagged
    approximation: rule-identical on regular inflections, no dictionary
    lookups for irregulars."""
    w = word.lower()
    if len(w) <= 3 or w in _KSTEM_PROTECT or not w.isalpha():
        return w
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("es") and w[-3:-2] in ("s", "x", "z", "h"):
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    if w.endswith("ied"):
        return w[:-3] + "y"
    if w.endswith("ing") and len(w) > 5:
        stem = w[:-3]
        if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
            stem = stem[:-1]
        elif not any(c in "aeiouy" for c in stem):
            return w
        return stem + ("e" if stem.endswith(("at", "iz", "bl", "v")) else "")
    if w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        if stem.endswith("i"):
            return stem[:-1] + "y"
        if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
            return stem[:-1]
        return stem + ("e" if stem.endswith(("at", "iz", "bl", "v")) else "")
    if w.endswith("ly") and len(w) > 5:
        return w[:-2]
    if w.endswith("ness") and len(w) > 6:
        return w[:-4]
    return w


kstem_filter = per_token(kstem)


# -------------------------------------------------------------- common_grams

def make_common_grams_filter(common_words: Iterable[str],
                             query_mode: bool = False) -> TokenFilter:
    """``common_grams`` (CommonGramsFilter / CommonGramsQueryFilter): pairs
    where either token is a common word additionally emit the bigram
    "a_b" at the FIRST token's position; query_mode replaces the common
    unigrams instead of keeping both (the query-side filter)."""
    cw = frozenset(common_words)

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t: List[str] = []
        out_p: List[int] = []
        n = len(tokens)
        for i, (t, p) in enumerate(zip(tokens, positions)):
            gram = None
            if i + 1 < n and (t in cw or tokens[i + 1] in cw) \
                    and positions[i + 1] == p + 1:
                gram = f"{t}_{tokens[i + 1]}"
            prev_gram = (i > 0 and positions[i - 1] == p - 1
                         and (tokens[i - 1] in cw or t in cw))
            if query_mode:
                # keep the unigram only when it forms no gram on either side
                if not gram and not prev_gram:
                    out_t.append(t)
                    out_p.append(p)
            else:
                out_t.append(t)
                out_p.append(p)
            if gram:
                out_t.append(gram)
                out_p.append(p)
        return out_t, out_p
    return filt


# ------------------------------------------------------------------ min_hash

def make_min_hash_filter(hash_count: int = 1, bucket_count: int = 512,
                         hash_set_size: int = 1,
                         with_rotation: bool = True) -> TokenFilter:
    """``min_hash`` token filter (MinHashTokenFilter / MinHashFilterFactory):
    hash every input token (typically a shingle stream), split the hash
    space into ``bucket_count`` buckets, keep the ``hash_set_size`` smallest
    hashes per bucket per hash function; ``with_rotation`` fills empty
    buckets with the next non-empty bucket's minimum (circular). Output
    tokens are 16-hex-digit strings of the kept hashes at position 0."""
    import numpy as np
    import pandas as pd

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        if not tokens:
            return [], []
        base = pd.util.hash_array(np.asarray(tokens, dtype=object))
        out: List[str] = []
        for h in range(hash_count):
            # per-function salt: xor-mix with an odd constant per h
            salt = np.uint64((0x9E3779B97F4A7C15 * (h + 1))
                             & 0xFFFFFFFFFFFFFFFF)
            hs = base ^ salt
            bucket = (hs % np.uint64(bucket_count)).astype(np.int64)
            kept: dict = {}
            for b, v in zip(bucket, hs):
                lst = kept.setdefault(int(b), [])
                lst.append(int(v))
            mins: List[Optional[List[int]]] = [None] * bucket_count
            for b, vs in kept.items():
                mins[b] = sorted(set(vs))[:hash_set_size]
            if with_rotation and kept:
                # circular fill: an empty bucket takes the NEXT non-empty
                # bucket's minimum
                for b in range(bucket_count):
                    if mins[b] is None:
                        j = (b + 1) % bucket_count
                        while mins[j] is None:
                            j = (j + 1) % bucket_count
                        mins[b] = [mins[j][0]]
            for b in range(bucket_count):
                if mins[b]:
                    out.extend(f"{v:016x}" for v in mins[b])
        return out, list(range(len(out)))
    return filt


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


# ------------------------------------------------- round-4 filter tail
# CommonAnalysisModulePlugin.java:251-340 registrations. Filters carrying
# Lucene ATTRIBUTES (type, keyword, payload) are approximated over the
# plain (token, position) stream; each divergence is documented inline.

def _token_type(t: str) -> str:
    """Lucene StandardTokenizer type approximation: <NUM> for tokens that
    parse numeric, else <ALPHANUM> (the two types the standard tokenizer
    emits for [a-z0-9] text)."""
    return "<NUM>" if t and t.replace(".", "", 1).replace(
        ",", "").isdigit() else "<ALPHANUM>"


def make_keep_types_filter(types: Iterable[str], mode: str = "include"
                           ) -> TokenFilter:
    """keep_types (KeepTypesFilterFactory): keep (or exclude) tokens whose
    TYPE is listed. Types come from :func:`_token_type` since this stream
    carries no attributes — covers the standard-tokenizer <NUM>/<ALPHANUM>
    split the conformance tests exercise."""
    tset = set(types)
    inc = mode == "include"

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            if (_token_type(t) in tset) == inc:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p
    return filt


def make_pattern_capture_filter(patterns: Iterable[str],
                                preserve_original: bool = True
                                ) -> TokenFilter:
    """pattern_capture (PatternCaptureGroupTokenFilter): every capture
    group of every pattern emits a token AT THE SAME POSITION; the original
    is kept when ``preserve_original`` (or when nothing matched)."""
    rxs = [re.compile(p) for p in patterns]

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            emitted = []
            for rx in rxs:
                for m in rx.finditer(t):
                    for g in m.groups():
                        if g:
                            emitted.append(g)
            if preserve_original or not emitted:
                out_t.append(t)
                out_p.append(p)
            for g in emitted:
                if g != t or not preserve_original:
                    out_t.append(g)
                    out_p.append(p)
        return out_t, out_p
    return filt


def make_pattern_replace_filter(pattern: str, replacement: str = "",
                                all: bool = True) -> TokenFilter:
    """pattern_replace TOKEN filter (PatternReplaceFilter — distinct from
    the char filter): regex-rewrite each token in place."""
    rx = re.compile(pattern)

    def one(t: str) -> Optional[str]:
        return rx.sub(replacement, t, count=0 if all else 1) or None
    return per_token(one)


def make_stemmer_override_filter(rules: dict,
                                 stemmer: Optional[TokenFilter] = None
                                 ) -> TokenFilter:
    """stemmer_override (StemmerOverrideTokenFilter): tokens in ``rules``
    take the dictated stem AND are protected from further stemming. Lucene
    implements protection via the keyword attribute; this stream has none,
    so the factory optionally WRAPS the downstream ``stemmer`` — overridden
    tokens skip it, others pass through it (same net semantics when placed
    where the stemmer chain sits)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            if t in rules:
                out_t.append(rules[t])
                out_p.append(p)
            elif stemmer is not None:
                st, sp = stemmer([t], [p])
                out_t.extend(st)
                out_p.extend(sp)
            else:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p
    return filt


def make_condition_filter(predicate: Callable[[str], bool],
                          filters: List[TokenFilter]) -> TokenFilter:
    """condition (ScriptedConditionTokenFilter): apply the sub-chain only
    to tokens satisfying ``predicate`` (a Python callable standing in for
    the Painless script, same substitution as everywhere else)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            if predicate(t):
                ts, ps = [t], [p]
                for f in filters:
                    ts, ps = f(ts, ps)
                out_t.extend(ts)
                out_p.extend(ps)
            else:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p
    return filt


def make_predicate_filter(predicate: Callable[[str], bool]) -> TokenFilter:
    """predicate_token_filter (ScriptedPredicateTokenFilter): keep tokens
    where the predicate holds (no position gap, Lucene FilteringTokenFilter
    with enablePositionIncrements handled by the caller's stop-style gaps
    not applying here)."""
    return per_token(lambda t: t if predicate(t) else None)


_CJK_WIDTH_MAP = {chr(c): chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F)}
_CJK_WIDTH_MAP[chr(0x3000)] = " "


def cjk_width_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """cjk_width (CJKWidthFilter): fold fullwidth ASCII variants to basic
    latin and halfwidth katakana to kana (the latter via NFKC, which is
    exactly Lucene's mapping for the FF61-FF9F block)."""
    def one(t: str) -> str:
        t = "".join(_CJK_WIDTH_MAP.get(ch, ch) for ch in t)
        if any(0xFF61 <= ord(ch) <= 0xFF9F for ch in t):
            t = unicodedata.normalize("NFKC", t)
        return t
    return [one(t) for t in tokens], positions


def make_delimited_payload_filter(delimiter: str = "|") -> TokenFilter:
    """delimited_payload (DelimitedPayloadTokenFilter): split
    ``token|payload``, keep the token part. Payloads have no storage here
    (the index carries no payload attribute) — the token-stream effect,
    which is what analyzers observe, is exactly this strip."""
    def one(t: str) -> Optional[str]:
        return t.split(delimiter, 1)[0] or None
    return per_token(one)


def make_keyword_marker_filter(keywords: Iterable[str],
                               chain: Optional[List[TokenFilter]] = None
                               ) -> TokenFilter:
    """keyword_marker (KeywordMarkerTokenFilter): protect listed words from
    stemming. Attribute-free stand-in: the factory wraps the downstream
    ``chain`` — keywords bypass it, everything else runs through it (a
    bare keyword_marker with no chain is the identity, as in Lucene)."""
    kw = set(keywords)
    inner = make_condition_filter(lambda t: t not in kw, chain or [])
    return inner if chain else (lambda ts, ps: (ts, ps))


def make_dictionary_decompounder_filter(word_list: Iterable[str],
                                        min_word_size: int = 5,
                                        min_subword_size: int = 2,
                                        max_subword_size: int = 15,
                                        only_longest_match: bool = False
                                        ) -> TokenFilter:
    """dictionary_decompounder (DictionaryCompoundWordTokenFilter): emit
    dictionary subwords found inside long tokens AT THE SAME POSITION, the
    original token kept first — the Lucene sliding-window algorithm.
    (hyphenation_decompounder is the point-aligned variant below — Liang's
    algorithm with inline TeX patterns replacing the XML grammar file.)"""
    words = set(word_list)

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            for i in range(len(t)):
                best = None
                for n in range(min_subword_size,
                               min(max_subword_size, len(t) - i) + 1):
                    sub = t[i:i + n]
                    if sub in words and sub != t:
                        if only_longest_match:
                            best = sub
                        else:
                            out_t.append(sub)
                            out_p.append(p)
                if only_longest_match and best:
                    out_t.append(best)
                    out_p.append(p)
        return out_t, out_p
    return filt


def _liang_points(word: str, patterns: dict) -> List[int]:
    """Hyphenation points for ``word`` under Liang's pattern algorithm
    (TeX82 / Knuth-Liang, public domain — the algorithm inside the
    reference's XML hyphenation grammars): wrap the word in '.', slide
    every pattern over it, take the MAX priority digit per inter-letter
    gap; odd final values are break points. ``patterns`` maps the
    pattern's letters to its per-gap digit list."""
    w = "." + word.lower() + "."
    vals = [0] * (len(w) + 1)
    for i in range(len(w)):
        for j in range(i + 1, min(len(w), i + 12) + 1):
            pat = patterns.get(w[i:j])
            if pat:
                for k, d in enumerate(pat):
                    if d > vals[i + k]:
                        vals[i + k] = d
    # vals index g = gap BEFORE w[g]; word letter m sits at w[m+1]
    return [g - 1 for g in range(2, len(w) - 1)
            if vals[g] % 2 == 1]


def _parse_tex_patterns(pats: Iterable[str]) -> dict:
    """TeX pattern strings ('hy3ph', '.he2n') -> {letters: digit-per-gap}."""
    out = {}
    for p in pats:
        letters = []
        digits = [0]
        for ch in p:
            if ch.isdigit():
                digits[-1] = int(ch)
            else:
                letters.append(ch)
                digits.append(0)
        out["".join(letters)] = digits
    return out


def make_hyphenation_decompounder_filter(patterns: Iterable[str],
                                         word_list: Optional[Iterable[str]]
                                         = None,
                                         min_word_size: int = 5,
                                         min_subword_size: int = 2,
                                         max_subword_size: int = 15,
                                         only_longest_match: bool = False
                                         ) -> TokenFilter:
    """hyphenation_decompounder (HyphenationCompoundWordTokenFilter): split
    compounds at Knuth-Liang hyphenation points; with a ``word_list``,
    keep only point-aligned substrings that are dictionary words (the
    reference's recommended mode), else emit the segments between
    consecutive points. The reference loads the patterns from an OFFO XML
    grammar — not shippable here, so TeX-style pattern STRINGS are passed
    inline (same algorithm, caller-supplied data; documented)."""
    pats = _parse_tex_patterns(patterns)
    words = set(w.lower() for w in word_list) if word_list else None

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t, out_p = [], []
        for t, p in zip(tokens, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            pts = _liang_points(t, pats)
            bounds = [0] + pts + [len(t)]
            if words is not None:
                # candidate = any substring between two break boundaries
                for ai in range(len(bounds) - 1):
                    best = None
                    for bi in range(ai + 1, len(bounds)):
                        sub = t[bounds[ai]:bounds[bi]]
                        if not (min_subword_size <= len(sub)
                                <= max_subword_size) or sub == t:
                            continue
                        if sub.lower() in words:
                            if only_longest_match:
                                best = sub
                            else:
                                out_t.append(sub)
                                out_p.append(p)
                    if only_longest_match and best:
                        out_t.append(best)
                        out_p.append(p)
            else:
                for ai in range(len(bounds) - 1):
                    sub = t[bounds[ai]:bounds[ai + 1]]
                    if (min_subword_size <= len(sub) <= max_subword_size
                            and sub != t):
                        out_t.append(sub)
                        out_p.append(p)
        return out_t, out_p
    return filt


def apostrophe_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """apostrophe (ApostropheFilter, Turkish): strip the apostrophe and
    everything after it."""
    def one(t: str) -> Optional[str]:
        return t.split("'", 1)[0].split("’", 1)[0] or None
    return per_token(one)(tokens, positions)


_ARABIC_NORM = str.maketrans({
    "آ": "ا", "أ": "ا", "إ": "ا",  # alef forms
    "ى": "ي",  # dotless ya -> ya
    "ة": "ه",  # teh marbuta -> heh
    "ـ": None,      # tatweel
    # harakat (ArabicNormalizer removes vowel marks)
    "ً": None, "ٌ": None, "ٍ": None, "َ": None,
    "ُ": None, "ِ": None, "ّ": None, "ْ": None,
})


def arabic_normalization_filter(tokens: List[str], positions: List[int]
                                ) -> TokenStream:
    """arabic_normalization (Lucene ArabicNormalizer rules)."""
    return [t.translate(_ARABIC_NORM) for t in tokens], positions


_PERSIAN_NORM = str.maketrans({
    "ي": "ی",  # arabic ya -> farsi yeh
    "ك": "ک",  # arabic kaf -> keheh
    "ة": "ه",  # teh marbuta -> heh
    "‌": None,      # ZWNJ removed
    "ـ": None,
})


def persian_normalization_filter(tokens: List[str], positions: List[int]
                                 ) -> TokenStream:
    """persian_normalization (Lucene PersianNormalizer rules)."""
    return [t.translate(_PERSIAN_NORM) for t in tokens], positions


_VOWELS_DE = set("aeiouyäöü")


def german_normalization_filter(tokens: List[str], positions: List[int]
                                ) -> TokenStream:
    """german_normalization (Lucene GermanNormalizationFilter / Snowball
    german2): ß->ss; ä/ö/ü lose the umlaut; 'ae'/'oe' -> a/o; 'ue' -> u
    except after a vowel or q."""
    def one(t: str) -> str:
        out = []
        i = 0
        while i < len(t):
            c = t[i]
            nxt = t[i + 1] if i + 1 < len(t) else ""
            if c == "ß":
                out.append("ss")
            elif c in "aou" and nxt == "e":
                if c == "u" and i > 0 and (t[i - 1] in _VOWELS_DE
                                           or t[i - 1] == "q"):
                    out.append(c)
                    i += 1
                    continue
                out.append(c)
                i += 2
                continue
            elif c == "ä":
                out.append("a")
            elif c == "ö":
                out.append("o")
            elif c == "ü":
                out.append("u")
            else:
                out.append(c)
            i += 1
        return "".join(out)
    return [one(t) for t in tokens], positions


_SCANDI_FOLD = str.maketrans({
    "å": "a", "Å": "A", "ä": "a", "Ä": "A", "æ": "a", "Æ": "A",
    "ö": "o", "Ö": "O", "ø": "o", "Ø": "O",
})
_SCANDI_NORM = str.maketrans({
    "ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø",
})


def scandinavian_folding_filter(tokens: List[str], positions: List[int]
                                ) -> TokenStream:
    """scandinavian_folding: å/ä/æ->a, ö/ø->o (+ aa/ae/ao/oe/oo digraph
    folding per Lucene ScandinavianFoldingFilter)."""
    def one(t: str) -> str:
        t = t.translate(_SCANDI_FOLD)
        for dg, r in (("aa", "a"), ("ae", "a"), ("ao", "a"),
                      ("oe", "o"), ("oo", "o")):
            t = t.replace(dg, r)
        return t
    return [one(t) for t in tokens], positions


def scandinavian_normalization_filter(tokens: List[str],
                                      positions: List[int]) -> TokenStream:
    """scandinavian_normalization: interchangeable forms unify (ä->æ,
    ö->ø, ae->æ, oe->ø, aa->å — ScandinavianNormalizationFilter)."""
    def one(t: str) -> str:
        t = t.translate(_SCANDI_NORM)
        return t.replace("ae", "æ").replace("oe", "ø").replace("aa", "å")
    return [one(t) for t in tokens], positions


def flatten_graph_filter(tokens: List[str], positions: List[int]
                         ) -> TokenStream:
    """flatten_graph (FlattenGraphFilter): these streams are ALREADY flat
    (graph filters here emit (token, position) pairs, never posLength > 1),
    so this is the identity — registered for pipeline compatibility."""
    return tokens, positions


def remove_duplicates_filter(tokens: List[str], positions: List[int]
                             ) -> TokenStream:
    """remove_duplicates (RemoveDuplicatesTokenFilter): drop a token equal
    to another token AT THE SAME POSITION (synonym/graph dedup)."""
    seen = set()
    out_t, out_p = [], []
    for t, p in zip(tokens, positions):
        if (t, p) in seen:
            continue
        seen.add((t, p))
        out_t.append(t)
        out_p.append(p)
    return out_t, out_p


def classic_filter(tokens: List[str], positions: List[int]) -> TokenStream:
    """classic (ClassicFilter): strip trailing 's and dots from acronyms."""
    def one(t: str) -> Optional[str]:
        if t.endswith("'s") or t.endswith("’s"):
            t = t[:-2]
        if "." in t and all(len(part) <= 1 for part in t.split(".")):
            t = t.replace(".", "")
        return t or None
    return per_token(one)(tokens, positions)


def hindi_normalization_filter(tokens: List[str], positions: List[int]
                               ) -> TokenStream:
    """hindi_normalization (HindiNormalizer subset): nukta decomposition
    (NFD then drop U+093C) — the rule the conformance cases exercise."""
    def one(t: str) -> str:
        return "".join(ch for ch in unicodedata.normalize("NFD", t)
                       if ch != "़")
    return [unicodedata.normalize("NFC", one(t)) for t in tokens], positions


def make_lowercase_filter(language: Optional[str] = None) -> TokenFilter:
    """lowercase with a language override (LowerCaseTokenFilterFactory:
    greek/irish/turkish variants). Turkish: I->ı and İ->i (dotted/dotless
    distinction, TurkishLowerCaseFilter)."""
    if language == "turkish":
        tr = str.maketrans({"I": "ı", "İ": "i"})

        def filt(tokens: List[str], positions: List[int]) -> TokenStream:
            return [t.translate(tr).lower() for t in tokens], positions
        return filt
    if language == "greek":
        def filt_g(tokens: List[str], positions: List[int]) -> TokenStream:
            # final sigma normalizes with str.lower(); also fold ς -> σ
            return [t.lower().replace("ς", "σ")
                    for t in tokens], positions
        return filt_g
    return lowercase_filter


# ------------------------------------------------- round-4b filter tail
# CommonAnalysisModulePlugin.java:251-340 — the language-stem filters, the
# remaining normalizers, and the stream-shape filters. Language stems
# delegate to the light stemmers in analysis/lang.py (the same documented
# approximations the language analyzers use).

def _lang_stem_filter(stem_fn) -> TokenFilter:
    return per_token(lambda t: stem_fn(t) or None)


def arabic_stem_filter(tokens, positions):
    """arabic_stem (ArabicStemTokenFilterFactory): normalize + light stem."""
    from .lang import arabic_light_stem
    return _lang_stem_filter(arabic_light_stem)(tokens, positions)


def brazilian_stem_filter(tokens, positions):
    """brazilian_stem (BrazilianStemTokenFilterFactory): approximated with
    the Portuguese light stemmer (Brazilian Portuguese shares the suffix
    system; Lucene's BrazilianStemmer is a heavier variant — documented
    approximation, same discipline as the language analyzers)."""
    from .lang import portuguese_light_stem
    return _lang_stem_filter(portuguese_light_stem)(tokens, positions)


def czech_stem_filter(tokens, positions):
    """czech_stem (CzechStemTokenFilterFactory)."""
    from .lang import czech_light_stem
    return _lang_stem_filter(czech_light_stem)(tokens, positions)


def dutch_stem_filter(tokens, positions):
    """dutch_stem (DutchStemTokenFilterFactory)."""
    from .lang import dutch_light_stem
    return _lang_stem_filter(dutch_light_stem)(tokens, positions)


def french_stem_filter(tokens, positions):
    """french_stem (FrenchStemTokenFilterFactory)."""
    from .lang import french_light_stem
    return _lang_stem_filter(french_light_stem)(tokens, positions)


def german_stem_filter(tokens, positions):
    """german_stem (GermanStemTokenFilterFactory)."""
    from .lang import german_light_stem
    return _lang_stem_filter(german_light_stem)(tokens, positions)


def russian_stem_filter(tokens, positions):
    """russian_stem (RussianStemTokenFilterFactory)."""
    from .lang import russian_light_stem
    return _lang_stem_filter(russian_light_stem)(tokens, positions)


def bengali_normalization_filter(tokens: List[str], positions: List[int]
                                 ) -> TokenStream:
    """bengali_normalization (BengaliNormalizer subset): nukta
    decomposition-fold (NFD, drop U+09BC, NFC) — the assimilation rules
    beyond nukta are out of scope, documented."""
    def one(t: str) -> str:
        return unicodedata.normalize(
            "NFC", "".join(ch for ch in unicodedata.normalize("NFD", t)
                           if ch != "়"))
    return [one(t) for t in tokens], positions


_DEVANAGARI_NUKTA = {  # base + U+093C -> precomposed (NFC excludes these)
    "\u0915": "\u0958", "\u0916": "\u0959", "\u0917": "\u095a",
    "\u091c": "\u095b", "\u0921": "\u095c", "\u0922": "\u095d",
    "\u092b": "\u095e", "\u092f": "\u095f", "\u0928": "\u0929",
    "\u0930": "\u0931", "\u0933": "\u0934"}


def indic_normalization_filter(tokens: List[str], positions: List[int]
                               ) -> TokenStream:
    """indic_normalization (IndicNormalizer subset): NFC plus the
    Devanagari base+nukta compositions Unicode EXCLUDES from NFC (the
    core of Lucene's per-script composition tables; other scripts'
    tables are out of scope, documented)."""
    def one(t: str) -> str:
        t = unicodedata.normalize("NFC", t)
        out = []
        for ch in t:
            if ch == "़" and out and out[-1] in _DEVANAGARI_NUKTA:
                out[-1] = _DEVANAGARI_NUKTA[out[-1]]
            else:
                out.append(ch)
        return "".join(out)
    return [one(t) for t in tokens], positions


def sorani_normalization_filter(tokens: List[str], positions: List[int]
                                ) -> TokenStream:
    """sorani_normalization (SoraniNormalizer subset): Arabic Kaf -> Keheh,
    Yeh/Alef-Maksura -> Farsi Yeh, Heh at word end -> Ae, strip tatweel /
    ZWNJ / Arabic harakat."""
    tr = str.maketrans({"ك": "ک", "ي": "ی",
                        "ى": "ی"})

    def one(t: str) -> Optional[str]:
        t = t.translate(tr)
        t = "".join(ch for ch in t
                    if ch not in ("ـ", "‌")
                    and not ("ً" <= ch <= "ٞ"))
        if t.endswith("ه"):  # final Heh -> Ae (the Sorani vowel)
            t = t[:-1] + "ە"
        return t or None
    return per_token(one)(tokens, positions)


def serbian_normalization_filter(tokens: List[str], positions: List[int]
                                 ) -> TokenStream:
    """serbian_normalization (SerbianNormalizationFilter, "bald" Latin):
    Cyrillic -> Latin transliteration and diacritic folding (đ/ђ -> dj,
    ž/ж -> z, ć/ћ -> c, č/ч -> c, š/ш -> s, џ -> dz, љ -> lj, њ -> nj)."""
    m = {"а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj",
         "е": "e", "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k",
         "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
         "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "c", "у": "u",
         "ф": "f", "х": "h", "ц": "c", "ч": "c", "џ": "dz", "ш": "s",
         "đ": "dj", "ž": "z", "ć": "c", "č": "c", "š": "s"}

    def one(t: str) -> str:
        return "".join(m.get(ch, m.get(ch.lower(), ch)) for ch in t)
    return [one(t) for t in tokens], positions


def keyword_repeat_filter(tokens: List[str], positions: List[int]
                          ) -> TokenStream:
    """keyword_repeat (KeywordRepeatFilter): emit every token TWICE at the
    same position (one copy keyword-marked in Lucene so a downstream
    stemmer leaves it alone). Attribute-free stand-in: pair it with
    make_keyword_repeat_filter(chain) for the stemmed+original effect, or
    follow with remove_duplicates as in the reference pipelines."""
    out_t: List[str] = []
    out_p: List[int] = []
    for t, p in zip(tokens, positions):
        out_t += [t, t]
        out_p += [p, p]
    return out_t, out_p


def make_keyword_repeat_filter(chain: Optional[List[TokenFilter]] = None
                               ) -> TokenFilter:
    """keyword_repeat + downstream chain, end-to-end: emits the ORIGINAL
    token and the chain's output at the same position (exactly what
    keyword_repeat -> stemmer -> remove_duplicates produces in the
    reference — the keyword-marked copy bypasses the stemmer)."""
    if not chain:
        return keyword_repeat_filter

    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        ct, cp = list(tokens), list(positions)
        for f in chain:
            ct, cp = f(ct, cp)
        stemmed = dict(zip(cp, ct))  # chain output by position
        out_t: List[str] = []
        out_p: List[int] = []
        for t, p in zip(tokens, positions):
            out_t.append(t)
            out_p.append(p)
            s = stemmed.get(p)
            if s is not None and s != t:
                out_t.append(s)
                out_p.append(p)
        return out_t, out_p
    return filt


def make_delimited_term_freq_filter(delimiter: str = "|") -> TokenFilter:
    """delimited_term_freq (DelimitedTermFrequencyTokenFilter): split
    ``token|N`` and repeat the token N times AT THE SAME POSITION — the
    index's tf for the term comes out exactly N (the reference sets a
    termFrequency attribute; occurrence-count indexing makes repetition
    the equivalent), documented stream-shape approximation."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t: List[str] = []
        out_p: List[int] = []
        for t, p in zip(tokens, positions):
            term, _, freq = t.partition(delimiter)
            if not term:
                continue
            n = int(freq) if freq.isdigit() and int(freq) > 0 else 1
            out_t += [term] * n
            out_p += [p] * n
        return out_t, out_p
    return filt


def type_as_payload_filter(tokens: List[str], positions: List[int]
                           ) -> TokenStream:
    """type_as_payload (TypeAsPayloadTokenFilter): copies the token-type
    attribute into the payload attribute. Neither attribute has storage
    here (same contract as delimited_payload's payload drop), and the
    observable token stream is unchanged — identity, registered for
    pipeline compatibility."""
    return tokens, positions


def make_concatenate_graph_filter(token_separator: str = " ",
                                  max_graph_expansions: int = 100
                                  ) -> TokenFilter:
    """concatenate_graph (ConcatenateGraphFilter): concatenate the whole
    stream into ONE token joined by ``token_separator`` (these streams are
    already flat, so the single linear path is the graph's only path)."""
    def filt(tokens: List[str], positions: List[int]) -> TokenStream:
        if not tokens:
            return [], []
        return ([token_separator.join(tokens)],
                [positions[0] if positions else 0])
    return filt


# --------------------------------------------------------------- phonetic

_SOUNDEX_CODE = {**{c: d for cs, d in (
    ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
    ("l", "4"), ("mn", "5"), ("r", "6")) for c in cs}}


def _soundex(word: str) -> str:
    """Classic American Soundex (the `soundex` encoder of the
    analysis-phonetic plugin / commons-codec Soundex): first letter +
    3 digits, consonants coded, adjacent duplicates collapsed, h/w
    transparent between same-coded consonants, vowels reset."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    out = [w[0].upper()]
    prev = _SOUNDEX_CODE.get(w[0], "")
    for c in w[1:]:
        code = _SOUNDEX_CODE.get(c, "")
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        if c not in "hw":
            prev = code
    return ("".join(out) + "000")[:4]


def _metaphone_lite(word: str) -> str:
    """A compact Metaphone approximation (the plugin's `metaphone`
    encoder, documented approximation): common digraph reductions +
    vowel dropping after the first letter. Deterministic; golden-pinned.
    """
    w = "".join(c for c in word.lower() if c.isalpha())
    if not w:
        return ""
    for a, b in (("ph", "f"), ("gh", "g"), ("kn", "n"), ("gn", "n"),
                 ("wr", "r"), ("ck", "k"), ("sch", "sk"), ("sh", "x"),
                 ("ch", "x"), ("th", "0"), ("wh", "w"), ("qu", "kw")):
        w = w.replace(a, b)
    head, rest = w[0], w[1:]
    rest = "".join(c for c in rest if c not in "aeiou")
    out = head + rest
    dedup = [out[0]]
    for c in out[1:]:
        if c != dedup[-1]:
            dedup.append(c)
    return "".join(dedup).upper()[:6]


def make_phonetic_filter(encoder: str = "soundex",
                         replace: bool = True) -> TokenFilter:
    """analysis-phonetic plugin (PhoneticTokenFilterFactory): emit each
    token's phonetic encoding — ``replace=False`` keeps the original
    token too, at the SAME position (the plugin's default for search
    chains)."""
    enc = {"soundex": _soundex, "metaphone": _metaphone_lite}[encoder]

    def f(tokens: List[str], positions: List[int]) -> TokenStream:
        out_t: List[str] = []
        out_p: List[int] = []
        for t, p in zip(tokens, positions):
            e = enc(t)
            if not replace:
                out_t.append(t)
                out_p.append(p)
            if e:
                out_t.append(e)
                out_p.append(p)
        return out_t, out_p

    return f


def make_icu_normalizer_filter(form: str = "NFKC") -> TokenFilter:
    """`icu_normalizer` approximation (plugins/analysis-icu,
    IcuNormalizerTokenFilterFactory) via Python's unicodedata: NFKC by
    default (the plugin's nfkc_cf minus ICU-specific case folding — we
    compose with the lowercase filter for the _cf part). Documented
    approximation: ICU tailorings beyond Unicode normalization forms are
    out of scope."""
    import unicodedata

    def f(tokens: List[str], positions: List[int]) -> TokenStream:
        return ([unicodedata.normalize(form, t) for t in tokens],
                positions)

    return f


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
    "snowball": snowball_filter,
    "kstem": kstem_filter,
    "word_delimiter": word_delimiter_filter,
    "word_delimiter_graph": word_delimiter_graph_filter,
    # parameterized factories
    "stemmer": make_stemmer_filter,
    "phonetic": make_phonetic_filter,
    "icu_normalizer": make_icu_normalizer_filter,
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
    "common_grams": make_common_grams_filter,
    "min_hash": make_min_hash_filter,
    # round-4 tail (CommonAnalysisModulePlugin.java:251-340)
    "cjk_width": cjk_width_filter,
    "apostrophe": apostrophe_filter,
    "arabic_normalization": arabic_normalization_filter,
    "persian_normalization": persian_normalization_filter,
    "german_normalization": german_normalization_filter,
    "scandinavian_folding": scandinavian_folding_filter,
    "scandinavian_normalization": scandinavian_normalization_filter,
    "flatten_graph": flatten_graph_filter,
    "remove_duplicates": remove_duplicates_filter,
    "classic": classic_filter,
    "hindi_normalization": hindi_normalization_filter,
    # parameterized factories (round-4 tail)
    "keep_types": make_keep_types_filter,
    "pattern_capture": make_pattern_capture_filter,
    "pattern_replace": make_pattern_replace_filter,
    "stemmer_override": make_stemmer_override_filter,
    "condition": make_condition_filter,
    "predicate_token_filter": make_predicate_filter,
    "delimited_payload": make_delimited_payload_filter,
    "keyword_marker": make_keyword_marker_filter,
    "dictionary_decompounder": make_dictionary_decompounder_filter,
    "lowercase_lang": make_lowercase_filter,
    # round-4b tail
    "cjk_bigram": cjk_bigram_filter,
    "arabic_stem": arabic_stem_filter,
    "brazilian_stem": brazilian_stem_filter,
    "czech_stem": czech_stem_filter,
    "dutch_stem": dutch_stem_filter,
    "french_stem": french_stem_filter,
    "german_stem": german_stem_filter,
    "russian_stem": russian_stem_filter,
    "bengali_normalization": bengali_normalization_filter,
    "indic_normalization": indic_normalization_filter,
    "sorani_normalization": sorani_normalization_filter,
    "serbian_normalization": serbian_normalization_filter,
    "keyword_repeat": keyword_repeat_filter,
    "keyword_repeat_with": make_keyword_repeat_filter,
    "delimited_term_freq": make_delimited_term_freq_filter,
    "type_as_payload": type_as_payload_filter,
    "concatenate_graph": make_concatenate_graph_filter,
    "hyphenation_decompounder": make_hyphenation_decompounder_filter,
}
