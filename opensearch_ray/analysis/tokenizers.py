"""Tokenizers.

Reference registrations: modules/analysis-common/.../CommonAnalysisModulePlugin.java:356-411
and server/index/analysis/StandardTokenizerFactory.java:47-61 (standard tokenizer,
Unicode UAX#29 word-break, ``max_token_length`` default 255).

A tokenizer is a callable ``(text: str) -> list[str]``. All tokenizers here are
pure functions with pre-compiled regexes (module import time == once per worker
process), so they are safe and cheap inside ``map_batches``.

UAX#29 note: the reference delegates to Lucene's JFlex-generated UAX#29
scanner. We implement a close regex approximation: alphanumeric runs
(underscore joins, per UAX#29 ExtendNumLet), word-internal apostrophes
(``can't`` -> one token), number-internal ``.``/``,`` (``3.14``, ``1,000``),
and CJK ideographs emitted one token per character (Lucene's IDEOGRAPHIC
type). Our query engine, oracle scorer, and golden tests all share this exact
definition, so scoring is self-consistent.
"""

from __future__ import annotations

import re
from typing import Callable, List

MAX_TOKEN_LENGTH = 255  # ref: StandardTokenizerFactory.java:47-61

_CJK = "㐀-䶿一-鿿豈-﫿"
# A "word" char: any \w (unicode letters, digits, underscore) that is NOT a CJK
# ideograph ([^\W...] = word-char minus the listed ranges).
_W = rf"[^\W{_CJK}]"

_STANDARD_RE = re.compile(
    rf"[{_CJK}]"                      # one ideograph per token
    rf"|{_W}+(?:[.,]\d+|['’]{_W}+)*"  # alnum runs; 3.14 / 1,000 / can't
)

_WHITESPACE_RE = re.compile(r"\S+")
_LETTER_RE = re.compile(r"[^\W\d_]+")  # maximal runs of letters


def _split_long(tokens: List[str], max_len: int) -> List[str]:
    """Lucene splits tokens longer than max_token_length at max_len intervals."""
    if all(len(t) <= max_len for t in tokens):
        return tokens
    out: List[str] = []
    for t in tokens:
        if len(t) <= max_len:
            out.append(t)
        else:
            out.extend(t[i : i + max_len] for i in range(0, len(t), max_len))
    return out


def standard_tokenizer(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> List[str]:
    """UAX#29-approximate word-break tokenizer (the default analyzer's core)."""
    toks = _STANDARD_RE.findall(text)
    if len(text) <= max_token_length:
        return toks  # no token can exceed the whole string's length
    return _split_long(toks, max_token_length)


def whitespace_tokenizer(text: str) -> List[str]:
    return _WHITESPACE_RE.findall(text)


def letter_tokenizer(text: str) -> List[str]:
    return _LETTER_RE.findall(text)


def lowercase_tokenizer(text: str) -> List[str]:
    """letter tokenizer + lowercase, like the reference's ``lowercase`` tokenizer."""
    return [t.lower() for t in _LETTER_RE.findall(text)]


def keyword_tokenizer(text: str) -> List[str]:
    return [text] if text else []


def make_pattern_tokenizer(pattern: str = r"\W+", group: int = -1) -> Callable[[str], List[str]]:
    """``pattern`` tokenizer: by default the pattern SPLITS (like the reference,
    default pattern ``\\W+``); with ``group >= 0`` the pattern MATCHES tokens."""
    rx = re.compile(pattern)
    if group >= 0:
        def tok_match(text: str) -> List[str]:
            return [m.group(group) for m in rx.finditer(text) if m.group(group)]
        return tok_match

    def tok_split(text: str) -> List[str]:
        return [t for t in rx.split(text) if t]
    return tok_split


def make_char_group_tokenizer(tokenize_on_chars: List[str]) -> Callable[[str], List[str]]:
    """``char_group`` tokenizer: split on a set of chars / char classes."""
    chars = set()
    classes = []
    for c in tokenize_on_chars:
        if c == "whitespace":
            classes.append(str.isspace)
        elif c == "letter":
            classes.append(str.isalpha)
        elif c == "digit":
            classes.append(str.isdigit)
        elif c in ("punctuation", "symbol"):
            classes.append(lambda ch: not ch.isalnum() and not ch.isspace())
        else:
            chars.add(c)

    def is_sep(ch: str) -> bool:
        return ch in chars or any(f(ch) for f in classes)

    def tok(text: str) -> List[str]:
        out, cur = [], []
        for ch in text:
            if is_sep(ch):
                if cur:
                    out.append("".join(cur))
                    cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out
    return tok


def make_ngram_tokenizer(min_gram: int = 1, max_gram: int = 2) -> Callable[[str], List[str]]:
    def tok(text: str) -> List[str]:
        out = []
        n = len(text)
        for i in range(n):
            for g in range(min_gram, max_gram + 1):
                if i + g <= n:
                    out.append(text[i : i + g])
        return out
    return tok


def make_edge_ngram_tokenizer(min_gram: int = 1, max_gram: int = 2) -> Callable[[str], List[str]]:
    def tok(text: str) -> List[str]:
        return [text[:g] for g in range(min_gram, min(max_gram, len(text)) + 1)]
    return tok


def make_path_hierarchy_tokenizer(delimiter: str = "/") -> Callable[[str], List[str]]:
    """``path_hierarchy``: /a/b/c -> [/a, /a/b, /a/b/c]."""
    def tok(text: str) -> List[str]:
        if not text:
            return []
        parts = text.split(delimiter)
        out, prefix = [], ""
        for i, p in enumerate(parts):
            if i == 0 and p == "":
                prefix = delimiter
                continue
            prefix = prefix + p if i == 0 or prefix.endswith(delimiter) else prefix + delimiter + p
            out.append(prefix)
        return out
    return tok


_URL_EMAIL_RE = re.compile(
    rf"(?:[A-Za-z][A-Za-z0-9+.-]*://\S+)"          # URL
    rf"|(?:[\w.+-]+@[\w-]+(?:\.[\w-]+)+)"          # email
    rf"|[{_CJK}]"
    rf"|{_W}+(?:[.,]\d+|['’]{_W}+)*"
)


def uax_url_email_tokenizer(text: str) -> List[str]:
    """standard tokenizer that additionally keeps URLs and emails whole."""
    return _split_long(_URL_EMAIL_RE.findall(text), MAX_TOKEN_LENGTH)


def make_simple_pattern_tokenizer(pattern: str) -> Callable[[str], List[str]]:
    """``simple_pattern``: tokens = maximal matches of the pattern
    (SimplePatternTokenizerFactory — the reference restricts to Lucene's
    regex subset for speed; we accept any Python regex, a documented
    superset)."""
    rx = re.compile(pattern)

    def tok(text: str) -> List[str]:
        return [m for m in rx.findall(text) if m]
    return tok


def make_simple_pattern_split_tokenizer(pattern: str) -> Callable[[str], List[str]]:
    """``simple_pattern_split``: split on pattern matches."""
    rx = re.compile(pattern)

    def tok(text: str) -> List[str]:
        return [t for t in rx.split(text) if t]
    return tok


_CLASSIC_RE = re.compile(
    r"(?:[A-Za-z]\.){2,}(?:['’]s)?"             # acronym U.S.A. (+possessive)
    r"|[A-Za-z0-9]+(?:['’][A-Za-z0-9]+)*"       # word / possessive
    r"|\d+(?:[.,]\d+)*"
)


def classic_tokenizer(text: str) -> List[str]:
    """``classic`` (Lucene ClassicTokenizer approximation): keeps acronyms
    with interior dots (dots then removed, ClassicFilter), keeps interior
    apostrophes but strips trailing possessive 's."""
    out = []
    for t in _CLASSIC_RE.findall(text):
        if "." in t:
            t = t.replace(".", "")
        if t.endswith("'s") or t.endswith("’s"):
            t = t[:-2]
        if t:
            out.append(t)
    return out


_THAI_RUN = re.compile(rf"[฀-๿]+|[^\W{_CJK}฀-๿]+")

# Indic scripts: Python's \w excludes combining vowel signs (Mn/Mc), which
# would split every word at its matras — treat whole Devanagari..Sinhala
# block runs as tokens instead (same run-level approximation as thai)
_INDIC = "ऀ-෿"
_INDIC_RUN = re.compile(rf"[{_INDIC}]+|[^\W{_CJK}{_INDIC}]+")


def indic_tokenizer(text: str) -> List[str]:
    """Script-run tokenizer for Devanagari/Bengali/…: keeps combining vowel
    signs attached to their word (the standard tokenizer's \\w class breaks
    at Mn marks); non-Indic text follows standard word rules."""
    return _split_long(_INDIC_RUN.findall(text), MAX_TOKEN_LENGTH)


def thai_tokenizer(text: str) -> List[str]:
    """``thai`` — documented approximation: Thai codepoint runs become single
    tokens (the reference segments them with an ICU/dictionary BreakIterator,
    not available here); non-Thai text follows standard word rules."""
    return _split_long(_THAI_RUN.findall(text), MAX_TOKEN_LENGTH)


TOKENIZERS = {
    "standard": standard_tokenizer,
    "classic": classic_tokenizer,
    "thai": thai_tokenizer,
    "whitespace": whitespace_tokenizer,
    "letter": letter_tokenizer,
    "lowercase": lowercase_tokenizer,
    "keyword": keyword_tokenizer,
    "uax_url_email": uax_url_email_tokenizer,
    # parameterized factories (call to get a tokenizer)
    "pattern": make_pattern_tokenizer,
    "simple_pattern": make_simple_pattern_tokenizer,
    "simple_pattern_split": make_simple_pattern_split_tokenizer,
    "char_group": make_char_group_tokenizer,
    "ngram": make_ngram_tokenizer,
    "edge_ngram": make_edge_ngram_tokenizer,
    "path_hierarchy": make_path_hierarchy_tokenizer,
}
