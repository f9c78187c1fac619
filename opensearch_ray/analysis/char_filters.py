"""Char filters: ``html_strip``, ``pattern_replace``, ``mapping``.

Reference: modules/analysis-common/.../CommonAnalysisModulePlugin.java:347-349.
A char filter is ``(text: str) -> str``, applied before tokenization.
"""

from __future__ import annotations

import html
import re
from typing import Callable, Dict

_TAG_RE = re.compile(r"<[^>]*>")


def html_strip(text: str) -> str:
    """Drop HTML tags, decode entities (like Lucene HTMLStripCharFilter)."""
    return html.unescape(_TAG_RE.sub(" ", text))


def make_pattern_replace(pattern: str, replacement: str = "") -> Callable[[str], str]:
    rx = re.compile(pattern)
    return lambda text: rx.sub(replacement, text)


def make_mapping(mappings: Dict[str, str]) -> Callable[[str], str]:
    """``mapping`` char filter: literal string replacements, longest-first."""
    keys = sorted(mappings, key=len, reverse=True)
    rx = re.compile("|".join(re.escape(k) for k in keys))
    return lambda text: rx.sub(lambda m: mappings[m.group(0)], text)


CHAR_FILTERS = {
    "html_strip": html_strip,
    "pattern_replace": make_pattern_replace,
    "mapping": make_mapping,
}
