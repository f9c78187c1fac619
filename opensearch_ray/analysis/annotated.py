"""annotated_text field type (modules? no — plugins/mapper-annotated-text,
AnnotatedTextFieldMapper): markdown-link syntax ``[covered text](anno)``
indexes the covered text normally AND each annotation as a single
un-analyzed token AT THE SAME POSITION as the first covered token — the
reference's AnnotationAnalyzerWrapper emits annotations with
positionIncrement 0 so phrase queries treat an entity tag and its surface
text interchangeably. Multiple annotations separate with ``&``, values are
URL-encoded.
"""
from __future__ import annotations

import re
import urllib.parse
from dataclasses import dataclass, field
from typing import List, Tuple

from .analyzer import Analyzer, transcript_analyzer

_ANNO_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")


@dataclass
class AnnotatedTextAnalyzer(Analyzer):
    """Wraps a base analyzer; plain spans and covered text analyze
    normally, annotation tokens inject at the covered span's first
    position. Picklable (ships to Ray builder tasks like any chain)."""

    base: Analyzer = field(default_factory=lambda: transcript_analyzer)
    name: str = "annotated_text"

    def _raw_len(self, seg: str) -> int:
        """Pre-stop token count of one span (position-offset unit — the
        same rank function the base fast path uses)."""
        if not seg:
            return 0
        if self.base._lower_fast:
            return len(self.base.tokenizer(seg.lower()))
        toks, poss = self.base.analyze(seg)
        return (max(poss) + 1) if poss else 0

    def analyze(self, text: str) -> Tuple[List[str], List[int]]:
        if not text:
            return [], []
        toks: List[str] = []
        poss: List[int] = []
        offset = 0

        def eat(seg: str, anchor_out=None):
            nonlocal offset
            t, p = self.base.analyze(seg)
            toks.extend(t)
            poss.extend(int(x) + offset for x in p)
            if anchor_out is not None:
                anchor_out.append(offset)
            offset += self._raw_len(seg)

        last = 0
        for m in _ANNO_RE.finditer(text):
            eat(text[last:m.start()])
            anchor: List[int] = []
            eat(m.group(1), anchor_out=anchor)
            for a in m.group(2).split("&"):
                a = urllib.parse.unquote(a).strip()
                if a:
                    # annotation = single keyword token, positionIncrement
                    # 0 relative to the covered span's first token
                    toks.append(a)
                    poss.append(anchor[0])
            last = m.end()
        eat(text[last:])
        return toks, poss

    def tokens(self, text: str) -> List[str]:
        return self.analyze(text)[0]


annotated_text_analyzer = AnnotatedTextAnalyzer()
