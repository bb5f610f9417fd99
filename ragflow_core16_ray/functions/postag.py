"""In-band positional tag codec.

The reference weaves position tags ``@@page\tx0\tx1\ttop\tbottom##``
through section text and strips them before output
(deepdoc/parser/pdf_parser.py:893-908 _line_tag, :1126-1127 remove_tag).
We carry positions structurally in Arrow instead (SURVEY.md §2.2), but the
codec is kept for fixture parity with reference-formatted text.
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(r"@@([0-9-]+)\t([0-9.-]+)\t([0-9.-]+)\t([0-9.-]+)\t([0-9.-]+)##")


def encode_tag(page: int, x0: float, x1: float, top: float,
               bottom: float) -> str:
    return f"@@{page}\t{x0:.1f}\t{x1:.1f}\t{top:.1f}\t{bottom:.1f}##"


def strip_tags(text: str) -> str:
    return _TAG_RE.sub("", text)


def parse_tags(text: str) -> list[tuple[int, float, float, float, float]]:
    return [(int(m.group(1)), float(m.group(2)), float(m.group(3)),
             float(m.group(4)), float(m.group(5)))
            for m in _TAG_RE.finditer(text)]
