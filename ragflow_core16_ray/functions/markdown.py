"""Markdown section + table extraction.

From-scratch implementation of the reference behaviors in
deepdoc/parser/markdown_parser.py:24-77 (pull bordered markdown tables out
of the text) and rag/app/naive.py:286-312 (headings glued to the following
text block; tables become standalone HTML chunks).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)+\|?\s*$")


@dataclass
class MdDoc:
    title: str = ""
    sections: list[str] = field(default_factory=list)
    tables: list[str] = field(default_factory=list)  # HTML strings


def _cells(line: str) -> list[str]:
    parts = line.strip().strip("|").split("|")
    return [c.strip() for c in parts]


def rows_to_html(rows: list[list[str]], header: bool = True) -> str:
    out = ["<table>"]
    for i, row in enumerate(rows):
        tag = "th" if (header and i == 0) else "td"
        out.append("<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in row) + "</tr>")
    out.append("</table>")
    return "".join(out)


def extract_markdown(lines: list[str]) -> MdDoc:
    """``lines`` = the doc's md spans in order (each may hold several
    newline-separated lines)."""
    flat: list[str] = []
    for chunk in lines:
        flat.extend(chunk.split("\n"))

    doc = MdDoc()
    pending_heading: str | None = None
    buf: list[str] = []

    def flush():
        nonlocal buf, pending_heading
        body = "\n".join(x for x in buf if x.strip())
        buf = []
        if pending_heading is not None and body:
            doc.sections.append(pending_heading + "\n" + body)
            pending_heading = None
        elif body:
            doc.sections.append(body)

    i, n = 0, len(flat)
    while i < n:
        line = flat[i]
        # bordered table: |...| row followed by a separator row
        if (_TABLE_ROW_RE.match(line) and i + 1 < n
                and _TABLE_SEP_RE.match(flat[i + 1])):
            flush()
            rows = [_cells(line)]
            i += 2
            while i < n and _TABLE_ROW_RE.match(flat[i]):
                rows.append(_cells(flat[i]))
                i += 1
            doc.tables.append(rows_to_html(rows))
            continue
        m = _HEADING_RE.match(line)
        if m:
            flush()
            if pending_heading is not None:
                # heading with no body still becomes a section
                doc.sections.append(pending_heading)
            heading = m.group(2).strip()
            if not doc.title and len(m.group(1)) == 1:
                # the first h1 is the doc title, not a section heading
                doc.title = heading
            else:
                pending_heading = heading
            i += 1
            continue
        if not line.strip():
            flush()
            i += 1
            continue
        buf.append(line)
        i += 1
    flush()
    if pending_heading is not None:
        doc.sections.append(pending_heading)
    return doc
