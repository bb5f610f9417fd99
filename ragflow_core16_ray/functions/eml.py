"""RFC-822 / MIME email parsing (the `email` chunk template's reader).

From-scratch implementation of the reference's EML handling
(rag/app/email.py:53-88): headers become "Header: value" text lines,
every text/plain part contributes its lines, every text/html part is
boilerplate-stripped with our Readability-style extractor, and MIME
attachments are surfaced as media references (the reference recursively
naive-chunks attachment payloads, rag/app/email.py:95-106 — binary
attachment parsing is out of sandbox scope, so we emit the attachment
filename as a media_ref instead).

Pure function over the raw message text; the stdlib `email` package does
the MIME walking.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from email import policy
from email.parser import Parser


@dataclass
class ParsedEmail:
    headers: list[str] = field(default_factory=list)  # "Header: value"
    text_lines: list[str] = field(default_factory=list)
    html_parts: list[str] = field(default_factory=list)  # raw html, unparsed
    attachments: list[str] = field(default_factory=list)  # filenames


def parse_eml(raw: str) -> ParsedEmail:
    """Parse a raw RFC-822 message into header lines, plain-text lines,
    raw HTML bodies and attachment filenames — the same decomposition the
    reference builds before naive_merge (rag/app/email.py:58-88)."""
    out = ParsedEmail()
    msg = Parser(policy=policy.default).parsestr(raw)

    for header, value in msg.items():
        out.headers.append(f"{header}: {value}")

    def add_content(part) -> None:
        ctype = part.get_content_type()
        if part.get_content_disposition() == "attachment":
            name = part.get_filename() or "attachment"
            out.attachments.append(name)
            return
        if ctype == "text/plain":
            body = part.get_content()
            out.text_lines.extend(
                line for line in body.split("\n") if line.strip())
        elif ctype == "text/html":
            out.html_parts.append(part.get_content())
        elif part.is_multipart():
            for sub in part.iter_parts():
                add_content(sub)

    add_content(msg)
    return out
