"""Byte-payload codec detection (role of the reference's chardet +
trial-decode, rag/nlp/__init__.py:32-71, deepdoc/parser/utils.py:20-32).

chardet is absent; this is a deterministic BOM + trial-decode cascade over
the codecs that matter for the corpus (utf-8 incl. CJK, gb18030, latin-1
as the never-fails fallback)."""

from __future__ import annotations

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_TRIAL = ("utf-8", "gb18030", "latin-1")


def sniff_codec(data: bytes) -> str:
    for bom, codec in _BOMS:
        if data.startswith(bom):
            return codec
    for codec in _TRIAL:
        try:
            data.decode(codec)
            return codec
        except UnicodeDecodeError:
            continue
    return "latin-1"


def get_text(data: bytes) -> str:
    return data.decode(sniff_codec(data), errors="replace")


import re as _re

_META_RE = _re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", _re.I)
_CT_RE = _re.compile(r"charset\s*=\s*[\"']?\s*([A-Za-z0-9_.:-]+)", _re.I)


def _try(data: bytes, codec: str) -> str | None:
    try:
        return data.decode(codec)
    except (UnicodeDecodeError, LookupError):
        return None


def decode_http_body(body: bytes, content_type: str = "") -> str:
    """HTTP response body → text with real-crawl charset resolution:
    the Content-Type header's charset wins, then an HTML <meta charset>
    in the first 2 KiB (the WHATWG prescan), then the BOM + trial
    cascade. A declared-but-wrong charset falls through to the next
    source instead of mojibaking (role of the reference's chardet use,
    deepdoc/parser/utils.py:20-32)."""
    m = _CT_RE.search(content_type or "")
    if m:
        out = _try(body, m.group(1))
        if out is not None:
            return out
    m = _META_RE.search(body[:2048])
    if m:
        out = _try(body, m.group(1).decode("ascii", "ignore"))
        if out is not None:
            return out
    return get_text(body)
