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
