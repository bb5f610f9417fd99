"""Legacy binary ``.doc`` (Word 97–2003) reader — CFB walk + piece-table
text extraction.

The reference routes ``.doc`` through Apache Tika over HTTP
(rag/app/naive.py:341-350 — "Word 97-2003 document" falls back to
``tika.parser.from_buffer``); no JVM exists here, so this module reads
the format directly from the PUBLIC specs: [MS-CFB] (the OLE2 compound
file container: header → DIFAT → FAT → directory tree → stream chains,
plus the 64-byte mini-sector stream for small streams) and [MS-DOC]
(the FIB in the ``WordDocument`` stream pointing at the CLX/piece table
in the ``0Table``/``1Table`` stream; each piece is a CP range stored
either as CP-1252 bytes at fc/2 when fCompressed or UTF-16LE at fc).

``make_doc_bytes`` writes a minimal-but-valid .doc (real CFB container,
real FIB + CLX piece table, uncompressed text) so fixtures exercise the
same byte-level path a real Word file takes.
"""

from __future__ import annotations

import struct

_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


# ------------------------------------------------------------ CFB read ---

def cfb_streams(data: bytes) -> dict[str, bytes]:
    """Compound file → {stream name: bytes} (top-level scan — .doc
    keeps WordDocument/xTable at the root)."""
    if data[:8] != _SIG:
        raise ValueError("not a compound file")
    ssz = 1 << _u16(data, 30)
    mini_cutoff = _u32(data, 56)

    def sector(i: int) -> bytes:
        o = 512 + i * ssz
        return data[o:o + ssz]

    # DIFAT → FAT sector list
    fat_secs = [ _u32(data, 76 + 4 * i) for i in range(109) ]
    difat = _u32(data, 68)
    while difat not in (_FREE, _ENDCHAIN):
        s = sector(difat)
        fat_secs += [_u32(s, 4 * i) for i in range(ssz // 4 - 1)]
        difat = _u32(s, ssz - 4)
    fat_secs = [x for x in fat_secs if x != _FREE]
    fat: list[int] = []
    for fs in fat_secs:
        s = sector(fs)
        fat += [_u32(s, 4 * i) for i in range(ssz // 4)]

    def chain(start: int, size: int | None = None) -> bytes:
        out = bytearray()
        cur = start
        # cycle guard: a corrupt FAT whose entries loop (fat[c] == c or
        # any longer cycle) must degrade to a truncated stream, not an
        # unbounded spin — a chain can't legitimately exceed the FAT
        steps = 0
        while cur not in (_FREE, _ENDCHAIN) and cur < len(fat):
            out += sector(cur)
            cur = fat[cur]
            steps += 1
            if steps > len(fat):
                break
        return bytes(out[:size] if size is not None else out)

    # directory entries
    dir_raw = chain(_u32(data, 48))
    entries = []
    for o in range(0, len(dir_raw) - 127, 128):
        e = dir_raw[o:o + 128]
        nlen = _u16(e, 64)
        if not 2 <= nlen <= 64:
            continue
        name = e[:nlen - 2].decode("utf-16-le", "ignore")
        entries.append({"name": name, "type": e[66],
                        "start": _u32(e, 116),
                        "size": _u32(e, 120)})
    root = next(e for e in entries if e["type"] == 5)
    mini_stream = chain(root["start"], root["size"])
    # mini FAT
    mfat_raw = chain(_u32(data, 60))
    mfat = [_u32(mfat_raw, 4 * i) for i in range(len(mfat_raw) // 4)]

    def mini_chain(start: int, size: int) -> bytes:
        out = bytearray()
        cur = start
        steps = 0  # same cycle guard as chain()
        while cur not in (_FREE, _ENDCHAIN) and cur < len(mfat):
            out += mini_stream[cur * 64:(cur + 1) * 64]
            cur = mfat[cur]
            steps += 1
            if steps > len(mfat):
                break
        return bytes(out[:size])

    out: dict[str, bytes] = {}
    for e in entries:
        if e["type"] != 2:
            continue
        if e["size"] < mini_cutoff:
            out[e["name"]] = mini_chain(e["start"], e["size"])
        else:
            out[e["name"]] = chain(e["start"], e["size"])
    return out


# --------------------------------------------------------- text extract ---

# Word control chars → paragraph/cell boundaries ([MS-DOC] 2.8.24)
_PARA_MARKS = {"\r", "\x07", "\x0b", "\x0c", "\x0e"}


def doc_text_paragraphs(raw: bytes) -> list[str]:
    """.doc bytes → paragraph texts (piece table walk; fcMin/fcMac ANSI
    fallback for pre-97 simple files)."""
    streams = cfb_streams(raw)
    wd = streams["WordDocument"]
    if _u16(wd, 0) != 0xA5EC:
        raise ValueError("not a WordDocument stream")
    flags = _u16(wd, 0x0A)
    table = streams.get("1Table" if flags & 0x0200 else "0Table")
    text = ""
    ccp_text = _u32(wd, 0x4C)
    fc_clx, lcb_clx = _u32(wd, 0x1A2), _u32(wd, 0x1A6)
    if table is not None and lcb_clx:
        clx = table[fc_clx:fc_clx + lcb_clx]
        i = 0
        plc = b""
        while i < len(clx):
            tag = clx[i]
            if tag == 1:          # Prc: skip the property blob
                i += 3 + _u16(clx, i + 1)
            elif tag == 2:        # Pcdt → PlcPcd
                lcb = _u32(clx, i + 1)
                plc = clx[i + 5:i + 5 + lcb]
                break
            else:
                break
        if plc:
            n = (len(plc) - 4) // 12
            cps = [_u32(plc, 4 * j) for j in range(n + 1)]
            parts = []
            for j in range(n):
                pcd = plc[4 * (n + 1) + 8 * j:4 * (n + 1) + 8 * j + 8]
                dw = _u32(pcd, 2)
                fc = dw & 0x3FFFFFFF
                n_cp = cps[j + 1] - cps[j]
                if (dw >> 30) & 1:     # fCompressed: CP-1252 at fc/2
                    parts.append(wd[fc // 2:fc // 2 + n_cp]
                                 .decode("cp1252", "replace"))
                else:                  # UTF-16LE at fc
                    parts.append(wd[fc:fc + 2 * n_cp]
                                 .decode("utf-16-le", "replace"))
            text = "".join(parts)[:ccp_text or None]
    if not text:                       # simple pre-97 layout
        fc_min, fc_mac = _u32(wd, 0x18), _u32(wd, 0x1C)
        text = wd[fc_min:fc_mac].decode("cp1252", "replace")
    # paragraph split on Word's mark characters; strip field/object
    # control bytes that are not text
    for m in _PARA_MARKS:
        text = text.replace(m, "\r")
    paras = [p.strip("\x00\x01\x02\x05\x08 \t")
             for p in text.split("\r")]
    return [p for p in paras if p]


# ----------------------------------------------------------- CFB write ---

def _dir_entry(name: str, typ: int, start: int, size: int,
               left: int = _FREE, right: int = _FREE,
               child: int = _FREE, color: int = 1) -> bytes:
    nm = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[:len(nm)] = nm
    struct.pack_into("<H", e, 64, len(nm))
    e[66] = typ
    e[67] = color
    struct.pack_into("<III", e, 68, left, right, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<I", e, 120, size)
    return bytes(e)


def make_doc_bytes(paragraphs: list[str]) -> bytes:
    """Minimal valid .doc: CFB container, FIB + one-piece CLX,
    uncompressed UTF-16 text (the fixture writer for the reader above;
    streams padded past the 4096-byte mini cutoff so they live in
    regular sectors)."""
    text = "\r".join(paragraphs) + "\r"
    ccp = len(text)
    txt_off = 1024
    wd = bytearray(max(4096, txt_off + 2 * ccp))
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)           # nFib: Word 97
    struct.pack_into("<H", wd, 0x0A, 0x0200)        # fWhichTblStm → 1Table
    struct.pack_into("<I", wd, 0x4C, ccp)           # ccpText
    wd[txt_off:txt_off + 2 * ccp] = text.encode("utf-16-le")

    # CLX: Pcdt(2) + PlcPcd{[0, ccp], one PCD (uncompressed @ fc=1024)}
    plc = struct.pack("<II", 0, ccp) + struct.pack("<HIH", 0, txt_off, 0)
    clx = bytes([2]) + struct.pack("<I", len(plc)) + plc
    table = bytearray(4096)
    table[:len(clx)] = clx
    struct.pack_into("<I", wd, 0x1A2, 0)            # fcClx
    struct.pack_into("<I", wd, 0x1A6, len(clx))     # lcbClx

    ssz = 512
    def n_sec(b: bytes) -> int:
        return (len(b) + ssz - 1) // ssz

    # sector layout: [FAT][DIR][WordDocument…][1Table…]
    n_wd, n_tb = n_sec(wd), n_sec(table)
    n_total = 1 + 1 + n_wd + n_tb
    assert n_total <= ssz // 4, "fixture writer: one FAT sector"
    fat = [_FREE] * (ssz // 4)
    fat[0] = _ENDCHAIN                                # FAT sector itself
    fat[1] = _ENDCHAIN                                # directory
    wd_start, tb_start = 2, 2 + n_wd
    for i in range(n_wd):
        fat[wd_start + i] = wd_start + i + 1 if i < n_wd - 1 else _ENDCHAIN
    for i in range(n_tb):
        fat[tb_start + i] = tb_start + i + 1 if i < n_tb - 1 else _ENDCHAIN

    # stream sizes report the PADDED length (≥ the 4096 mini cutoff) so
    # readers fetch them from regular sectors — the whole point of the
    # padding; the FIB/lcbClx carry the true payload lengths
    dirs = (_dir_entry("Root Entry", 5, _ENDCHAIN, 0, child=1, color=0)
            + _dir_entry("1Table", 2, tb_start, len(table), right=2)
            + _dir_entry("WordDocument", 2, wd_start, len(wd)))
    dirs += _dir_entry("", 0, _FREE, 0) * 1           # pad to sector

    hdr = bytearray(512)
    hdr[:8] = _SIG
    struct.pack_into("<H", hdr, 24, 0x003E)
    struct.pack_into("<H", hdr, 26, 0x0003)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<H", hdr, 30, 9)                # 512-byte sectors
    struct.pack_into("<H", hdr, 32, 6)
    struct.pack_into("<I", hdr, 44, 1)                # one FAT sector
    struct.pack_into("<I", hdr, 48, 1)                # dir at sector 1
    struct.pack_into("<I", hdr, 56, 4096)
    struct.pack_into("<I", hdr, 60, _ENDCHAIN)
    struct.pack_into("<I", hdr, 68, _ENDCHAIN)
    for i in range(109):
        struct.pack_into("<I", hdr, 76 + 4 * i, 0 if i == 0 else _FREE)

    def pad(b: bytes) -> bytes:
        return bytes(b) + b"\x00" * (n_sec(b) * ssz - len(b))

    fat_bytes = struct.pack(f"<{ssz // 4}I", *fat)
    return bytes(hdr) + fat_bytes + pad(dirs) + pad(wd) + pad(table)

# --------------------------------------------------------- span routing ---

def expand_doc_spans(spans: list[dict]) -> list[dict]:
    """Replace legacy ``doc`` payload spans (base64 CFB bytes in
    ``text``) with one ``text`` span per paragraph — the same IR the
    docx expansion produces, so routing/chunking downstream is shared
    (role of the reference's tika fallback, rag/app/naive.py:341-350).
    Idempotent; undecodable payloads are dropped (poison containment
    one level up)."""
    if not any(s["kind"] == "doc" for s in spans):
        return spans
    import base64

    from ..schemas import finalize_offsets, make_span

    out: list[dict] = []
    for s in spans:
        if s["kind"] != "doc":
            out.append(s)
            continue
        try:
            for p in doc_text_paragraphs(base64.b64decode(s["text"])):
                out.append(make_span("text", p))
        except Exception:  # noqa: BLE001 — undecodable payload: skip
            pass
    return finalize_offsets(out)
