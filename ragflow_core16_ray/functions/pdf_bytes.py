"""PDF-from-bytes ingestion: a pure-Python text-layer extractor.

Role of the reference's pdfplumber char extraction + page assembly
(deepdoc/parser/pdf_parser.py:994-1113) for the unencrypted,
text-layer case: parse the PDF object graph, inflate the page content
streams, interpret the text-positioning/showing operators (Tf Td TD Tm
T* TL Tj TJ ' ") under q/Q//cm graphics state, and emit one UNTAGGED box
span per text-showing op in the existing box IR — downstream
``_infer_layout`` (functions/pdfish.py) classifies them exactly like any
other untagged box. Rasterization + OCR of scanned pages (zoom-9 retry,
pdf_parser.py:1052-1068) needs the vision models and stays out of scope.

Also ships :func:`build_pdf`, a deterministic minimal PDF writer
(FlateDecode streams, direct /Length, xref table) used by the synthetic
corpus so the parser is exercised on REAL PDF bytes.

Coordinates: PDF is bottom-up; the box IR is top-down scaled to a
1000-unit page height (the synth/pdfish convention), so y maps through
``top = (H - y - size) * 1000/H``.
"""

from __future__ import annotations

import json
import re
import zlib

# average Helvetica advance as a fraction of font size — the FALLBACK
# for fonts that carry no /Widths (x1 estimates / column detection);
# fonts with real metrics use _font_widths below
_AVG_ADVANCE = 0.5
_TARGET_H = 1000.0

# Helvetica advance widths for chars 32..126 in glyph-space units
# (1/1000 em) — the Adobe core-14 AFM values (public metrics). The
# builder stamps these on its /F1 font and the parser reads them back
# through the same /FirstChar + /Widths path real simple fonts use.
_HELV_WIDTHS = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278,
    333, 278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
    278, 278, 584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611,
    778, 722, 278, 500, 667, 556, 833, 722, 778, 667, 778, 722, 667,
    611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556, 333,
    556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833,
    556, 556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500,
    334, 260, 334, 584]


# ------------------------------------------------------------ builder ----

def _esc_lit(text: str) -> bytes:
    esc = (text.replace("\\", r"\\")
           .replace("(", r"\(").replace(")", r"\)"))
    return esc.encode("latin-1", "replace")


def build_pdf(pages: list[list[tuple[float, float, float, str]]],
              media_box: tuple[float, float] = (612.0, 792.0),
              use_objstm: bool = False,
              outlines: list[tuple[str, int]] | None = None) -> bytes:
    """pages = per page a list of (x, top, size, text) in TOP-DOWN page
    coords (same convention as the box IR, unscaled). Deterministic
    output bytes for given input. ``use_objstm`` packs every non-stream
    object (catalog/pages/font/page dicts) into one /Type /ObjStm
    compressed object stream — the PDF 1.5+ layout most real-world
    writers emit — exercising the parser's ObjStm unpack path.
    ``outlines`` = [(title, depth)] emits a document outline (bookmark)
    tree — /Outlines root + /First//Last//Next//Parent item chain, the
    structure pdfplumber exposes as ``pdf.outline`` and the reference
    walks at pdf_parser.py:1022-1034."""
    w, h = media_box
    objs: list[bytes] = []  # 1-indexed object bodies (without obj/endobj)
    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] "
                f">>".encode())
    helv_w = " ".join(str(w) for w in _HELV_WIDTHS)
    objs.append(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                f"/FirstChar 32 /LastChar 126 /Widths [{helv_w}] "
                f">>".encode())
    # non-latin text routes through a Type0 /Identity-H CID font whose
    # ToUnicode CMap the parser must actually read — the real-PDF shape
    # for CJK (CIDs here = BMP code points, written as UTF-16BE hex
    # strings; astral chars degrade to U+FFFD)
    def _is_latin(t: str) -> bool:
        try:
            t.encode("latin-1")
            return True
        except UnicodeEncodeError:
            return False

    needs_cid = any(not _is_latin(text) for lines in pages
                    for _, _, _, text in lines)
    f2_num = 4 + 2 * n_pages          # first object after pages/contents
    font_res = "<< /F1 3 0 R >>" if not needs_cid else (
        f"<< /F1 3 0 R /F2 {f2_num} 0 R >>")
    for i, lines in enumerate(pages):
        content_id = page_ids[i] + 1
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w:g} {h:g}] "
            f"/Resources << /Font {font_res} >> "
            f"/Contents {content_id} 0 R >>".encode())
        parts = [b"BT"]
        for x, top, size, text in lines:
            y = h - top - size  # top-down → bottom-up baseline
            if _is_latin(text):
                parts.append(f"/F1 {size:g} Tf {x:g} {y:g} Td".encode())
                if len(text) >= 8 and zlib.crc32(text.encode()) % 4 == 0:
                    # kerned TJ split (real-world generators emit one
                    # array per line with inter-run kern numbers); the
                    # parser re-joins the pieces through /Widths-exact
                    # advances, so the tiny 15/1000-em kern never reads
                    # as a word gap
                    cut = len(text) // 2
                    parts.append(b"[ (" + _esc_lit(text[:cut]) + b") 15 ("
                                 + _esc_lit(text[cut:]) + b") ] TJ")
                else:
                    parts.append(b"(" + _esc_lit(text) + b") Tj")
            else:
                units = "".join(
                    f"{ord(c):04X}" if ord(c) <= 0xFFFF else "FFFD"
                    for c in text)
                parts.append(f"/F2 {size:g} Tf {x:g} {y:g} Td".encode())
                parts.append(b"<" + units.encode("ascii") + b"> Tj")
            # reset to absolute positioning for the next line
            parts.append(f"{-x:g} {-y:g} Td".encode())
        parts.append(b"ET")
        stream = zlib.compress(b"\n".join(parts), 6)
        objs.append(b"<< /Length " + str(len(stream)).encode()
                    + b" /Filter /FlateDecode >>\nstream\n" + stream
                    + b"\nendstream")
    if needs_cid:
        assert len(objs) + 1 == f2_num
        desc_num, tou_num = f2_num + 1, f2_num + 2
        objs.append(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCJK "
            f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
            f"/ToUnicode {tou_num} 0 R >>".encode())
        objs.append(b"<< /Type /Font /Subtype /CIDFontType2 "
                    b"/BaseFont /GraftCJK /CIDSystemInfo "
                    b"<< /Registry (Adobe) /Ordering (Identity) "
                    b"/Supplement 0 >> /DW 1000 "
                    b"/W [ 32 126 500 ] >>")
        cmap = (b"/CIDInit /ProcSet findresource begin\n"
                b"12 dict begin\nbegincmap\n"
                b"1 begincodespacerange\n<0000> <FFFF>\n"
                b"endcodespacerange\n"
                b"1 beginbfrange\n<0000> <FFFF> <0000>\nendbfrange\n"
                b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
                b"end\nend\n")
        z = zlib.compress(cmap, 6)
        objs.append(b"<< /Length " + str(len(z)).encode()
                    + b" /Filter /FlateDecode >>\nstream\n" + z
                    + b"\nendstream")
    if outlines:
        # outline tree: root object, then one item per entry; parent =
        # nearest shallower entry, siblings chain via /Next
        root_num = len(objs) + 1
        item_num = [root_num + 1 + i for i in range(len(outlines))]
        parent: list[int] = []       # object number of each item's parent
        stack: list[tuple[int, int]] = []   # (depth, item index)
        for i, (_, d) in enumerate(outlines):
            while stack and stack[-1][0] >= d:
                stack.pop()
            parent.append(item_num[stack[-1][1]] if stack else root_num)
            stack.append((d, i))
        children: dict[int, list[int]] = {}
        for i, p in enumerate(parent):
            children.setdefault(p, []).append(i)
        top = children.get(root_num, [])
        objs[0] = (f"<< /Type /Catalog /Pages 2 0 R "
                   f"/Outlines {root_num} 0 R >>").encode()
        root = f"<< /Type /Outlines /Count {len(outlines)}"
        if top:
            root += (f" /First {item_num[top[0]]} 0 R"
                     f" /Last {item_num[top[-1]]} 0 R")
        objs.append((root + " >>").encode())
        for i, (title, _) in enumerate(outlines):
            body = (b"<< /Title (" + _esc_lit(title) + b")"
                    + f" /Parent {parent[i]} 0 R".encode())
            sibs = children[parent[i]]
            at = sibs.index(i)
            if at + 1 < len(sibs):
                body += f" /Next {item_num[sibs[at + 1]]} 0 R".encode()
            if at > 0:
                body += f" /Prev {item_num[sibs[at - 1]]} 0 R".encode()
            kids_i = children.get(item_num[i], [])
            if kids_i:
                body += (f" /First {item_num[kids_i[0]]} 0 R"
                         f" /Last {item_num[kids_i[-1]]} 0 R").encode()
            objs.append(body + b" >>")
    if use_objstm:
        # pack the non-stream objects into one compressed object stream;
        # content streams stay direct (streams cannot nest in an ObjStm)
        packed = [(n, body) for n, body in enumerate(objs, start=1)
                  if b"stream" not in body]
        direct = [(n, body) for n, body in enumerate(objs, start=1)
                  if b"stream" in body]
        payload = bytearray()
        offs = []
        for _, body in packed:
            offs.append(len(payload))
            payload += body + b"\n"
        header = " ".join(f"{n} {o}" for (n, _), o in zip(packed, offs))
        inner = header.encode() + b"\n" + payload
        first = len(header) + 1
        z = zlib.compress(bytes(inner), 6)
        stm_num = len(objs) + 1
        direct.append((stm_num,
                       f"<< /Type /ObjStm /N {len(packed)} /First {first} "
                       f"/Length {len(z)} /Filter /FlateDecode "
                       f">>\nstream\n".encode() + z + b"\nendstream"))
        out = bytearray(b"%PDF-1.5\n")
        for n, body in direct:
            out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
        # xref stream omitted: the parser is scan-based by design
        out += (f"trailer\n<< /Size {stm_num + 1} /Root 1 0 R >>\n"
                f"%%EOF\n").encode()
        return bytes(out)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def build_scanned_pdf(pages: list[list[str]],
                      media_box: tuple[float, float] = (612.0, 792.0),
                      margin_px: int = 36, dpi_scale: int = 1,
                      feed_rot: int = 0,
                      photos: list[list[tuple]] | None = None,
                      skew_slope: float = 0.0) -> bytes:
    """Scanner-output-shaped PDF: each page is ONE full-page /Image
    XObject (Flate DeviceGray 8-bit) placed by a page-filling CTM, with
    NO text layer — the input class the reference sends to its OCR
    det/rec models (pdf_parser.py:994-1113 rasterize → ocr.py:70-398).
    ``pages`` = per page a list of text lines, rendered with the
    deterministic 5x7 glyph font (functions/glyphs.render_text) at
    ``dpi_scale`` px/pt (scanner resolution: 1 = 72 dpi, 2 = 144 dpi …)
    onto a page-sized canvas, text block at (margin_px, margin_px)
    pseudo-points from the top-left. ``feed_rot`` = number of CCW
    quarter-turns the scanner fed the page at (2 = upside down; 1/3 =
    sideways, which also swaps the stored image dims and MediaBox as a
    real scanner would). ``photos`` (optional, per page): deterministic
    dithered PHOTO blocks as (y, x, h, w, seed) in base pixels — mixed
    text+photo pages, the layout-split input class (photo regions come
    back as figure crops, text still reads). The base canvas (text +
    photos) upscales as ONE image, exactly as a scanner sampling the
    whole sheet at its DPI would. Deterministic bytes for given
    input."""
    from .glyphs import render_text

    w, h = media_box
    k = max(1, int(dpi_scale))
    iw, ih = int(w), int(h)
    n_pages = len(pages)
    objs: list[bytes] = []
    page_ids = [3 + 3 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] "
                f">>".encode())
    for i, lines in enumerate(pages):
        import numpy as np

        canvas = np.zeros((ih, iw), dtype=np.uint8)
        if lines:
            block = render_text(list(lines))
            bh = min(block.shape[0], ih - margin_px)
            bw = min(block.shape[1], iw - margin_px)
            canvas[margin_px:margin_px + bh,
                   margin_px:margin_px + bw] = block[:bh, :bw]
        for (py, px, bh, bw, seed) in (photos[i] if photos else ()):
            rng = np.random.RandomState(int(seed) & 0xFFFFFFFF)
            bh = min(bh, ih - py)     # clamp like the text block does
            bw = min(bw, iw - px)
            if bh > 0 and bw > 0:
                canvas[py:py + bh, px:px + bw] = \
                    (rng.rand(bh, bw) > 0.5).astype(np.uint8) * 255
        if k > 1:
            canvas = np.kron(canvas, np.ones((k, k), dtype=np.uint8))
        if skew_slope:
            # scanner skew in the small-angle shear model: column x
            # shifts DOWN by round(x·slope) at scan resolution — the
            # same kernel as deskew with the sign flipped (np.round is
            # odd-symmetric), so glyphs._unshear recovers the page
            # bit-identically
            from .glyphs import _unshear

            canvas = _unshear(canvas, -skew_slope)
        if feed_rot % 4:
            canvas = np.ascontiguousarray(np.rot90(canvas, feed_rot % 4))
        ph_, pw_ = canvas.shape
        pw_pt, ph_pt = (w, h) if feed_rot % 2 == 0 else (h, w)
        z = zlib.compress(canvas.tobytes(), 6)
        content = f"q {pw_pt:g} 0 0 {ph_pt:g} 0 0 cm /Im0 Do Q".encode()
        objs.append(
            f"<< /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 {pw_pt:g} {ph_pt:g}] "
            f"/Resources << /XObject << /Im0 {page_ids[i] + 2} 0 R >> >> "
            f"/Contents {page_ids[i] + 1} 0 R >>".encode())
        objs.append(b"<< /Length " + str(len(content)).encode()
                    + b" >>\nstream\n" + content + b"\nendstream")
        objs.append(
            f"<< /Type /XObject /Subtype /Image /Width {pw_} "
            f"/Height {ph_} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            f"/Filter /FlateDecode /Length {len(z)} "
            f">>\nstream\n".encode() + z + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ------------------------------------------------------------- parser ----

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_LEN_RE = re.compile(rb"/Length\s+(\d+)\b")
_MBOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)")


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """num → object body. Stream payloads are skipped via direct /Length
    when present (our writer always emits it), else the first
    ``endstream`` after the ``stream`` keyword. Objects stored inside
    /Type /ObjStm compressed object streams (PDF 1.5+, where most
    real-world catalogs/page dicts live) are unpacked in a second pass;
    a direct object wins over an ObjStm copy of the same number."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        sm = re.compile(rb"\bstream\r?\n").search(data, start)
        em = data.find(b"endobj", start)
        if sm is not None and (em == -1 or sm.start() < em):
            # an INDIRECT /Length (N 0 R) must not be misread as a
            # direct length of N — the slice would cut mid-stream at
            # any in-stream 'endobj' bytes; fall to the endstream scan
            lm = None
            if not re.search(rb"/Length\s+\d+\s+\d+\s+R",
                             data[start:sm.start()]):
                lm = _LEN_RE.search(data, start, sm.start())
            if lm:
                body_end = data.find(b"endobj", sm.end() + int(lm.group(1)))
            else:
                es = data.find(b"endstream", sm.end())
                body_end = data.find(b"endobj", es if es != -1 else sm.end())
        else:
            body_end = em
        if body_end == -1:
            body_end = len(data)
        objs[int(m.group(1))] = data[start:body_end]
        pos = body_end + 6
    for num in list(objs):
        if re.search(rb"/Type\s*/ObjStm\b", objs[num][:400]):
            for inner_num, body in _unpack_objstm(objs[num]):
                objs.setdefault(inner_num, body)
    return objs


_INT_PAIR_RE = re.compile(rb"(\d+)\s+(\d+)")


def _stream_payload(body: bytes,
                    objs: dict[int, bytes] | None = None) -> bytes | None:
    """Raw stream bytes of an object body. A direct /Length is
    authoritative (PDF 32000-1 §7.3.8.2 — the only way to slice exactly,
    since deflate bytes can themselves look like EOLs or ``endstream``);
    an INDIRECT /Length (``N 0 R`` — the common shape when the writer
    streams before it knows the size) resolves through ``objs`` when
    given; without a usable length, fall back to the last ``endstream``
    with a single-EOL strip (§7.3.8.1 allows at most one EOL before the
    keyword)."""
    sm = re.compile(rb"\bstream\r?\n").search(body)
    if not sm:
        return None
    length: int | None = None
    im = re.search(rb"/Length\s+(\d+)\s+\d+\s+R\b", body[:sm.start()])
    if im:
        if objs is not None:
            lo = objs.get(int(im.group(1)), b"")
            dm = re.search(rb"-?\d+", lo)
            if dm:
                length = max(0, int(dm.group(0)))
    else:
        lm = _LEN_RE.search(body, 0, sm.start())
        if lm:
            length = int(lm.group(1))
    if length is not None:
        return body[sm.end():sm.end() + length]
    end = body.rfind(b"endstream")
    raw = body[sm.end():end if end != -1 else len(body)]
    if raw.endswith(b"\r\n"):
        return raw[:-2]
    if raw.endswith((b"\n", b"\r")):
        return raw[:-1]
    return raw


def _unpack_objstm(body: bytes) -> list[tuple[int, bytes]]:
    """/Type /ObjStm → [(objnum, object body)] (PDF 32000-1 §7.5.7): the
    inflated stream opens with /N (objnum, byte-offset) integer pairs;
    object data starts at /First. Contained objects are dict/array/scalar
    only (no nested streams), so slicing offset-to-next-offset is exact."""
    sm = re.compile(rb"\bstream\r?\n").search(body)
    if not sm:
        return []
    head = body[:sm.start()]
    n_m = re.search(rb"/N\s+(\d+)\b", head)
    first_m = re.search(rb"/First\s+(\d+)\b", head)
    if not n_m or not first_m:
        return []
    raw = _stream_payload(body)
    if raw is None:
        return []
    if re.search(rb"/FlateDecode\b", head):
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            return []
    n, first = int(n_m.group(1)), int(first_m.group(1))
    pairs: list[tuple[int, int]] = []
    pos = 0
    for _ in range(n):
        m = _INT_PAIR_RE.match(raw, pos) or _INT_PAIR_RE.search(raw, pos)
        if not m:
            return []
        pairs.append((int(m.group(1)), int(m.group(2))))
        pos = m.end()
    out: list[tuple[int, bytes]] = []
    for i, (num, off) in enumerate(pairs):
        start = first + off
        stop = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(raw)
        out.append((num, raw[start:stop]))
    return out


def _dict_of(body: bytes) -> bytes:
    i = body.find(b"<<")
    if i == -1:
        return b""
    depth, j = 0, i
    while j < len(body) - 1:
        if body[j:j + 2] == b"<<":
            depth += 1
            j += 2
        elif body[j:j + 2] == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return body[i:j]
        else:
            j += 1
    return body[i:]


def _value_of(d: bytes, key: bytes) -> bytes:
    """Raw bytes of a dictionary entry up to the next key at depth 0."""
    m = re.search(re.escape(key) + rb"\b", d)
    if not m:
        return b""
    rest = d[m.end():]
    out, depth, i = [], 0, 0
    while i < len(rest):
        c = rest[i:i + 1]
        if c == b"[" or rest[i:i + 2] == b"<<":
            depth += 1
            i += 2 if rest[i:i + 2] == b"<<" else 1
            out.append(c if c == b"[" else b"<<")
            continue
        if c == b"]" or rest[i:i + 2] == b">>":
            depth -= 1
            i += 2 if rest[i:i + 2] == b">>" else 1
            out.append(c if c == b"]" else b">>")
            if depth <= 0 and c == b"]":
                break
            continue
        if depth == 0 and c == b"/" and out and not b"".join(out).strip() \
                .startswith(b"/"):
            break
        out.append(c)
        i += 1
    return b"".join(out).strip()


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Logical page order from the /Pages tree; falls back to numeric
    order of /Type /Page objects for damaged trees."""
    catalog = next((n for n, b in objs.items()
                    if re.search(rb"/Type\s*/Catalog\b", b)), None)
    order: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            order.append(num)
            return
        kids = _value_of(_dict_of(body), b"/Kids")
        for r in _REF_RE.finditer(kids):
            walk(int(r.group(1)), seen)

    if catalog is not None:
        root = _REF_RE.search(_value_of(_dict_of(objs[catalog]), b"/Pages"))
        if root:
            walk(int(root.group(1)), set())
    if not order:
        order = sorted(n for n, b in objs.items()
                       if re.search(rb"/Type\s*/Page\b(?!s)", b))
    return order


def _owner_of(objs: dict[int, bytes], num: int, key: bytes,
              max_up: int = 16) -> bytes | None:
    """Body of the nearest node (the page or an ancestor /Pages node)
    whose dict defines ``key`` — the inheritable-page-attribute walk of
    PDF 32000-1 7.7.3.4 (/MediaBox and /Resources are inherited from
    parent Pages nodes in many real-world files)."""
    seen: set[int] = set()
    while num in objs and num not in seen and max_up:
        seen.add(num)
        body = objs[num]
        d = _dict_of(body)
        if re.search(re.escape(key) + rb"\b", d):
            return body
        pm = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", d)
        if not pm:
            return None
        num = int(pm.group(1))
        max_up -= 1
    return None


def _lzw_decode(data: bytes) -> bytes:
    """LZWDecode, PDF 32000-1 7.4.4: 9→12-bit growing codes, clear=256,
    EOD=257, EarlyChange=1 (the default; code width grows one code
    early)."""
    table = {i: bytes([i]) for i in range(256)}
    next_code, bits = 258, 9
    buf = nbits = 0
    prev: bytes | None = None
    out = bytearray()
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (buf >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, bits, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise ValueError("LZW: bad first code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW: code out of range")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
            if next_code + 1 >= (1 << bits) and bits < 12:
                bits += 1
            out += entry
            prev = entry
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode, PDF 32000-1 7.4.5."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            out += data[i:i + ln + 1]
            i += ln + 1
        else:
            out += data[i:i + 1] * (257 - ln)
            i += 1
    return bytes(out)


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _apply_filters(body: bytes, raw: bytes) -> bytes | None:
    """Run a stream's /Filter chain (name or array). Text-bearing
    filters: Flate, LZW, ASCII85, ASCIIHex, RunLength. Image codecs
    (DCT/JPX/CCITT/JBIG2) and unknown filters return None — the caller
    treats the stream as non-text. No /Filter passes through."""
    import base64 as _b64

    head = body[:max(body.find(b"stream"), 0)]
    m = _FILTER_RE.search(head)
    if not m:
        return raw
    for nm in re.findall(rb"/([A-Za-z0-9]+)", m.group(1)):
        try:
            if nm == b"FlateDecode" or nm == b"Fl":
                raw = zlib.decompress(raw)
            elif nm == b"LZWDecode" or nm == b"LZW":
                raw = _lzw_decode(raw)
            elif nm == b"ASCII85Decode" or nm == b"A85":
                s = raw.strip()
                if not s.startswith(b"<~"):
                    s = b"<~" + s
                if not s.endswith(b"~>"):
                    s += b"~>"
                raw = _b64.a85decode(s, adobe=True)
            elif nm == b"ASCIIHexDecode" or nm == b"AHx":
                h = re.sub(rb"\s", b"", raw.split(b">", 1)[0])
                if len(h) % 2:
                    h += b"0"
                raw = bytes.fromhex(h.decode("ascii"))
            elif nm == b"RunLengthDecode" or nm == b"RL":
                raw = _rle_decode(raw)
            else:
                return None         # image codec / crypt / unknown
        except (ValueError, zlib.error, UnicodeDecodeError):
            return None
    pm = re.search(rb"/Predictor\s+(\d+)", head)
    if pm and raw:
        pred = int(pm.group(1))
        if pred >= 10:              # PNG row predictors (7.4.4.4)
            import numpy as np

            from .png import _unfilter

            def _ival(key: bytes, default: int) -> int:
                m2 = re.search(key + rb"\s+(\d+)", head)
                return int(m2.group(1)) if m2 else default

            cols = _ival(rb"/Columns", 1)
            colors = _ival(rb"/Colors", 1)
            bpc = _ival(rb"/BitsPerComponent", 8)
            stride = (cols * colors * bpc + 7) // 8
            bpp = max(1, colors * bpc // 8)
            h = len(raw) // (stride + 1)
            if h < 1:
                return None
            try:
                raw = _unfilter(
                    np.frombuffer(raw[:h * (stride + 1)], np.uint8),
                    h, stride, bpp).tobytes()
            except ValueError:
                return None
        elif pred > 1:
            return None             # TIFF predictor: not text-bearing
    return raw


def _content_of(objs: dict[int, bytes], page_body: bytes) -> bytes:
    streams: list[bytes] = []
    cv = _value_of(_dict_of(page_body), b"/Contents")
    for r in _REF_RE.finditer(cv):
        body = objs.get(int(r.group(1)), b"")
        raw = _stream_payload(body, objs)
        if raw is None:
            continue
        raw = _apply_filters(body, raw)
        if raw is None:
            continue
        streams.append(raw)
    return b"\n".join(streams)


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _lit_string(stream: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string whose ``(`` sits at index ``i``;
    returns (decoded text, index just past the closing paren). Handles
    nested parens, the named escapes, octal ``\\ddd`` and line
    continuations — the one string grammar shared by content streams
    and outline ``/Title`` values."""
    n = len(stream)
    out, depth, j = bytearray(), 1, i + 1
    while j < n and depth:
        ch = stream[j]
        if ch == 0x5C and j + 1 < n:  # backslash escape
            nxt = stream[j + 1:j + 2]
            esc = {b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                   b"(": 40, b")": 41, b"\\": 92}
            if nxt in esc:
                out.append(esc[nxt])
                j += 2
            elif nxt.isdigit():  # octal \ddd
                k = j + 1
                oct_s = b""
                while k < n and len(oct_s) < 3 \
                        and stream[k:k + 1].isdigit():
                    oct_s += stream[k:k + 1]
                    k += 1
                out.append(int(oct_s, 8) & 0xFF)
                j = k
            else:  # line continuation / unknown escape
                j += 2
        elif ch == 0x28:
            depth += 1
            out.append(ch)
            j += 1
        elif ch == 0x29:
            depth -= 1
            if depth:
                out.append(ch)
            j += 1
        else:
            out.append(ch)
            j += 1
    return out.decode("latin-1"), j


def _lex(stream: bytes):
    """Content-stream tokens: ('num', f) ('str', s) ('name', s) ('op', s)
    ('[',) (']',)."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i:i + 1]
        if c in _WS:
            i += 1
        elif c == b"%":
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == b"(":
            s, j = _lit_string(stream, i)
            yield ("str", s)
            i = j
        elif c == b"<" and stream[i + 1:i + 2] != b"<":
            j = stream.find(b">", i)
            hexs = re.sub(rb"\s", b"", stream[i + 1:j if j != -1 else n])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode("ascii", "ignore"))
                   .decode("latin-1"))
            i = (j + 1) if j != -1 else n
        elif c == b"[":
            yield ("[",)
            i += 1
        elif c == b"]":
            yield ("]",)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and stream[j:j + 1] not in _WS \
                    and stream[j:j + 1] not in _DELIM:
                j += 1
            yield ("name", stream[i + 1:j].decode("latin-1"))
            i = j
        elif c == b"<":  # << inline dict (BDC property lists etc.) — skip
            i += 2
        elif c == b">":
            i += 2
        else:
            j = i
            while j < n and stream[j:j + 1] not in _WS \
                    and stream[j:j + 1] not in _DELIM:
                j += 1
            tok = stream[i:j]
            if tok == b"ID":
                # inline image (BI … ID <binary> EI): the raw sample
                # data would derail the lexer — skip to the delimited EI
                k = j
                while True:
                    k = stream.find(b"EI", k + 1)
                    if k == -1:
                        i = n
                        break
                    before = stream[k - 1:k]
                    after = stream[k + 2:k + 3]
                    if (before in _WS and
                            (after == b"" or after in _WS
                             or after in _DELIM)):
                        i = k + 2
                        break
                continue
            try:
                yield ("num", float(tok))
            except ValueError:
                yield ("op", tok.decode("latin-1", "replace"))
            i = j


def _mat_mul(a, b):  # 2x3 affine as (a,b,c,d,e,f)
    return (a[0] * b[0] + a[1] * b[2],
            a[0] * b[1] + a[1] * b[3],
            a[2] * b[0] + a[3] * b[2],
            a[2] * b[1] + a[3] * b[3],
            a[4] * b[0] + a[5] * b[2] + b[4],
            a[4] * b[1] + a[5] * b[3] + b[5])

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


_HEX_PAIR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _parse_cmap(data: bytes):
    """ToUnicode CMap → (bfchar dict, bfrange list of (lo, hi, base or
    [targets]), code width in BYTES). Handles the two mapping block
    forms of the CMap spec; destination hex may be multi-code-unit
    (UTF-16BE). Code width comes from the codespacerange (subsetted
    simple fonts ship 1-byte ToUnicode CMaps — decoding those as
    2-byte CIDs would mojibake whole documents), with the first
    mapping key's hex length as fallback."""
    chars: dict[int, str] = {}
    ranges: list[tuple[int, int, object]] = []
    wm = (re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data)
          or re.search(rb"beginbf(?:char|range)\s*<([0-9A-Fa-f]+)>",
                       data))
    nbytes = max(1, len(wm.group(1)) // 2) if wm else 2

    def _hex_int(h: bytes) -> int:
        return int(re.sub(rb"\s", b"", h) or b"0", 16)

    def _hex_str(h: bytes) -> str:
        hs = re.sub(rb"\s", b"", h).decode("ascii")
        if len(hs) % 4:
            hs = hs.ljust((len(hs) + 3) // 4 * 4, "0")
        return "".join(chr(int(hs[i:i + 4], 16))
                       for i in range(0, len(hs), 4))

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _HEX_PAIR_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            chars[_hex_int(toks[i])] = _hex_str(toks[i + 1])
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        # array form: <lo> <hi> [<d1> <d2> ...]
        pos = 0
        while True:
            am = re.search(
                rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*"
                rb"(\[(?:\s*<[0-9A-Fa-f\s]*>)*\s*\]|<[0-9A-Fa-f\s]*>)",
                body[pos:])
            if not am:
                break
            lo, hi = _hex_int(am.group(1)), _hex_int(am.group(2))
            dst = am.group(3)
            if dst.startswith(b"["):
                targets = [_hex_str(t) for t in
                           _HEX_PAIR_RE.findall(dst)]
                ranges.append((lo, hi, targets))
            else:
                ranges.append((lo, hi, _hex_int(dst[1:-1])))
            pos += am.end()
    return chars, ranges, nbytes


def _cmap_decoder(chars: dict, ranges: list, nbytes: int = 2):
    """Callable decoding a CMap-coded string (latin-1-carried bytes,
    ``nbytes`` per code) through the CMap; unmapped codes become
    U+FFFD."""

    def dec(s: str) -> str:
        b = s.encode("latin-1")
        out = []
        for i in range(0, len(b) - (nbytes - 1), nbytes):
            cid = int.from_bytes(b[i:i + nbytes], "big")
            if cid in chars:
                out.append(chars[cid])
                continue
            for lo, hi, dst in ranges:
                if lo <= cid <= hi:
                    if isinstance(dst, list):
                        out.append(dst[cid - lo] if cid - lo < len(dst)
                                   else "�")
                    else:
                        out.append(chr(dst + (cid - lo)))
                    break
            else:
                out.append("�")
        return "".join(out)

    return dec


_FONT_REF_RE = re.compile(rb"/([A-Za-z0-9._+-]+)\s+(\d+)\s+\d+\s+R")


def _resource_dict(objs: dict[int, bytes], page_body: bytes,
                   key: bytes) -> bytes | None:
    """Inner bytes of a page's /<key> resource sub-dict (e.g. /Font,
    /XObject) — inline, indirect sub-dict, or behind an indirect
    /Resources reference."""
    def _sub(body: bytes) -> bytes | None:
        m = re.search(rb"/" + key + rb"\s*<<(.*?)>>", body, re.S)
        if m:
            return m.group(1)
        m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
        if m:                       # the sub-dict itself indirect
            sub = objs.get(int(m.group(1)))
            if sub is not None:
                dm = re.search(rb"<<(.*?)>>", sub, re.S)
                return dm.group(1) if dm else sub
        return None

    found = _sub(page_body)
    if found is None:               # /Resources N 0 R — follow it
        rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", page_body)
        if rm:
            res = objs.get(int(rm.group(1)))
            if res is not None:
                found = _sub(res)
    return found


# Adobe Glyph List subset: the names simple-font /Differences arrays
# re-map in practice (ASCII + Latin-1 + the publishing set). Unlisted
# names degrade to U+FFFD; uniXXXX/uXXXX names parse directly.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "acute": "´",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    "AE": "Æ", "ae": "æ", "Oslash": "Ø", "oslash":
    "ø", "germandbls": "ß", "Thorn": "Þ", "thorn":
    "þ", "Eth": "Ð", "eth": "ð",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•",
    "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "endash": "–", "emdash": "—", "trademark": "™",
    "fi": "ﬁ", "fl": "ﬂ", "fraction": "⁄",
    "florin": "ƒ", "circumflex": "ˆ", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "tilde": "˜", "hungarumlaut": "˝",
    "minus": "−", "Euro": "€", "Scaron": "Š",
    "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "OE": "Œ", "oe": "œ", "Ydieresis": "Ÿ",
    "dotlessi": "ı", "nbspace": " ",
}
# accented Latin letters follow a regular <letter><accent> glyph-name
# form (Agrave, ntilde, Ccedilla, ...): compose via NFC and keep only
# combinations that exist as single precomposed chars
import unicodedata as _ud

for _acc_name, _comb in (("grave", "̀"), ("acute", "́"),
                         ("circumflex", "̂"), ("tilde", "̃"),
                         ("dieresis", "̈"), ("ring", "̊"),
                         ("cedilla", "̧")):
    for _ch in "AEIOUYNCaeiouync":
        _comp = _ud.normalize("NFC", _ch + _comb)
        if len(_comp) == 1:
            _AGL.setdefault(_ch + _acc_name, _comp)
del _ud


def _glyph_char(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    if len(name) == 1:
        return name                      # A..Z a..z 0..9 map to selves
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})|u([0-9A-Fa-f]{4,6})", name)
    if m:
        try:
            return chr(int(m.group(1) or m.group(2), 16))
        except ValueError:
            pass
    return "�"


def _base_table(enc_name: bytes | None) -> list[str]:
    """256-entry code→char table for a named base encoding."""
    if enc_name == b"WinAnsiEncoding":
        return [bytes([i]).decode("cp1252", "replace") for i in range(256)]
    if enc_name == b"MacRomanEncoding":
        return [bytes([i]).decode("mac_roman", "replace")
                for i in range(256)]
    # StandardEncoding / absent: latin-1 identity is the best stand-in
    return [chr(i) for i in range(256)]


def _encoding_decoder(objs: dict[int, bytes], body: bytes):
    """Decoder for a simple font's /Encoding — named base encoding
    (WinAnsi/MacRoman) or an encoding dict with /BaseEncoding +
    /Differences [code /glyphname ...]. None when the font carries no
    /Encoding (latin-1 passthrough is already correct)."""
    m = re.search(rb"/Encoding\s*(/[A-Za-z]+|\d+\s+\d+\s+R|<<)", body)
    if not m:
        return None
    val = m.group(1)
    if val.startswith(b"/"):
        table = _base_table(val[1:])
        diffs = b""
    else:
        if val == b"<<":
            d = _dict_of(body[m.start(1):])
        else:
            d = objs.get(int(val.split()[0]), b"")
        bm = re.search(rb"/BaseEncoding\s*/([A-Za-z]+)", d)
        table = _base_table(bm.group(1) if bm else None)
        diffs = _value_of(_dict_of(d) or d, b"/Differences")
    if diffs:
        pos = 0
        for tok in re.findall(rb"/([^\s/\[\]<>()]+)|(\d+)", diffs):
            name, num = tok
            if num:
                pos = int(num)
            elif 0 <= pos < 256:
                table[pos] = _glyph_char(name.decode("latin-1",
                                                     "replace"))
                pos += 1
    tbl = "".join(table)

    def dec(s: str) -> str:
        return "".join(tbl[ord(c)] if ord(c) < 256 else c for c in s)

    return dec


def _font_decoders(objs: dict[int, bytes], page_body: bytes) -> dict:
    """Per-page font-name → string decoder. Fonts carrying a /ToUnicode
    CMap (the Type0/Identity-H CJK path) decode through it; simple fonts
    with a /Encoding (WinAnsiEncoding on virtually every Office/HWP
    export, or a /Differences dict) decode through the encoding table;
    fonts with neither pass latin-1 text through unchanged."""
    fd = _resource_dict(objs, page_body, b"Font")
    if fd is None:
        return {}
    out = {}
    for name, num in _FONT_REF_RE.findall(fd):
        body = objs.get(int(num))
        if body is None:
            continue
        if b"/ToUnicode" not in body:
            if re.search(rb"/Subtype\s*/Type0\b", body):
                # Identity-H/V with no ToUnicode: the 2-byte codes are
                # private glyph IDs with no text mapping — decoding them
                # as latin-1 pairs yields mojibake, so degrade each code
                # to U+FFFD (honest undecodable marker, geometry kept)
                out[name.decode("latin-1")] = (
                    lambda s: "�" * (len(s) // 2))
            else:
                enc = _encoding_decoder(objs, body)
                if enc is not None:
                    out[name.decode("latin-1")] = enc
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", body)
        if not tm:
            continue
        tou = objs.get(int(tm.group(1)))
        if tou is None:
            continue
        payload = _stream_payload(tou, objs)
        if payload is None:
            continue
        payload = _apply_filters(tou, payload)
        if payload is None:
            continue
        chars, ranges, nb = _parse_cmap(payload)
        out[name.decode("latin-1")] = _cmap_decoder(chars, ranges, nb)
    return out


def _arr_of(objs: dict[int, bytes], body: bytes, key: bytes) -> bytes:
    """Raw bytes of an array-valued dict entry, following one level of
    indirection (``/Widths 9 0 R`` → the array object's body)."""
    d = _dict_of(body) or body
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", d)
    if m:
        return objs.get(int(m.group(1)), b"")
    return _value_of(d, key)


_WTOK_RE = re.compile(rb"[\[\]]|[-+]?\d+(?:\.\d+)?")


def _parse_w_array(raw: bytes) -> dict[int, float]:
    """CIDFont /W array → {cid: width}. Both PDF 32000-1 9.7.4.3 forms:
    ``c [w1 … wn]`` (consecutive from c) and ``c1 c2 w`` (range)."""
    out: dict[int, float] = {}
    pend: list[float] = []
    in_list, base = False, 0
    for tok in _WTOK_RE.findall(raw):
        if tok == b"[":
            if not in_list and pend:
                base, pend = int(pend[-1]), []
                in_list = True
            continue
        if tok == b"]":
            in_list = False
            continue
        v = float(tok)
        if in_list:
            out[base] = v
            base += 1
        else:
            pend.append(v)
            if len(pend) == 3:
                c1, c2, w = pend
                for c in range(int(c1), min(int(c2), int(c1) + 65535) + 1):
                    out[c] = w
                pend = []
    return out


def _font_widths(objs: dict[int, bytes], page_body: bytes) -> dict:
    """Per-page font-name → ("cid"|"simple", {code: width}, default)
    glyph-advance metrics, in 1/1000-em units. Simple fonts read
    /FirstChar + /Widths (inline or indirect array); Type0 fonts read
    /DW + /W off the descendant CIDFont (role of pdfplumber's width
    tables feeding pdf_parser.py char geometry). Fonts with no metrics
    get no entry and fall back to the _AVG_ADVANCE estimate."""
    fd = _resource_dict(objs, page_body, b"Font")
    if fd is None:
        return {}
    out = {}
    for name, num in _FONT_REF_RE.findall(fd):
        body = objs.get(int(num))
        if body is None:
            continue
        if re.search(rb"/Subtype\s*/Type0\b", body):
            dm = re.search(rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R",
                           body)
            desc = objs.get(int(dm.group(1))) if dm else None
            if desc is None:
                continue
            dwm = re.search(rb"/DW\s+([\d.]+)", desc)
            dw = float(dwm.group(1)) if dwm else 1000.0
            wmap = _parse_w_array(_arr_of(objs, desc, b"/W"))
            out[name.decode("latin-1")] = ("cid", wmap, dw)
        else:
            fc = re.search(rb"/FirstChar\s+(\d+)", body)
            raw = _arr_of(objs, body, b"/Widths")
            if not fc or not raw:
                continue
            first = int(fc.group(1))
            vals = [float(t) for t in
                    re.findall(rb"[-+]?\d+(?:\.\d+)?", raw)]
            wmap = {first + i: w for i, w in enumerate(vals)}
            out[name.decode("latin-1")] = ("simple", wmap,
                                           _AVG_ADVANCE * 1000.0)
    return out


def _interpret(stream: bytes,
               decoders: dict | None = None,
               places: list | None = None,
               widths: dict | None = None
               ) -> list[tuple[float, float, float, str, float, float]]:
    """Text-showing ops → (x, baseline_y, effective_size, text, x_end,
    y_end) in PDF (bottom-up) device space. ``decoders`` maps font resource
    names to string decoders (CID fonts); ``widths`` maps them to
    _font_widths metrics — when present, advances (and so x_end and TJ
    kern placement) are glyph-exact incl. Tc/Tw/Tz spacing; otherwise
    the _AVG_ADVANCE/CJK estimate stands in. The current font follows
    Tf. When ``places`` is a list, XObject invocations (``/Name Do``)
    append (name, ctm) to it — the unit square maps through the CTM, so
    the placement rectangle is (e, f, a, d) for the axis-aligned case."""
    shows: list[tuple[float, float, float, str, float, float]] = []
    ctm, stack = _ID, []
    tm = tlm = _ID
    size, leading = 0.0, 0.0
    char_sp, word_sp, hscale = 0.0, 0.0, 1.0
    font = ""
    operands: list = []
    arr: list | None = None

    def _advance(raw: str, decoded: str) -> float:
        # text-space advance of one shown string, PDF 32000-1 9.4.4
        met = widths.get(font) if widths else None
        if met is None:
            base = _adv(decoded, size)
            n_sp = decoded.count(" ")
            return (base + char_sp * len(decoded)
                    + word_sp * n_sp) * hscale
        kind, wmap, dw = met
        if kind == "cid":
            codes = [(ord(raw[i]) << 8) | ord(raw[i + 1])
                     for i in range(0, len(raw) - 1, 2)]
            wsp = 0.0      # Tw applies to 1-byte code 32 only (9.3.3)
        else:
            codes = [ord(c) for c in raw]
            wsp = word_sp
        adv = 0.0
        for c in codes:
            adv += (wmap.get(c, dw) / 1000.0 * size + char_sp
                    + (wsp if c == 32 else 0.0))
        return adv * hscale

    def show(txt: str) -> None:
        nonlocal tm
        raw = txt
        if decoders and font in decoders:
            txt = decoders[font](txt)
        if not txt:
            return
        adv = _advance(raw, txt)
        trm = _mat_mul(tm, ctm)
        tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)
        eff = abs(size * trm[3]) or size
        trm2 = _mat_mul(tm, ctm)
        shows.append((trm[4], trm[5], eff, txt, trm2[4], trm2[5]))

    def next_line(tx: float, ty: float) -> None:
        nonlocal tm, tlm
        tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
        tm = tlm

    for tok in _lex(stream):
        kind = tok[0]
        if kind == "[":
            arr = []
            continue
        if kind == "]":
            operands.append(arr or [])
            arr = None
            continue
        if kind in ("num", "str", "name"):
            (arr if arr is not None else operands).append(tok[1])
            continue
        op = tok[1]
        try:
            if op == "q":
                stack.append(ctm)
            elif op == "Q":
                ctm = stack.pop() if stack else _ID
            elif op == "cm" and len(operands) >= 6:
                ctm = _mat_mul(tuple(operands[-6:]), ctm)
            elif op == "BT":
                tm = tlm = _ID
            elif op == "Tf" and operands:
                size = float(operands[-1])
                if len(operands) >= 2:
                    font = str(operands[-2])
            elif op == "TL" and operands:
                leading = float(operands[-1])
            elif op == "Tc" and operands:
                char_sp = float(operands[-1])
            elif op == "Tw" and operands:
                word_sp = float(operands[-1])
            elif op == "Tz" and operands:
                hscale = float(operands[-1]) / 100.0
            elif op == "Td" and len(operands) >= 2:
                next_line(float(operands[-2]), float(operands[-1]))
            elif op == "TD" and len(operands) >= 2:
                leading = -float(operands[-1])
                next_line(float(operands[-2]), float(operands[-1]))
            elif op == "Tm" and len(operands) >= 6:
                tm = tlm = tuple(float(v) for v in operands[-6:])
            elif op == "T*":
                next_line(0.0, -leading)
            elif op == "Tj" and operands:
                show(str(operands[-1]))
            elif op == "'" and operands:
                next_line(0.0, -leading)
                show(str(operands[-1]))
            elif op == '"' and len(operands) >= 3:
                word_sp = float(operands[-3])
                char_sp = float(operands[-2])
                next_line(0.0, -leading)
                show(str(operands[-1]))
            elif op == "TJ" and operands and isinstance(operands[-1], list):
                # element-wise: each number kerns tm by -n/1000·size·Th,
                # each string shows at its own (metric-exact) position
                for el in operands[-1]:
                    if isinstance(el, str):
                        show(el)
                    else:
                        kern = -float(el) / 1000.0 * size * hscale
                        tm = _mat_mul((1, 0, 0, 1, kern, 0), tm)
            elif op == "Do" and operands and places is not None:
                places.append((str(operands[-1]), ctm))
        except (TypeError, ValueError):
            pass  # malformed operand run: skip the op, keep scanning
        operands = []
    return shows


def pdf_page_count(data: bytes) -> int:
    """Page count from the page-tree walk alone — NO content-stream
    interpretation, no OCR: the cheap metadata probe the parse-stage
    page-range fan-out sizes its shards with (role of the reference's
    PdfReader(...).pages length probe, task_service.py:321-327).
    Refuses encrypted PDFs like pdf_to_boxes does — an encrypted doc
    must take the (contained) single-task refusal path, not burn a
    fan-out of shard tasks that each refuse."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data):
        raise ValueError("encrypted PDF (/Encrypt present)")
    return len(_page_order(_scan_objects(data)))


def pdf_to_boxes(data: bytes, from_page: int = 0,
                 to_page: int | None = None) -> list[dict]:
    """PDF bytes → untagged box spans (the pdfish input IR), top-down
    coords scaled to the 1000-unit page height. Raises ValueError on
    non-PDF input; a PDF with no recoverable text layer (scanned pages)
    yields [] — the reference's OCR fallback territory.

    ``from_page``/``to_page`` restrict interpretation (and OCR) to the
    half-open page range — the parse-stage fan-out unit (the reference's
    from_page/to_page task arguments, task_service.py:321-327); page
    numbers in the emitted boxes stay GLOBAL, so range outputs
    concatenate into exactly the whole-document parse."""
    from ..schemas import make_span

    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data):
        # encrypted document: strings/streams are ciphertext — silently
        # yielding garbage or [] would masquerade as a scanned page, so
        # refuse loudly; expand_pdf_spans catches and keeps the ref
        # (the reference's pdfplumber raises similarly)
        raise ValueError("encrypted PDF (/Encrypt present)")
    objs = _scan_objects(data)
    spans: list[dict] = []
    for page_no, num in enumerate(_page_order(objs)):
        if page_no < from_page:
            continue
        if to_page is not None and page_no >= to_page:
            break
        body = objs[num]
        mb = _MBOX_RE.search(_owner_of(objs, num, b"/MediaBox") or body)
        pw, ph = (612.0, 792.0)
        if mb:
            pw = float(mb.group(3)) - float(mb.group(1))
            ph = float(mb.group(4)) - float(mb.group(2))
        # /Rotate (inheritable): normalize device coords to DISPLAY
        # (reading) space so baselines are horizontal again — the role
        # of pdfplumber's page.rotation handling
        rot = 0
        rb = _owner_of(objs, num, b"/Rotate")
        if rb is not None:
            rm = re.search(rb"/Rotate\s+(-?\d+)", _dict_of(rb))
            if rm:
                rot = int(rm.group(1)) % 360

        pw0, ph0 = pw, ph           # device dims (pre-rotation)

        def disp(px: float, py: float) -> tuple[float, float]:
            if rot == 90:       # page displays rotated 90° clockwise
                return (py, pw0 - px)
            if rot == 180:
                return (pw0 - px, ph0 - py)
            if rot == 270:
                return (ph0 - py, px)
            return (px, py)

        # /Resources may be inherited from an ancestor /Pages node
        res_body = (_owner_of(objs, num, b"/Resources") or body
                    if b"/Resources" not in body else body)
        decoders = _font_decoders(objs, res_body)
        widths = _font_widths(objs, res_body)
        places: list[tuple[str, tuple]] = []
        shows = []
        for x, y, eff, t, xe, ye in _interpret(_content_of(objs, body),
                                               decoders, places, widths):
            if not t.strip():
                continue
            dx, dy = disp(x, y)
            dxe, _dye = disp(xe, ye)
            shows.append((dx, dy, eff, t, dxe))
        if rot in (90, 270):
            pw, ph = ph, pw
        scale = _TARGET_H / (ph or 792.0)
        # embedded images: each /Name Do placement becomes a figure box
        # (unit square through the CTM) + an image span whose payload the
        # in-house JPEG/PNG codecs can really decode (role of the
        # reference's pdfplumber image crops, pdf_parser.py:1129-1208)
        xod = _resource_dict(objs, res_body, b"XObject")
        xmap = ({n.decode("latin-1"): int(v) for n, v
                 in _FONT_REF_RE.findall(xod)} if xod else {})
        for name, ctm in places:
            num = xmap.get(name)
            if num is None:
                continue
            a, _b, _c, d, e, f = ctm
            iw, ih = abs(a), abs(d)
            if iw < 1 or ih < 1:
                continue
            arr = anote = None
            if not shows:
                # page has NO text layer: scanned-page territory — run
                # the det/rec OCR over the placed image (the reference
                # rasterizes and OCRs every such page, pdf_parser.py:
                # 994-1113 + deepdoc/vision/ocr.py), decoded straight
                # to pixels (no PNG transcode round-trip). Recognized
                # lines REPLACE the figure; unreadable images stay
                # figures.
                arr, anote = _image_array(objs, num)
                if arr is not None:
                    ocr_boxes = _ocr_image_boxes(
                        arr, ctm, disp, ph, scale, page_no, name)
                    if ocr_boxes:
                        spans.extend(ocr_boxes)
                        continue
            if arr is not None and anote in ("rgb", "gray"):
                # OCR refused but the pixels are already decoded: build
                # the figure payload from them directly instead of
                # re-inflating the stream inside _image_payload
                import base64

                from .png import encode_png

                payload, note = (base64.b64encode(encode_png(arr))
                                 .decode("ascii"), "png")
            else:
                payload, note = _image_payload(objs, num)
            if note in ("not-an-image", "no-dims", "no-stream"):
                continue
            # placement rect corners through the display transform
            (cx0, cy0), (cx1, cy1) = disp(e, f), disp(e + iw, f + ih)
            x0d, x1d = min(cx0, cx1), max(cx0, cx1)
            y0d, y1d = min(cy0, cy1), max(cy0, cy1)
            spans.append(make_span("box", json.dumps(
                {"t": "", "x0": round(x0d * scale, 2),
                 "x1": round(x1d * scale, 2),
                 "top": round((ph - y1d) * scale, 2),
                 "bot": round((ph - y0d) * scale, 2),
                 "page": page_no, "lay": "figure"},
                ensure_ascii=False, sort_keys=True)))
            spans.append(make_span(
                "image", payload,
                media_ref=f"pdf://{page_no}/{name}"))
        for x, y, eff, txt, xe in _assemble_lines(shows):
            txt = txt.strip()
            if not txt:
                continue
            top = (ph - y - eff) * scale
            d = {"t": txt,
                 "x0": round(x * scale, 2),
                 "x1": round(max(xe, x + eff * 0.1) * scale, 2),
                 "top": round(top, 2),
                 "bot": round(top + eff * scale, 2),
                 "page": page_no}
            spans.append(make_span(
                "box", json.dumps(d, ensure_ascii=False, sort_keys=True)))
    return spans


def _ocr_image_boxes(arr, ctm, disp, ph: float, scale: float,
                     page_no: int, img_name: str = "Im0") -> list[dict]:
    """OCR a placed image (decoded pixel array) on a textless page into
    ordinary text-box spans (same dict shape as the text-layer path, so
    layout inference and templates downstream cannot tell a scan from a
    text PDF). Line pixel geometry maps through the placement CTM into
    device points, then through the page display transform.
    Sideways/upside-down scanner feeds are detected and corrected
    (glyphs.ocr_page_oriented) — geometry is then interpreted in the
    corrected frame, so reading order and header/footer bands survive
    the feed rotation. Returns [] when the image is not glyph-font
    text."""
    from ..schemas import make_span
    from .glyphs import CELL_H, CELL_W, PITCH_X, ocr_page_oriented

    if arr.shape[0] < 1 or arr.shape[1] < 1:
        return []
    a, _b, _c, d, e, f = ctm
    # a mirrored placement CTM (`w 0 0 -h 0 h cm` — producers whose
    # image data is stored bottom-up) renders the raw array flipped;
    # flip it into RENDERED orientation first so recognition sees what
    # a viewer sees, then map geometry from the transformed placement
    # corners (min/max like the figure path) instead of assuming (e, f)
    # is the bottom-left anchor
    import numpy as _np

    if d < 0:
        arr = _np.ascontiguousarray(arr[::-1])
    if a < 0:
        arr = _np.ascontiguousarray(arr[:, ::-1])
    # luma conversion happens inside ocr_page_oriented
    lines, rot, (px_h, px_w), slope = ocr_page_oriented(arr)
    iw, ih = abs(a), abs(d)
    x_base = min(e, e + a)          # rendered-rect left edge (device pts)
    y_base = max(f, f + d)          # rendered-rect top edge (device pts)
    out: list[dict] = []

    def emit(txt: str, px0: float, px1: float, py0: float, py1: float,
             lay: str | None) -> None:
        # pixel rows count from the RENDERED image top; device y bottom-up
        x0_pt = x_base + iw * px0 / px_w
        x1_pt = x_base + iw * px1 / px_w
        ytop_pt = y_base - ih * py0 / px_h
        ybot_pt = y_base - ih * py1 / px_h
        (dx0, dy0), (dx1, dy1) = disp(x0_pt, ybot_pt), disp(x1_pt, ytop_pt)
        box = {"t": txt, "x0": round(min(dx0, dx1) * scale, 2),
               "x1": round(max(dx0, dx1) * scale, 2),
               "top": round((ph - max(dy0, dy1)) * scale, 2),
               "bot": round((ph - min(dy0, dy1)) * scale, 2),
               "page": page_no}
        if lay is not None:
            box["lay"] = lay
        out.append(make_span("box", json.dumps(
            box, ensure_ascii=False, sort_keys=True)))

    n_fig = 0
    text_lines = [l for l in lines if not l.get("fig")]
    detected = _detect_scan_tables(text_lines)
    # a line splits at a gutter-wide gap ONLY when a neighboring line
    # splits too (a real column region spans many lines) — a lone
    # title-and-date line with a wide gap must stay one box, or its
    # right fragment would flip the page into column-major ordering
    multi = [len(_SCAN_COL_RE.findall(ln["text"])) >= 2
             if segs is None else False
             for ln, segs in detected]
    for ix, (ln, segs) in enumerate(detected):
        k = max(1, (ln["y1"] - ln["y0"]) // CELL_H)

        def seg_x(i0: int, i1: int) -> tuple[float, float]:
            # the char grid is monospaced (pen reconstruction), so
            # segment x comes straight from the char index
            return (ln["x0"] + i0 * PITCH_X * k,
                    ln["x0"] + (i1 - 1) * PITCH_X * k + CELL_W * k)

        if segs is None:
            split = multi[ix] and ((ix > 0 and multi[ix - 1])
                                   or (ix + 1 < len(multi)
                                       and multi[ix + 1]))
            if split:
                # two-COLUMN text: one box per column block, so
                # pdfish's two-column ordering sees scanned columns
                # exactly like text-PDF columns
                for m in _SCAN_COL_RE.finditer(ln["text"]):
                    sx0, sx1 = seg_x(m.start(), m.end())
                    emit(m.group(), sx0, sx1, ln["y0"], ln["y1"], None)
            else:
                txt = ln["text"].strip()
                if txt:
                    emit(txt, ln["x0"], ln["x1"], ln["y0"], ln["y1"],
                         None)
            continue
        # tabular line: one box per cell segment, tagged lay=table and
        # emitted contiguously so extract_pdfish's auto-tno run grouping
        # keeps one table per aligned region
        for i0, i1, seg in segs:
            sx0, sx1 = seg_x(i0, i1)
            emit(seg, sx0, sx1, ln["y0"], ln["y1"], "table")
    # photo regions amid the text (figure bands): a lay=figure box at
    # the band's ink bbox + an image span carrying the REAL pixel crop
    # — the role of the reference's figure-region crops from layout
    # output (pdf_parser.py:1129-1208). Geometry keeps ordering; the
    # image span must directly follow its box (caption attachment).
    figs = [l for l in lines if l.get("fig")]
    if figs:
        import base64

        from .glyphs import _unshear
        from .png import encode_png

        gray = (arr.mean(axis=2).astype("uint8") if arr.ndim == 3
                else arr)
        if rot:
            import numpy as _np

            gray = _np.ascontiguousarray(_np.rot90(gray, rot))
        # line coordinates live in the fully CORRECTED frame: apply the
        # same deskew to the pixels before cropping, or a skewed page's
        # figure payload would be a diagonally-torn crop
        gray = _unshear(gray, slope)
        for ln in figs:
            emit("", ln["x0"], ln["x1"], ln["y0"], ln["y1"], "figure")
            crop = gray[ln["y0"]:ln["y1"], ln["x0"]:ln["x1"]]
            out.append(make_span(
                "image",
                base64.b64encode(encode_png(crop)).decode("ascii"),
                media_ref=f"pdf://{page_no}/{img_name}/scanfig{n_fig}"))
            n_fig += 1
    return out


_SCAN_SEG_RE = re.compile(r"\S+(?: {1,2}\S+)*")
# a two-column page gutter: at least this many blank char cells between
# text blocks on one OCR line (table cell gaps are 3–7; prose never
# reconstructs runs this wide)
_SCAN_GUTTER = 8
_SCAN_COL_RE = re.compile(r"\S+(?: {1,%d}\S+)*" % (_SCAN_GUTTER - 1))


def _detect_scan_tables(lines: list[dict]) -> list[tuple[dict, list | None]]:
    """Tabular-region detection over OCR'd page lines — the role of the
    reference's table-structure recognizer on scanned input
    (deepdoc/vision/table_structure_recognizer.py:29-92), re-expressed
    for the monospaced glyph frame: a line splits into cell segments at
    runs of >=3 spaces; >=2 CONSECUTIVE lines whose >=3 segments start
    at IDENTICAL char columns (left-aligned layout) form a table
    region. Exactly-2-segment aligned runs are NOT tables — that shape
    is two-COLUMN text (both columns left-aligned at the same gutter),
    which the caller splits into per-column boxes instead; a genuine
    2-column table reads as two text columns, the documented ambiguity.
    Returns one (line, segments|None) per line — segments =
    [(start_char, end_char, text)] for table lines, None for prose."""
    seg_of: list[list[tuple[int, int, str]]] = []
    for ln in lines:
        seg_of.append([(m.start(), m.end(), m.group())
                       for m in _SCAN_SEG_RE.finditer(ln["text"])])
    is_table = [False] * len(lines)
    i = 0
    while i < len(lines):
        starts = tuple(s[0] for s in seg_of[i])
        if len(starts) < 3:
            i += 1
            continue
        j = i + 1
        while (j < len(lines)
               and tuple(s[0] for s in seg_of[j]) == starts):
            j += 1
        if j - i >= 2:
            for t in range(i, j):
                is_table[t] = True
        i = j
    return [(ln, seg_of[ix] if is_table[ix] else None)
            for ix, ln in enumerate(lines)]


def _image_array(objs: dict[int, bytes], num: int):
    """(numpy pixel array | None, note) for an /Image XObject — decoded
    STRAIGHT to pixels, no container round-trip (the OCR path reads
    this; transcoding to PNG and decoding it back would double the
    cost of every scanned page). 8-bit Flate/raw DeviceGray/DeviceRGB
    inflate + reshape; DCTDecode goes through the in-house JPEG
    decoder; anything else returns None with the reason note."""
    body = objs.get(num)
    if body is None or not re.search(rb"/Subtype\s*/Image", body):
        return None, "not-an-image"
    wm = re.search(rb"/Width\s+(\d+)", body)
    hm = re.search(rb"/Height\s+(\d+)", body)
    if not (wm and hm):
        return None, "no-dims"
    w, h = int(wm.group(1)), int(hm.group(1))
    payload = _stream_payload(body, objs)
    if payload is None:
        return None, "no-stream"
    if re.search(rb"/DCTDecode\b", body):
        try:
            from .image_ops import decode_image

            return decode_image(payload), "jpeg"
        except Exception:  # noqa: BLE001 — corrupt JPEG: not decodable
            return None, "bad-jpeg"
    if re.search(rb"/DecodeParms\b|/SMask\b|/ImageMask\b", body):
        return None, "unsupported-params"
    bm = re.search(rb"/BitsPerComponent\s+(\d+)", body)
    if not bm or int(bm.group(1)) != 8:
        return None, "unsupported-depth"
    if re.search(rb"/FlateDecode\b", body):
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            return None, "bad-deflate"
    import numpy as np

    if re.search(rb"/DeviceRGB\b", body) and len(payload) >= w * h * 3:
        return np.frombuffer(payload[:w * h * 3],
                             dtype=np.uint8).reshape(h, w, 3), "rgb"
    if re.search(rb"/DeviceGray\b", body) and len(payload) >= w * h:
        return np.frombuffer(payload[:w * h],
                             dtype=np.uint8).reshape(h, w), "gray"
    return None, "unsupported-colorspace"


def _image_payload(objs: dict[int, bytes], num: int) -> tuple[str, str]:
    """(base64 payload, note) for an /Image XObject. DCTDecode streams
    ARE JPEG files — they pass through for the in-house JPEG decoder;
    8-bit Flate/raw DeviceGray/DeviceRGB bitmaps inflate and transcode
    to PNG via the in-house codec; anything else (CMYK, masks,
    predictors, CCITT…) stays a reference-only figure."""
    import base64

    body = objs.get(num)
    if body is None or not re.search(rb"/Subtype\s*/Image", body):
        return "", "not-an-image"
    if not (re.search(rb"/Width\s+\d+", body)
            and re.search(rb"/Height\s+\d+", body)):
        return "", "no-dims"
    if re.search(rb"/DCTDecode\b", body):
        payload = _stream_payload(body, objs)
        if payload is None:
            return "", "no-stream"
        return base64.b64encode(payload).decode("ascii"), "jpeg"
    arr, note = _image_array(objs, num)
    if arr is None:
        return "", note
    from .png import encode_png

    return base64.b64encode(encode_png(arr)).decode("ascii"), "png"


def _adv(txt: str, size: float) -> float:
    """Width estimate: CJK glyphs advance ~1 em, latin ~0.5 em."""
    return size * sum(1.0 if ord(c) > 0x2E7F else _AVG_ADVANCE
                      for c in txt)


def _assemble_lines(shows: list[tuple[float, float, float, str, float]]
                    ) -> list[tuple[float, float, float, str, float]]:
    """pdfplumber-style line assembly (role of pdf_parser's line-level
    input): real-world generators emit one Tj per word/styled run, so a
    visual line arrives as many fragments sharing a baseline. Cluster by
    baseline (±20% of size), sort by x, and merge runs whose horizontal
    gap is under one em — inserting a space when the gap is at least a
    quarter em (a word break), concatenating otherwise (an intra-word
    style/kern split). Column gaps are several ems and never merge.
    Fragment end-x comes from the interpreter (glyph-exact when the
    font carries /Widths). Single-show lines pass through unchanged."""
    if len(shows) <= 1:
        return shows
    shows = sorted(shows, key=lambda s: (-s[1], s[0]))
    out: list[list] = []
    for x, y, eff, txt, xe in shows:
        if out:
            lx, ly, leff, ltxt, lend = out[-1]
            same_line = abs(y - ly) <= 0.2 * max(eff, leff, 1.0)
            gap = x - lend
            if same_line and -0.5 * eff <= gap <= 1.0 * max(eff, leff):
                sep = " " if (gap >= 0.25 * max(eff, leff)
                              and not ltxt.endswith(" ")
                              and not txt.startswith(" ")) else ""
                out[-1][3] = ltxt + sep + txt
                out[-1][2] = max(eff, leff)
                out[-1][4] = max(lend, xe)
                continue
        out.append([x, y, eff, txt, xe])
    return [tuple(r) for r in out]


def pdf_outlines(data: bytes) -> list[tuple[str, int]]:
    """Walk the document outline (bookmark) tree into (title, depth)
    pairs in pre-order — exactly the reference's dfs over
    ``pdf.outline`` (pdf_parser.py:1022-1034, depth 0 at top level).
    Missing/absent outlines → [] (the reference's "Miss outlines"
    path). Cycle-safe: an item is visited once."""
    objs = _scan_objects(data)
    cat = next((b for b in objs.values() if b"/Catalog" in b), None)
    if cat is None:
        return []
    m = re.search(rb"/Outlines\s+(\d+)\s+\d+\s+R", cat)
    if m is None:
        return []

    def ref_of(body: bytes, key: bytes) -> int | None:
        r = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
        return int(r.group(1)) if r else None

    out: list[tuple[str, int]] = []
    seen: set[int] = set()

    def dfs(num: int | None, depth: int) -> None:
        while num is not None and num not in seen:
            seen.add(num)
            body = objs.get(num)
            if body is None:
                return
            t = body.find(b"/Title")
            if t >= 0:
                p = body.find(b"(", t)
                if p >= 0:
                    title, _ = _lit_string(body, p)
                    # real-world outlines write non-ASCII titles as
                    # UTF-16BE with a BOM (PDF 32000-1 §7.9.2.2)
                    if title.startswith("\xfe\xff"):
                        title = (title.encode("latin-1")[2:]
                                 .decode("utf-16-be", "replace"))
                    out.append((title, depth))
            dfs(ref_of(body, b"First"), depth + 1)
            num = ref_of(body, b"Next")

    root = objs.get(int(m.group(1)))
    if root is None:
        return []
    dfs(ref_of(root, b"First"), 0)
    return out


def expand_pdf_spans(spans: list[dict], from_page: int = 0,
                     to_page: int | None = None) -> list[dict]:
    """Replace `pdf` payload spans (base64 PDF bytes in `text`) with the
    parsed box spans; all other spans pass through. Idempotent — a span
    list with no `pdf` kind is returned as-is (same object).
    ``from_page``/``to_page`` restrict the parse to a page range (the
    parse-shard unit); doc-level outline spans ride only with the first
    range so range concatenation equals the whole-doc expansion."""
    if not any(s["kind"] == "pdf" for s in spans):
        return spans
    import base64

    from ..schemas import finalize_offsets

    out: list[dict] = []
    for s in spans:
        if s["kind"] != "pdf":
            out.append(s)
            continue
        try:
            raw = base64.b64decode(s["text"])
            boxes = pdf_to_boxes(raw, from_page, to_page)
            # outlines ride as toc_entry metadata spans (consumed and
            # dropped by phase B; the manual template uses them for
            # section levels — rag/app/manual.py:196-210)
            toc = ([make_toc_span(t, lvl)
                    for t, lvl in pdf_outlines(raw)]
                   if from_page == 0 else [])
            out.extend(toc + boxes)
        except Exception:  # noqa: BLE001 — undecodable payload: keep a ref
            pass
    return finalize_offsets(out)


def make_toc_span(title: str, lvl: int) -> dict:
    from ..schemas import make_span

    return make_span("toc_entry", json.dumps(
        {"t": title, "lvl": int(lvl)}, ensure_ascii=False, sort_keys=True))


def parse_toc_span(span: dict) -> tuple[str, int]:
    d = json.loads(span["text"])
    return d["t"], int(d["lvl"])
