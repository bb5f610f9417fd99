"""Deterministic glyph rendering + rule-OCR over a fixed 5x7 bitmap font.

The reference's picture template runs a real det/rec OCR model over the
image (rag/app/picture.py:31-41, deepdoc/vision/ocr.py) — model weights
don't exist in this sandbox, so the synthetic corpus renders text with
this font and the OCR side recovers it with the same classic pipeline
shape (binarize → segment into cells → classify each cell by nearest
template). The classifier is a toy, the Ray-side plumbing and the
binarize/segment/classify structure are real.

Geometry contract (shared by renderer and OCR): glyph cell 5x7, 1px
inter-char gap (pitch 6), 2px inter-line gap (pitch 9), 2px margin all
around, white-on-black (ink=255).
"""

from __future__ import annotations

import numpy as np

CELL_W, CELL_H = 5, 7
PITCH_X, PITCH_Y = 6, 9
MARGIN = 2

# 5x7 font: per char, 7 rows of 5-bit ints (MSB = leftmost pixel)
_FONT_ROWS: dict[str, tuple[int, ...]] = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11100, 0b10010, 0b10001, 0b10001, 0b10001, 0b10010, 0b11100),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    ".": (0, 0, 0, 0, 0, 0b00100, 0b00100),
    ",": (0, 0, 0, 0, 0b00100, 0b00100, 0b01000),
    ":": (0, 0b00100, 0b00100, 0, 0b00100, 0b00100, 0),
    "-": (0, 0, 0, 0b11111, 0, 0, 0),
    "?": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0, 0b00100),
    "!": (0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0, 0b00100),
}


def _bitmap(ch: str) -> np.ndarray:
    rows = _FONT_ROWS[ch]
    return np.array([[(r >> (CELL_W - 1 - x)) & 1 for x in range(CELL_W)]
                     for r in rows], dtype=np.uint8)


_TEMPLATES: list[tuple[str, np.ndarray]] | None = None


def _templates() -> list[tuple[str, np.ndarray]]:
    global _TEMPLATES
    if _TEMPLATES is None:
        _TEMPLATES = [(ch, _bitmap(ch)) for ch in _FONT_ROWS]
    return _TEMPLATES


def normalize_text(text: str) -> str:
    """Project text onto the font alphabet: uppercase, unknown → space."""
    return "".join(c if c in _FONT_ROWS else " " for c in text.upper())


def render_text(lines: list[str]) -> np.ndarray:
    """Render lines into a white-on-black grayscale image (uint8)."""
    lines = [normalize_text(ln) for ln in lines] or [" "]
    n_cols = max(1, max(len(ln) for ln in lines))
    w = 2 * MARGIN + n_cols * PITCH_X - 1
    h = 2 * MARGIN + len(lines) * PITCH_Y - 2
    img = np.zeros((h, w), dtype=np.uint8)
    for j, ln in enumerate(lines):
        y0 = MARGIN + j * PITCH_Y
        for i, ch in enumerate(ln):
            x0 = MARGIN + i * PITCH_X
            img[y0:y0 + CELL_H, x0:x0 + CELL_W] = _bitmap(ch) * 255
    return img


def ocr_glyphs(img: np.ndarray) -> str:
    """Binarize → segment into the fixed glyph grid → classify each cell
    by minimum Hamming distance to the font templates. Returns the
    recovered text with per-line trailing whitespace stripped."""
    if img.ndim == 3:  # luma of color input
        img = img.mean(axis=2).astype(np.uint8)
    binary = (img > 127).astype(np.uint8)
    h, w = binary.shape
    n_cols = max(0, (w - 2 * MARGIN + 1) // PITCH_X)
    n_rows = max(0, (h - 2 * MARGIN + 2) // PITCH_Y)
    lines: list[str] = []
    for j in range(n_rows):
        y0 = MARGIN + j * PITCH_Y
        chars: list[str] = []
        for i in range(n_cols):
            x0 = MARGIN + i * PITCH_X
            cell = binary[y0:y0 + CELL_H, x0:x0 + CELL_W]
            if cell.shape != (CELL_H, CELL_W):
                break
            if not cell.any():
                chars.append(" ")
                continue
            best, best_d = " ", CELL_W * CELL_H + 1
            for ch, tpl in _templates():
                d = int(np.count_nonzero(cell != tpl))
                if d < best_d:
                    best, best_d = ch, d
            chars.append(best)
        lines.append("".join(chars).rstrip())
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


# --------------------------------------------------- page-level det/rec ----
# The scanned-PDF path (functions/pdf_bytes.pdf_to_boxes) needs OCR over a
# whole page image where the text block sits at an ARBITRARY offset — the
# fixed-grid assumption of ocr_glyphs does not hold. ocr_page is a classic
# two-stage det/rec pipeline (the role of deepdoc/vision/ocr.py:70-398's
# TextDetector+TextRecognizer, with template matching standing in for the
# ONNX models the sandbox cannot host): detection finds ink-row bands
# (lines) and ink-column runs (glyphs); recognition classifies each glyph
# by its ink-tight pattern and reconstructs pen positions from the
# template's tight offsets, so word spaces count exactly.

def _tight(arr: np.ndarray):
    """(pattern, top, left) of the ink-tight crop; None for blank."""
    ys, xs = np.nonzero(arr)
    if ys.size == 0:
        return None
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    return arr[y0:y1, x0:x1], y0, x0


_TIGHT_TEMPLATES: list[tuple[str, np.ndarray, int, int]] | None = None
_TIGHT_EXACT: dict[tuple, tuple[str, int, int]] = {}


def _tight_templates() -> list[tuple[str, np.ndarray, int, int]]:
    global _TIGHT_TEMPLATES
    if _TIGHT_TEMPLATES is None:
        out = []
        for ch, tpl in _templates():
            t = _tight(tpl)
            if t is None:          # the space glyph: no ink
                continue
            out.append((ch, t[0], t[1], t[2]))
            _TIGHT_EXACT[(t[0].shape, t[0].tobytes())] = (ch, t[1], t[2])
        _TIGHT_TEMPLATES = out
    return _TIGHT_TEMPLATES


# worst acceptable Hamming distance (of the 35-cell frame) for the
# noisy-glyph fallback — beyond it the pattern is NOT this font (a
# rotated glyph, a photo fragment) and the whole page is rejected
# rather than garbage-matched
_MAX_HAMMING = 4


def _classify_tight(pat: np.ndarray) -> tuple[str, int, int] | None:
    """pattern → (char, tight_top, tight_left). Exact tight-pattern match
    first (every font glyph has a distinct tight pattern — pinned in
    tests; O(1) dict hit on clean renders); nearest-by-Hamming over
    same-or-padded dims as the noisy fallback, capped at _MAX_HAMMING.
    None when the pattern cannot be this font (too large / too far)."""
    ph, pw = pat.shape
    if ph > CELL_H or pw > CELL_W:
        return None
    _tight_templates()
    hit = _TIGHT_EXACT.get(((ph, pw), pat.tobytes()))
    if hit is not None:
        return hit
    best = None
    best_d = _MAX_HAMMING + 1
    for ch, tpl, tt, tl in _tight_templates():
        th, tw = tpl.shape
        mh, mw = max(th, ph), max(tw, pw)
        a = np.zeros((mh, mw), dtype=np.uint8)
        b = np.zeros((mh, mw), dtype=np.uint8)
        a[:ph, :pw] = pat
        b[:th, :tw] = tpl
        d = int(np.count_nonzero(a != b))
        if d < best_d:
            best, best_d = (ch, tt, tl), d
    return best


def _run_length_gcd(b: np.ndarray, cap: int = 8) -> int:
    """Scan-resolution estimate: a k-times nearest-neighbor upscale makes
    EVERY ink-run length (along rows and columns) a multiple of k, so the
    gcd of all run lengths recovers k (the role of the reference's
    zoom-factor bookkeeping around its rasterizer, pdf_parser.py:994-1113
    — there the DPI is known because it rasterizes itself; a scanner
    image arrives with unknown DPI). Processed in row chunks with an
    early exit at gcd 1 (exact: each row's runs are independent), so a
    photo page — whose dithered runs hit gcd 1 within the first band —
    costs a fraction of a full-page diff. Capped."""
    import math

    g = 0
    for arr in (b, b.T):
        n = arr.shape[0]
        for c0 in range(0, n, 128):
            chunk = arr[c0:c0 + 128]
            p = np.zeros((chunk.shape[0], chunk.shape[1] + 2),
                         dtype=np.int8)
            p[:, 1:-1] = chunk
            flat = np.diff(p, axis=1).reshape(-1)
            starts = np.flatnonzero(flat == 1)
            ends = np.flatnonzero(flat == -1)
            for ln in np.unique(ends - starts):
                g = math.gcd(g, int(ln))
                if g == 1:
                    return 1
    return min(max(g, 1), cap)


def _ocr_binary_scaled(b: np.ndarray, kk_fn=None) -> list[dict]:
    """OCR a binary page at whatever scan resolution it arrived in:
    estimate the integer upscale k, phase-align on the first ink pixel
    (block boundaries of an exact upscale), sample the k-grid down to
    the 1 px/pt frame, OCR there, and map line boxes back to FULL-frame
    pixel coords. Falls back to k=1 when the k attempt rejects.
    ``kk_fn`` optionally supplies the scale estimate (run-length gcd is
    rotation-invariant — quarter turns swap rows and columns and reverse
    them, preserving every run length — so orientation search computes
    it once per page, not once per rotation)."""
    if not b.any():
        return []
    def text_chars(lines: list[dict]) -> int:
        return sum(len(ln["text"]) for ln in lines if not ln.get("fig"))

    # 1 px/pt first: the common case. A CLEAN all-text parse wins
    # outright; otherwise (figure bands present — a scaled page reads
    # as mostly figures, a mixed page as text+figures) the gcd-scale
    # parse competes by recognized-character count, so a 2x page's
    # stray dot-sized fragments can never beat its real text.
    lines1 = _ocr_binary(b)
    score1 = text_chars(lines1)
    if score1 and not any(ln.get("fig") for ln in lines1):
        return lines1
    fallback = lines1 if score1 else []
    kk = kk_fn() if kk_fn is not None else _run_length_gcd(b)
    if kk <= 1:
        return fallback
    # phase-align on the first ink pixel (argmax of the any-profiles —
    # no full nonzero materialization): in an exact kk-upscale, ink
    # always starts on a block boundary
    phy = int(b.any(axis=1).argmax()) % kk
    phx = int(b.any(axis=0).argmax()) % kk
    sh = (b.shape[0] - phy) // kk
    sw = (b.shape[1] - phx) // kk
    if sh < 1 or sw < 1:
        return fallback
    win = b[phy:phy + sh * kk, phx:phx + sw * kk]
    sub = np.ascontiguousarray(win[::kk, ::kk])
    # verify the upscale hypothesis EXACTLY: every kk-block constant
    # (a solid photo blob passes the run-length gcd but fails here)
    if not (win.reshape(sh, kk, sw, kk)
            == sub[:, None, :, None]).all():
        return fallback
    lines = _ocr_binary(sub)
    if text_chars(lines) <= score1:
        return fallback
    for ln in lines:
        ln["x0"] = ln["x0"] * kk + phx
        ln["x1"] = ln["x1"] * kk + phx
        ln["y0"] = ln["y0"] * kk + phy
        ln["y1"] = ln["y1"] * kk + phy
    return lines


def ocr_page(img: np.ndarray) -> list[dict]:
    """Detect + recognize glyph-font text anywhere on a page bitmap, at
    any integer scan resolution (1 px/pt, 2x, 3x … — scale estimated
    from ink-run lengths). Returns one dict per text line — {"text",
    "x0", "x1", "y0", "y1"} in pixel coords of the full CELL-frame line
    box at the INPUT resolution — or [] when the image does not look
    like glyph-font text (photo/noise: some ink component exceeds the
    glyph cell, or a glyph pattern is beyond the Hamming cap), so
    callers can keep it as a figure."""
    if img.ndim == 3:
        img = img.mean(axis=2).astype(np.uint8)
    return _ocr_binary_scaled((img > 127).astype(np.uint8))


def _estimate_shear(b: np.ndarray, max_slope: float = 0.05,
                    steps: int = 101) -> float:
    """Skew estimate for a scanned page, in the small-angle shear model
    (each pixel column shifted vertically by round(x·slope) — how a
    slightly rotated sheet samples onto the scanner grid): pick the
    slope whose unshear concentrates ink into the fewest rows (maximum
    sum-of-squares of the row profile — the classic projection-profile
    deskew). The grid is i/1000 for |i| ≤ 50; ties prefer the smaller
    |slope|, so an unskewed page estimates exactly 0."""
    ys, xs = np.nonzero(b)
    if ys.size == 0:
        return 0.0
    ys = ys.astype(np.int64)
    xs = xs.astype(np.int64)
    best, best_score = 0.0, -1
    for slope in np.linspace(-max_slope, max_slope, steps):
        yy = ys - np.round(xs * slope).astype(np.int64)
        prof = np.bincount(yy - yy.min())
        score = int((prof.astype(np.int64) ** 2).sum())
        if score > best_score or (score == best_score
                                  and abs(slope) < abs(best)):
            best, best_score = round(float(slope), 6), score
    return best


def _unshear(b: np.ndarray, slope: float) -> np.ndarray:
    """Invert the column shear: column x shifts UP by round(x·slope)
    (exact integer shifts — the inverse of the scanner-skew model, so
    glyph patterns come back bit-identical when the slope is right)."""
    if not slope:
        return b
    h, w = b.shape
    d = np.round(np.arange(w) * slope).astype(np.int64)
    out = np.zeros_like(b)
    for dv in np.unique(d):
        cols = d == dv
        if dv >= 0:
            out[:h - dv, cols] = b[dv:, cols]
        else:
            out[-dv:, cols] = b[:h + dv, cols]
    return out


# a parse must recognize at least this many characters for the page to
# count as text at all — one or two stray glyph-shaped marks on a photo
# or line-art image must NOT convert the whole image into "text"
_MIN_PAGE_CHARS = 8


def ocr_page_oriented(img: np.ndarray) -> tuple[list[dict], int,
                                                tuple[int, int], float]:
    """Orientation-searching OCR for scanner feeds: try the page as-is,
    then 180 (upside-down feed), then 90/270 (sideways feed) — the role
    of the reference OCR's angle classifier — with a small-angle DESKEW
    fallback. Returns (lines, rot, (h, w), slope): ``lines`` in the
    CORRECTED (derotated + unsheared) frame of dimensions (h, w),
    ``rot`` the np.rot90 count and ``slope`` the shear that correct the
    input (apply rot90 then _unshear to map raw pixels into the
    corrected frame). Wrong orientations reject (the Hamming cap +
    _MIN_PAGE_CHARS) rather than read mirrored glyphs. A clean pure-
    text parse at ANY rotation returns immediately — wrong rotations
    never parse clean, so the first clean one is the answer."""
    if img.ndim == 3:
        img = img.mean(axis=2).astype(np.uint8)
    b = (img > 127).astype(np.uint8)
    if not b.any():
        return [], 0, b.shape, 0.0

    def text_score(lines: list[dict]) -> int:
        return sum(len(ln["text"]) for ln in lines if not ln.get("fig"))

    best: tuple[list[dict], int, tuple[int, int], float] = \
        ([], 0, b.shape, 0.0)
    best_score = 0
    # run-length gcd is rotation-invariant: compute at most once for all
    # four quarter-turn attempts (the deskew path recomputes — unshear
    # changes row runs)
    kk_cache: list[int] = []

    def kk_fn() -> int:
        if not kk_cache:
            kk_cache.append(_run_length_gcd(b))
        return kk_cache[0]

    for rot in (0, 2, 1, 3):
        rb = np.rot90(b, rot) if rot else b
        lines = _ocr_binary_scaled(rb, kk_fn)
        if not lines:
            continue
        score = text_score(lines)
        if score >= _MIN_PAGE_CHARS \
                and not any(ln.get("fig") for ln in lines):
            return lines, rot, rb.shape, 0.0
        if score > best_score:
            best, best_score = (lines, rot, rb.shape, 0.0), score
    # glyph text inks a few percent of the page; a dense image (photo,
    # dithered art) can never be skewed text — don't spend 4 shear
    # estimates rejecting it
    sparse = b.mean() <= 0.20
    if best_score < _MIN_PAGE_CHARS and sparse:
        # nothing substantial at any quarter turn (a skewed page often
        # still yields a stray glyph or two — hence a threshold, not
        # zero): try DESKEW — estimate the small-angle shear per
        # rotation, unshear, re-parse. Geometry comes back in the
        # DESKEWED frame (shifts are bounded by |slope|·width, well
        # inside the margins).
        for rot in (0, 2, 1, 3):
            rb = np.rot90(b, rot) if rot else b
            slope = _estimate_shear(rb)
            if not slope:
                continue
            lines = _ocr_binary_scaled(_unshear(rb, slope))
            score = text_score(lines)
            if score >= _MIN_PAGE_CHARS \
                    and not any(ln.get("fig") for ln in lines):
                return lines, rot, rb.shape, slope
            if score > best_score:
                best, best_score = (lines, rot, rb.shape, slope), score
    if best_score < _MIN_PAGE_CHARS:
        return [], 0, b.shape, 0.0
    return best


# pluggable core recognizer: None = the rule kernels below; an
# ONNX-backed stage (functions/vision_onnx.OnnxOcr, selected by
# ExtractConfig.layout_recognize="onnx") installs its det/rec pair here
# ONCE PER PROCESS/ACTOR — the reference's per-process model cache
# (deepdoc/vision/ocr.py:70-126) in Ray-worker form. Orientation
# search, deskew and DPI descaling above this point are shared by both
# backends.
_OCR_CORE = None


def set_core_ocr(fn) -> None:
    global _OCR_CORE
    _OCR_CORE = fn


def _ocr_binary(b: np.ndarray) -> list[dict]:
    """Core det/rec over a 1 px/pt binary page (see ocr_page). Bands
    that cannot be this font — taller than a glyph cell, a run wider
    than a cell, or a pattern beyond the Hamming cap — become FIGURE
    bands ({"fig": True} with the band's ink bbox) instead of rejecting
    the whole page: a real scan mixes photos with text, and the text
    must still read (the reference's layout model splits regions the
    same way). Callers gate on recognized-character counts — a page
    with only figure bands (or just stray glyph-shaped marks) is not
    glyph text at this scale/orientation."""
    if _OCR_CORE is not None:
        return _OCR_CORE(b)
    if not b.any():
        return []
    row_ink = b.any(axis=1)
    # detection, vertical: contiguous ink-row bands; a ≤1-row internal
    # blank (":"-only or "!"-only lines) merges, the ≥2-row inter-line
    # gap (PITCH_Y - CELL_H) splits
    bands: list[tuple[int, int]] = []
    idx = np.flatnonzero(row_ink)
    start = prev = int(idx[0])
    for y in idx[1:]:
        y = int(y)
        if y - prev > 2:
            bands.append((start, prev + 1))
            start = y
        prev = y
    bands.append((start, prev + 1))
    lines: list[dict] = []
    for by0, by1 in bands:
        band = b[by0:by1]
        col_ink = band.any(axis=0)
        cidx = np.flatnonzero(col_ink)

        def fig_band() -> dict:
            return {"text": "", "fig": True,
                    "x0": int(cidx[0]), "x1": int(cidx[-1]) + 1,
                    "y0": int(by0), "y1": int(by1)}

        if by1 - by0 > CELL_H:
            lines.append(fig_band())   # taller than any glyph: a photo
            continue
        runs: list[tuple[int, int]] = []
        rs = rp = int(cidx[0])
        for x in cidx[1:]:
            x = int(x)
            if x - rp > 1:
                runs.append((rs, rp + 1))
                rs = x
            rp = x
        runs.append((rs, rp + 1))
        # band-level tight bounds, vectorized: a run's x-extent is
        # ink-tight by construction (run edges ARE ink columns); its
        # y-extent is the min/max of per-column first/last ink rows —
        # two argmax passes for the whole band instead of a nonzero per
        # glyph (the recognition hot path)
        bh = band.shape[0]
        col_top = np.where(col_ink, band.argmax(axis=0), bh)
        col_bot = np.where(col_ink,
                           bh - band[::-1].argmax(axis=0), 0)
        pens: list[tuple[float, str]] = []   # (pen_x, char)
        frame_y0 = by1                        # min over glyph candidates
        bad = False
        for rx0, rx1 in runs:
            if rx1 - rx0 > CELL_W:
                bad = True     # wider than any glyph
                break
            gy0 = int(col_top[rx0:rx1].min())
            gy1 = int(col_bot[rx0:rx1].max())
            pat = np.ascontiguousarray(band[gy0:gy1, rx0:rx1])
            cls = _classify_tight(pat)
            if cls is None:
                bad = True     # beyond the Hamming cap
                break
            ch, tt, tl = cls
            pens.append((rx0 - tl, ch))
            frame_y0 = min(frame_y0, by0 + gy0 - tt)
        if bad:
            lines.append(fig_band())
            continue
        if not pens:
            continue
        chars = [pens[0][1]]
        for (px, ch), (qx, _c) in zip(pens[1:], pens[:-1]):
            n_sp = int(round((px - qx) / PITCH_X)) - 1
            chars.extend(" " * max(0, n_sp))
            chars.append(ch)
        lines.append({"text": "".join(chars),
                      "x0": int(pens[0][0]),
                      "x1": int(pens[-1][0]) + CELL_W,
                      "y0": int(frame_y0),
                      "y1": int(frame_y0) + CELL_H})
    return lines
