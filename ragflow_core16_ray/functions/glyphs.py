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
