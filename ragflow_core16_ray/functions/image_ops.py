"""Image array operations — pure numpy (no PIL in this container).

The reference manipulates PIL Images: crop with margin
(deepdoc/parser/pdf_parser.py:1129-1208 ``crop``), rotated-crop via
perspective transform for tilted OCR boxes (deepdoc/vision/ocr.py:561-594
``get_rotate_crop_image``), and vertical concatenation of chunk images
(rag/nlp/__init__.py:557-574 ``concat_img``). Here the same operations are
implemented over decoded ``HxWxC`` uint8 numpy arrays — the form a real
decoder (the swap-in point documented in pipelines/multimodal.py) would
hand to a vision model anyway. Axis-aligned semantics are exact; the
reference's arbitrary-angle perspective warp needs cv2, so rotation is
provided in exact 90° steps plus the crop of the rotated box's bounding
rect (documented substitution).
"""

from __future__ import annotations

import numpy as np


def crop(img: np.ndarray, x0: int, top: int, x1: int, bottom: int,
         margin: int = 0) -> np.ndarray:
    """Axis-aligned crop with optional margin, clamped to the image
    (pdf_parser.py crop semantics: the box is widened by ``margin`` and
    intersected with the page)."""
    h, w = img.shape[:2]
    x0 = max(0, int(x0) - margin)
    top = max(0, int(top) - margin)
    x1 = min(w, int(x1) + margin)
    bottom = min(h, int(bottom) + margin)
    if x1 <= x0 or bottom <= top:
        return img[0:0, 0:0]
    return img[top:bottom, x0:x1]


def rotate90(img: np.ndarray, turns: int = 1) -> np.ndarray:
    """Rotate by exact 90° steps (counter-clockwise, like np.rot90).
    The reference rotates tall OCR crops by 90° when h/w ≥ 1.5
    (ocr.py:590-593); that check is `maybe_rotate` below."""
    return np.rot90(img, k=turns % 4, axes=(0, 1))


def maybe_rotate(img: np.ndarray, ratio: float = 1.5) -> np.ndarray:
    """ocr.py:590-593: a crop much taller than wide is rotated upright
    before recognition."""
    h, w = img.shape[:2]
    return rotate90(img) if w > 0 and h / w >= ratio else img


def vertical_concat(images: list[np.ndarray],
                    fill: int = 255) -> np.ndarray:
    """Stack images vertically on a common width (the max), padding
    narrower ones with ``fill`` — rag/nlp/__init__.py:557-574 concat_img
    (PIL pastes onto a white canvas of the max width)."""
    images = [im for im in images if im.size]
    if not images:
        return np.zeros((0, 0, 3), dtype=np.uint8)
    if any(im.ndim == 3 for im in images):
        # mixed grayscale/color input: promote 2D frames to 3-channel so
        # padding and concat see one rank
        nch = max(im.shape[2] for im in images if im.ndim == 3)
        images = [im if im.ndim == 3
                  else np.repeat(im[:, :, None], nch, axis=2)
                  for im in images]
    width = max(im.shape[1] for im in images)
    rows = []
    for im in images:
        h, w = im.shape[:2]
        if w < width:
            pad_shape = ((0, 0), (0, width - w)) + (((0, 0),) if im.ndim == 3
                                                    else ())
            im = np.pad(im, pad_shape, constant_values=fill)
        rows.append(im)
    return np.concatenate(rows, axis=0)


def resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize to (out_h, out_w) — the vision-model
    input-normalization step (the reference resizes via PIL/cv2 before
    the ONNX detectors, e.g. deepdoc/vision/operators.py resize ops;
    nearest-neighbor is the deterministic pure-numpy substitution).
    Index map uses the standard floor((i+0.5)·scale) pixel-center rule,
    so the result is identical for any chunking of the batch."""
    if out_h <= 0 or out_w <= 0 or img.size == 0:
        shape = (max(out_h, 0), max(out_w, 0)) + img.shape[2:]
        return np.zeros(shape, dtype=img.dtype)
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h)
                      .astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w)
                      .astype(np.int64), w - 1)
    return img[rows[:, None], cols[None, :]]


def decode_image(data: bytes) -> np.ndarray:
    """Magic-sniffing still-image decode: PNG (functions/png.py), GIF
    (functions/gif.py) or baseline JPEG (functions/jpeg.py) →
    grayscale/array uint8. The decode stages accept any in-band format
    the corpus carries; callers never hardcode one."""
    from .avi import decode_avi, is_avi
    from .gif import decode_gif, is_gif
    from .jpeg import decode_jpeg, is_jpeg
    from .png import _SIG, decode_png

    if data[:8] == _SIG:
        return decode_png(data)
    if is_gif(data):
        return decode_gif(data)
    if is_jpeg(data):
        return decode_jpeg(data)
    if is_avi(data):  # video: still-image contract = first frame ONLY
        return decode_avi(data, first_only=True)[1][0]
    raise ValueError("unrecognized image magic")


def decode_image_frames(data: bytes) -> tuple[list[int], list[np.ndarray]]:
    """Magic-sniffing animation/video decode: APNG (acTL/fcTL/fdAT),
    animated GIF or MJPEG-AVI → (per-frame delay ms, frames). Static
    images of any supported format (incl. JPEG, which has no animation)
    come back as ([0], [frame])."""
    from .avi import decode_avi_frames, is_avi
    from .gif import decode_gif_frames, is_gif
    from .jpeg import decode_jpeg, is_jpeg
    from .png import _SIG, decode_apng

    if data[:8] == _SIG:
        return decode_apng(data)
    if is_gif(data):
        return decode_gif_frames(data)
    if is_jpeg(data):
        return [0], [decode_jpeg(data)]
    if is_avi(data):
        return decode_avi_frames(data)
    raise ValueError("unrecognized image magic")
