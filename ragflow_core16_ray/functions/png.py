"""Pure-Python PNG codec (zlib + numpy) — the sandbox has no PIL, so this
is the real decode kernel behind the picture template and the media
feature stage (role of the reference's ``Image.open`` entry points,
rag/app/picture.py:33 and deepdoc/parser/pdf_parser.py:1129-1208).

Scope: non-interlaced, bit depth 8, color types 0 (grayscale), 2 (RGB),
4 (gray+alpha) and 6 (RGBA). All five scanline filters decode; the
encoder always emits filter 0 (None) — deterministic output bytes for a
given array, which the synthetic corpus relies on.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H,W) grayscale or (H,W,3|4) color → PNG bytes.
    Filter 0 on every scanline; zlib level 6. Deterministic."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, h, w = 0, *arr.shape
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color_type = 2 if arr.shape[2] == 3 else 6
        h, w = arr.shape[:2]
        flat = arr.reshape(h, -1)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.empty((h, flat.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None
    raw[:, 1:] = flat
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) \
        + _chunk(b"IEND", b"")


def encode_apng(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """Animated PNG (APNG, the public PNG extension): acTL + per-frame
    fcTL, frame 0 in IDAT, later frames in fdAT. All frames full-canvas,
    same shape/dtype rules as :func:`encode_png`. Deterministic."""
    if not frames:
        raise ValueError("need at least one frame")
    first = np.ascontiguousarray(frames[0], dtype=np.uint8)
    if any(f.shape != first.shape for f in frames):
        raise ValueError("all APNG frames must share the canvas shape")
    base = encode_png(first)
    # split the single-frame PNG: [sig+IHDR][IDAT][IEND]
    ihdr_end = 8 + 12 + 13
    idat = base[ihdr_end:-12]
    h, w = first.shape[:2]

    def fctl(seq: int, frame_idx: int) -> bytes:
        return _chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, delay_ms, 1000, 0, 0))

    out = bytearray(base[:ihdr_end])
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    out += fctl(seq, 0)
    seq += 1
    out += idat
    for f in frames[1:]:
        out += fctl(seq, 0)
        seq += 1
        raw = encode_png(np.ascontiguousarray(f, dtype=np.uint8))
        payload = raw[ihdr_end + 8:-12 - 4]  # IDAT chunk data only
        out += _chunk(b"fdAT", struct.pack(">I", seq) + payload)
        seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(data: bytes) -> tuple[list[int], list[np.ndarray]]:
    """APNG bytes → (per-frame delay_ms list, frames). A plain PNG
    (no acTL) decodes as one frame with delay 0. Only full-canvas frames
    decode (x=y=0, frame dims == IHDR dims — what our encoder emits);
    sub-region frames raise ValueError."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr = 8, None
    frames_raw: list[tuple[int, list[bytes]]] = []  # (delay_ms, payloads)
    animated = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"acTL":
            animated = True
        elif tag == b"fcTL":
            _, fw, fh, x, y, d_num, d_den, _, _ = struct.unpack(
                ">IIIIIHHBB", payload)
            if ihdr and (fw != ihdr[0] or fh != ihdr[1] or x or y):
                raise ValueError("sub-region APNG frames unsupported")
            delay = (d_num * 1000 // d_den) if d_den else d_num * 10
            frames_raw.append((delay, []))
        elif tag == b"IDAT":
            if not frames_raw:
                frames_raw.append((0, []))
            frames_raw[0][1].append(payload)
        elif tag == b"fdAT":
            if frames_raw:
                frames_raw[-1][1].append(payload[4:])  # strip seq number
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("truncated PNG (missing IHDR)")
    if not animated:
        return [0], [decode_png(data)]
    w, h, depth, color_type = ihdr[0], ihdr[1], ihdr[2], ihdr[3]
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError("unsupported APNG variant")
    ch = _CHANNELS[color_type]
    stride = w * ch
    delays, frames = [], []
    for delay, payloads in frames_raw:
        if not payloads:
            continue
        raw = np.frombuffer(zlib.decompress(b"".join(payloads)),
                            dtype=np.uint8)
        if raw.size != h * (stride + 1):
            raise ValueError("APNG frame size mismatch")
        out = _unfilter(raw, h, stride, ch)
        frames.append(out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch))
        delays.append(delay)
    return delays, frames


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (PNG spec §9). Rows whose filter is
    0/2 stay vectorized; 1/3/4 need the sequential per-pixel pass."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            out[y] = cur
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = cur
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (H,W) for grayscale, (H,W,C) otherwise."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp or filt or interlace or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color_type} "
            f"interlace={interlace})")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = _unfilter(raw, h, stride, ch)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
