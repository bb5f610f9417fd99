"""Pure-Python Motion-JPEG AVI (RIFF) container codec — no ffmpeg.

The first REAL video path in the engine: AVI is a plain RIFF chunk tree
(like WAV, functions/wav.py) and MJPEG frames are baseline JPEGs
(functions/jpeg.py), so a full video decode needs no native media stack.
FrameSampler (pipelines/multimodal.py) real-decodes these payloads the
same way it does APNG/animated-GIF; compressed codecs (H.264 etc.) would
still need ffmpeg and keep the documented fake probe.

Encoder writes RIFF('AVI ') → LIST hdrl (avih + one 'vids'/'MJPG'
stream: strh + BITMAPINFOHEADER strf) → LIST movi ('00dc' chunk per
frame) → idx1. Decoder walks the chunk tree, takes fps from
strh.dwRate/dwScale and decodes every '00dc'/'00db' chunk. Frame
timing is exact (integer ms per frame); pixels are JPEG-lossy.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25,
                     quality: int = 88) -> bytes:
    """Grayscale H×W uint8 frames → MJPEG AVI at ``fps`` (dwScale=1, so
    per-frame time is exactly 1000/fps ms — pick fps dividing 1000 for
    integer timestamps)."""
    from .jpeg import encode_jpeg

    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack("<10I", 1_000_000 // fps, max_bytes * fps, 0,
                       0x10,  # AVIF_HASINDEX
                       len(frames), 0, 1, max_bytes, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps,  # dwScale, dwRate
                                            0, len(frames), max_bytes,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body),
                                     len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_body))

    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int, out: dict) -> None:
    pos = start
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        payload_at = pos + 8
        if tag == b"LIST":
            _walk(data, payload_at + 4, payload_at + size, out)
        elif tag == b"strh":
            if data[payload_at:payload_at + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", data,
                                                 payload_at + 20)
                out["fps"] = (rate / scale) if scale else 25.0
        elif tag[2:] in (b"dc", b"db") and tag[:2].isdigit():
            out.setdefault("frames", []).append(
                data[payload_at:payload_at + size])
        pos = payload_at + size + (size % 2)


def decode_avi(data: bytes,
               first_only: bool = False) -> tuple[float, list[np.ndarray]]:
    """MJPEG AVI bytes → (fps, decoded grayscale/RGB frames).
    ``first_only`` decodes just frame 0 — the still-image contract
    (OCR/feature paths) must not pay N Huffman+IDCT passes for one
    frame."""
    from .jpeg import decode_jpeg

    if not is_avi(data):
        raise ValueError("not an AVI")
    found: dict = {}
    _walk(data, 12, 12 + struct.unpack_from("<I", data, 4)[0] - 4, found)
    raw = found.get("frames", [])
    if not raw:
        raise ValueError("AVI carries no video chunks")
    if first_only:
        raw = raw[:1]
    return float(found.get("fps", 25.0)), [decode_jpeg(j) for j in raw]


def decode_avi_frames(data: bytes) -> tuple[list[int], list[np.ndarray]]:
    """FrameSampler contract (same shape as png.decode_apng /
    gif.decode_gif_frames): (per-frame delay ms, frames). MJPEG timing is
    uniform: every frame lasts round(1000/fps) ms."""
    fps, frames = decode_avi(data)
    delay = max(1, round(1000.0 / fps))
    return [delay] * len(frames), frames
