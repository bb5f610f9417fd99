"""Pure-Python GIF87a/89a codec (grayscale, full LZW) — no PIL.

The reference crops/concats real images via PIL (deepdoc/parser/
pdf_parser.py:1129-1208); this engine real-decodes in-band media with
stdlib+numpy codecs instead (see functions/png.py for PNG/APNG). GIF is
the second public image format carried by the synthetic corpus's picture
archetype, so the decode-dispatch path is exercised on more than one
magic.

Encoder writes a 256-entry grayscale global color table and GIF LZW
image data (variable 9→12-bit codes, LSB-first bit packing, 4096-entry
dictionary reset via CLEAR, ≤255-byte sub-blocks). Animated GIFs carry
NETSCAPE2.0 looping plus a Graphic Control Extension per frame (delay in
centiseconds — callers must use multiples of 10 ms for exact roundtrip).
Decoder handles both and the KwKwK LZW corner case.

Grayscale roundtrip is EXACT: palette entry i is (i, i, i), so index ==
intensity and LZW is lossless.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _MAGICS


# ------------------------------------------------------------- LZW ----

_CLEAR = 256
_EOI = 257
_MAX_CODE = 4096


def _lzw_encode(indices: np.ndarray) -> bytes:
    """GIF-flavor LZW over 8-bit symbols: emit CLEAR, grow code width
    9→12 bits, reset the dictionary at 4096 entries (the decoder-
    compatible convention), finish with EOI. LSB-first bit packing."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = 9
    table: dict[int, int] = {}
    next_code = _EOI + 1
    emit(_CLEAR, width)
    data = indices.tobytes()
    if not data:
        emit(_EOI, width)
    else:
        prefix = data[0]
        for byte in data[1:]:
            key = (prefix << 8) | byte
            code = table.get(key)
            if code is not None:
                prefix = code
                continue
            emit(prefix, width)
            table[key] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
            if next_code >= _MAX_CODE:
                emit(_CLEAR, width)
                table.clear()
                next_code = _EOI + 1
                width = 9
            prefix = byte
        emit(prefix, width)
        emit(_EOI, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    """Inverse of _lzw_encode, incl. the KwKwK case (code == next slot)."""
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def read() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return _EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while len(out) < n_expected:
        code = read()
        if code == _EOI:
            break
        if code == _CLEAR:
            del table[_EOI + 1:]
            width = 9
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # width grows when the NEXT code would not fit; the encoder
            # grows after assigning next_code, mirror that exactly
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        pos += n


# ---------------------------------------------------------- encoder ----

def _screen(w: int, h: int) -> bytes:
    # packed 0xF7: global table present, color resolution 8, 256 entries
    gct = bytes(v for i in range(256) for v in (i, i, i))
    return struct.pack("<6sHHBBB", b"GIF89a", w, h, 0xF7, 0, 0) + gct


def _image_data(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    return desc + bytes([8]) + _sub_blocks(
        _lzw_encode(np.ascontiguousarray(arr, dtype=np.uint8).ravel()))


def encode_gif(arr: np.ndarray) -> bytes:
    """Grayscale H×W uint8 → single-frame GIF89a (exact roundtrip)."""
    h, w = arr.shape
    return _screen(w, h) + _image_data(arr) + b"\x3b"


def encode_gif_animated(frames: list[np.ndarray],
                        delay_ms: int = 100) -> bytes:
    """Grayscale frames → looping animated GIF89a. GIF delays are
    centiseconds; delay_ms must be a multiple of 10 for exact
    roundtrip."""
    h, w = frames[0].shape
    out = bytearray(_screen(w, h))
    # NETSCAPE2.0 infinite loop
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delay_cs = max(1, delay_ms // 10)
    for f in frames:
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delay_cs, 0, 0)
        out += _image_data(f)
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------- decoder ----

def decode_gif_frames(data: bytes,
                      max_frames: int | None = None
                      ) -> tuple[list[int], list[np.ndarray]]:
    """GIF bytes → (per-frame delay ms, grayscale uint8 frames). Static
    GIFs return ([0], [frame]). Frames with a local color table or
    interlacing are rejected (the encoder never writes them).
    ``max_frames`` stops LZW work after that many frames (the
    still-image contract reads only frame 0)."""
    if not is_gif(data):
        raise ValueError("not a GIF")
    w, h, packed = struct.unpack_from("<HHB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(
            data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    delays: list[int] = []
    frames: list[np.ndarray] = []
    next_delay = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            blocks, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(blocks) >= 3:
                next_delay = struct.unpack_from("<H", blocks, 1)[0] * 10
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fpacked & 0x80:
            raise ValueError("local color tables unsupported")
        if fpacked & 0x40:
            raise ValueError("interlaced GIFs unsupported")
        min_code = data[pos]
        pos += 1
        if min_code != 8:
            raise ValueError("only 8-bit LZW streams supported")
        payload, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(_lzw_decode(payload, fw * fh),
                            dtype=np.uint8).reshape(fh, fw)
        if palette is not None:
            gray = palette[idx.ravel().astype(np.intp), 0].reshape(fh, fw)
        else:
            gray = idx
        frames.append(gray.copy())
        delays.append(next_delay)
        next_delay = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF carries no image data")
    if len(frames) == 1 and delays == [0]:
        pass  # static: keep [0]
    return delays, frames


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF as grayscale uint8 (the OCR-path contract,
    same shape as png.decode_png). Stops after one frame — no LZW work
    on an animation's tail."""
    return decode_gif_frames(data, max_frames=1)[1][0]
