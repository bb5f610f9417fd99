"""Pure-Python baseline JPEG (JFIF) codec — no PIL.

The reference crops/concats real images via PIL (deepdoc/parser/
pdf_parser.py:1129-1208); this engine real-decodes in-band media with
stdlib+numpy codecs (functions/png.py, functions/gif.py). JPEG is the
third public image format the corpus carries, and the one real scanned
corpora are dominated by.

Encoder: baseline sequential (SOF0), grayscale or RGB (4:4:4 or 4:2:0
chroma), ITU T.81 Annex K luminance quantization scaled by the libjpeg
quality formula, Annex K.3 Huffman tables, FDCT as one einsum over all
8×8 blocks. Decoder: baseline sequential, 1- or 3-component, arbitrary
1/2 sampling factors, restart intervals; Huffman decode takes an 8-bit
peek LUT fast path, dequant+IDCT run vectorized over every block of a
component at once.

JPEG is lossy — roundtrip is NOT exact (unlike png/gif). Tests bound
PSNR and require the glyph rule-OCR (functions/glyphs.py, min-Hamming
classification) to survive quality ≥ 80 on rendered text.
"""

from __future__ import annotations

import struct

import numpy as np


def is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


# zigzag index k ↔ natural (row-major) position _ZIGZAG[k]  (T.81 fig. 5)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.intp)

# Annex K.1 luminance quantization table (natural order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    a[0] *= 1 / np.sqrt(2)
    return a


_A = _dct_matrix()


def _quant_table(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the Annex K table (natural order)."""
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip((_Q_LUM * scale + 50) // 100, 1, 255)


def _encode_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit packer with 0xFF → 0xFF 0x00 stuffing (F.1.2.3)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = self.n = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(category size, amplitude bits) per T.81 F.1.2.1."""
    size = int(v if v >= 0 else -v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(zz: np.ndarray, pred: int, writer: _BitWriter,
                  dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    nz = np.nonzero(zz[1:])[0] + 1
    k = 1
    for idx in nz:
        run = int(idx) - k
        while run >= 16:  # ZRL
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(int(zz[idx]))
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        k = int(idx) + 1
    if k < 64:  # EOB
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray, n_by: int, n_bx: int,
                  q_nat: np.ndarray) -> np.ndarray:
    """Pad a component plane to the block grid, FDCT + quantize every
    block at once → int32 (n_by, n_bx, 64) in ZIGZAG order."""
    h, w = plane.shape
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, n_by * 8 - h), (0, n_bx * 8 - w)), mode="edge")
    blocks = (padded.reshape(n_by, 8, n_bx, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    coeffs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T, optimize=True)
    quant = np.rint(coeffs.reshape(-1, 64) / q_nat[None, :])
    return quant[:, _ZIGZAG].astype(np.int32).reshape(n_by, n_bx, 64)


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.clip(p, 0, 255) for p in (y, cb, cr)]


def _box_down(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    padded = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
    hh, ww = padded.shape
    return padded.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def encode_jpeg(arr: np.ndarray, quality: int = 88,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Grayscale H×W or RGB H×W×3 uint8 → baseline JFIF bytes. Color uses
    4:4:4 chroma, or 4:2:0 with ``subsample=True``. One (luminance)
    quant/Huffman table set serves every component.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resync points a parallel decoder can split on)."""
    h, w = arr.shape[:2]
    q_nat = _quant_table(quality)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
        samplings = [(1, 1)]
    else:
        planes = _rgb_to_ycbcr(arr)
        samplings = [(2, 2), (1, 1), (1, 1)] if subsample \
            else [(1, 1), (1, 1), (1, 1)]
    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    comp_zz = []
    for plane, (sh, sv) in zip(planes, samplings):
        down = _box_down(plane, max_v // sv, max_h // sh)
        comp_zz.append(_plane_blocks(down, mcus_y * sv, mcus_x * sh, q_nat))

    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_done = 0
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_done \
                    and mcu_done % restart_interval == 0:
                writer.flush()
                writer.out += bytes((0xFF, 0xD0 + n_rst % 8))
                n_rst += 1
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samplings):
                for by in range(sv):
                    for bx in range(sh):
                        preds[ci] = _encode_block(
                            comp_zz[ci][my * sv + by, mx * sh + bx],
                            preds[ci], writer, dc_codes, ac_codes)
            mcu_done += 1
    writer.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00)
    out += bytes(q_nat.astype(np.uint8)[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(planes), 8,
                                     h, w, len(planes))
    for ci, (sh, sv) in enumerate(samplings):
        out += struct.pack("BBB", ci + 1, (sh << 4) | sv, 0)
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), cls << 4)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for ci in range(len(planes)):
        out += struct.pack("BB", ci + 1, 0x00)
    out += b"\x00\x3f\x00"
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------- decoder ----

def _decode_tables(bits, vals):
    """(256-entry peek LUT for codes ≤ 8 bits, {(length, code): symbol})."""
    lut: list[tuple[int, int] | None] = [None] * 256
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            table[(length, code)] = sym
            if length <= 8:
                prefix = code << (8 - length)
                for i in range(1 << (8 - length)):
                    lut[prefix | i] = (sym, length)
            code += 1
            k += 1
        code <<= 1
    return lut, table


class _BitReader:
    """MSB-first reader over destuffed entropy bytes; zero-pads at EOF
    (trailing pad bits of the last byte are never consumed as data — the
    MCU count bounds the scan loop)."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        self.n -= k
        val = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return val

    def symbol(self, lut, table) -> int:
        self._fill(8)
        ent = lut[(self.acc >> (self.n - 8)) & 0xFF]
        if ent is not None:
            sym, length = ent
            self.n -= length
            self.acc &= (1 << self.n) - 1
            return sym
        code = self.read(8)
        for length in range(9, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → grayscale (H, W) or RGB (H, W, 3) uint8.
    Handles 1- or 3-component scans, sampling factors, multiple
    DQT/DHT tables and restart intervals; progressive (SOF2) and
    arithmetic-coded streams are rejected."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    dc_tbl: dict[int, tuple] = {}
    ac_tbl: dict[int, tuple] = {}
    frame = None  # (h, w, [(comp_id, sh, sv, tq)])
    restart = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq:
                    vals = np.frombuffer(seg[o:o + 128], dtype=">u2")
                    o += 128
                else:
                    vals = np.frombuffer(seg[o:o + 64], dtype=np.uint8)
                    o += 64
                qtables[tq] = vals.astype(np.int64)  # zigzag order
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 15
                bits = tuple(seg[o + 1:o + 17])
                n = sum(bits)
                vals = tuple(seg[o + 17:o + 17 + n])
                (ac_tbl if cls else dc_tbl)[tid] = _decode_tables(bits, vals)
                o += 17 + n
        elif marker in (0xC0, 0xC1):
            _, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, samp, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                comps.append((cid, samp >> 4, samp & 15, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding (SOF 0x{marker:02x})")
        elif marker == 0xDD:
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tabs = {seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4,
                                          seg[2 + 2 * i] & 15)
                         for i in range(ns)}
            return _decode_scan(data, pos, frame, scan_tabs, qtables,
                                dc_tbl, ac_tbl, restart)
    raise ValueError("JPEG carries no scan")


def _destuff(data: bytes, pos: int) -> list[bytes]:
    """Entropy bytes from ``pos`` to EOI, split at restart markers."""
    intervals: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or next segment
            break
    intervals.append(bytes(cur))
    return intervals


def _decode_scan(data, pos, frame, scan_tabs, qtables, dc_tbl, ac_tbl,
                 restart) -> np.ndarray:
    fh, fw, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * max_h))
    mcus_y = -(-fh // (8 * max_v))
    intervals = _destuff(data, pos)
    reader = _BitReader(intervals[0])
    interval_i = 0
    preds = [0] * len(comps)
    zz_all = [np.zeros((mcus_y * sv * mcus_x * sh, 64), dtype=np.int64)
              for _, sh, sv, _ in comps]
    mcu_done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_done and mcu_done % restart == 0:
                interval_i += 1
                reader = _BitReader(intervals[interval_i])
                preds = [0] * len(comps)
            for ci, (cid, sh, sv, _) in enumerate(comps):
                dct, dtab = dc_tbl[scan_tabs[cid][0]]
                act, atab = ac_tbl[scan_tabs[cid][1]]
                for by in range(sv):
                    for bx in range(sh):
                        zz = zz_all[ci][(my * sv + by) * mcus_x * sh
                                        + mx * sh + bx]
                        s = reader.symbol(dct, dtab)
                        preds[ci] += _extend(reader.read(s), s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.symbol(act, atab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            zz[k] = _extend(reader.read(s), s)
                            k += 1
            mcu_done += 1

    planes = []
    for ci, (_, sh, sv, tq) in enumerate(comps):
        n_by, n_bx = mcus_y * sv, mcus_x * sh
        dq = zz_all[ci].astype(np.float64) * qtables[tq][None, :]
        nat = np.zeros_like(dq)
        nat[:, _ZIGZAG] = dq
        blocks = np.einsum("ij,njk,kl->nil", _A.T,
                           nat.reshape(-1, 8, 8), _A, optimize=True)
        plane = (blocks.reshape(n_by, n_bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(n_by * 8, n_bx * 8)) + 128.0
        # upsample to the full MCU grid, crop to frame size
        plane = np.repeat(np.repeat(plane, max_v // sv, axis=0),
                          max_h // sh, axis=1)[:fh, :fw]
        planes.append(plane)
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
