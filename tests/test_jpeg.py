"""Baseline JPEG codec (functions/jpeg.py) — lossy, so the bounds are
PSNR + OCR survival rather than the exact roundtrips png/gif get."""

import numpy as np
import pytest

from ragflow_core16_ray.functions.glyphs import (normalize_text, ocr_glyphs,
                                                 render_text)
from ragflow_core16_ray.functions.image_ops import (decode_image,
                                                    decode_image_frames)
from ragflow_core16_ray.functions.jpeg import (_extend, _magnitude,
                                               decode_jpeg, encode_jpeg,
                                               is_jpeg)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(yy / 9.0) + np.cos(xx / 13.0) + 2) / 4 * 255) \
        .astype(np.uint8)


def test_gray_roundtrip_psnr():
    img = _gradient(120, 200)
    dec = decode_jpeg(encode_jpeg(img, quality=88))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) > 40


def test_odd_dimensions_crop_back():
    img = _gradient(13, 21)  # not multiples of 8
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (13, 21)
    assert _psnr(img, dec) > 35


def test_quality_orders_fidelity_and_size():
    img = _gradient(64, 64)
    lo, hi = encode_jpeg(img, quality=30), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(img, decode_jpeg(lo)) < _psnr(img, decode_jpeg(hi))


def test_glyph_ocr_survives_lossy_roundtrip():
    lines = ["HELLO WORLD 123", "RAY DATA ENGINE", "QUICK BROWN FOX"]
    img = render_text(lines)
    dec = decode_jpeg(encode_jpeg(img, quality=88))
    assert ocr_glyphs(dec) == "\n".join(normalize_text(ln) for ln in lines)


def test_color_444_and_420():
    g = _gradient(48, 72)
    rgb = np.stack([g, g[::-1], np.roll(g, 7, axis=1)], axis=2)
    full = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert full.shape == rgb.shape
    assert _psnr(rgb, full) > 40
    sub = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=True))
    assert sub.shape == rgb.shape
    assert _psnr(rgb, sub) > 28  # chroma halved: looser bound


def test_restart_intervals_decode_identically():
    img = _gradient(80, 80)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = encode_jpeg(img, quality=85, restart_interval=3)
    assert rst.count(b"\xff\xdd") == 1  # DRI present
    assert np.array_equal(decode_jpeg(rst), plain)


def test_extreme_blocks_at_quality_100():
    # q=1 tables: DC diffs near the ±2040 categorical ceiling and dense
    # AC energy — the largest magnitude categories the tables carry
    img = np.zeros((32, 32), dtype=np.uint8)
    img[8:16, :] = 255
    img[:, 8:16] ^= 255
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert _psnr(img, dec) > 30


def test_magnitude_extend_roundtrip():
    for v in list(range(-260, 261)) + [-2040, -1023, 1023, 2040]:
        size, bits = _magnitude(v)
        assert _extend(bits, size) == v


def test_magic_and_rejections():
    img = _gradient(16, 16)
    enc = encode_jpeg(img)
    assert is_jpeg(enc)
    from ragflow_core16_ray.functions.gif import encode_gif
    from ragflow_core16_ray.functions.png import encode_png
    assert not is_jpeg(encode_png(img))
    assert not is_jpeg(encode_gif(img))
    # progressive (SOF2) is rejected, not mis-decoded
    bad = bytearray(enc)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="unsupported"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no scan


def test_dispatch_sniffs_jpeg():
    img = _gradient(24, 40)
    enc = encode_jpeg(img, quality=92)
    assert _psnr(img, decode_image(enc)) > 35
    delays, frames = decode_image_frames(enc)
    assert delays == [0] and len(frames) == 1
    assert frames[0].shape == img.shape


# ------------------------------------------------------- fuzz bounds ----

from hypothesis import example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(st.integers(0, 2**32 - 1), st.integers(9, 40), st.integers(9, 40),
       st.sampled_from([60, 75, 88, 95]))
@settings(max_examples=40, deadline=None)
# hard 1-vs-212 step inside one 8x8 block: PSNR 24.7 at q60 (27.5 at
# q75, 42.2 at q95 — monotone, so quantization loss, not a codec bug)
@example(seed=2_830_863_492, h=10, w=10, quality=60)
def test_fuzz_roundtrip_psnr(seed, h, w, quality):
    rng = np.random.RandomState(seed)
    # smooth random field (JPEG's design domain — white noise would
    # legitimately crush PSNR at low quality)
    img = rng.randint(0, 256, (4, 4)).astype(np.float64)
    img = np.clip(np.kron(img, np.ones((h // 4 + 1, w // 4 + 1)))[:h, :w],
                  0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    # q60's coarse quant table legitimately dips to ~24-25 dB on
    # block-step content; mid/high qualities must clear 25
    assert _psnr(img, dec) > (23 if quality <= 60 else 25)


@given(st.integers(0, 2**32 - 1), st.integers(2, 400))
@settings(max_examples=60, deadline=None)
def test_fuzz_truncation_never_hangs(seed, cut):
    """A truncated/garbled stream must raise or return — bounded either
    way (the bit reader zero-pads at EOF and the MCU loop is counted, so
    no input can spin)."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    enc = bytearray(encode_jpeg(img, quality=80))
    cut = min(cut, len(enc) - 1)
    try:
        decode_jpeg(bytes(enc[:cut]))
    except Exception:
        pass  # any exception is fine; hanging or exiting is not


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_fuzz_bitflip_never_hangs(seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    enc = bytearray(encode_jpeg(img, quality=80))
    for _ in range(3):
        enc[rng.randint(2, len(enc))] ^= 1 << rng.randint(8)
    try:
        out = decode_jpeg(bytes(enc))
        assert out.dtype == np.uint8
    except Exception:
        pass
