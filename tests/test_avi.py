"""MJPEG-AVI container codec (functions/avi.py): container fields are
exact, pixels are JPEG-lossy."""

import numpy as np
import pytest

from ragflow_core16_ray.functions.avi import (decode_avi, decode_avi_frames,
                                              encode_avi_mjpeg, is_avi)
from ragflow_core16_ray.functions.image_ops import (decode_image,
                                                    decode_image_frames)


def _frames(n=4, h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((np.sin(yy / 5.0) + np.cos(xx / 7.0) + 2) / 4 * 255) \
        .astype(np.uint8)
    return [((base.astype(np.int32) * (n - k)) // n).astype(np.uint8)
            for k in range(n)]


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_roundtrip_container_exact_pixels_lossy():
    frames = _frames(5)
    raw = encode_avi_mjpeg(frames, fps=25)
    assert is_avi(raw)
    fps, got = decode_avi(raw)
    assert fps == 25.0
    assert len(got) == 5
    for want, have in zip(frames, got):
        assert have.shape == want.shape
        assert _psnr(want, have) > 38


def test_frame_table_contract():
    frames = _frames(3)
    delays, got = decode_avi_frames(encode_avi_mjpeg(frames, fps=8))
    assert delays == [125, 125, 125]  # round(1000/8)
    assert len(got) == 3


def test_dispatch_sniffs_avi():
    frames = _frames(3)
    raw = encode_avi_mjpeg(frames, fps=25)
    first = decode_image(raw)  # still-image contract: frame 0
    assert _psnr(frames[0], first) > 38
    delays, got = decode_image_frames(raw)
    assert delays == [40, 40, 40] and len(got) == 3


def test_rejections():
    assert not is_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00AVI ")  # no video chunks
    from ragflow_core16_ray.functions.wav import encode_wav
    wav = encode_wav(np.zeros(100, dtype=np.int16), 8000)
    assert not is_avi(wav)


def test_glyph_ocr_survives_mjpeg():
    from ragflow_core16_ray.functions.glyphs import (normalize_text,
                                                     ocr_glyphs, render_text)
    lines = ["MOTION JPEG AVI", "FRAME ZERO TEXT"]
    img = render_text(lines)
    fades = [(img.astype(np.int32) * 2 // 3).astype(np.uint8)]
    raw = encode_avi_mjpeg([img] + fades, fps=25)
    assert ocr_glyphs(decode_image(raw)) == \
        "\n".join(normalize_text(ln) for ln in lines)


# ------------------------------------------------------- fuzz bounds ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(st.integers(0, 2**32 - 1), st.integers(1, 6),
       st.sampled_from([8, 10, 20, 25]))
@settings(max_examples=25, deadline=None)
def test_fuzz_container_fields_exact(seed, n, fps):
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (16, 16)).astype(np.uint8)
              for _ in range(n)]
    got_fps, got = decode_avi(encode_avi_mjpeg(frames, fps=fps))
    assert got_fps == float(fps)
    assert len(got) == n
    assert all(f.shape == (16, 16) for f in got)


@given(st.integers(0, 2**32 - 1), st.integers(12, 300))
@settings(max_examples=40, deadline=None)
def test_fuzz_truncation_never_hangs(seed, cut):
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (8, 8)).astype(np.uint8)
              for _ in range(2)]
    enc = encode_avi_mjpeg(frames, fps=25)
    try:
        decode_avi(enc[:min(cut, len(enc) - 1)])
    except Exception:
        pass
