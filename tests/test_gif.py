"""GIF codec (functions/gif.py): pure-Python LZW, exact grayscale
roundtrip, animated frames, and the magic-sniffing decode dispatch that
lets every image stage accept PNG and GIF payloads interchangeably."""

import base64

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ragflow_core16_ray.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animated,
    is_gif,
)
from ragflow_core16_ray.functions.image_ops import (
    decode_image,
    decode_image_frames,
)


def test_gif_roundtrip_shapes():
    rng = np.random.default_rng(7)
    for shape in ((1, 1), (5, 7), (64, 64), (13, 257), (200, 300)):
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        data = encode_gif(a)
        assert is_gif(data) and data[:6] == b"GIF89a"
        assert np.array_equal(decode_gif(data), a)


def test_gif_lzw_dictionary_reset():
    # high-entropy image large enough that the LZW dict hits 4096 and
    # the encoder emits CLEAR mid-stream — roundtrip must stay exact
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(300, 500), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(a)), a)


def test_gif_low_entropy_long_runs():
    a = np.zeros((400, 400), np.uint8)
    a[::3] = 17
    a[:, ::5] = 200
    assert np.array_equal(decode_gif(encode_gif(a)), a)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=4000))
def test_lzw_roundtrip_fuzz(payload):
    idx = np.frombuffer(payload, dtype=np.uint8)
    assert _lzw_decode(_lzw_encode(idx), len(payload)) == payload


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_gif_roundtrip_fuzz(h, w, seed):
    a = np.random.RandomState(seed).randint(
        0, 256, size=(h, w)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(a)), a)


def test_animated_gif_roundtrip_and_delays():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(20, 30), dtype=np.uint8)
              for _ in range(4)]
    data = encode_gif_animated(frames, delay_ms=80)
    delays, out = decode_gif_frames(data)
    assert delays == [80] * 4
    assert all(np.array_equal(x, y) for x, y in zip(frames, out))
    # first frame via the still-image path
    assert np.array_equal(decode_gif(data), frames[0])


def test_static_gif_frames_contract():
    a = np.arange(35, dtype=np.uint8).reshape(5, 7)
    delays, frames = decode_gif_frames(encode_gif(a))
    assert delays == [0] and len(frames) == 1
    assert np.array_equal(frames[0], a)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"definitely not a gif")


def test_decode_image_dispatch_both_magics():
    from ragflow_core16_ray.functions.png import encode_apng, encode_png

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(decode_image(encode_png(a)), a)
    assert np.array_equal(decode_image(encode_gif(a)), a)
    d1, f1 = decode_image_frames(encode_apng([a, a + 1], delay_ms=40))
    d2, f2 = decode_image_frames(encode_gif_animated([a, a + 1],
                                                     delay_ms=40))
    assert d1 == d2 == [40, 40]
    assert np.array_equal(f1[1], f2[1])
    with pytest.raises(ValueError):
        decode_image(b"\x00" * 16)


def test_glyph_ocr_through_gif():
    from ragflow_core16_ray.functions.glyphs import (
        normalize_text,
        ocr_glyphs,
        render_text,
    )

    lines = [normalize_text("the quick brown fox"),
             normalize_text("jumps over lazy dogs 123")]
    img = render_text(lines)
    assert ocr_glyphs(decode_gif(encode_gif(img))) == ocr_glyphs(img)


def test_picture_template_gif_payload_chunks():
    """A GIF picture doc flows through the extract OCR path identically
    to a PNG one — the stage sniffs, never assumes a format."""
    from ragflow_core16_ray.functions.glyphs import (
        normalize_text,
        render_text,
    )
    from ragflow_core16_ray.sources.synth import (
        finalize_offsets,
        make_span,
    )
    from ragflow_core16_ray.stages.extract import extract_doc, route_template

    lines = [normalize_text("distributed systems need backpressure"),
             normalize_text("and bounded queues everywhere all day")]
    payload = base64.b64encode(encode_gif(render_text(lines))).decode()
    spans = finalize_offsets(
        [make_span("image", payload, "media://doc-gif-1/pic")])
    assert route_template(spans) == "picture"
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "picture"
    secs = [s["text"] for s in out if s["kind"] == "section"]
    assert secs == ["\n".join(lines)]  # OCR recovered the exact text
    assert any(s["kind"] == "image" for s in out)


def test_decode_gif_reads_only_frame_zero():
    """The still-image contract stops after one frame: decode_gif of an
    animation equals frame 0 and max_frames short-circuits the tail."""
    import numpy as np

    from ragflow_core16_ray.functions.gif import (decode_gif,
                                                  decode_gif_frames,
                                                  encode_gif_animated)

    frames = [np.full((6, 6), v, dtype=np.uint8) for v in (10, 90, 200)]
    raw = encode_gif_animated(frames, delay_ms=40)
    assert np.array_equal(decode_gif(raw), frames[0])
    delays, got = decode_gif_frames(raw, max_frames=2)
    assert len(got) == 2 and len(delays) == 2
