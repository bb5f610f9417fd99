"""Picture template: real PNG codec (functions/png.py), glyph rule-OCR
(functions/glyphs.py), the picture chunker (rag/app/picture.py:31-60
minus the CV-LLM), and the real decode path in media_features."""

import base64
import struct
import zlib

import numpy as np
import pytest

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.glyphs import (normalize_text, ocr_glyphs,
                                                 render_text)
from ragflow_core16_ray.functions.png import decode_png, encode_png
from ragflow_core16_ray.schemas import finalize_offsets, make_span
from ragflow_core16_ray.stages.extract import extract_doc, route_template


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.RandomState(7)
    for shape in [(13, 29), (7, 11, 3), (5, 9, 4), (1, 1), (2, 3, 3)]:
        a = rng.randint(0, 256, shape).astype(np.uint8)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and (b == a).all()


def test_png_decode_all_filter_types():
    # hand-build a PNG whose scanlines cycle filters 0..4 (spec §9)
    h, w = 6, 8
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

    raw = bytearray()
    prev = np.zeros(w, np.int32)
    for y in range(h):
        f = y % 5
        line = img[y].astype(np.int32)
        enc = line.copy()
        if f == 1:
            for x in range(w - 1, 0, -1):
                enc[x] = (enc[x] - line[x - 1]) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            for x in range(w):
                left = line[x - 1] if x else 0
                enc[x] = (line[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                ul = int(prev[x - 1]) if x else 0
                enc[x] = (line[x] - paeth(left, int(prev[x]), ul)) & 0xFF
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prev = line

    def chunk(tag, pl):
        return (struct.pack(">I", len(pl)) + tag + pl
                + struct.pack(">I", zlib.crc32(tag + pl) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert (decode_png(data) == img).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_glyph_ocr_roundtrip():
    msgs = ["HELLO WORLD", "RAY DATA ENGINE 42", "OCR: TEST-1, TWO!", "A?"]
    img = render_text(msgs)
    assert ocr_glyphs(img) == "\n".join(
        normalize_text(m).rstrip() for m in msgs)
    # survives a PNG encode/decode roundtrip
    assert ocr_glyphs(decode_png(encode_png(img))) == ocr_glyphs(img)


def _picture_spans(lines, doc_id="doc-picture-00000001"):
    payload = base64.b64encode(encode_png(render_text(lines))).decode()
    return finalize_offsets(
        [make_span("image", payload, f"media://{doc_id}/pic")])


def test_picture_template_long_text_one_chunk():
    lines = ["STREAM BATCH TABLE SCAN MERGE SORT JOIN",
             "FILTER WINDOW GROUP KEY VALUE COLUMN ROW",
             "VECTOR HASH RANGE SHARD BLOCK SPILL ACTOR"]
    spans = _picture_spans(lines)
    assert route_template(spans) == "picture"
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "picture"
    secs = [s["text"] for s in out if s["kind"] == "section"]
    assert secs == ["\n".join(lines)]  # OCR recovered the exact text
    assert any(s["kind"] == "image" for s in out)  # payload kept with doc


def test_picture_template_short_text_no_chunk():
    # ≤32 chars and ≤32 words: the reference hands this to the CV LLM
    # (picture.py:42-56, out of scope) → no text chunk, media ref only
    _, out, _ = extract_doc(_picture_spans(["TINY CAPTION"]))
    assert [s["kind"] for s in out if s["kind"] == "section"] == []
    assert any(s["kind"] == "image" for s in out)


def test_picture_template_undecodable_payload_keeps_ref():
    spans = finalize_offsets(
        [make_span("image", base64.b64encode(b"junk").decode(),
                   "media://doc-x/pic")])
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "picture"
    assert [s["kind"] for s in out] == ["image"]


def test_picture_override_non_image_doc_refs_only():
    # the reference raises NotImplementedError for non-image files; the
    # corpus-wide override degrades them to media refs, no text chunks
    spans = [make_span("text", "plain prose " * 20, offset=0),
             make_span("image", "", "media://doc-y/f1")]
    tmpl, out, _ = extract_doc(finalize_offsets(spans),
                               ExtractConfig(template_override="picture"))
    assert tmpl == "picture"
    assert all(s["kind"] in ("image", "figure") for s in out)


def test_media_features_real_png_decode():
    from ragflow_core16_ray.pipelines.multimodal import MediaFeatures

    img = render_text(["ABC DEF GHI"])
    payload = base64.b64encode(encode_png(img)).decode()
    mf = MediaFeatures()
    w, h, feat = mf.decode_real(base64.b64decode(payload))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert feat.shape == (16,) and abs(float(np.linalg.norm(feat)) - 1) < 1e-6
    # histogram of a binary glyph image loads only the first and last bins
    assert feat[0] > 0 and feat[-1] > 0 and float(feat[1:-1].sum()) == 0.0


# ---------------------------------------------------------- audio/WAV ----

def test_wav_roundtrip_and_unknown_chunks():
    import struct

    from ragflow_core16_ray.functions.wav import (decode_wav, encode_wav,
                                                  rms_of)

    s = (np.sin(np.arange(8000) / 8000 * 2 * np.pi * 440) * 20000) \
        .astype(np.int16)
    rate, out = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and (out == s).all()
    # LIST metadata chunk between fmt and data must be skipped by size
    raw = encode_wav(s, 8000)
    fmt_end = 12 + 8 + 16
    meta = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:fmt_end] + meta + raw[fmt_end:]
    patched = bytearray(patched)
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    rate2, out2 = decode_wav(bytes(patched))
    assert rate2 == 8000 and (out2 == s).all()
    assert rms_of(np.zeros(10, np.int16)) == 0
    assert rms_of(np.full(10, 1000, np.int16)) == 1000
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_audio_doc_passthrough_and_segmenter_real_decode():
    from ragflow_core16_ray.pipelines.multimodal import AudioSegmenter
    from ragflow_core16_ray.sources.synth import _gen_audio, _rng

    spans = finalize_offsets(_gen_audio(_rng(42, 7), "doc-audio-7"))
    tmpl, out, _ = extract_doc(spans)
    assert [s["kind"] for s in out] == ["audio"]  # payload kept with doc

    import pandas as pd

    seg = AudioSegmenter(window_ms=1000, overlap_ms=200)
    rows = seg(pd.DataFrame({
        "doc_id": ["doc-audio-7"],
        "media_ref": [out[0]["media_ref"]],
        "payload": [out[0]["text"]]}))
    assert len(rows) >= 1
    assert (rows["rms"] >= 0).all()           # real energy, not the fake
    assert rows["sample_rate"].iloc[0] in (8000, 16000)
    # windows tile the real duration with the configured step
    assert rows["start_ms"].tolist() == [i * 800 for i in range(len(rows))]


def test_audio_segmenter_ref_only_keeps_fake_probe():
    import pandas as pd

    from ragflow_core16_ray.pipelines.multimodal import AudioSegmenter

    seg = AudioSegmenter(window_ms=30_000, overlap_ms=5_000)
    rows = seg(pd.DataFrame({"doc_id": ["d"], "media_ref": ["media://d/f"],
                             "payload": [""]}))
    assert (rows["rms"] == -1).all()


# ------------------------------------------------------- APNG / frames ----

def test_apng_roundtrip_and_static_fallback():
    from ragflow_core16_ray.functions.png import decode_apng, encode_apng

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (9, 13)).astype(np.uint8)
              for _ in range(4)]
    data = encode_apng(frames, delay_ms=80)
    delays, out = decode_apng(data)
    assert delays == [80] * 4
    assert all((a == b).all() for a, b in zip(frames, out))
    # frame 0 is still a valid plain PNG (the glyph-OCR path)
    assert (decode_png(data) == frames[0]).all()
    # a static PNG decodes as one zero-delay frame
    d2, o2 = decode_apng(encode_png(frames[1]))
    assert d2 == [0] and (o2[0] == frames[1]).all()


def test_frame_sampler_real_apng_decode():
    import pandas as pd

    from ragflow_core16_ray.functions.png import encode_apng
    from ragflow_core16_ray.pipelines.multimodal import FrameSampler

    img = render_text(["FRAME ZERO TEXT"])
    fades = [(img // 2), (img // 4)]
    payload = base64.b64encode(encode_apng([img] + fades, 100)).decode()
    rows = FrameSampler(n_frames=3)(pd.DataFrame({
        "doc_id": ["d"], "media_ref": ["media://d/pic"],
        "payload": [payload]}))
    assert len(rows) == 3
    # timestamps come from the real delay table (frames at 0/100/200 ms)
    assert rows["timestamp_ms"].tolist() == [0, 100, 200]
    assert (rows["width"] == img.shape[1]).all()
    # real pixels: fades strictly darken
    m = rows["mean_intensity"].tolist()
    assert m[0] > m[1] > m[2] >= 0


def test_frame_sampler_ref_only_keeps_fake_probe():
    import pandas as pd

    from ragflow_core16_ray.pipelines.multimodal import FrameSampler

    rows = FrameSampler(n_frames=2)(pd.DataFrame({
        "doc_id": ["d"], "media_ref": ["media://d/f"], "payload": [""]}))
    assert len(rows) == 2 and (rows["mean_intensity"] == -1).all()


def test_animated_picture_doc_ocr_unchanged():
    from ragflow_core16_ray.functions.png import encode_apng

    lines = ["STREAM BATCH TABLE SCAN MERGE SORT JOIN",
             "FILTER WINDOW GROUP KEY VALUE COLUMN ROW"]
    img = render_text(lines)
    payload = base64.b64encode(encode_apng([img, img // 2], 40)).decode()
    spans = finalize_offsets(
        [make_span("image", payload, "media://doc-anim/pic")])
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "picture"
    secs = [s["text"] for s in out if s["kind"] == "section"]
    assert secs == ["\n".join(lines)]  # OCR reads frame 0
