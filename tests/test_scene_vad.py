"""Shot-boundary detection (SceneCuts) and energy-VAD speech
segmentation (VadSegmenter) — the content-aware multimodal screens next
to the fixed-grid framing stages (pipelines/multimodal.py). Class-level
batch tests; the driver exercises the Ray plumbing via the
video_scene_cuts / audio_vad_segments queries."""

import base64

import numpy as np
import pandas as pd

from ragflow_core16_ray.functions.gif import encode_gif_animated
from ragflow_core16_ray.functions.wav import encode_wav
from ragflow_core16_ray.pipelines.multimodal import SceneCuts, VadSegmenter


def _batch(payload_bytes: bytes) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": ["d1"], "media_ref": ["m1"],
        "payload": [base64.b64encode(payload_bytes).decode("ascii")]})


# ------------------------------------------------------------- scenes ----

def test_scene_cuts_detects_hard_cut():
    a = np.zeros((16, 16), dtype=np.uint8)
    b = np.full((16, 16), 255, dtype=np.uint8)
    gif = encode_gif_animated([a, a, a, b, b], delay_ms=40)
    out = SceneCuts()(_batch(gif))
    assert out.to_dict("records") == [{
        "doc_id": "d1", "media_ref": "m1", "cut_index": 0,
        "frame_index": 3, "t_ms": 120, "jump_q": 255_000_000}]


def test_scene_cuts_two_cuts_and_indexing():
    a = np.zeros((8, 8), dtype=np.uint8)
    b = np.full((8, 8), 200, dtype=np.uint8)
    gif = encode_gif_animated([a, a, b, b, a, a], delay_ms=100)
    out = SceneCuts()(_batch(gif))
    assert list(out["frame_index"]) == [2, 4]
    assert list(out["cut_index"]) == [0, 1]
    assert list(out["t_ms"]) == [200, 400]


def test_scene_cuts_two_frame_clip():
    """A 2-frame clip's lone hard cut registers: the leave-one-out
    baseline is empty (0), so the absolute floor alone gates it."""
    a = np.zeros((8, 8), dtype=np.uint8)
    b = np.full((8, 8), 255, dtype=np.uint8)
    out = SceneCuts()(_batch(encode_gif_animated([a, b], delay_ms=50)))
    assert out.to_dict("records") == [{
        "doc_id": "d1", "media_ref": "m1", "cut_index": 0,
        "frame_index": 1, "t_ms": 50, "jump_q": 255_000_000}]


def test_scene_cuts_ignores_shimmer_below_floor():
    """Lossy-codec-level noise (small per-pixel deltas) is not a cut."""
    frames = [np.full((16, 16), 100 + i, dtype=np.uint8)
              for i in range(5)]                 # jump_q = 1e6 per step
    gif = encode_gif_animated(frames, delay_ms=40)
    assert len(SceneCuts()(_batch(gif))) == 0


def test_scene_cuts_static_and_corrupt():
    a = np.zeros((8, 8), dtype=np.uint8)
    gif = encode_gif_animated([a, a, a], delay_ms=40)
    assert len(SceneCuts()(_batch(gif))) == 0
    out = SceneCuts()(_batch(b"not an animation"))
    assert out.to_dict("records") == [{
        "doc_id": "d1", "media_ref": "m1", "cut_index": -1,
        "frame_index": -1, "t_ms": -1, "jump_q": -1}]


def test_scene_cuts_skips_ref_only_rows():
    batch = pd.DataFrame({"doc_id": ["d"], "media_ref": ["m"],
                          "payload": [""]})
    assert len(SceneCuts()(batch)) == 0


# ---------------------------------------------------------------- vad ----

def _tone(ms: int, rate: int = 8000, amp: int = 1000) -> np.ndarray:
    n = rate * ms // 1000
    s = np.full(n, amp, dtype=np.int16)
    s[1::2] = -amp                               # square wave, RMS = amp
    return s


def _silence(ms: int, rate: int = 8000) -> np.ndarray:
    return np.zeros(rate * ms // 1000, dtype=np.int16)


def test_vad_segments_speech_boundaries():
    wav = encode_wav(np.concatenate([
        _silence(500), _tone(500), _silence(300), _tone(400)]), 8000)
    out = VadSegmenter()(_batch(wav))
    assert out.to_dict("records") == [
        {"doc_id": "d1", "media_ref": "m1", "seg_index": 0,
         "start_ms": 500, "end_ms": 1000, "mean_rms": 1000},
        {"doc_id": "d1", "media_ref": "m1", "seg_index": 1,
         "start_ms": 1300, "end_ms": 1700, "mean_rms": 1000}]


def test_vad_drops_sub_minimum_blips():
    """A 100 ms blip (< min_speech_ms 200) does not become a segment."""
    wav = encode_wav(np.concatenate([
        _silence(400), _tone(100), _silence(400), _tone(300)]), 8000)
    out = VadSegmenter()(_batch(wav))
    assert out.to_dict("records") == [
        {"doc_id": "d1", "media_ref": "m1", "seg_index": 0,
         "start_ms": 900, "end_ms": 1200, "mean_rms": 1000}]


def test_vad_all_silence_and_corrupt():
    wav = encode_wav(_silence(1000), 8000)
    assert len(VadSegmenter()(_batch(wav))) == 0
    out = VadSegmenter()(_batch(b"not a wav"))
    assert list(out["seg_index"]) == [-1]
