"""Pure-numpy image ops (functions/image_ops.py — reference semantics:
pdf_parser.py crop, ocr.py:590-593 upright rotation,
rag/nlp/__init__.py:557-574 vertical concat) and the distributed collage
pipeline."""

import numpy as np

from ragflow_core16_ray.functions.image_ops import (crop, maybe_rotate,
                                                    rotate90,
                                                    vertical_concat)


def _img(h, w, v=7):
    return np.full((h, w, 3), v, dtype=np.uint8)


def test_crop_with_margin_clamps():
    img = _img(100, 200)
    c = crop(img, 50, 10, 150, 90, margin=20)
    assert c.shape == (100, 140, 3)  # top clamped to 0, bottom to 100
    assert crop(img, 190, 90, 300, 300).shape == (10, 10, 3)
    assert crop(img, 5, 5, 5, 50).size == 0  # degenerate box


def test_rotate90_steps():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    assert rotate90(img).shape == (4, 3, 1)
    assert rotate90(img, 2).shape == (3, 4, 1)
    assert np.array_equal(rotate90(rotate90(img), 3), img)


def test_maybe_rotate_tall_only():
    tall = _img(90, 30)
    wide = _img(30, 90)
    assert maybe_rotate(tall).shape == (30, 90, 3)  # h/w=3 ≥ 1.5 → rotated
    assert maybe_rotate(wide).shape == (30, 90, 3)  # untouched


def test_vertical_concat_pads_to_max_width():
    out = vertical_concat([_img(10, 30, 1), _img(5, 50, 2)])
    assert out.shape == (15, 50, 3)
    assert (out[:10, 30:] == 255).all()  # padded region is white
    assert (out[10:, :50] == 2).all()
    assert vertical_concat([]).size == 0


def test_media_collage_pipeline(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import media_collage

    rows = [
        {"doc_id": "a", "spans": [
            {"kind": "figure", "text": "", "media_ref": "m://a/0", "offset": 0},
            {"kind": "figure", "text": "", "media_ref": "m://a/1", "offset": 1},
            {"kind": "section", "text": "x", "media_ref": "", "offset": 2}]},
        {"doc_id": "b", "spans": [
            {"kind": "section", "text": "y", "media_ref": "", "offset": 0}]},
    ]
    ds = rd.from_items(rows)
    out = media_collage(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == ["a"]  # doc b has no figures
    assert int(out["n_figures"].iloc[0]) == 2
    assert int(out["collage_height"].iloc[0]) > 0
    assert int(out["collage_width"].iloc[0]) >= 16


def test_frame_sampler_fanout(ray_session):
    import pandas as pd

    from ragflow_core16_ray.pipelines.multimodal import FrameSampler

    s = FrameSampler(n_frames=4)
    out = s(pd.DataFrame({"doc_id": ["d1", "d2"],
                          "media_ref": ["media://d1/0", "media://d2/0"]}))
    assert len(out) == 8
    d1 = out[out.doc_id == "d1"]
    # uniform midpoint sampling: timestamps strictly increasing, inside
    # the probed duration, deterministic per ref
    assert list(d1.frame_index) == [0, 1, 2, 3]
    assert d1.timestamp_ms.is_monotonic_increasing
    assert (d1.width.nunique() == 1) and (d1.height.nunique() == 1)
    again = s(pd.DataFrame({"doc_id": ["d1"], "media_ref": ["media://d1/0"]}))
    assert list(again.timestamp_ms) == list(d1.timestamp_ms)


def test_audio_segmenter_windows(ray_session):
    import pandas as pd

    from ragflow_core16_ray.pipelines.multimodal import AudioSegmenter

    s = AudioSegmenter(window_ms=30_000, overlap_ms=5_000)
    out = s(pd.DataFrame({"doc_id": ["d1", "d2"],
                          "media_ref": ["media://d1/0", "media://d2/0"]}))
    d1 = out[out.doc_id == "d1"]
    assert list(d1.segment_index) == list(range(len(d1)))
    # windows step by (window - overlap); every full window is 30s; the
    # kept tail (if any) is at least half a window
    starts = list(d1.start_ms)
    assert starts == [i * 25_000 for i in range(len(d1))]
    spans_ms = (d1.end_ms - d1.start_ms).tolist()
    assert all(w == 30_000 for w in spans_ms[:-1])
    assert spans_ms[-1] >= 15_000
    assert d1.sample_rate.nunique() == 1
    # deterministic per ref
    again = s(pd.DataFrame({"doc_id": ["d1"], "media_ref": ["media://d1/0"]}))
    assert list(again.end_ms) == list(d1.end_ms)


def test_incremental_dedup_anti_join(ray_session):
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.dedup import incremental_dedup

    sf = "/root/testdata/sf0.001"
    got = set(incremental_dedup(sf).to_pandas()["doc_id"])
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "text", "source"]).to_pandas()
    prior = docs[[int(s[3:]) % 2 == 0 for s in docs["source"]]]
    new = docs[[int(s[3:]) % 2 == 1 for s in docs["source"]]]
    want = set(new.loc[~new["text"].isin(set(prior["text"])), "doc_id"])
    assert got == want
    assert 0 < len(got) <= len(new)


def test_incremental_dedup_bloom_equals_exact(ray_session):
    """The Bloom scale path must be output-identical to the exact
    anti-join — both at a production filter size and at a deliberately
    undersized filter (1 bit/key, k=2) whose false positives exercise
    the exact-verification sliver."""
    from ragflow_core16_ray.pipelines.dedup import (incremental_dedup,
                                                    incremental_dedup_bloom)

    sf = "/root/testdata/sf0.001"
    want = sorted(incremental_dedup(sf).to_pandas()["doc_id"])
    got = sorted(incremental_dedup_bloom(sf).to_pandas()["doc_id"])
    assert got == want

    tiny = sorted(incremental_dedup_bloom(
        sf, bits_per_key=1, k_hashes=2).to_pandas()["doc_id"])
    assert tiny == want


def test_resize_semantics():
    """Nearest-neighbor resize: exact block structure on integer
    scaling, clamped edges, aspect handling, degenerate sizes."""
    import numpy as np

    from ragflow_core16_ray.functions.image_ops import resize

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    up = resize(img, 4, 4)
    assert up.shape == (4, 4, 3)
    # 2x upscale of a 2x2: each source pixel becomes a 2x2 block
    assert (up[:2, :2] == img[0, 0]).all() and (up[2:, 2:] == img[1, 1]).all()
    down = resize(up, 2, 2)
    assert (down == img).all()
    # degenerate targets yield typed empties
    assert resize(img, 0, 5).shape == (0, 5, 3)
    # grayscale passes through with rank preserved
    g = np.arange(4, dtype=np.uint8).reshape(2, 2)
    assert resize(g, 3, 5).shape == (3, 5)


def test_poison_payloads_contained_per_row(ray_session):
    """A corrupt in-band payload costs one SENTINEL row in every media
    stage — never a failed Ray task (at corpus scale corrupt media is
    guaranteed). Sentinels are distinct from the ref-only fake markers:
    features dims −1×−1, frame rows mean −2 / index −1, audio rows
    rms −2 / index −1, collage frames become 16×16 tombstones."""
    import base64

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ragflow_core16_ray.functions.png import encode_png
    from ragflow_core16_ray.pipelines.multimodal import (AudioSegmenter,
                                                         FrameSampler,
                                                         MediaFeatures,
                                                         media_collage)

    good = base64.b64encode(
        encode_png(np.full((8, 8), 7, dtype=np.uint8))).decode()
    bad = base64.b64encode(b"\x89PNG\r\n\x1a\nGARBAGE-NOT-A-PNG").decode()
    batch = pd.DataFrame({
        "doc_id": ["d1", "d1", "d2"],
        "media_ref": ["m://d1/good", "m://d1/bad", "m://d2/ref"],
        "payload": [good, bad, ""]})

    feats = MediaFeatures()(batch)
    assert feats.width.tolist()[0] == 8
    assert feats.width.tolist()[1] == -1 and feats.height.tolist()[1] == -1
    assert feats.width.tolist()[2] > 0  # ref-only fake keeps real-ish dims

    frames = FrameSampler(n_frames=3)(batch)
    badrows = frames[frames.media_ref == "m://d1/bad"]
    assert badrows.frame_index.tolist() == [-1]
    assert badrows.mean_intensity.tolist() == [-2]
    assert (frames[frames.media_ref == "m://d1/good"]
            .mean_intensity >= 0).all()

    segs = AudioSegmenter()(pd.DataFrame({
        "doc_id": ["d1"], "media_ref": ["m://d1/bad"], "payload": [bad]}))
    assert segs.segment_index.tolist() == [-1]
    assert segs.rms.tolist() == [-2]

    rows = [{"doc_id": "d1", "spans": [
        {"kind": "image", "text": good, "media_ref": "m://d1/g",
         "offset": 0},
        {"kind": "image", "text": bad, "media_ref": "m://d1/b",
         "offset": 1}]}]
    out = media_collage(rd.from_items(rows)).to_pandas()
    assert out.n_figures.tolist() == [2]  # tombstone still counted
