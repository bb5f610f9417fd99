"""The ONNX model-execution slot (r4 verdict demand #2): real .onnx
bytes round-trip through the hand-rolled wire codec, the numpy executor
matches reference math, and a self-trained toy det/rec pair runs through
the ACTUAL actor-pool extract path — load-once-per-actor, rec batched
16, output identical to the rule kernels on the synthetic font."""

import numpy as np
import pytest

from ragflow_core16_ray.functions import onnx_min as om


def test_wire_roundtrip_and_executor():
    rng = np.random.RandomState(0)
    W = rng.randn(3, 1, 3, 3).astype(np.float32)
    B = rng.randn(3).astype(np.float32)
    W2 = rng.randn(3 * 4 * 4, 5).astype(np.float32)
    nodes = [
        om.make_node("Conv", ["x", "W", "B"], ["c"], strides=[1, 1],
                     pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
        om.make_node("Relu", ["c"], ["r"]),
        om.make_node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2],
                     strides=[2, 2]),
        om.make_node("Flatten", ["p"], ["f"], axis=1),
        om.make_node("MatMul", ["f", "W2"], ["m"]),
        om.make_node("Softmax", ["m"], ["y"], axis=-1),
    ]
    inits = [om.make_tensor("W", W), om.make_tensor("B", B),
             om.make_tensor("W2", W2)]
    data = om.make_model(nodes, inits, ["x"], ["y"])
    sess = om.OnnxSession(data)
    assert sess.input_names == ["x"] and sess.output_names == ["y"]
    x = rng.randn(2, 1, 8, 8).astype(np.float32)
    y = sess.run(None, {"x": x})[0]
    # reference math in plain numpy
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    c = np.zeros((2, 3, 8, 8), np.float32)
    for n in range(2):
        for o in range(3):
            for i in range(8):
                for j in range(8):
                    c[n, o, i, j] = (xp[n, 0, i:i + 3, j:j + 3]
                                     * W[o, 0]).sum() + B[o]
    r = np.maximum(c, 0)
    p = r.reshape(2, 3, 4, 2, 4, 2).max(axis=(3, 5))
    m = p.reshape(2, -1) @ W2
    e = np.exp(m - m.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    assert np.abs(y - ref).max() < 1e-5
    assert y.sum(axis=-1) == pytest.approx(np.ones(2), abs=1e-5)


def test_negative_int_attrs_and_int64_tensors():
    t = om.make_tensor("t", np.array([-5, 3], np.int64))
    node = om.make_node("ArgMax", ["x"], ["y"], axis=-1, keepdims=0)
    data = om.make_model([node], [t], ["x"], ["y"])
    g = om.load_model(data)
    assert g["initializers"]["t"].tolist() == [-5, 3]
    assert g["nodes"][0]["attrs"]["axis"] == -1
    sess = om.OnnxSession(data)
    y = sess.run(None, {"x": np.array([[1.0, 9.0, 2.0]], np.float32)})[0]
    assert y.tolist() == [1]


@pytest.fixture()
def toy_weights(tmp_path):
    from ragflow_core16_ray.functions.vision_onnx import build_toy_models

    d = str(tmp_path / "weights")
    build_toy_models(d)
    return d


def test_toy_ocr_matches_rule_kernel(toy_weights):
    """On the glyph font, the onnx det/rec pair reproduces the rule
    OCR bit-for-bit — including figure-band rejection of a photo block —
    and the recognizer runs in ≤16 batches."""
    from ragflow_core16_ray.functions.glyphs import (_ocr_binary,
                                                     render_text)
    from ragflow_core16_ray.functions.vision_onnx import REC_BATCH, OnnxOcr

    lines = ["stream batch table scan", "merge sort join filter",
             "", "window group key value 42"]
    img = render_text(lines)
    b = (img > 127).astype(np.uint8)
    # add a photo-like dense block well below the text
    b2 = np.zeros((b.shape[0] + 40, b.shape[1]), np.uint8)
    b2[:b.shape[0]] = b
    b2[b.shape[0] + 8:b.shape[0] + 36, 10:90] = 1
    OnnxOcr.max_rec_batch = 0
    ocr = OnnxOcr(toy_weights)
    got = ocr.ocr_binary(b2)
    want = _ocr_binary(b2)
    assert got == want
    assert any(ln.get("fig") for ln in got)
    assert sum(len(ln["text"]) for ln in got if not ln.get("fig")) > 40
    assert 0 < OnnxOcr.max_rec_batch <= REC_BATCH


def test_actor_pool_extract_path(ray_session, toy_weights, tmp_path):
    """The full extract pipeline with layout_recognize='onnx' on an
    actor pool: identical output to the rule path (golden-equality of
    the plumbing) and the det/rec pair loads once per ACTOR, not per
    batch."""
    import ray.data as rd

    from ragflow_core16_ray.config import ExtractConfig, RuntimeConfig
    from ragflow_core16_ray.functions.vision_onnx import OnnxOcr
    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.sources.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    # seed chosen to include scan-archetype docs (OCR actually runs)
    write_corpus(corpus, n_docs=160, seed=3, mega_every=0)
    rule_out = str(tmp_path / "rule_out")
    onnx_out = str(tmp_path / "onnx_out")
    run_extract(corpus, rule_out)

    import os

    cfg = ExtractConfig(layout_recognize="onnx", onnx_dir=toy_weights)
    rt = RuntimeConfig(use_actor_pool=True, parse_concurrency=(2, 2),
                       parse_batch_size=16)   # 10 batches >> 2 actors
    run_extract(corpus, onnx_out, cfg=cfg, runtime=rt)
    # load-once-per-ACTOR: 2 actors × 1 constructor call each, despite
    # ~10 batches flowing through the pool (one appended line per
    # session load, from whichever process constructed it)
    loads = open(os.path.join(toy_weights, "_loads.log")).read().split()
    assert len(loads) == 2, loads

    a = rd.read_parquet(rule_out + "/docs").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = rd.read_parquet(onnx_out + "/docs").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["template"]) == list(b["template"])
    # span-level equality — the whole parse, not just routing
    assert a["spans"].map(lambda s: [tuple(sorted(d.items()))
                                     for d in s]).equals(
        b["spans"].map(lambda s: [tuple(sorted(d.items())) for d in s]))
    assert any(t == "scan" or d.startswith("doc-scan-")
               for d, t in zip(a["doc_id"], a["template"]))


def test_missing_weights_fall_back_to_rule(ray_session, tmp_path):
    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.pipelines.extract import ExtractRouter

    cfg = ExtractConfig(layout_recognize="onnx",
                        onnx_dir=str(tmp_path / "absent"))
    r = ExtractRouter(cfg, str(tmp_path / "staging"))
    assert r.ocr is None  # nothing loads at construction (driver side)
    r._ensure_models()    # the worker-side load attempt
    assert r.ocr is None and r.layout is None  # rule kernels active


def test_toy_layout_matches_rule_exhaustively(tmp_path):
    """All 32 feature combinations: the toy linear head's argmax equals
    the rule chain's decision, including the header-over-title and
    footer-over-title tie priorities."""
    from itertools import product

    from ragflow_core16_ray.functions.pdfish import LAYOUT_CLASSES
    from ragflow_core16_ray.functions.vision_onnx import (OnnxLayout,
                                                          build_toy_layout)

    d = str(tmp_path / "w")
    build_toy_layout(d)
    head = OnnxLayout(d)
    feats = np.array(list(product([0.0, 1.0], repeat=5)), dtype=np.float32)
    got = [LAYOUT_CLASSES[i] for i in head.classify(feats)]

    def rule(short, top, bot, tall, sent):
        if short and top:
            return "header"
        if short and bot:
            return "footer"
        if tall and short and not sent:
            return "title"
        return "text"

    want = [rule(*map(bool, f)) for f in feats]
    assert got == want
    assert OnnxLayout.n_loads >= 1
    assert 0 < OnnxLayout.max_batch <= 16


def test_layout_model_in_infer_layout(tmp_path):
    """The installed model head classifies untagged boxes through
    _infer_layout identically to the rule head on a realistic page, and
    never touches pre-tagged boxes."""
    from ragflow_core16_ray.functions import pdfish
    from ragflow_core16_ray.functions.pdfish import Box
    from ragflow_core16_ray.functions.vision_onnx import (OnnxLayout,
                                                          build_toy_layout)

    def mk_boxes():
        return [
            Box("Page 3 of 9", 10, 200, 20, 40, 0, None),
            Box("A TALL TITLE", 10, 400, 120, 160, 0, None),
            Box("body text that ends with a period.", 10, 500, 200,
                220, 0, None),
            Box("short tall but punctuated!", 10, 300, 260, 300, 0, None),
            Box("footer line", 10, 150, 940, 955, 0, None),
            Box("pre-tagged", 10, 150, 500, 520, 0, "table"),
        ]

    rule_boxes = mk_boxes()
    pdfish._infer_layout(rule_boxes, 1000)

    d = str(tmp_path / "w")
    build_toy_layout(d)
    head = OnnxLayout(d)
    model_boxes = mk_boxes()
    pdfish.set_layout_model(head.classify)
    try:
        pdfish._infer_layout(model_boxes, 1000)
    finally:
        pdfish.set_layout_model(None)
    assert [b.lay for b in model_boxes] == [b.lay for b in rule_boxes]
    assert model_boxes[-1].lay == "table"  # tagged boxes untouched


def test_layout_onnx_extract_path(ray_session, toy_weights, tmp_path):
    """Full extract with det/rec AND layout toys installed: identical
    output to the rule path (the layout head classifies every untagged
    pdf box through the actor's batch-scoped hook)."""
    import ray.data as rd

    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.functions.vision_onnx import build_toy_layout
    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.sources.synth import write_corpus

    build_toy_layout(toy_weights)  # det/rec already there
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=60, seed=7, mega_every=0)
    rule_out = str(tmp_path / "rule_out")
    onnx_out = str(tmp_path / "onnx_out")
    run_extract(corpus, rule_out)
    cfg = ExtractConfig(layout_recognize="onnx", onnx_dir=toy_weights)
    run_extract(corpus, onnx_out, cfg=cfg)
    a = rd.read_parquet(rule_out + "/docs").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = rd.read_parquet(onnx_out + "/docs").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert a["spans"].map(lambda s: [tuple(sorted(x.items()))
                                     for x in s]).equals(
        b["spans"].map(lambda s: [tuple(sorted(x.items())) for x in s]))
