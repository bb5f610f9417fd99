"""Multimodal plumbing: media decode / feature-extract as an actor-pool
stage.

Media (image/audio/video) travels as opaque references / binary columns
with typed metadata. The real decoders (PIL/ffmpeg/onnx vision models —
the reference's deepdoc/vision stack) are NOT in this container, so the
decode kernel is STUBBED: ``DecodeStub.decode_real`` raises
NotImplementedError, and the pipeline runs a clearly-marked deterministic
fake (seeded by the media ref) so the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested.

Swap-in point for production: replace ``_fake_decode`` with the real
decoder in ``MediaFeatures.__init__`` (model load once per actor) and
``__call__`` (batched inference), exactly like the reference's per-process
model cache (deepdoc/vision/ocr.py:35,76-80) becomes actor state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import hash64

FEATURE_DIM = 16


class MediaFeatures:
    """Actor-pool stage: (doc_id, media_ref) batches → decoded metadata +
    feature vector. Batch size should be small for real binary payloads
    (images ~MBs each); the constructor is the once-per-actor model-load
    site."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        # real impl: self.model = load_onnx_session(...)  (once per actor)

    @staticmethod
    def decode_real(payload: bytes):
        raise NotImplementedError(
            "image/audio decoders are not available in this sandbox; "
            "production swaps this for PIL/ffmpeg + an ONNX session")

    def _fake_decode(self, media_ref: str) -> tuple[int, int, np.ndarray]:
        """Deterministic fake: dimensions + feature vector derived from the
        ref hash. Stands in for decode+embed so downstream schema/layout
        are exercised for real."""
        h = hash64(media_ref)
        rng = np.random.RandomState(h % (2**32))
        width = 64 + (h >> 8) % 1024
        height = 64 + (h >> 20) % 1024
        feat = rng.standard_normal(self.feature_dim).astype(np.float32)
        feat /= np.linalg.norm(feat)
        return int(width), int(height), feat

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        widths, heights, feats = [], [], []
        for ref in batch["media_ref"]:
            w, h, f = self._fake_decode(ref)
            widths.append(w)
            heights.append(h)
            feats.append(f)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].values,
            "media_ref": batch["media_ref"].values,
            "width": pd.array(widths, dtype="int32"),
            "height": pd.array(heights, dtype="int32"),
            "feature": feats,
        })


def media_features(extracted: rd.Dataset, concurrency=(1, 4),
                   batch_size: int = 64) -> rd.Dataset:
    """Extracted-docs dataset → one row per figure span with decoded
    metadata + features. flat-map explode happens vectorized in Arrow."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..schemas import explode_spans

    def explode(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        keep = pc.and_(pc.equal(flat["kind"], "figure"),
                       pc.not_equal(flat["media_ref"], ""))
        return flat.filter(keep).select(["doc_id", "media_ref"])

    refs = extracted.map_batches(explode, batch_format="pyarrow")
    return refs.map_batches(MediaFeatures, batch_format="pandas",
                            batch_size=batch_size, concurrency=concurrency)


def media_collage(extracted: rd.Dataset) -> rd.Dataset:
    """Per-doc figure collage: decode (fake) each figure, upright-rotate
    tall ones, stack vertically on a common width (functions/image_ops —
    the reference's chunk-image concat, rag/nlp/__init__.py:557-574).
    Output: one row per doc with ≥1 figure: (doc_id, n_figures,
    collage_height, collage_width). The groupby(doc_id) co-locates a
    doc's decoded frames on one worker; frames never cross the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import hash64
    from ..functions.image_ops import maybe_rotate, vertical_concat
    from ..schemas import explode_spans

    def explode(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        keep = pc.and_(pc.equal(flat["kind"], "figure"),
                       pc.not_equal(flat["media_ref"], ""))
        return flat.filter(keep).select(["doc_id", "media_ref"])

    def collage(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for ref in g["media_ref"]:
            h = hash64(ref)
            arr = np.full(((h >> 8) % 96 + 16, (h >> 16) % 96 + 16, 3),
                          h % 251, dtype=np.uint8)  # fake decode
            frames.append(maybe_rotate(arr))
        out = vertical_concat(frames)
        return pd.DataFrame({
            "doc_id": [g["doc_id"].iloc[0]],
            "n_figures": pd.array([len(frames)], dtype="int64"),
            "collage_height": pd.array([out.shape[0]], dtype="int64"),
            "collage_width": pd.array([out.shape[1]], dtype="int64")})

    return (extracted.map_batches(explode, batch_format="pyarrow")
            .groupby("doc_id").map_groups(collage, batch_format="pandas"))
