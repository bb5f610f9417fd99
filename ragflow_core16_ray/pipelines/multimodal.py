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

    def decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """REAL decode for PNG, GIF, baseline-JPEG and MJPEG-AVI
        payloads (functions/{png,gif,jpeg,avi}.py — pure
        zlib/LZW/Huffman+numpy; video features come from frame 0):
        dimensions from the header, feature = L2-normalized
        ``feature_dim``-bin intensity histogram of the decoded pixels.
        Compressed codecs (H.264, MP3…) still need ffmpeg — unavailable
        in this sandbox."""
        from ..functions.image_ops import decode_image

        arr = decode_image(payload)
        if arr.ndim == 3:
            arr = arr.mean(axis=2).astype(np.uint8)
        hist, _ = np.histogram(arr, bins=self.feature_dim, range=(0, 256))
        feat = hist.astype(np.float32)
        norm = float(np.linalg.norm(feat))
        if norm > 0:
            feat /= norm
        return arr.shape[1], arr.shape[0], feat

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
        import base64

        payloads = (batch["payload"] if "payload" in batch.columns
                    else [""] * len(batch))
        widths, heights, feats = [], [], []
        for ref, payload in zip(batch["media_ref"], payloads):
            if payload:
                try:
                    # in-band payload (picture docs): REAL decode
                    w, h, f = self.decode_real(base64.b64decode(payload))
                except Exception:  # noqa: BLE001 — poison containment:
                    # at corpus scale corrupt media is guaranteed; one bad
                    # payload must cost one sentinel row, never the task.
                    # width/height = -1 marks it (distinct from ref-only
                    # fakes, which carry plausible dims).
                    w, h = -1, -1
                    f = np.zeros(self.feature_dim, dtype=np.float32)
            else:
                # ref-only figure (html/pdf/docx): the blob store holding
                # these bytes doesn't exist in the sandbox → documented fake
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



def _explode_payload(batch, kinds: tuple, payload_kinds: tuple):
    """Shared span explode for every media stage: keep ref-bearing spans
    of ``kinds``; rows whose kind is in ``payload_kinds`` carry their
    in-band payload (picture/audio docs), ref-only rows carry ""."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..schemas import explode_spans

    flat = explode_spans(batch)
    keep = pc.and_(pc.is_in(flat["kind"],
                            value_set=pa.array(list(kinds))),
                   pc.not_equal(flat["media_ref"], "")).combine_chunks()
    flat = flat.filter(keep)
    payload = pc.if_else(pc.is_in(flat["kind"],
                                  value_set=pa.array(list(payload_kinds))),
                         flat["text"], pa.scalar(""))
    return (flat.select(["doc_id", "media_ref"])
            .append_column("payload", payload))


class _FusedExplode:
    """Explode + decode fused into ONE map_batches stage.

    The two-stage shape (explode task → actor pool) ships every in-band
    media payload through the object store twice — once as the doc's
    spans column into the explode task, once again as the explode
    output's payload column into the decode actor. At 100 TB the second
    shipment is pure waste (it was the r4 bench's slowest entry's cost).
    Fusing keeps the actor-pool semantics (stage state constructed once
    per actor) while payload bytes enter the object store exactly once,
    at the read."""

    def __init__(self, stage_cls, kinds: tuple, payload_kinds: tuple,
                 *stage_args):
        self.stage = stage_cls(*stage_args)
        self.kinds = kinds
        self.payload_kinds = payload_kinds

    def __call__(self, batch) -> pd.DataFrame:
        flat = _explode_payload(batch, self.kinds, self.payload_kinds)
        return self.stage(flat.to_pandas())


def _default_pool() -> tuple[int, int]:
    """Actor-pool bounds sized from the cluster, not a hard-coded cap: a
    CPU decode stage starves at (1,4) on a 32-CPU node. Production GPU
    models would instead pass an explicit concurrency + num_gpus."""
    import ray

    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() \
        else 4
    return (1, max(4, n))


def media_features(extracted: rd.Dataset, concurrency=None,
                   batch_size: int = 32) -> rd.Dataset:
    """Extracted-docs dataset → one row per figure span with decoded
    metadata + features. Explode (vectorized Arrow) and decode run FUSED
    in one actor stage — figure spans carry a ref only; image spans
    (picture docs) carry their PNG payload in-band for the real decode,
    and those bytes must not re-enter the object store between stages.
    ``batch_size`` counts docs (not media rows): real payloads are MBs,
    so batches stay small."""
    if concurrency is None:
        concurrency = _default_pool()
    return extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(MediaFeatures, ("figure", "image"), ("image",)),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def media_collage(extracted: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Per-doc figure collage: decode (fake) each figure, upright-rotate
    tall ones, stack vertically on a common width (functions/image_ops —
    the reference's chunk-image concat, rag/nlp/__init__.py:557-574).
    Output: one row per doc with ≥1 figure: (doc_id, n_figures,
    collage_height, collage_width).

    NO shuffle: a doc's figure spans all live in its own input row, so
    the collage is doc-local by construction — explode + decode + concat
    run fused in one map_batches task and payload bytes enter the object
    store exactly once (the earlier bucket-groupby shape paid an
    all-to-all to co-locate rows that were never apart). ``n_buckets``
    is retained for API compatibility; it no longer affects execution."""
    from ..functions.image_ops import maybe_rotate, resize, vertical_concat

    def collage_docs(g: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.hashing import hash64
        from ..functions.image_ops import decode_image

        g = g.sort_values(["doc_id", "media_ref"], kind="stable")
        doc_ids, n_figs, heights, widths = [], [], [], []
        for doc_id, grp in g.groupby("doc_id", sort=False):
            frames = []
            for ref, payload in zip(grp["media_ref"], grp["payload"]):
                if payload:
                    try:
                        arr = decode_image(base64.b64decode(payload))
                    except Exception:  # noqa: BLE001 — poison
                        # containment: a corrupt frame becomes a 16×16
                        # black tombstone (still counted in n_figures),
                        # never a failed task
                        arr = np.zeros((16, 16, 3), dtype=np.uint8)
                    if arr.ndim == 2:  # collage frames are 3-channel
                        arr = np.repeat(arr[:, :, None], 3, axis=2)
                else:
                    h = hash64(ref)
                    arr = np.full(((h >> 8) % 96 + 16,
                                   (h >> 16) % 96 + 16, 3),
                                  h % 251, dtype=np.uint8)  # fake decode
                arr = maybe_rotate(arr)
                # model-input normalization: every frame to a common
                # width, aspect preserved (integer math — deterministic
                # under any batching)
                hh, ww = arr.shape[:2]
                frames.append(resize(arr, max(1, hh * 64 // ww), 64))
            out = vertical_concat(frames)
            doc_ids.append(doc_id)
            n_figs.append(len(frames))
            heights.append(out.shape[0])
            widths.append(out.shape[1])
        return pd.DataFrame({
            "doc_id": doc_ids,
            "n_figures": pd.array(n_figs, dtype="int64"),
            "collage_height": pd.array(heights, dtype="int64"),
            "collage_width": pd.array(widths, dtype="int64")})

    def per_batch(batch) -> pd.DataFrame:
        flat = _explode_payload(batch, ("figure", "image"), ("image",))
        return collage_docs(flat.to_pandas())

    return extracted.map_batches(per_batch, batch_format="pyarrow",
                                 batch_size=32)


class FrameSampler:
    """Actor-pool stage: video/animation refs → uniformly sampled frame
    rows (timestamp_ms, frame_index, width, height, mean_intensity).

    In-band APNG, animated-GIF and MJPEG-AVI payloads (animated picture
    docs) get a REAL decode (functions/{png,gif,avi}.py via the
    magic-sniffing decode_image_frames): timestamps from the frame delay
    table (or the AVI stream's dwRate/dwScale), dimensions from the
    header, and the sampled frame's integer mean intensity — proof the
    pixels were actually decoded. Ref-only media keeps a deterministic
    fake probe (compressed codecs — H.264 etc. — still need ffmpeg,
    absent in this sandbox; mean_intensity = -1 marks those rows). Either way one input row fans out to ``n_frames``
    output rows, the constructor is the once-per-actor decoder-handle
    site, and batches stay small because real decoded frames are MBs.
    Role of a frame-sampling ingest stage in a video training-data
    pipeline (the reference has no video path; this is a north-rule
    training-data addition)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames
        # real impl: self.decoder = open_codec_context(...) (once per actor)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.image_ops import decode_image_frames

        payloads = (batch["payload"] if "payload" in batch.columns
                    else [""] * len(batch))
        doc_ids, refs, idxs, ts, ws, hs, means = [], [], [], [], [], [], []
        for did, ref, payload in zip(batch["doc_id"], batch["media_ref"],
                                     payloads):
            frames = None
            if payload:
                try:
                    # in-band APNG / animated-GIF / MJPEG-AVI payload:
                    # REAL frame table + pixels (magic-sniffed)
                    delays, frames = decode_image_frames(
                        base64.b64decode(payload))
                except Exception:  # noqa: BLE001 — poison containment:
                    # one sentinel row (frame_index −1, mean −2; −1 means
                    # ref-only), never a failed task
                    doc_ids.append(did)
                    refs.append(ref)
                    idxs.append(-1)
                    ts.append(-1)
                    ws.append(-1)
                    hs.append(-1)
                    means.append(-2)
                    continue
                duration_ms = max(1, sum(delays))
                starts = np.cumsum([0] + delays[:-1])
                height, width = frames[0].shape[:2]
                n = min(self.n_frames, len(frames))
            else:
                h = hash64(ref)
                duration_ms = 1_000 + h % 600_000   # fake probe: 1s–10min
                width = 320 + (h >> 8) % 1600
                height = 240 + (h >> 20) % 900
                n = self.n_frames
            for i in range(n):
                # uniform sampling: frame i at (i + 0.5)/n of the duration
                doc_ids.append(did)
                refs.append(ref)
                idxs.append(i)
                ws.append(width)
                hs.append(height)
                if frames is not None:
                    # nearest real frame at the uniform timestamp
                    want = duration_ms * (2 * i + 1) // (2 * n)
                    j = int(np.searchsorted(starts, want, side="right") - 1)
                    ts.append(int(starts[j]))
                    means.append(int(frames[j].mean()))
                else:
                    ts.append(int(duration_ms * (2 * i + 1) // (2 * n)))
                    means.append(-1)
        return pd.DataFrame({
            "doc_id": doc_ids, "media_ref": refs,
            "frame_index": pd.array(idxs, dtype="int32"),
            "timestamp_ms": pd.array(ts, dtype="int64"),
            "width": pd.array(ws, dtype="int32"),
            "height": pd.array(hs, dtype="int32"),
            # integer mean intensity of the REAL sampled frame; -1 =
            # ref-only media (no payload in the sandbox's blob store)
            "mean_intensity": pd.array(means, dtype="int64")})


class AudioSegmenter:
    """Actor-pool stage: audio refs → fixed-length overlapping segment
    rows, the framing step in front of any ASR/embedding model.

    In-band WAV payloads (audio docs) get a REAL probe: RIFF/PCM16
    decode (functions/wav.py), duration from the sample count, and an
    integer RMS energy per window — the voice-activity feature an ASR
    batcher keys on. Ref-only figures keep a deterministic fake probe
    (ffmpeg/soundfile for compressed formats are absent in this
    sandbox; rms = -1 marks those rows). The Ray-side contract is the
    same either way: one input row fans out to one row per ``window_ms``
    segment with ``overlap_ms`` overlap (a trailing partial window is
    kept iff ≥ half a window), constructor is the once-per-actor
    decoder-handle site, small batches because real decoded audio is
    MBs/minute. Role of an ASR ingest framing stage (the reference's
    audio template transcribes via a remote LLM, rag/app/audio.py:25-44
    — external-service path; the framing plumbing is what a self-hosted
    pipeline needs)."""

    def __init__(self, window_ms: int = 30_000, overlap_ms: int = 5_000):
        assert overlap_ms < window_ms
        self.window_ms = window_ms
        self.step_ms = window_ms - overlap_ms
        # real impl: self.decoder = soundfile/ffmpeg handle (once per actor)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.wav import decode_wav, rms_of

        payloads = (batch["payload"] if "payload" in batch.columns
                    else [""] * len(batch))
        doc_ids, refs, idxs = [], [], []
        starts, ends, rates, rmss = [], [], [], []
        for did, ref, payload in zip(batch["doc_id"], batch["media_ref"],
                                     payloads):
            samples = None
            if payload:
                try:
                    # in-band WAV payload (audio docs): REAL probe + energy
                    rate, samples = decode_wav(base64.b64decode(payload))
                except Exception:  # noqa: BLE001 — poison containment:
                    # one sentinel row (segment_index −1, rms −2; −1
                    # means ref-only), never a failed task
                    doc_ids.append(did)
                    refs.append(ref)
                    idxs.append(-1)
                    starts.append(-1)
                    ends.append(-1)
                    rates.append(-1)
                    rmss.append(-2)
                    continue
                duration_ms = len(samples) * 1000 // rate
            else:
                h = hash64(ref)
                duration_ms = 2_000 + h % 900_000    # fake probe: 2s–15min
                rate = (8_000, 16_000, 44_100)[h % 3]
            start = 0
            i = 0
            while start < duration_ms:
                end = min(start + self.window_ms, duration_ms)
                if end - start < self.window_ms // 2 and i > 0:
                    break  # drop a <half-window tail (ASR framing norm)
                doc_ids.append(did)
                refs.append(ref)
                idxs.append(i)
                starts.append(start)
                ends.append(end)
                rates.append(rate)
                rmss.append(rms_of(samples[start * rate // 1000:
                                           end * rate // 1000])
                            if samples is not None else -1)
                start += self.step_ms
                i += 1
        return pd.DataFrame({
            "doc_id": doc_ids, "media_ref": refs,
            "segment_index": pd.array(idxs, dtype="int32"),
            "start_ms": pd.array(starts, dtype="int64"),
            "end_ms": pd.array(ends, dtype="int64"),
            "sample_rate": pd.array(rates, dtype="int32"),
            # integer RMS of the REAL window samples; -1 = ref-only media
            # (no payload in the sandbox's blob store)
            "rms": pd.array(rmss, dtype="int64")})


def audio_segments(extracted: rd.Dataset, window_ms: int = 30_000,
                   overlap_ms: int = 5_000, concurrency=None,
                   batch_size: int = 16) -> rd.Dataset:
    """Extracted docs → overlapping audio segment rows for every
    media-bearing figure span (same Arrow explode as media_features; the
    fan-out happens inside the actor — no driver loop, no shuffle)."""
    # audio spans carry their WAV payload in-band for the real probe;
    # explode+segment fused so payloads enter the object store once
    return extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(AudioSegmenter, ("figure", "audio"),
                             ("audio",), window_ms, overlap_ms),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool())


def frame_samples(extracted: rd.Dataset, n_frames: int = 4,
                  concurrency=None, batch_size: int = 16) -> rd.Dataset:
    """Extracted docs → sampled frame rows for every media-bearing figure
    span. Same explode as media_features; the sampler fans each ref out to
    ``n_frames`` rows inside the actor (no driver loop, no shuffle)."""
    # image spans may be animated (APNG/GIF/AVI) — the sampler
    # real-decodes the in-band payload; explode+sample fused so payloads
    # enter the object store once
    return extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(FrameSampler, ("figure", "image"), ("image",),
                             n_frames),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool())


# ------------------------------------------------ perceptual-hash dedup ---

def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash (dHash, Krawetz 2013 — the public
    perceptual hash LAION-scale image dedup pipelines run): grayscale →
    8×9 grid of AREA means (integral-image cell averages, more stable
    under re-encoding than nearest-neighbor sampling) → bit = cell
    brighter than its right neighbor. Deterministic, pure numpy."""
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    a = arr.astype(np.float64)
    h, w = a.shape
    if h == 0 or w == 0:
        return 0
    # integral image → exact mean over each of the 8×9 cells
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = a.cumsum(0).cumsum(1)
    rb = np.linspace(0, h, 9).astype(np.int64)     # 8 row bands
    cb = np.linspace(0, w, 10).astype(np.int64)    # 9 col bands
    area = ((rb[1:] - rb[:-1])[:, None]
            * (cb[1:] - cb[:-1])[None, :]).astype(np.float64)
    cells = (ii[rb[1:], :][:, cb[1:]] - ii[rb[:-1], :][:, cb[1:]]
             - ii[rb[1:], :][:, cb[:-1]]
             + ii[rb[:-1], :][:, cb[:-1]]) / np.maximum(area, 1.0)
    bits = (cells[:, :-1] > cells[:, 1:]).ravel()  # 8×8
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class DHasher:
    """Actor-pool stage: in-band image payloads → 64-bit dHash. Decode
    dispatch is magic-sniffing (PNG/GIF/JPEG/AVI frame 0); corrupt
    payloads cost one ok=False row (poison containment, never the
    task)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.image_ops import decode_image

        hashes, ok = [], []
        for payload in batch["payload"]:
            try:
                arr = decode_image(base64.b64decode(payload))
                hashes.append(np.uint64(dhash64(arr)))
                ok.append(True)
            except Exception:  # noqa: BLE001 — poison containment
                hashes.append(np.uint64(0))
                ok.append(False)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].values,
            "media_ref": batch["media_ref"].values,
            "dhash": pd.array(hashes, dtype="uint64"),
            "ok": pd.array(ok, dtype="bool")})


def image_dhash_dups(extracted: rd.Dataset, max_hamming: int = 6,
                     n_buckets: int = 64,
                     concurrency=None) -> pd.DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the cross-format image dedup every multimodal training pipeline
    runs before CLIP-style filtering (a PNG, its GIF re-palette and its
    JPEG re-encode all land within a few dHash bits of each other while
    cryptographic content hashes see three distinct blobs).

    Scale shape: decode+hash is the actor-pool stage (pixels never
    shuffle — each image reduces to 8 bytes in place); candidate
    generation is the EXACT pigeonhole piece trick proven by
    simhash_pairs (max_hamming+1 pieces; any pair within the bound
    agrees on ≥1 piece), shuffled by a bounded bucket column; verify is
    a vectorized in-bucket hamming check. Output one row per qualifying
    unordered pair, (doc_a, ref_a, doc_b, ref_b, hamming) sorted."""
    n_pieces = max_hamming + 1
    piece_bits = 64 // n_pieces

    # explode+hash fused: each image reduces to 8 bytes in the same
    # actor that received it, so payload bytes never re-enter the store
    sigs = extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(DHasher, ("image",), ("image",)),
        batch_format="pyarrow", batch_size=32,
        concurrency=concurrency or _default_pool())

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["ok"]]
        n = len(b)
        if not n:
            return pd.DataFrame({
                "bucket": pd.array([], dtype="int32"),
                "piece_key": pd.array([], dtype="int64"),
                "doc_id": pd.array([], dtype="string"),
                "media_ref": pd.array([], dtype="string"),
                "dhash": pd.array([], dtype="uint64")})
        hs = b["dhash"].to_numpy(np.uint64)
        ps = np.arange(n_pieces, dtype=np.uint64)
        mask = np.uint64((1 << piece_bits) - 1)
        pieces = (hs[:, None] >> (ps[None, :] * np.uint64(piece_bits))) & mask
        keys = ((ps[None, :] << np.uint64(piece_bits)) | pieces).astype(
            np.int64).ravel()
        return pd.DataFrame({
            "bucket": pd.array((keys % n_buckets).astype(np.int32),
                               dtype="int32"),
            "piece_key": pd.array(keys, dtype="int64"),
            "doc_id": np.repeat(b["doc_id"].to_numpy(), n_pieces),
            "media_ref": np.repeat(b["media_ref"].to_numpy(), n_pieces),
            "dhash": pd.array(np.repeat(hs, n_pieces), dtype="uint64")})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated("piece_key", keep=False)]
        out = []
        for _, grp in g.groupby("piece_key", sort=False):
            grp = (grp.sort_values(["doc_id", "media_ref"])
                   .drop_duplicates(["doc_id", "media_ref"]))
            recs = list(zip(grp["doc_id"], grp["media_ref"],
                            grp["dhash"].astype("uint64")))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    d = bin(int(recs[i][2]) ^ int(recs[j][2])).count("1")
                    if d <= max_hamming:
                        out.append((recs[i][0], recs[i][1],
                                    recs[j][0], recs[j][1], d))
        return pd.DataFrame({
            "doc_a": [r[0] for r in out],
            "ref_a": [r[1] for r in out],
            "doc_b": [r[2] for r in out],
            "ref_b": [r[3] for r in out],
            "hamming": pd.array([r[4] for r in out], dtype="int64")})

    df = (sigs.map_batches(bands, batch_format="pandas")
          .repartition(min(16, n_buckets))
          .groupby("bucket").map_groups(bucket_pairs,
                                        batch_format="pandas")
          .to_pandas())
    if df.empty:
        return pd.DataFrame({
            "doc_a": pd.array([], dtype="string"),
            "ref_a": pd.array([], dtype="string"),
            "doc_b": pd.array([], dtype="string"),
            "ref_b": pd.array([], dtype="string"),
            "hamming": pd.array([], dtype="int64")})
    return (df.drop_duplicates(["doc_a", "ref_a", "doc_b", "ref_b"])
            .sort_values(["doc_a", "ref_a", "doc_b", "ref_b"])
            .reset_index(drop=True))


class MotionStats:
    """Actor-pool stage: animated in-band payloads → per-media MOTION
    energy (mean |Δintensity| per pixel per transition, exact integer
    arithmetic) — the shot-boundary / static-clip screen every video
    training pipeline runs before sampling frames (a deck of identical
    frames wastes its token budget; a hard cut wants denser sampling).
    Real decode via the magic-sniffing frame dispatch (APNG /
    animated-GIF / MJPEG-AVI); corrupt payloads cost one sentinel row
    (n_frames −1), static/ref-only media report n_frames accordingly."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.image_ops import decode_image_frames

        rows = {"doc_id": [], "media_ref": [], "n_frames": [],
                "duration_ms": [], "motion_q": []}
        for did, ref, payload in zip(batch["doc_id"], batch["media_ref"],
                                     batch["payload"]):
            n, dur, motion = -1, -1, -1
            if payload:
                try:
                    delays, frames = decode_image_frames(
                        base64.b64decode(payload))
                    n = len(frames)
                    dur = int(sum(delays))
                    if n >= 2:
                        total = 0
                        for a, b in zip(frames, frames[1:]):
                            total += int(np.abs(a.astype(np.int64)
                                                - b.astype(np.int64)).sum())
                        den = (n - 1) * frames[0].size
                        motion = (total * 1_000_000 + den // 2) // den
                    else:
                        motion = 0
                except Exception:  # noqa: BLE001 — poison containment
                    pass
            rows["doc_id"].append(did)
            rows["media_ref"].append(ref)
            rows["n_frames"].append(n)
            rows["duration_ms"].append(dur)
            rows["motion_q"].append(motion)
        return pd.DataFrame({
            "doc_id": rows["doc_id"], "media_ref": rows["media_ref"],
            "n_frames": pd.array(rows["n_frames"], dtype="int64"),
            "duration_ms": pd.array(rows["duration_ms"], dtype="int64"),
            "motion_q": pd.array(rows["motion_q"], dtype="int64")})


def frame_motion_stats(extracted: rd.Dataset, batch_size: int = 32,
                       concurrency=None) -> rd.Dataset:
    """One row per in-band image/video payload with exact-integer motion
    energy (see MotionStats). Pixels never shuffle — each clip reduces
    to three ints in place on the actor pool."""
    return extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(MotionStats, ("image",), ("image",)),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool())


class SceneCuts:
    """Actor-pool stage: animated in-band payloads → one row per HARD
    CUT (shot boundary) — the pre-sampling step of a video training
    pipeline: frames should be drawn per shot, not uniformly across a
    cut. A transition is a cut when its per-pixel jump dwarfs the
    clip's own baseline: jump_q ≥ ``ratio`` × (lower median of the
    OTHER transitions' jumps — leave-one-out, so a 2-frame clip's lone
    cut still registers and the cut's own magnitude never inflates its
    baseline) AND jump_q ≥ ``floor_q`` (≈``floor_q``/1e6 intensity
    levels per pixel — the absolute guard that keeps lossy-codec
    shimmer from counting). A clip where EVERY transition is a cut
    (consecutive-cut slideshow) reads as high motion, not cuts — that
    case is frame_motion_stats territory. Exact integer arithmetic;
    corrupt payloads cost one sentinel row (frame_index −1), never a
    failed task."""

    def __init__(self, ratio: int = 4, floor_q: int = 5_000_000):
        self.ratio = ratio
        self.floor_q = floor_q

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.image_ops import decode_image_frames

        rows = {"doc_id": [], "media_ref": [], "cut_index": [],
                "frame_index": [], "t_ms": [], "jump_q": []}

        def add(did, ref, ci, fi, t, j):
            rows["doc_id"].append(did)
            rows["media_ref"].append(ref)
            rows["cut_index"].append(ci)
            rows["frame_index"].append(fi)
            rows["t_ms"].append(t)
            rows["jump_q"].append(j)

        for did, ref, payload in zip(batch["doc_id"], batch["media_ref"],
                                     batch["payload"]):
            if not payload:
                continue          # ref-only media: no pixels to analyze
            try:
                delays, frames = decode_image_frames(
                    base64.b64decode(payload))
            except Exception:  # noqa: BLE001 — poison containment
                add(did, ref, -1, -1, -1, -1)
                continue
            if len(frames) < 2:
                continue
            size = frames[0].size
            jumps = []
            for a, b in zip(frames, frames[1:]):
                tot = int(np.abs(a.astype(np.int64)
                                 - b.astype(np.int64)).sum())
                jumps.append((tot * 1_000_000 + size // 2) // size)
            ci = 0
            t_ms = 0
            for t, j in enumerate(jumps):
                t_ms += int(delays[t])
                others = sorted(jumps[:t] + jumps[t + 1:])
                med = others[(len(others) - 1) // 2] if others else 0
                if j >= self.floor_q and j >= self.ratio * med:
                    add(did, ref, ci, t + 1, t_ms, j)
                    ci += 1
        return pd.DataFrame({
            "doc_id": rows["doc_id"], "media_ref": rows["media_ref"],
            "cut_index": pd.array(rows["cut_index"], dtype="int32"),
            "frame_index": pd.array(rows["frame_index"], dtype="int32"),
            "t_ms": pd.array(rows["t_ms"], dtype="int64"),
            "jump_q": pd.array(rows["jump_q"], dtype="int64")})


def video_scene_cuts(extracted: rd.Dataset, batch_size: int = 32,
                     concurrency=None) -> rd.Dataset:
    """One row per detected hard cut across every animated in-band
    payload (see SceneCuts). Pixels never shuffle — each clip reduces
    to its cut list in place on the actor pool."""
    return extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(SceneCuts, ("image",), ("image",)),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool())


class VadSegmenter:
    """Actor-pool stage: in-band WAV payloads → speech-activity
    segments by frame energy (the classic energy VAD an ASR pipeline
    runs before transcription, replacing AudioSegmenter's fixed grid
    with content-aware boundaries): ``frame_ms`` frames, a frame is
    ACTIVE when its integer RMS ≥ max(clip RMS / ``thr_div``, 1), and
    maximal active runs of ≥ ``min_speech_ms`` become segments carrying
    their own mean frame-RMS. Exact integer output; corrupt payloads
    cost one sentinel row (seg_index −1); ref-only media skip (energy
    needs samples)."""

    def __init__(self, frame_ms: int = 20, min_speech_ms: int = 200,
                 thr_div: int = 4):
        self.frame_ms = frame_ms
        self.min_speech_ms = min_speech_ms
        self.thr_div = thr_div

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import base64

        from ..functions.wav import decode_wav, rms_of

        rows = {"doc_id": [], "media_ref": [], "seg_index": [],
                "start_ms": [], "end_ms": [], "mean_rms": []}

        def add(did, ref, si, s, e, m):
            rows["doc_id"].append(did)
            rows["media_ref"].append(ref)
            rows["seg_index"].append(si)
            rows["start_ms"].append(s)
            rows["end_ms"].append(e)
            rows["mean_rms"].append(m)

        min_frames = max(1, self.min_speech_ms // self.frame_ms)
        for did, ref, payload in zip(batch["doc_id"], batch["media_ref"],
                                     batch["payload"]):
            if not payload:
                continue
            try:
                rate, samples = decode_wav(base64.b64decode(payload))
            except Exception:  # noqa: BLE001 — poison containment
                add(did, ref, -1, -1, -1, -1)
                continue
            flen = max(1, rate * self.frame_ms // 1000)
            n_f = len(samples) // flen
            if n_f == 0:
                continue
            f = samples[:n_f * flen].astype(np.float64).reshape(n_f, flen)
            frame_rms = np.floor(
                np.sqrt((f * f).mean(axis=1)) + 0.5).astype(np.int64)
            thr = max(rms_of(samples) // self.thr_div, 1)
            active = frame_rms >= thr
            si = 0
            i = 0
            while i < n_f:
                if not active[i]:
                    i += 1
                    continue
                j = i
                while j < n_f and active[j]:
                    j += 1
                if j - i >= min_frames:
                    add(did, ref, si, i * self.frame_ms,
                        j * self.frame_ms,
                        int(frame_rms[i:j].sum()) // (j - i))
                    si += 1
                i = j
        return pd.DataFrame({
            "doc_id": rows["doc_id"], "media_ref": rows["media_ref"],
            "seg_index": pd.array(rows["seg_index"], dtype="int32"),
            "start_ms": pd.array(rows["start_ms"], dtype="int64"),
            "end_ms": pd.array(rows["end_ms"], dtype="int64"),
            "mean_rms": pd.array(rows["mean_rms"], dtype="int64")})


def audio_vad_segments(extracted: rd.Dataset, frame_ms: int = 20,
                       min_speech_ms: int = 200, thr_div: int = 4,
                       concurrency=None,
                       batch_size: int = 16) -> rd.Dataset:
    """Energy-VAD speech segments for every in-band audio payload (see
    VadSegmenter) — content-aware boundaries next to audio_segments'
    fixed ASR framing grid."""
    return extracted.map_batches(
        _FusedExplode,
        fn_constructor_args=(VadSegmenter, ("figure", "audio"), ("audio",),
                             frame_ms, min_speech_ms, thr_div),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or _default_pool())


def link_graph(extracted_corpus: rd.Dataset, k: int = 50) -> pd.DataFrame:
    """OUTLINK harvest over the raw HTML spans of the interleaved
    corpus: per distinct href, how many documents link to it and the
    total anchor occurrences — the link-graph aggregation every
    web-crawl pipeline runs (frontier seeding, boilerplate-link
    identification: a nav href linked from everywhere is chrome, a
    long-tail href is content). Top-k by (n_docs desc, href) plus the
    corpus totals row (href='', the out-of-band rollup).

    Scale shape: anchor extraction is a streaming map_batches over raw
    html spans (regex per span, pure per-doc work); per-batch
    (href, docs, hits) partials ride the combiner tree; the driver sees
    the merged href table (distinct-outlink bounded — at open-web scale
    swap the tree's final stage for mode='bucket' on an href-hash
    key, the documented combiner escape hatch)."""
    from ..functions.html_extract import extract_links
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        total_hits = 0
        n_html = 0
        for spans in batch["spans"]:
            if spans is None:
                continue
            hrefs = set()
            saw_html = False
            for s in spans:
                if s["kind"] != "html":
                    continue
                saw_html = True
                for href, _text in extract_links(s["text"]):
                    total_hits += 1
                    r = rows.setdefault(href, [0, 0])
                    r[1] += 1
                    hrefs.add(href)
            for h in hrefs:
                rows[h][0] += 1
            n_html += int(saw_html)
        out = pd.DataFrame({
            "href": list(rows) + [""],
            "n_docs": pd.array([v[0] for v in rows.values()] + [n_html],
                               dtype="int64"),
            "n_hits": pd.array([v[1] for v in rows.values()]
                               + [total_hits], dtype="int64")})
        return out

    hist = combine_partials(
        extracted_corpus.map_batches(partial, batch_format="pandas"),
        ["href"], {"n_docs": "sum", "n_hits": "sum"}).to_pandas()
    if hist.empty or "href" not in hist.columns:
        return pd.DataFrame({"href": pd.array([], dtype="string"),
                             "n_docs": pd.array([], dtype="int64"),
                             "n_hits": pd.array([], dtype="int64")})
    totals = hist[hist["href"] == ""]
    rest = (hist[hist["href"] != ""]
            .sort_values(["n_docs", "href"], ascending=[False, True])
            .head(k))
    out = pd.concat([totals, rest], ignore_index=True)
    for c in ("n_docs", "n_hits"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def link_hits(extracted_corpus: rd.Dataset, k: int = 20) -> pd.DataFrame:
    """Two-step HITS over the harvested doc→href bipartite graph
    (Kleinberg 1999), EXACT-INT unnormalized: auth₁(h) = indegree,
    hub₁(d) = Σ_{h∈d} auth₁(h), auth₂(h) = Σ_{d∋h} hub₁(d). The L2
    normalization of textbook HITS only rescales — rankings are
    identical without it, so every score is an exact int64 and the
    result is rerun/partition-stable with no float contract (the
    textrank_keywords move, second verse). The ranking separates
    content links (linked from high-hub docs) from uniform nav chrome.

    Scale shape: distinct (doc, href) edges come from one streaming
    pass; indegree rides the combiner tree; hub and second-step
    authority are two more streaming passes with the (href-vocab
    bounded) score map broadcast — a bucket co-partition replaces the
    broadcast past driver scale. Output top-k (href, auth2, indeg),
    (auth2 desc, href)."""
    import ray

    from ..functions.html_extract import extract_links
    from ..stages.agg import combine_partials

    def edges(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, spans in zip(batch["doc_id"], batch["spans"]):
            if spans is None:
                continue
            hrefs = {href for s in spans if s["kind"] == "html"
                     for href, _ in extract_links(s["text"])}
            rows.extend((did, h) for h in hrefs)
        return pd.DataFrame({
            "doc_id": [r[0] for r in rows],
            "href": [r[1] for r in rows],
            "one": pd.array([1] * len(rows), dtype="int64")})

    edge_ds = extracted_corpus.map_batches(
        edges, batch_format="pandas").materialize()
    indeg = combine_partials(edge_ds, ["href"], {"one": "sum"}).to_pandas()
    if indeg.empty or "href" not in indeg.columns:
        return pd.DataFrame({"href": pd.array([], dtype="string"),
                             "auth2": pd.array([], dtype="int64"),
                             "indeg": pd.array([], dtype="int64")})
    indeg_ref = ray.put(dict(zip(indeg["href"],
                                 indeg["one"].astype("int64"))))

    def hub_partial(batch: pd.DataFrame) -> pd.DataFrame:
        a1 = ray.get(indeg_ref)
        h = batch["href"].map(a1).astype("int64")
        g = (pd.DataFrame({"doc_id": batch["doc_id"].values, "hub": h})
             .groupby("doc_id", sort=False)["hub"].sum().reset_index())
        g["hub"] = g["hub"].astype("int64")
        return g

    hubs = combine_partials(
        edge_ds.map_batches(hub_partial, batch_format="pandas"),
        ["doc_id"], {"hub": "sum"}).to_pandas()
    hub_ref = ray.put(dict(zip(hubs["doc_id"],
                               hubs["hub"].astype("int64"))))

    def auth_partial(batch: pd.DataFrame) -> pd.DataFrame:
        hb = ray.get(hub_ref)
        a = batch["doc_id"].map(hb).astype("int64")
        g = (pd.DataFrame({"href": batch["href"].values, "auth2": a})
             .groupby("href", sort=False)["auth2"].sum().reset_index())
        g["auth2"] = g["auth2"].astype("int64")
        return g

    auth2 = combine_partials(
        edge_ds.map_batches(auth_partial, batch_format="pandas"),
        ["href"], {"auth2": "sum"}).to_pandas()
    out = auth2.merge(indeg.rename(columns={"one": "indeg"}), on="href")
    out["auth2"] = out["auth2"].astype("int64")
    out["indeg"] = out["indeg"].astype("int64")
    return (out.sort_values(["auth2", "href"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def image_dup_verified_pairs(extracted: rd.Dataset, max_hamming: int = 6,
                             mae_threshold: int = 8) -> pd.DataFrame:
    """The VERIFY stage for perceptual-hash image dedup (the
    minhash_verified_pairs move, image edition): dHash candidates
    (hamming ≤ ``max_hamming``) are checked against the REAL decoded
    pixels — a pair is an exact dup if the decoded arrays' md5 digests
    match (identical pixels under any container format), else a near
    dup if the 16×16 area-mean thumbnails differ by mean-abs-error ≤
    ``mae_threshold`` intensity levels (the lossy-re-encode case).

    Scale shape: candidates come from image_dhash_dups' pigeonhole
    shuffle; the verify pass streams the corpus ONCE with the
    (candidate-bounded) doc-id set broadcast, reducing each candidate
    image to a 32-byte digest + 256-int thumbnail in place — pixels
    never leave the worker, the driver compares candidate-pair-many
    tiny artifacts. Output (doc_a, ref_a, doc_b, ref_b, exact, mae_q),
    verified pairs only, sorted."""
    import base64
    import hashlib

    import ray

    cand = image_dhash_dups(extracted, max_hamming=max_hamming)
    empty = pd.DataFrame({
        "doc_a": pd.array([], dtype="string"),
        "ref_a": pd.array([], dtype="string"),
        "doc_b": pd.array([], dtype="string"),
        "ref_b": pd.array([], dtype="string"),
        "exact": pd.array([], dtype="int64"),
        "mae_q": pd.array([], dtype="int64")})
    if cand.empty:
        return empty
    wanted = frozenset(zip(cand["doc_a"], cand["ref_a"])) \
        | frozenset(zip(cand["doc_b"], cand["ref_b"]))
    wanted_ref = ray.put(wanted)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.image_ops import decode_image

        want = ray.get(wanted_ref)
        rows = {"doc_id": [], "media_ref": [], "digest": [],
                "thumb": []}
        for did, ref, payload in zip(batch["doc_id"],
                                     batch["media_ref"],
                                     batch["payload"]):
            if (did, ref) not in want:
                continue
            try:
                arr = decode_image(base64.b64decode(payload))
            except Exception:  # noqa: BLE001 — poison containment
                continue
            if arr.ndim == 3:
                arr = arr.mean(axis=2)
            a = arr.astype(np.float64)
            h, w = a.shape
            ii = np.zeros((h + 1, w + 1))
            ii[1:, 1:] = a.cumsum(0).cumsum(1)
            rb = np.linspace(0, h, 17).astype(np.int64)
            cb = np.linspace(0, w, 17).astype(np.int64)
            area = np.maximum((rb[1:] - rb[:-1])[:, None]
                              * (cb[1:] - cb[:-1])[None, :], 1)
            cells = (ii[rb[1:], :][:, cb[1:]] - ii[rb[:-1], :][:, cb[1:]]
                     - ii[rb[1:], :][:, cb[:-1]]
                     + ii[rb[:-1], :][:, cb[:-1]]) / area
            rows["doc_id"].append(did)
            rows["media_ref"].append(ref)
            rows["digest"].append(
                hashlib.md5(np.ascontiguousarray(
                    arr.astype(np.uint8)).tobytes()
                    + str(arr.shape).encode()).hexdigest())
            rows["thumb"].append(cells.ravel())
        return pd.DataFrame(rows)

    # explode+probe fused: each image reduces to a digest + 8×8 thumb in
    # the task that received it — payload bytes enter the store once
    sigs = extracted.map_batches(
        lambda b: probe(
            _explode_payload(b, ("image",), ("image",)).to_pandas()),
        batch_format="pyarrow").to_pandas()
    meta = {(d, r): (dg, th) for d, r, dg, th in
            zip(sigs["doc_id"], sigs["media_ref"],
                sigs["digest"], sigs["thumb"])}
    out = {"doc_a": [], "ref_a": [], "doc_b": [], "ref_b": [],
           "exact": [], "mae_q": []}
    for da, ra, db, rb_ in zip(cand["doc_a"], cand["ref_a"],
                               cand["doc_b"], cand["ref_b"]):
        ma, mb = meta.get((da, ra)), meta.get((db, rb_))
        if ma is None or mb is None:
            continue
        exact = int(ma[0] == mb[0])
        mae = float(np.abs(ma[1] - mb[1]).mean())
        if not exact and mae > mae_threshold:
            continue
        out["doc_a"].append(da)
        out["ref_a"].append(ra)
        out["doc_b"].append(db)
        out["ref_b"].append(rb_)
        out["exact"].append(exact)
        out["mae_q"].append(int(np.floor(mae * 1e6 + 0.5)))
    df = pd.DataFrame(out)
    if df.empty:
        return empty
    df["exact"] = df["exact"].astype("int64")
    df["mae_q"] = df["mae_q"].astype("int64")
    return (df.sort_values(["doc_a", "ref_a", "doc_b", "ref_b"])
            .reset_index(drop=True))


def anchor_text_index(extracted_corpus: rd.Dataset,
                      k: int = 20, top_words: int = 3) -> pd.DataFrame:
    """Anchor-text aggregation — the classic web-search relevance
    signal: for each outlink target, which words do OTHER documents use
    when linking to it (Google's original anchor trick; also the
    cleanest boilerplate tell — chrome links carry the same one or two
    words everywhere). For the ``k`` most-linked hrefs, the
    ``top_words`` most frequent whitespace-lowercased anchor words with
    counts, ties broken lexically.

    Scale shape: anchor harvesting is the same streaming pass as
    link_graph; (href, word, n) partials ride the combiner tree; the
    driver ranks within the (outlink-vocabulary bounded) merged table —
    at open-web scale the final combine flips to mode='bucket' on the
    href hash, the documented escape hatch."""
    from ..functions.html_extract import extract_links
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict = {}
        for spans in batch["spans"]:
            if spans is None:
                continue
            for s in spans:
                if s["kind"] != "html":
                    continue
                for href, text in extract_links(s["text"]):
                    for w in text.lower().split():
                        key = (href, w)
                        counts[key] = counts.get(key, 0) + 1
        return pd.DataFrame({
            "href": [h for h, _ in counts],
            "word": [w for _, w in counts],
            "n": pd.array(list(counts.values()), dtype="int64")})

    hist = combine_partials(
        extracted_corpus.map_batches(partial, batch_format="pandas"),
        ["href", "word"], {"n": "sum"}).to_pandas()
    if hist.empty or "href" not in hist.columns:
        return pd.DataFrame({"href": pd.array([], dtype="string"),
                             "word": pd.array([], dtype="string"),
                             "n": pd.array([], dtype="int64")})
    by_href = (hist.groupby("href")["n"].sum()
               .sort_values(ascending=False))
    keep = sorted(by_href.head(k).index)
    rows = []
    for href in keep:
        g = (hist[hist["href"] == href]
             .sort_values(["n", "word"], ascending=[False, True])
             .head(top_words))
        rows.append(g)
    out = pd.concat(rows, ignore_index=True) if rows else hist.iloc[:0]
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)
