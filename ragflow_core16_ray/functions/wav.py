"""Pure-Python WAV (RIFF/PCM) codec — the sandbox has no soundfile or
ffmpeg, so this is the real probe/decode kernel behind the audio framing
stage (role of the decoder in front of the reference's audio template,
rag/app/audio.py:25-44, whose transcription itself is an external LLM
call and stays out of scope).

Scope: canonical RIFF/WAVE with a PCM ``fmt `` chunk (format tag 1),
16-bit samples, any channel count / sample rate; unknown chunks are
skipped by size (the spec's rule), so files with LIST/INFO metadata
parse fine. The encoder emits the minimal mono layout the synthetic
corpus uses — deterministic bytes for given samples.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → canonical 44-byte-header WAV bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(pcm))
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 samples[n, channels] squeezed to
    1-D for mono). Raises ValueError on non-WAV / non-PCM16 input."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={fmt_tag} bits={bits}); "
                    "only PCM16 decodes here")
        elif tag == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    samples = np.frombuffer(pcm[:len(pcm) - len(pcm) % (2 * channels)],
                            dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return rate, samples


def rms_of(samples: np.ndarray) -> int:
    """Integer RMS energy of an int16 window (rounded half-up) — the
    deterministic energy feature the segment rows carry; 0 = silence."""
    if samples.size == 0:
        return 0
    mean_sq = float(np.mean(samples.astype(np.float64) ** 2))
    return int(np.floor(np.sqrt(mean_sq) + 0.5))
