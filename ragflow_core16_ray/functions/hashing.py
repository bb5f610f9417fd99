"""Stable content hashing + fingerprints (pure functions).

The reference uses xxhash.xxh64(content + doc_id) for chunk ids
(rag/svr/task_executor.py:266). xxhash is absent here; blake2b truncated to
64 bits plays the same role (stable across processes — Python's builtin
``hash`` is salted and must never be used for distributed keys).
"""

from __future__ import annotations

import hashlib
import zlib


def hash64(text: str) -> int:
    """Stable unsigned 64-bit hash of a string."""
    return int.from_bytes(
        hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest(), "big"
    )


def content_id(content: str, doc_id: str) -> str:
    """Chunk id = stable hash of content + doc_id (role of
    rag/svr/task_executor.py:266)."""
    return hashlib.blake2b(
        (content + doc_id).encode("utf-8"), digest_size=8
    ).hexdigest()


def md5_hash64(text: str) -> int:
    """64-bit word hash equal to DuckDB's ``md5_number_lower`` (the low
    half of the md5 digest, little-endian) — chosen for the simhash
    pipeline so its oracle can recompute identical signatures in SQL."""
    return int.from_bytes(
        hashlib.md5(text.encode("utf-8")).digest()[8:16], "little")


def md5_hex(text: str) -> str:
    """md5 hexdigest — chosen for the oracled fingerprint query because
    DuckDB's md5() produces the identical string."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def crc32(text: str) -> int:
    return zlib.crc32(text.encode("utf-8")) & 0xFFFFFFFF


_B = 1_000_000_007
_M = (1 << 61) - 1


def winnow_fingerprint(text: str, k: int = 8, w: int = 4) -> int:
    """Document fingerprint via winnowing (Schleimer/Wilkerson/Aiken 2003,
    public): polynomial rolling hash over k-grams of the character stream,
    then min-hash per window of w consecutive k-gram hashes, folded to one
    61-bit value. Deterministic; robust to formatting edits while any edit
    region spanning ≥ w+k-1 chars is guaranteed to alter some selected
    window minimum (the winnowing guarantee)."""
    s = text.encode("utf-8")
    n = len(s)
    if n < k:
        return hash64(text) & _M
    # rolling k-gram hashes
    pow_k = pow(_B, k - 1, _M)
    h = 0
    grams = []
    for i, b in enumerate(s):
        h = (h * _B + b) % _M
        if i >= k - 1:
            grams.append(h)
            h = (h - s[i - k + 1] * pow_k) % _M
    # fold the selected window-minimum hashes with a multiplicative mix
    # (an XOR fold cancels on periodic text with even repetition counts)
    fp = 1469598103934665603
    if len(grams) <= w:
        for g in grams:
            fp = (fp * 1099511628211 + g) % _M
        return fp
    last = -1
    for i in range(len(grams) - w + 1):
        g = min(grams[i : i + w])
        if g != last:
            fp = (fp * 1099511628211 + g) % _M
            last = g
    return fp
