"""Plain-text and JSON splitters.

- ``txt_split``: the reference's TXT chunker semantics
  (deepdoc/parser/txt_parser.py:28-64): the delimiter string may contain
  backtick-quoted multi-char delimiters (e.g. "\\n!?;。；！？`##`");
  text splits on any of them (delimiter attached to the preceding piece)
  and pieces greedily merge up to the token budget.
- ``json_split``: the reference's recursive structure-preserving JSON
  splitter (deepdoc/parser/json_parser.py:25-133): a value serializing
  within ``max_size`` is one chunk; dicts partition their keys into
  size-bounded sub-dicts (oversized values recurse); lists become
  {index: value} dicts first.
"""

from __future__ import annotations

import json
import re

from .tokenizer import num_tokens


def parse_delimiters(delimiter: str) -> list[str]:
    """Backtick-quoted substrings are multi-char delimiters; every other
    char is a single-char delimiter. Longest-first for regex alternation."""
    dels: list[str] = []
    i = 0
    while i < len(delimiter):
        if delimiter[i] == "`":
            j = delimiter.find("`", i + 1)
            if j > i + 1:
                dels.append(delimiter[i + 1:j])
                i = j + 1
                continue
        dels.append(delimiter[i])
        i += 1
    # longest-first for the regex alternation; lexicographic within a
    # length so the order is deterministic (set order is not)
    return sorted(set(d for d in dels if d), key=lambda d: (-len(d), d))


def txt_split(text: str, chunk_token_num: int = 128,
              delimiter: str = "\n!?;。；！？") -> list[str]:
    dels = parse_delimiters(delimiter)
    if not dels:
        return [text] if text else []
    pattern = "(" + "|".join(re.escape(d) for d in dels) + ")"
    parts = re.split(pattern, text)
    pieces: list[str] = []
    for p in parts:
        if not p:
            continue
        if pieces and p in dels:
            pieces[-1] += p
        else:
            pieces.append(p)
    chunks: list[str] = [""]
    counts = [0]
    for piece in pieces:
        t = num_tokens(piece)
        if counts[-1] > chunk_token_num:
            chunks.append(piece)
            counts.append(t)
        else:
            chunks[-1] += piece
            counts[-1] += t
    return [c.strip() for c in chunks if c.strip()]


def _size(obj) -> int:
    return len(json.dumps(obj, ensure_ascii=False))


def json_split(obj, max_size: int = 512, min_size: int = 32) -> list[str]:
    """Split a JSON structure into serialized chunks ≤ max_size where
    possible (a single scalar larger than max_size stays whole)."""
    out: list[str] = []

    def rec(o):
        if _size(o) <= max_size:
            out.append(json.dumps(o, ensure_ascii=False))
            return
        if isinstance(o, list):
            o = {str(i): v for i, v in enumerate(o)}
        if isinstance(o, dict):
            bucket: dict = {}
            for key, val in o.items():
                if _size(val) > max_size:
                    if bucket:
                        out.append(json.dumps(bucket, ensure_ascii=False))
                        bucket = {}
                    if isinstance(val, (dict, list)):
                        rec(val)
                    else:
                        out.append(json.dumps({key: val}, ensure_ascii=False))
                    continue
                bucket[key] = val
                if _size(bucket) >= max_size:
                    out.append(json.dumps(bucket, ensure_ascii=False))
                    bucket = {}
            if bucket:
                out.append(json.dumps(bucket, ensure_ascii=False))
            return
        out.append(json.dumps(o, ensure_ascii=False))

    rec(obj)
    # glue tiny trailing chunks forward (the reference's min-size behavior)
    merged: list[str] = []
    for c in out:
        if merged and len(c) < min_size and len(merged[-1]) + len(c) <= max_size:
            prev = json.loads(merged[-1])
            cur = json.loads(c)
            if isinstance(prev, dict) and isinstance(cur, dict):
                prev.update(cur)
                merged[-1] = json.dumps(prev, ensure_ascii=False)
                continue
        merged.append(c)
    return merged
