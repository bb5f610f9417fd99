"""Token-budget chunk packing (role of rag/nlp/__init__.py:510-541
``naive_merge``).

Semantics: each section is split into sentence pieces on the configured
delimiter set (delimiters stay attached to the preceding piece, so
concatenation reconstructs the section text); pieces are greedily packed
into chunks; a chunk is flushed once it holds > ``chunk_token_num`` tokens
(the reference's ``tk_nums[-1] > chunk_token_num`` rule — a chunk may
overshoot by one piece, it is never split mid-piece). Sections are joined
with a newline inside a chunk.

Pure, deterministic; token currency = functions.tokenizer.num_tokens.
Token counts are taken on TAG-FREE text: with keep_positions the sections
carry in-band ``@@…##`` positional tags, and the reference packs on the
tag-free text while carrying positions separately (rag/nlp/__init__.py
naive_merge + add_positions) — so chunk boundaries must not shift when
tags are enabled.
"""

from __future__ import annotations

import re

from .postag import strip_tags
from .tokenizer import num_tokens


def split_on_delimiters(text: str, delimiter: str) -> list[str]:
    """Split keeping each delimiter char attached to the preceding piece."""
    if not text:
        return []
    pattern = "([" + re.escape(delimiter) + "])"
    parts = re.split(pattern, text)
    pieces: list[str] = []
    for p in parts:
        if not p:
            continue
        if pieces and len(p) == 1 and p in delimiter:
            pieces[-1] += p
        else:
            pieces.append(p)
    return pieces


def naive_merge(sections: list[str], chunk_token_num: int = 128,
                delimiter: str = "\n!?。；！？",
                counter=None) -> list[str]:
    """``counter`` picks the token currency: None → the max-match counter
    (functions.tokenizer.num_tokens); pass functions.bpe_counter.
    bpe_num_tokens for frozen-vocab budgets (ExtractConfig.token_counter
    routes this)."""
    count = counter or num_tokens
    chunks: list[str] = [""]
    counts: list[int] = [0]

    def add(piece: str, new_section: bool):
        tnum = count(strip_tags(piece))
        if counts[-1] > chunk_token_num:
            chunks.append(piece)
            counts.append(tnum)
            return
        if chunks[-1] and new_section:
            chunks[-1] += "\n"
            counts[-1] += 1
        chunks[-1] += piece
        counts[-1] += tnum

    for sec in sections:
        first = True
        for piece in split_on_delimiters(sec, delimiter):
            add(piece, first)
            first = False
    return [c for c in (c.strip("\n") for c in chunks) if c]
