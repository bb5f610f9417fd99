"""Frozen-vocabulary BPE token counting.

The reference prices chunk budgets in tiktoken tokens
(rag/utils/__init__.py:81-90 num_tokens_from_string); tiktoken is not in
this container, so this module ships the same contract a different way:
a merge table frozen into the package (ragflow_core16_ray/data/
bpe_merges.tsv, produced by tools/freeze_bpe.py from the Sennrich
trainer in pipelines/text_analysis.py) applied by rank — chunk
boundaries under ``ExtractConfig(token_counter="bpe")`` are reproducible
across machines and runs exactly like tiktoken's frozen encodings.

Pre-tokenization is whitespace (the trainer's convention); words absent
from the merge closure degrade gracefully toward character tokens, which
upper-bounds the budget rather than undercounting it.
"""

from __future__ import annotations

import os

_MERGES_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "bpe_merges.tsv")

_RANKS: dict[tuple[str, str], int] | None = None
_CACHE: dict[str, int] = {}
_CACHE_MAX = 65536  # per-process word cache; synthetic vocab ≪ this


def bpe_encode_word(word: str, ranks: dict) -> list:
    """Apply merge ranks greedily (lowest rank first) to one word. The
    canonical encode loop — pipelines/text_analysis.bpe_token_counts and
    the pytest replicas all run this function."""
    w = list(word) + ["</w>"]
    while len(w) > 1:
        best_i, best_r = -1, None
        for i in range(len(w) - 1):
            r = ranks.get((w[i], w[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        w[best_i:best_i + 2] = [w[best_i] + w[best_i + 1]]
    return w


def load_ranks(path: str = _MERGES_PATH) -> dict[tuple[str, str], int]:
    """(left, right) → rank from a frozen merges TSV (one per process)."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            left, right = line.rstrip("\n").split("\t")
            ranks[(left, right)] = len(ranks)
    return ranks


def _ranks() -> dict[tuple[str, str], int]:
    global _RANKS
    if _RANKS is None:
        _RANKS = load_ranks()
    return _RANKS


def bpe_num_tokens(text: str) -> int:
    """Token count under the frozen merge table. Deterministic; memoized
    per distinct word per process (the encode loop is O(len²·merges))."""
    if not text:
        return 0
    ranks = _ranks()
    total = 0
    for w in text.split():
        n = _CACHE.get(w)
        if n is None:
            n = len(bpe_encode_word(w, ranks))
            if len(_CACHE) < _CACHE_MAX:
                _CACHE[w] = n
        total += n
    return total
