"""Answer-grounding citation insertion — the deterministic core of the
reference's ``Dealer.insert_citations`` (rag/nlp/search.py:158-245):
split the answer into sentence pieces (code fences kept whole), score
every piece against every retrieved chunk with the 0.1/0.9 hybrid
similarity, walk the 0.63 → ×0.8 threshold ladder until something
cites, and append `` ##i$$`` markers after each cited piece (top
matches within 1% of the max, ≤4 per piece, each chunk cited once).

The reference encodes pieces with its GPU embedding model and weights
tokens with the dictionary term-weight dealer; this engine substitutes
the feature-hash encoder (stages/embed — the same stand-in the rest of
the retrieval stack uses) and uniform token weights (the
dictionary-free reduction of tw.weights, making token_similarity the
matched-token mass ratio). Everything else — the piece regexes, the
<5-char piece filter, the ladder, the marker format — follows the
reference line for line.
"""

from __future__ import annotations

import re

import numpy as np

# sentence boundary: CJK enders / newline not after '|', or latin
# sentence punctuation after a lowercase letter (search.py:163,184)
_BOUND = r"([^\|][；。？!！\n]|[a-z][.?;!][ \n])"
_BOUND_RE = re.compile(_BOUND)


def split_answer_pieces(answer: str) -> list[str]:
    """Code-fence-aware sentence split (search.py:163-188): fenced
    blocks stay single pieces; boundary fragments re-attach their first
    char to the previous piece."""
    pieces = re.split(r"(```)", answer)
    if len(pieces) >= 3:
        out: list[str] = []
        i = 0
        while i < len(pieces):
            if pieces[i] == "```":
                st = i
                i += 1
                while i < len(pieces) and pieces[i] != "```":
                    i += 1
                if i < len(pieces):
                    i += 1
                out.append("".join(pieces[st:i]) + "\n")
            else:
                out.extend(re.split(_BOUND, pieces[i]))
                i += 1
        pieces = out
    else:
        pieces = re.split(_BOUND, answer)
    for i in range(1, len(pieces)):
        if pieces[i] is None:
            pieces[i] = ""
        if _BOUND_RE.match(pieces[i]):
            pieces[i - 1] += pieces[i][0]
            pieces[i] = pieces[i][1:]
    return [p if p is not None else "" for p in pieces]


def _token_sim(a_tokens: list[str], b_tokens_list: list[list[str]]
               ) -> np.ndarray:
    """Uniform-weight token_similarity (query.py:213-239 with w≡1):
    (1e-9 + |matched token mass|) / (1e-9 + |query token mass|); a
    repeated query token carries its multiplicity, like toDict's +=."""
    from collections import Counter

    aw = Counter(a_tokens)
    q = 1e-9 + sum(aw.values())
    out = np.empty(len(b_tokens_list))
    for j, btks in enumerate(b_tokens_list):
        bset = set(btks)
        out[j] = (1e-9 + sum(c for t, c in aw.items() if t in bset)) / q
    return out


def insert_citations(answer: str, chunks: list[str],
                     chunk_vs: np.ndarray | None = None,
                     tkweight: float = 0.1, vtweight: float = 0.9,
                     dim: int = 64) -> tuple[str, set[int]]:
    """→ (answer with `` ##i$$`` markers, set of cited chunk indices).
    ``chunk_vs`` defaults to the hash-embedder vectors of the chunks."""
    from .query_rewrite import rm_www
    from .tokenizer import tokenize
    from ..stages.embed import _norm_rows, sums_matrix

    if not chunks:
        return answer, set()
    pieces = split_answer_pieces(answer)
    idx, kept = [], []
    for i, t in enumerate(pieces):
        if len(t) < 5:
            continue
        idx.append(i)
        kept.append(t)
    if not kept:
        return answer, set()

    ans_v = _norm_rows(sums_matrix([" ".join(tokenize(p)) for p in kept],
                                   dim))
    if chunk_vs is None:
        chunk_vs = _norm_rows(sums_matrix(
            [" ".join(tokenize(c)) for c in chunks], dim))
    chunks_tks = [rm_www(tokenize(c)) for c in chunks]
    piece_tks = [rm_www(tokenize(p)) for p in kept]

    cites: dict[int, list[str]] = {}
    thr = 0.63
    while thr > 0.3 and not cites and kept and chunks_tks:
        for i in range(len(kept)):
            vtsim = chunk_vs @ ans_v[i]
            tksim = _token_sim(piece_tks[i], chunks_tks)
            sim = (tksim if float(np.sum(vtsim)) == 0
                   else vtweight * vtsim + tkweight * tksim)
            mx = float(np.max(sim)) * 0.99
            if mx < thr:
                continue
            # the reference truncates list(set(...))[:4] — set order is
            # hash-seed dependent; sorting numerically keeps this
            # engine's run-to-run determinism contract
            cites[idx[i]] = [str(j) for j in sorted(
                j for j in range(len(chunks)) if sim[j] > mx)][:4]
        thr *= 0.8

    res = ""
    seen: set[str] = set()
    for i, p in enumerate(pieces):
        res += p
        if i not in idx or i not in cites:
            continue
        for c in cites[i]:
            if c in seen:
                continue
            res += f" ##{c}$$"
            seen.add(c)
    return res, {int(c) for c in seen}
