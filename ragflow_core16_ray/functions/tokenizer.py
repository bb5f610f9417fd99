"""Token counting + text normalization (pure functions, no external deps).

The reference counts tokens with tiktoken cl100k_base
(rag/utils/__init__.py:81-90) and normalizes full-width chars with
``_strQ2B`` (rag/nlp/rag_tokenizer.py:101-110). tiktoken is not present in
this sandbox, so we implement a deterministic BPE-ish regex tokenizer of the
same family (GPT-2-style word/number/punct splitting published in the GPT-2
code release, with CJK chars counted one per char, approximating cl100k's
behavior on CJK). All goldens and budgets in this repo use THIS counter, so
the engine is self-consistent.

The regexes are compiled at module import — i.e. once per Ray worker
process — so per-batch calls pay no compile cost (the actor-state rule from
SURVEY.md §2.3 for the tokenizer singleton, rag/nlp/rag_tokenizer.py:31-98).
"""

from __future__ import annotations

import regex as re

# GPT-2-family pretokenizer (public, from the GPT-2/tiktoken releases),
# with an extra CJK branch so each Han/Kana/Hangul char is its own token.
_TOKEN_RE = re.compile(
    r"[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]"
    r"|'(?:[sdmt]|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)"
    r"|\s+",
    re.UNICODE,
)

_WS_RE = re.compile(r"\s+")


def tokenize(text: str) -> list[str]:
    """BPE-ish pretokenization of ``text``."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)


def num_tokens(text: str) -> int:
    """Deterministic token count (the engine's chunk_token_num currency;
    role of rag/utils/__init__.py:81-90 num_tokens_from_string)."""
    if not text:
        return 0
    return len(_TOKEN_RE.findall(text))


def ws_tokens(text: str) -> list[str]:
    """Plain whitespace tokenization (used by the SQL-oracled token-count
    query; trivially expressible in DuckDB)."""
    t = text.strip()
    if not t:
        return []
    return _WS_RE.split(t)


def str_q2b(s: str) -> str:
    """Full-width → half-width normalization (semantics of
    rag/nlp/rag_tokenizer.py:101-110 _strQ2B: U+3000 → space, U+FF01–FF5E →
    ASCII)."""
    out = []
    for ch in s:
        code = ord(ch)
        if code == 0x3000:
            code = 0x20
        elif 0xFF01 <= code <= 0xFF5E:
            code -= 0xFEE0
        out.append(chr(code))
    return "".join(out)


_CJK_RE = re.compile(r"[\p{Han}]")
_LATIN_RE = re.compile(r"[A-Za-z]")


def is_english(texts: list[str]) -> bool:
    """Deterministic language check: full scan, no sampling (the reference
    samples with random.choices — rag/nlp/__init__.py:227-236,
    pdf_parser.py:1043-1050; we replace that with an exact ratio per the
    determinism requirement in SURVEY.md §2.6)."""
    latin = cjk = 0
    for t in texts:
        latin += len(_LATIN_RE.findall(t))
        cjk += len(_CJK_RE.findall(t))
    return latin >= cjk
