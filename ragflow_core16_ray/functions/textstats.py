"""Text analysis for training-data pipelines: language id, quality
scoring, token counting, shingling, fingerprints.

These back the `queries()` text-analysis entries and the dedup pipelines.
All pure; vectorization happens in the calling map_batches stage. The
quality counters are all integers so the DuckDB oracle hashes match
exactly (no float drift).
"""

from __future__ import annotations

import re

# on LOWERED text, and char-for-char identical to the oracle SQL's
# '[a-zà-ÿ]' class (a wider Python class would count ß/× as word chars
# that DuckDB treats as delimiters, silently diverging the hash gate)
_WORD_RE = re.compile(r"[a-zà-ÿ]+")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_CJK_RE = re.compile(r"[一-鿿]")

# marker stopwords per language (public-knowledge function-word lists)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "fr": {"le", "la", "les", "de", "et", "est", "une", "que", "des", "dans"},
    "es": {"el", "la", "los", "de", "y", "es", "una", "que", "las", "en"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "den", "von"},
}
_LANG_ORDER = ("en", "fr", "es", "de")  # deterministic tie-break priority

_STOPWORDS = _LANG_MARKERS["en"]


def lang_id(text: str) -> str:
    """n-gram/function-word heuristic language id over {en,fr,es,de,zh}.
    CJK density decides zh; else the language whose marker set hits the
    most tokens (ties broken by fixed priority order)."""
    if not text:
        return "en"
    n_cjk = len(_CJK_RE.findall(text))
    words = _WORD_RE.findall(text.lower())
    if n_cjk > max(1, len(words)) * 0.5:
        return "zh"
    best, best_n = "en", -1
    for lang in _LANG_ORDER:
        n = sum(1 for w in words if w in _LANG_MARKERS[lang])
        if n > best_n:
            best, best_n = lang, n
    return best


def quality_counts(text: str) -> dict:
    """Integer quality counters (length / punctuation / stopword ratios are
    derived client-side): n_chars, n_ws_tokens, n_punct, n_stop, n_upper,
    n_digit, max_word_len."""
    toks = text.split()
    words = _WORD_RE.findall(text.lower())  # class matches lowered text
    return {
        "n_chars": len(text),
        "n_ws_tokens": len(toks),
        "n_punct": len(_PUNCT_RE.findall(text)),
        "n_stop": sum(1 for w in words if w in _STOPWORDS),
        "n_upper": sum(1 for ch in text if ch.isupper()),
        "n_digit": sum(1 for ch in text if ch.isdigit()),
        "max_word_len": max((len(w) for w in toks), default=0),
    }


def word_shingles(text: str, k: int = 3) -> set[str]:
    """k-word shingles over the lowercased word stream (basis for Jaccard /
    MinHash dedup)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def char_ngrams(text: str, n: int = 4) -> set[str]:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < n:
        return {t} if t else set()
    return {t[i:i + n] for i in range(len(t) - n + 1)}


# --------------------------- vectorized whitespace-token kernels ---------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def ws_tok_arrays(text):
    """Whitespace-tokenize an Arrow string column → (flat token array,
    parent row index per token, per-row non-empty token count). The
    canonical tokenize kernel every full-corpus streaming pass shares
    (``utf8_split_whitespace`` emits empty tokens at leading/trailing/
    run whitespace, so lengths count only non-empty tokens; equality
    masks never match "" for non-empty needles)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.utf8_split_whitespace(text)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.bincount(parent[keep], minlength=len(text)).astype(np.int64)
    return flat, parent, dl


def gopher_flag_arrays(text):
    """(n, 4) bool matrix of the Gopher lexical rules — [length,
    mean-word-length, alpha-fraction, stopword-presence], the same
    integer thresholds as text_analysis.gopher_filter. ONE vectorized
    implementation shared by the standalone query, clean.py's hard
    screen and its per-rule rollup, so the three can't drift."""
    import numpy as np
    import pyarrow.compute as pc

    flat, parent, nw = ws_tok_arrays(text)
    n = len(nw)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    nc = np.bincount(parent[keep], weights=lens[keep],
                     minlength=n).astype(np.int64)
    am = pc.match_substring_regex(flat, "[A-Za-z]") \
        .to_numpy(zero_copy_only=False)
    na = np.bincount(parent[am], minlength=n).astype(np.int64)
    low = pc.utf8_lower(flat)
    ns = np.zeros(n, dtype=np.int64)
    for sw in GOPHER_STOPWORDS:   # DISTINCT stopwords present
        m = pc.equal(low, sw).to_numpy(zero_copy_only=False)
        ns += np.bincount(parent[m], minlength=n) > 0
    return np.stack([
        (nw >= 50) & (nw <= 100_000),
        (3 * nw <= nc) & (nc <= 10 * nw),
        5 * na >= 4 * nw,
        ns >= 2], axis=1), nw, nc, na, ns
