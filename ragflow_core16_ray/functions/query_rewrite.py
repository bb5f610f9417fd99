"""Query-side rewrite: interrogative stripping, synonym expansion and
weighted query composition.

Role mapping to the reference:

- ``lookup`` is rag/nlp/synonym.py ``Dealer.lookup`` — dictionary
  synonyms capped at ``topn`` (the reference additionally consults
  wordnet for pure-ascii tokens; wordnet is not in this sandbox, so the
  built-in table below carries both roles).
- ``rm_www`` is rag/nlp/query.py ``FulltextQueryer.rmWWW`` — drop
  interrogatives and function words from the question, falling back to
  the original text when everything got stripped.
- ``rewrite_query`` is the English branch of ``FulltextQueryer.question``
  (query.py:76-120): normalize (lower, full→half width, trad→simp),
  strip punctuation, rmWWW, tokenize; per token collect capped
  synonyms; weight synonyms at ``w/4`` and adjacent-bigram phrases at
  ``2·max(w_left, w_right)`` — those three ratios are the reference's
  (query.py:96-112). Term weights themselves are supplied by the caller
  (corpus idf in pipelines/similarity.py — this engine's dictionary-free
  substitute for the reference's frozen term_weight tables), normalized
  to sum 1 over the unigrams like term_weight.Dealer.weights.
- ``query_string`` renders the Lucene-ish weighted string
  ``(tk^w "syn"^w/4 …) … "a b"^2w`` for parity/debugging — fixture-
  pinned in tests/test_query_rewrite.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .tokenizer import str_q2b, tradi2simp

# built-in synonym table (role of the reference's synonym.json +
# wordnet): domain vocabulary of the corpus plus a few CJK pairs;
# values are ordered, lookup caps at topn like the reference
SYNONYMS: dict[str, list[str]] = {
    "hash": ["digest", "checksum", "key"],
    "table": ["relation", "grid"],
    "scan": ["sweep", "read", "filter"],
    "merge": ["combine", "join"],
    "sort": ["order", "rank"],
    "query": ["search", "lookup"],
    "shard": ["partition", "split"],
    "worker": ["executor", "node"],
    "cache": ["buffer", "store"],
    "pipeline": ["dataflow", "stream"],
    "index": ["catalog", "registry"],
    "vector": ["embedding", "array"],
    "chunk": ["segment", "block"],
    "token": ["term", "word"],
    "数据": ["资料"],
    "查询": ["检索"],
}

# interrogatives + function words rmWWW strips (the reference's three
# regex passes, query.py:56-74, expressed as token sets)
_WH = frozenset("what who how which where why when whats who's".split())
_FUNCTION = frozenset(
    "is are was were be been do does did don't doesn't didn't has have "
    "had there you me your my mine just please may i should would will "
    "won't wouldn't done go for with so the a an by i'm it's he's she's "
    "they they're you're as on in at up out down of to or and if".split())

_PUNCT_RE = re.compile(r"[ :|\r\n\t,，。？?/`!！&^%()\[\]{}<>]+")


def lookup(tk: str, topn: int = 8) -> list[str]:
    """Synonyms of one token, capped (synonym.py:lookup)."""
    res = SYNONYMS.get(re.sub(r"[ \t]+", " ", tk.lower()), [])
    if isinstance(res, str):
        res = [res]
    return res[:topn]


def rm_www(tokens: list[str]) -> list[str]:
    """Strip interrogatives + function words; keep the original when
    everything would be stripped (rmWWW's fallback)."""
    kept = [t for t in tokens if t not in _WH and t not in _FUNCTION]
    return kept if kept else tokens


@dataclass
class QueryRewrite:
    tokens: list[str] = field(default_factory=list)
    synonyms: dict[str, list[str]] = field(default_factory=dict)
    phrases: list[tuple[str, str]] = field(default_factory=list)

    @property
    def keywords(self) -> list[str]:
        """tokens + their synonyms (the reference returns this list to
        the highlighter alongside the match expression)."""
        out = list(self.tokens)
        for t in self.tokens:
            out.extend(self.synonyms.get(t, ()))
        return out


def rewrite_query(txt: str, topn_syn: int = 8) -> QueryRewrite:
    """Question text → rewrite structure (deterministic, corpus-free)."""
    txt = _PUNCT_RE.sub(" ", tradi2simp(str_q2b(txt.lower()))).strip()
    tokens = rm_www(txt.split())
    syns = {t: lookup(t, topn_syn) for t in tokens}
    syns = {t: s for t, s in syns.items() if s}
    phrases = [(a, b) for a, b in zip(tokens, tokens[1:])]
    return QueryRewrite(tokens=tokens, synonyms=syns, phrases=phrases)


def compose(rw: QueryRewrite,
            weights: dict[str, float]) -> list[tuple[str, str, float]]:
    """Weighted scoring plan in deterministic order: ("term", tk, w) for
    unigrams, ("syn", s, w/4), ("phrase", "a b", 2·max). ``weights`` is
    normalized over the unigrams first (term_weight.Dealer.weights
    normalizes the same way)."""
    total = sum(weights.get(t, 0.0) for t in rw.tokens) or 1.0
    w = {t: weights.get(t, 0.0) / total for t in rw.tokens}
    plan: list[tuple[str, str, float]] = []
    for t in rw.tokens:
        plan.append(("term", t, w[t]))
        for s in rw.synonyms.get(t, ()):
            plan.append(("syn", s, w[t] / 4.0))
    for a, b in rw.phrases:
        plan.append(("phrase", f"{a} {b}", 2.0 * max(w[a], w[b])))
    return plan


def query_string(rw: QueryRewrite, weights: dict[str, float]) -> str:
    """Lucene-ish rendering of the composed query (query.py:96-112)."""
    plan = compose(rw, weights)
    by_term: dict[str, list[str]] = {}
    phrases: list[str] = []
    for kind, term, w in plan:
        if kind == "term":
            by_term[term] = [f"{term}^{w:.4f}"]
        elif kind == "syn":
            parent = next(t for t in rw.tokens
                          if term in rw.synonyms.get(t, ()))
            by_term[parent].append(f'"{term}"^{w:.4f}')
        else:
            phrases.append(f'"{term}"^{w:.4f}')
    parts = [f"({' '.join(by_term[t])})" for t in rw.tokens]
    return " ".join(parts + phrases)
