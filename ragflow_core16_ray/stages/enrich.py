"""Chunk-doc enrichment: extracted span rows → index-ready chunk docs.

Role of the reference's ``tokenize``/``tokenize_chunks`` step
(rag/nlp/__init__.py:251-279) that runs between chunking and the doc-store
sink: every chunk doc carries the raw text (``content_with_weight``), its
word tokenization joined by spaces (``content_ltks``) and the fine-grained
re-segmentation of those tokens (``content_sm_ltks``) — the two fields the
reference's full-text index matches against. Table HTML tags are stripped
before tokenizing, exactly like the reference's ``re.sub`` on
``</?table|td|...>``.

Ray shape: one stateless ``map_batches`` over the extracted-docs parquet —
the explode is the zero-copy Arrow flatten (schemas.explode_spans); only
the tokenizer itself walks Python strings (compiled-regex work that has no
Arrow kernel). No shuffle: chunk docs keep their parent row's partition.
"""

from __future__ import annotations

import pyarrow as pa

import regex as re

from ..functions.tokenizer import fine_grained_tokenize, tokenize
from ..schemas import explode_spans

# the reference strips table markup before tokenizing
# (rag/nlp/__init__.py:253); our table chunks are plain rows or HTML
_TABLE_TAG_RE = re.compile(r"</?(table|td|caption|tr|th)( [^<>]{0,12})?>")


def tokenize_chunk_batch(batch: pa.Table) -> pa.Table:
    """One extracted-doc batch → flat chunk docs with the reference's
    chunk-doc fields: deterministic content-hash ``id``
    (task_executor.py:266 ``xxh64(content + doc_id)`` — our stable hash64
    plays the xxh64 role), ``title_tks``/``title_sm_tks`` from the
    document name (rag/nlp/__init__.py:251-257 tokenizes the extensionless
    filename; doc_id is our name), and the content ``*_tks`` pair."""
    from ..functions.hashing import content_id

    flat = explode_spans(batch, extra_cols=("doc_id", "template"))
    doc_ids = flat.column("doc_id").to_pylist()
    texts = flat.column("text").to_pylist()
    ids: list[str] = []
    ltks: list[str] = []
    sm_ltks: list[str] = []
    title_cache: dict[str, tuple[str, str]] = {}
    title_tks: list[str] = []
    title_sm: list[str] = []
    for did, t in zip(doc_ids, texts):
        ids.append(content_id(t or "", did))
        toks = tokenize(_TABLE_TAG_RE.sub(" ", t)) if t else []
        ltks.append(" ".join(toks))
        sm_ltks.append(" ".join(fine_grained_tokenize(toks)))
        cached = title_cache.get(did)
        if cached is None:
            ttoks = tokenize(did)
            cached = (" ".join(ttoks),
                      " ".join(fine_grained_tokenize(ttoks)))
            title_cache[did] = cached
        title_tks.append(cached[0])
        title_sm.append(cached[1])
    return pa.table({
        "id": pa.array(ids, type=pa.string()),
        "doc_id": flat.column("doc_id"),
        "template": flat.column("template"),
        "offset": flat.column("offset"),
        "kind": flat.column("kind"),
        "title_tks": pa.array(title_tks, type=pa.string()),
        "title_sm_tks": pa.array(title_sm, type=pa.string()),
        "content_with_weight": flat.column("text"),
        "content_ltks": pa.array(ltks, type=pa.string()),
        "content_sm_ltks": pa.array(sm_ltks, type=pa.string()),
    })


def chunk_docs(docs_dir: str):
    """Extracted docs parquet → Dataset of index-ready chunk docs."""
    import ray.data as rd

    return rd.read_parquet(
        docs_dir, columns=["doc_id", "template", "spans"]
    ).map_batches(tokenize_chunk_batch, batch_format="pyarrow")
