"""Arrow schemas for the interleaved-document data model.

The input shape is fixed by BASELINE.json's input_hint: a Lance table of
interleaved text + media documents,

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

(no Lance runtime is present in this sandbox; we materialize the identical
schema in Parquet and gate the Lance reader behind an import-try — see
sources/interleaved.py).

Input span ``kind`` vocabulary (what a crawled interleaved doc contains):
``html`` raw HTML fragment, ``text`` plain text line, ``md`` markdown line,
``box`` pre-OCR layout box (text = compact JSON
``{"t":..., "x0":..., "x1":..., "top":..., "bot":..., "page":..., "lay":...,
"row":..., "col":..., "tno":...}`` — models the reference's post-OCR IR,
deepdoc/parser/pdf_parser.py:296-352), ``row`` TSV table row (first one in a
doc is the header — rag/app/table.py:155-176 behavior), ``image`` media-only
span, ``caption`` figure/table caption text, ``slide`` presentation slide
text with thumbnail media_ref (deepdoc/parser/ppt_parser.py:22-80 output),
``eml`` raw RFC-822 message text (rag/app/email.py input), ``docx``
base64-encoded OOXML zip bytes (rag/app/naive.py:175-238 input; base64
because this schema is all-string — production uses a binary column).

Output span kinds: ``title``, ``section``, ``table_row``, ``table_html``,
``figure``, ``qa``, ``abstract``, ``slide``. ``offset`` is the emission
order 0..n-1 per document.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# The one input shape everything runs over (BASELINE.json input_hint).
DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Output: same span shape, plus the template that produced it and shard
# lineage counters (part of the per-partition lineage/metrics contract).
EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("template", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("n_input_spans", pa.int32()),
        ("n_shards", pa.int32()),
    ]
)

INPUT_KINDS = ("html", "text", "md", "box", "row", "image", "caption",
               "slide", "eml", "json", "docx")
OUTPUT_KINDS = ("title", "section", "table_row", "table_html", "figure",
                "qa", "abstract", "slide")

# Intermediate shape between phase A (heavy per-shard parse) and phase B
# (light per-doc template merge): one row per shard.
SHARD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("template", pa.string()),
        ("shard_id", pa.int32()),
        ("n_shards", pa.int32()),
        ("n_input_spans", pa.int32()),
        # phase-A output: partially-extracted spans for this shard, already
        # in reading order within the shard
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)


def spans_to_pylist(spans) -> list[dict]:
    """Normalize a spans cell (Arrow list scalar / numpy array / list) to
    a plain ``list[dict]`` with keys kind/text/media_ref/offset."""
    if spans is None:
        return []
    if hasattr(spans, "as_py"):
        spans = spans.as_py()
    out = []
    for s in spans:
        if not isinstance(s, dict):
            s = dict(s)
        out.append(s)
    return out


def spans_column_to_pylists(col) -> list[list[dict]]:
    """Fast decode of a ``list<struct>`` spans column to per-row
    ``list[dict]``: flatten to the four child arrays (flat ``to_pylist``
    is ~2.6× faster than Arrow's nested path) and re-slice by offsets.
    Null rows decode to []."""
    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
    else:
        chunks = [col]
    rows: list[list[dict]] = []
    for chunk in chunks:
        offsets = chunk.offsets.to_pylist()
        # CRITICAL for sliced chunks (map_batches slices blocks into
        # batches): ``.values`` returns the UNSLICED child array, so
        # decoding it whole makes every small batch pay for its entire
        # parent block (quadratic in batches-per-block — this was the
        # round-2 bench regression when auto batch sizing shrank batches).
        # Slice the children to exactly this chunk's span range first.
        lo, hi = offsets[0], offsets[-1]
        flat = chunk.values.slice(lo, hi - lo)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        refs = flat.field("media_ref").to_pylist()
        offs = flat.field("offset").to_pylist()
        valid = (chunk.is_valid().to_pylist()
                 if chunk.null_count else None)
        for i in range(len(chunk)):
            if valid is not None and not valid[i]:
                rows.append([])
                continue
            rows.append([{"kind": kinds[j], "text": texts[j],
                          "media_ref": refs[j], "offset": offs[j]}
                         for j in range(offsets[i] - lo, offsets[i + 1] - lo)])
    return rows


def explode_spans(tbl: pa.Table, extra_cols: tuple[str, ...] = ("doc_id",)
                  ) -> pa.Table:
    """Vectorized one-row-per-span explode of a (doc_id, spans, ...) table:
    ``pc.list_parent_indices`` + ``pc.list_flatten`` touch only the Arrow
    child arrays (zero row-level Python), then the parent columns are
    gathered with ``take``. Null/empty spans rows contribute no output."""
    import pyarrow.compute as pc

    col = tbl.column("spans")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    parent = pc.list_parent_indices(arr)
    flat = pc.list_flatten(arr)  # StructArray of the span fields
    cols: dict[str, pa.Array] = {}
    for c in extra_cols:
        pcol = tbl.column(c)
        if isinstance(pcol, pa.ChunkedArray):
            pcol = pcol.combine_chunks()
        cols[c] = pcol.take(parent)
    for f in ("kind", "text", "media_ref", "offset"):
        cols[f] = flat.field(f)
    return pa.table(cols)


def make_span(kind: str, text: str, media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": int(offset)}


def finalize_offsets(spans: list[dict]) -> list[dict]:
    """Re-stamp offsets to emission order 0..n-1 (the per-doc ordering
    contract; mirrors the reference's within-document reading-order
    guarantee, pdf_parser.py:359-363)."""
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans
