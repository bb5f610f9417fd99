"""Typed-table template: column type inference + coercion + row docs.

From-scratch implementation of the reference's table template semantics
(rag/app/table.py:82-241): per-column regex-class majority vote over the
cells decides the column type (int / float / datetime / bool / text), cells
are coerced, headers get a type-suffixed field name (the reference uses
pinyin + suffix; we use a slugged header + the same suffix vocabulary
``_long/_flt/_dt/_kwd/_tks``), and every data row becomes one chunk line
``header1:value1; header2:value2`` (the Excel line form,
deepdoc/parser/excel_parser.py:107-130). Rows whose cell count differs from
the header are dropped (deformed rows).

Vectorized over all rows of a doc with plain Python/regex — doc-local, no
distributed state.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass

_INT_RE = re.compile(r"^[+-]?\d{1,18}$")
_FLT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_BOOL_RE = re.compile(r"^(yes|no|true|false|y|n|是|否)$", re.I)
_DATE_RES = (
    (re.compile(r"^(\d{4})-(\d{1,2})-(\d{1,2})$"), (1, 2, 3)),
    (re.compile(r"^(\d{4})/(\d{1,2})/(\d{1,2})$"), (1, 2, 3)),
    (re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})$"), (3, 1, 2)),
    (re.compile(r"^(\d{4})年(\d{1,2})月(\d{1,2})日$"), (1, 2, 3)),
)
_TRUE_SET = frozenset(("yes", "true", "y", "是"))

TYPE_SUFFIX = {"int": "_long", "float": "_flt", "date": "_dt",
               "bool": "_kwd", "text": "_tks"}


@functools.lru_cache(maxsize=1 << 16)
def _classify(cell: str) -> str:
    # memoized: real tables repeat cell values heavily (dates, booleans,
    # small-int codes), and the regex cascade is the per-cell hot path
    c = cell.strip()
    if not c:
        return "empty"
    if _INT_RE.match(c):
        return "int"
    if _FLT_RE.match(c):
        return "float"
    if _BOOL_RE.match(c):
        return "bool"
    for pat, _ in _DATE_RES:
        if pat.match(c):
            return "date"
    return "text"


def column_types(columns: list[list[str]], majority: float = 0.6) -> list[str]:
    """Majority vote per column (rag/app/table.py:97-127 semantics: the
    dominant non-empty class wins if it covers > ``majority`` of the
    non-empty cells; int demotes to float if floats present; else text)."""
    from collections import Counter

    out = []
    for col in columns:
        counts = Counter(map(_classify, col))
        counts.pop("empty", None)
        total = sum(counts.values())
        if not total:
            out.append("text")
            continue
        # ints are valid floats: a mixed int/float column is float
        if counts.get("float") and counts.get("int"):
            counts["float"] += counts.pop("int")
        typ, n = counts.most_common(1)[0]
        out.append(typ if n / total > majority else "text")
    return out


@functools.lru_cache(maxsize=1 << 16)
def coerce(cell: str, typ: str) -> str:
    """Coerce a cell to its column type, rendered as a canonical string
    (dates → ISO; bools → true/false; numbers normalized). Memoized like
    ``_classify`` (same repeated-value skew)."""
    c = cell.strip()
    if not c:
        return ""
    try:
        if typ == "int":
            return str(int(c))
        if typ == "float":
            v = float(c)
            return str(int(v)) if v.is_integer() else repr(v)
        if typ == "bool":
            return "true" if c.lower() in _TRUE_SET else "false"
        if typ == "date":
            for pat, (yi, mi, di) in _DATE_RES:
                m = pat.match(c)
                if m:
                    return f"{int(m.group(yi)):04d}-{int(m.group(mi)):02d}-{int(m.group(di)):02d}"
            return c
    except ValueError:
        return c
    return c


_SLUG_RE = re.compile(r"[^0-9a-zA-Z一-鿿]+")
# "/alt-name" suffixes and parenthesized hints are dropped before naming,
# as in the reference's re.sub (rag/app/table.py:197-202)
_HINT_RE = re.compile(r"(/.*|（[^（）]*?）|\([^()]*?\))")


def field_name(header: str, typ: str) -> str:
    """Pinyin-ized, slugged header + type suffix (rag/app/table.py:196-211
    ``PY.get_pinyins(header, '_').lower() + suffix``). Han chars covered by
    the built-in table become pinyin syllables; the rest stay in the slug
    verbatim."""
    from .pinyin import pinyinize

    base = pinyinize(_HINT_RE.sub("", header.strip()).lower())
    slug = _SLUG_RE.sub("_", base).strip("_") or "col"
    return slug + TYPE_SUFFIX[typ]


@dataclass
class TypedTable:
    fields: list[str]
    types: list[str]
    rows: list[list[str]]  # coerced

    def row_lines(self) -> list[str]:
        return ["; ".join(f"{f}:{v}" for f, v in zip(self.fields, row) if v)
                for row in self.rows]


def parse_typed_table(header_cells: list[str],
                      data_rows: list[list[str]]) -> TypedTable:
    ncols = len(header_cells)
    rows = [r for r in data_rows if len(r) == ncols]  # drop deformed rows
    columns = [[r[i] for r in rows] for i in range(ncols)]
    types = column_types(columns)
    fields = [field_name(h, t) for h, t in zip(header_cells, types)]
    # coerce COLUMN-wise: text columns (usually the majority) reduce to a
    # plain strip — same result as coerce(v, "text") without the call +
    # cache overhead on the per-cell hot path
    coerced_cols = [[c.strip() for c in col] if t == "text"
                    else [coerce(v, t) for v in col]
                    for col, t in zip(columns, types)]
    coerced = [list(vals) for vals in zip(*coerced_cols)] if rows else []
    return TypedTable(fields, types, coerced)


def parse_tsv_rows(row_texts: list[str]) -> TypedTable:
    """First row = header (rag/app/table.py:155-176 behavior)."""
    if not row_texts:
        return TypedTable([], [], [])
    header = row_texts[0].split("\t")
    data = [t.split("\t") for t in row_texts[1:]]
    return parse_typed_table(header, data)


def tsv_to_html_chunks(row_texts: list[str], caption: str = "",
                       chunk_rows: int = 12) -> list[str]:
    """The `html4excel` table form: raw cells (no type coercion, no
    deformed-row drop), header as <th>, data split into chunk_rows-row
    <table> chunks each repeating the caption + header
    (deepdoc/parser/excel_parser.py:73-103; naive passes chunk_rows=12,
    rag/app/naive.py:418-419)."""
    if not row_texts:
        return []
    head = "<tr>" + "".join(f"<th>{c}</th>"
                            for c in row_texts[0].split("\t")) + "</tr>"
    data = [t.split("\t") for t in row_texts[1:]]
    chunks = []
    for i in range(0, max(len(data), 1), chunk_rows):
        body = "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
            for row in data[i:i + chunk_rows])
        cap = f"<caption>{caption}</caption>" if caption else ""
        chunks.append(f"<table>{cap}{head}{body}</table>")
    return chunks


# --------------------------------------------------- NL table description ---

_NUMBERISH_RE = re.compile(r"[+-]?[\d,.]+%?$")


def _numericish_row(row: list[str]) -> bool:
    vals = [c.strip() for c in row if c.strip()]
    return bool(vals) and sum(
        1 for c in vals if _NUMBERISH_RE.fullmatch(c)) * 2 >= len(vals)


def describe_grid_rows(grid: list[list[str]], eng: bool | None = None
                       ) -> list[str]:
    """Natural-language row descriptions for a positional cell grid —
    semantics of the reference's ``__desc_table``
    (deepdoc/vision/table_structure_recognizer.py:399-501): header rows
    are composed onto each data cell as ``header：value`` joined with
    ``"; "``; stacked header rows merge child+parent with ``" for "`` /
    ``"的"``; empty header cells inherit the cell above; a 2-column
    headerless table renders key-value style (``a：b``); header rows are
    not emitted. The reference takes header rows from the TSR model's
    column-header class; model-free stand-in here: the leading (≤2)
    non-numeric rows count as headers only when the remaining rows are
    majority-numeric — a text-only grid has no headers and renders plain
    rows."""
    if not grid:
        return []
    if eng is None:
        from .tokenizer import is_english

        eng = is_english([c for row in grid for c in row if c])
    ncol = max(len(r) for r in grid)
    pad = [list(r) + [""] * (ncol - len(r)) for r in grid]
    n_hdr = 0
    while n_hdr < min(2, len(pad) - 1) and not _numericish_row(pad[n_hdr]):
        n_hdr += 1
    data = pad[n_hdr:]
    body = [r for r in data if any(c.strip() for c in r)]
    if n_hdr and (not body or sum(
            1 for r in body if _numericish_row(r)) * 2 < len(body)):
        # majority-non-numeric (or empty) body — a subtotal/footnote row
        # must not disable composition: only when MOST rows look textual
        # do we stop guessing headers and render plain
        n_hdr, data = 0, pad
    de = " for " if eng else "的"
    headers = [""] * ncol
    for r in range(n_hdr):
        prev = list(headers)
        for j in range(ncol):
            txt = pad[r][j].strip()
            if not txt:
                headers[j] = prev[j]  # inherit the cell above
            elif prev[j] and prev[j] not in txt:
                # compose child with parent, longer side first
                headers[j] = (txt + de + prev[j] if len(txt) > len(prev[j])
                              else prev[j] + de + txt)
            else:
                headers[j] = txt
    out: list[str] = []
    for row in data:
        cells = [(headers[j], row[j].strip()) for j in range(ncol)
                 if row[j].strip()]
        if not cells:
            continue
        if n_hdr == 0 and ncol <= 2:
            out.append("：".join(txt for _, txt in cells))
        else:
            out.append("; ".join(f"{h}：{txt}" if h else txt
                                 for h, txt in cells))
    return out
