"""WARC (ISO 28500 / WARC 1.0) source and sink — the wire format web
crawls actually ship in (Common Crawl's crawl shards are .warc.gz files
of per-record gzip members, each member one WARC record wrapping an
HTTP response).

Role of the reference's blob-fetch ingest side (rag/svr task producer
pulls raw web documents from storage): here the raw web corpus itself
becomes a first-class engine input. Two pieces:

- ``build_warc_gz`` — deterministic writer: each record is its own gzip
  member (``mtime=0``) so byte-range reads can start at any member, the
  Common Crawl layout; record ids / dates derive from the target URI so
  two runs produce byte-identical shards.
- ``read_warc`` — streaming reader: ``read_binary_files`` (one shard
  per block — the shard IS the parallelism unit, exactly how a 100 TB
  crawl is laid out) then a flat per-batch parse into typed columns
  (warc_type, target_uri, http_status, mime, body). Poison-safe: a
  record that fails to parse costs ONE sentinel row
  (``warc_type="corrupt"``), never the shard.

Scale shape: nothing ever materializes a whole crawl — each task holds
one decompressed shard (bounded by how the writer sizes shards; Common
Crawl members are ~1 GB gzip, our builder buckets by doc_id), emits an
Arrow batch, and the streaming executor pipelines extraction behind the
read. Custom ``WARC-Graft-*`` extension headers (the spec reserves the
``WARC-`` prefix for extensions) carry documents-table metadata so the
container round-trip is lossless — proven end-to-end by the
``warc_token_counts`` driver query hash-matching the parquet oracle.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

_CRLF = "\r\n"


def _warc_record(warc_type: str, uri: str, payload: bytes,
                 http_headers: list[tuple[str, str]] | None = None,
                 warc_headers: list[tuple[str, str]] | None = None,
                 status: int = 200) -> bytes:
    """One WARC record (optionally wrapping an HTTP response)."""
    if http_headers is not None:
        status_line = f"HTTP/1.1 {status} " + (
            "OK" if status == 200 else "ERR")
        http = (status_line + _CRLF
                + _CRLF.join(f"{k}: {v}" for k, v in http_headers)
                + _CRLF + _CRLF).encode("utf-8") + payload
        block = http
        ctype = "application/http; msgtype=response"
    else:
        block = payload
        ctype = "text/plain"
    # record id / date are pure functions of the URI → deterministic
    rid = hashlib.md5(uri.encode("utf-8")).hexdigest()
    rec_id = (f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}"
              f"-{rid[16:20]}-{rid[20:32]}>")
    head = [("WARC-Type", warc_type),
            ("WARC-Record-ID", rec_id),
            ("WARC-Date", "2026-01-01T00:00:00Z"),
            ("WARC-Target-URI", uri),
            ("Content-Type", ctype),
            ("Content-Length", str(len(block)))]
    head += list(warc_headers or [])
    hdr = ("WARC/1.0" + _CRLF
           + _CRLF.join(f"{k}: {v}" for k, v in head)
           + _CRLF + _CRLF).encode("utf-8")
    return hdr + block + _CRLF.encode() + _CRLF.encode()


def build_warc_gz(records: list[dict], path: str) -> None:
    """Write records as one .warc.gz of per-record gzip members
    (Common Crawl layout). Each record dict: ``uri``, ``payload``
    (bytes), optional ``warc_type`` (default response), ``mime``,
    ``status``, ``extra`` ([(k, v)] WARC extension headers)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for r in records:
            http = [("Content-Type", r.get("mime", "text/html"))]
            raw = _warc_record(
                r.get("warc_type", "response"), r["uri"], r["payload"],
                http_headers=http, status=r.get("status", 200),
                warc_headers=r.get("extra"))
            f.write(gzip.compress(raw, mtime=0))
    os.replace(tmp, path)


def _parse_records(data: bytes, path: str) -> list[dict]:
    """Parse one decompressed WARC stream into row dicts. Content-Length
    drives the walk; a malformed record emits a sentinel row and resyncs
    at the next ``WARC/`` magic."""
    rows: list[dict] = []
    pos, n, idx = 0, len(data), 0

    def sentinel():
        return {"warc_file": path, "rec_idx": idx, "warc_type": "corrupt",
                "target_uri": "", "http_status": -1, "mime": "",
                "body": b""}

    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            rows.append(sentinel())
            idx += 1
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            rows.append(sentinel())
            idx += 1
            break
        try:
            lines = data[pos:hdr_end].decode("utf-8", "replace").split(_CRLF)
            fields = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                fields[k.strip().lower()] = v.strip()
            clen = int(fields["content-length"])
            block = data[hdr_end + 4:hdr_end + 4 + clen]
            pos = hdr_end + 4 + clen
            wtype = fields.get("warc-type", "")
            uri = fields.get("warc-target-uri", "")
            status, mime, body = -1, fields.get("content-type", ""), block
            if mime.startswith("application/http"):
                he = block.find(b"\r\n\r\n")
                if he < 0:
                    raise ValueError("bad http block")
                hlines = block[:he].decode("utf-8", "replace").split(_CRLF)
                status = int(hlines[0].split(" ", 2)[1])
                mime = ""
                for ln in hlines[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        mime = v.strip()
                body = block[he + 4:]
            row = {"warc_file": path, "rec_idx": idx, "warc_type": wtype,
                   "target_uri": uri, "http_status": status, "mime": mime,
                   "body": body}
            for k, v in fields.items():
                if k.startswith("warc-graft-"):
                    row[k[len("warc-graft-"):].replace("-", "_")] = v
            rows.append(row)
        except (KeyError, ValueError, IndexError):
            rows.append(sentinel())
            nxt = data.find(b"WARC/", pos + 5)
            if nxt < 0:
                break
            pos = nxt
        idx += 1
    return rows


def read_warc(path: str | list[str]) -> rd.Dataset:
    """Streaming read of .warc[.gz] shards into typed columns
    (warc_file, rec_idx, warc_type, target_uri, http_status, mime,
    body, + any WARC-Graft-* extension headers as string columns).
    gzip multi-member streams decompress in one call (`gzip.decompress`
    handles concatenated members); one shard per task."""
    if isinstance(path, str) and os.path.isdir(path):
        import glob
        shards = sorted(glob.glob(os.path.join(path, "*.warc"))
                        + glob.glob(os.path.join(path, "*.warc.gz")))
        if not shards:
            raise FileNotFoundError(f"no *.warc[.gz] shards in {path}")
        path = shards

    base_cols = ["warc_file", "rec_idx", "warc_type", "target_uri",
                 "http_status", "mime", "body"]

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for p, raw in zip(batch.column("path").to_pylist(),
                          batch.column("bytes").to_pylist()):
            # sniff the gzip magic, don't trust the extension: Ray's
            # read_binary_files already inflates .gz files it recognizes
            data = (gzip.decompress(raw)
                    if raw[:2] == b"\x1f\x8b" else raw)
            rows.extend(_parse_records(data, p))
        if not rows:
            return pa.table({
                "warc_file": pa.array([], pa.string()),
                "rec_idx": pa.array([], pa.int64()),
                "warc_type": pa.array([], pa.string()),
                "target_uri": pa.array([], pa.string()),
                "http_status": pa.array([], pa.int64()),
                "mime": pa.array([], pa.string()),
                "body": pa.array([], pa.binary())})
        df = pd.DataFrame(rows)
        # canonical column order (sentinel rows lack extension headers;
        # fill so every block in the stream shares one schema)
        extras = sorted(c for c in df.columns if c not in base_cols)
        df = df[base_cols + extras]
        for c in extras:
            df[c] = df[c].fillna("")
        cols, names = [], []
        for c in df.columns:
            if c == "body":
                cols.append(pa.array(df[c].tolist(), type=pa.binary()))
            elif c in ("rec_idx", "http_status"):
                cols.append(pa.array(df[c].astype("int64")))
            else:
                cols.append(pa.array(df[c].astype(str)))
            names.append(c)
        return pa.table(cols, names=names)

    return rd.read_binary_files(path, include_paths=True).map_batches(
        parse, batch_format="pyarrow")


def _messy_uri(source: str, doc_id: int, variant: int) -> str:
    """One of four real-crawl URL forms of the same page — mixed case,
    explicit default port, dot-segments, fragments, tracking params.
    All four canonicalize to https://graft.example/{source}/{doc_id}
    (functions/url.py::canonical_url)."""
    base = f"graft.example/{source}/{doc_id}"
    return [
        f"HTTPS://GRAFT.EXAMPLE:443/{source}/{doc_id}",
        f"https://{base}".replace(f"/{doc_id}", f"/./{doc_id}#frag-2"),
        f"https://graft.example/{source}/x/../{doc_id}"
        f"?utm_source=rss&fbclid=x{doc_id % 7}",
        f"https://graft.example:443/{source}/{doc_id}?utm_campaign=w",
    ][variant % 4]


def write_documents_warc(docs: rd.Dataset, out_dir: str,
                         n_files: int = 8, as_html: bool = False,
                         messy_urls: bool = False,
                         crawl2: bool = False) -> pd.DataFrame:
    """Write a documents-schema Dataset as ``n_files`` .warc.gz shards of
    HTTP response records (text/plain body = the doc text verbatim; with
    ``as_html`` the body is the text wrapped in deterministic nav/footer
    boilerplate — the input shape for the main-content extraction
    proof). lang/source ride WARC-Graft-* extension headers. Same
    deterministic bucket-by-doc_id layout as the jsonl/csv sinks.

    ``messy_urls`` emits each record under a deterministic real-crawl
    URL variant of the canonical URI, and re-fetches docs whose
    md5(doc_id) first hex digit is < '4' a second time under a
    different variant — the input shape for the URL-canonicalization
    dedup proof (the md5 rule is replayed verbatim by the SQL oracle).

    ``crawl2`` writes the SECOND crawl of the same site: docs whose
    md5(doc_id) 4th hex digit is < '2' have disappeared (dropped
    pages), docs whose 3rd hex digit is < '8' changed content (text +
    ' (updated)') — the input shape for the crawl-delta proof; both
    rules are replayed verbatim by the SQL oracle."""
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = (batch["doc_id"] % n_files).astype("int32")
        return batch

    def dump(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_bucket"].iloc[0])
        g = g.sort_values("doc_id")
        recs = []
        for row in g.itertuples():
            text = row.text
            did = int(row.doc_id)
            h = (hashlib.md5(str(did).encode()).hexdigest()
                 if (crawl2 or messy_urls) else "")
            if crawl2:
                if h[3] < "2":
                    continue            # page gone in the second crawl
                if h[2] < "8":
                    text = text + " (updated)"
            if as_html:
                text = wrap_boilerplate(text, did)
            base = {
                "payload": text.encode("utf-8"),
                "mime": ("text/html; charset=utf-8" if as_html
                         else "text/plain; charset=utf-8"),
                "extra": [("WARC-Graft-Doc-Id", str(row.doc_id)),
                          ("WARC-Graft-Lang", row.lang),
                          ("WARC-Graft-Source", row.source)],
            }
            if not messy_urls:
                recs.append(dict(
                    base,
                    uri=f"https://graft.example/{row.source}/"
                        f"{row.doc_id}"))
                continue
            v = int(h[1], 16)
            recs.append(dict(base, uri=_messy_uri(row.source, did, v)))
            if h[0] < "4":      # 25% of docs: a second crawl fetch
                recs.append(dict(base,
                                 uri=_messy_uri(row.source, did, v + 1)))
        path = os.path.join(out_dir, f"part-{bk:05d}.warc.gz")
        build_warc_gz(recs, path)
        return pd.DataFrame({"path": [path],
                             "n_rows": pd.array([len(g)], dtype="int64")})

    return (docs.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(dump, batch_format="pandas")
            .to_pandas().sort_values("path").reset_index(drop=True))


def wrap_boilerplate(text: str, doc_id: int) -> str:
    """Deterministic link-dense chrome around a text/plain doc — the
    nav/footer shape ``extract_html``'s density scoring is built to
    strip. Paragraphs split on blank lines; single newlines stay inside
    one <p> (html whitespace collapses anyway)."""
    paras = [p.strip() for p in text.split("\n\n") if p.strip()] or [text]
    nav = "".join(f'<a href="/nav/{i}">section {i}</a> | '
                  for i in range(6))
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (f"<html><head><title>doc {doc_id}</title></head><body>"
            f'<div class="nav">{nav}</div>'
            f'<div class="content">{body}</div>'
            f'<div class="footer"><a href="/about">about</a> | '
            f'<a href="/terms">terms</a> | <a href="/privacy">privacy'
            f"</a></div></body></html>")


def warc_to_documents(ds: rd.Dataset) -> rd.Dataset:
    """Reconstruct the canonical documents schema from a WARC Dataset
    written by ``write_documents_warc`` (text/plain bodies)."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = [i for i, (t, s) in enumerate(zip(
            batch.column("warc_type").to_pylist(),
            batch.column("http_status").to_pylist()))
            if t == "response" and s == 200]
        batch = batch.take(pa.array(keep, type=pa.int64()))
        from ..functions.codec import decode_http_body
        texts = [decode_http_body(b, m) for b, m in
                 zip(batch.column("body").to_pylist(),
                     batch.column("mime").to_pylist())]
        return pa.table({
            "doc_id": pa.array([int(x) for x in
                                batch.column("doc_id").to_pylist()],
                               type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
