"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ragflow_core16_ray) calls ray.init()/ray.shutdown().

`queries()` exposes every implemented operator family from SURVEY.md §2
plus the training-data-scale additions (dedup, similarity search, text
analysis, multimodal plumbing, extraction itself). Entries with an
`oracle_sql()` counterpart produce integer/string-typed outputs whose
DuckDB hashes match bit-exactly; genuinely non-SQL ops (the extraction
pipeline over the synthetic interleaved corpus, LSH/MinHash/SimHash
approximations, the stubbed media decode) are rows-only by design.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

# docs per scale factor for the synthetic interleaved corpus (deterministic,
# seeded; mega-doc every 150 docs → real shard/reassembly traffic)
_CORPUS_DOCS = {"0.001": 200, "0.01": 500, "0.1": 2000}
_CORPUS_SEED = 42
_MEGA_EVERY = 150


def _sf_tag(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else base


def _corpus_for(sf_dir: str) -> str:
    """Generate (once) the interleaved corpus sized for this sf."""
    tag = _sf_tag(sf_dir)
    n = _CORPUS_DOCS.get(tag, 200)
    from ragflow_core16_ray.sources.synth import CORPUS_VERSION

    path = f"/tmp/graft_corpus_sf{tag}_v{CORPUS_VERSION}p8_{_CORPUS_SEED}_{n}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from ragflow_core16_ray.sources.synth import write_corpus

        # 8 files: the resume/lineage partition unit (and realistic — at
        # 100 TB the corpus is always many files)
        write_corpus(path, n_docs=n, seed=_CORPUS_SEED,
                     mega_every=_MEGA_EVERY, parallelism=8)
        open(marker, "w").close()
    return path


_SRC_DIGEST = None


def _src_digest() -> str:
    """Fingerprint of the package source, so cached extraction output is
    invalidated the moment ANY parse code changes (a config digest alone
    cannot see code edits)."""
    global _SRC_DIGEST
    if _SRC_DIGEST is None:
        import glob
        import hashlib

        import ragflow_core16_ray as pkg

        h = hashlib.md5()
        root = os.path.dirname(os.path.abspath(pkg.__file__))
        for f in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                  recursive=True)):
            with open(f, "rb") as fh:
                h.update(fh.read())
        _SRC_DIGEST = h.hexdigest()[:10]
    return _SRC_DIGEST


def _extract_out(sf_dir: str) -> str:
    """Run (once per corpus+config+code version) the two-pass extraction
    pipeline; queries sharing the same extracted output reuse it via a
    done-marker keyed on a source digest."""
    from ragflow_core16_ray.pipelines.extract import run_extract

    corpus = _corpus_for(sf_dir)
    out_dir = corpus + "_out_" + _src_digest()
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        run_extract(corpus, out_dir)
        open(marker, "w").close()
    return out_dir


def _extract_flat(sf_dir: str):
    """Flagship: synthesize corpus → two-pass extraction pipeline → one row
    per output span (doc_id, offset, kind, text, media_ref)."""
    import pyarrow as pa
    import ray.data as rd

    out_dir = _extract_out(sf_dir)

    from ragflow_core16_ray.schemas import explode_spans

    def flatten(batch: pa.Table) -> pa.Table:
        flat = explode_spans(batch)
        return flat.select(["doc_id", "offset", "kind", "text", "media_ref"])

    return rd.read_parquet(
        os.path.join(out_dir, "docs"), columns=["doc_id", "spans"]
    ).map_batches(flatten, batch_format="pyarrow")


def _extract_bytes_counts(sf_dir: str, prefixes: tuple[str, ...]):
    """Raw-binary entry-point evidence: the spans of every doc in the
    given archetype prefixes after full extraction — per-kind counts +
    an order-independent span-text hash, same evidence shape as
    _extract_override. Rows-only: the binary parse isn't
    SQL-expressible."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ragflow_core16_ray.functions.hashing import hash64
    from ragflow_core16_ray.schemas import explode_spans

    out_dir = _extract_out(sf_dir)
    _M63 = (1 << 63) - 1

    def counts(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        mask = None
        for p in prefixes:
            m = pc.starts_with(batch["doc_id"], p)
            mask = m if mask is None else pc.or_(mask, m)
        flat = explode_spans(batch.filter(mask), extra_cols=("template",))
        df = flat.select(["template", "kind", "text"]).to_pandas()
        df["text_hash"] = np.fromiter(
            (hash64(t) & _M63 for t in df["text"]), dtype=np.int64,
            count=len(df))
        g = (df.groupby(["template", "kind"], sort=False)
             .agg(n=("text", "size"), text_hash=("text_hash", "sum")))
        g["text_hash"] &= _M63
        return pa.Table.from_pandas(
            g.reset_index(),
            schema=pa.schema([("template", pa.string()),
                              ("kind", pa.string()),
                              ("n", pa.int64()),
                              ("text_hash", pa.int64())]),
            preserve_index=False)

    from ragflow_core16_ray.stages.agg import combine_partials

    ds = rd.read_parquet(
        os.path.join(out_dir, "docs"),
        columns=["doc_id", "template", "spans"]
    ).map_batches(counts, batch_format="pyarrow")
    out = combine_partials(ds, ["template", "kind"],
                           {"n": "sum", "text_hash": "sum"})

    def mask_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["text_hash"] &= _M63
        return batch

    return out.map_batches(mask_hash, batch_format="pandas")


def _extract_pdf_bytes(sf_dir: str):
    """Raw-PDF entry point (functions/pdf_bytes.py content-stream
    parse): rows-only per-(template, kind) evidence."""
    return _extract_bytes_counts(sf_dir, ("doc-pdf-",))


def _extract_scanned_pdf(sf_dir: str):
    """Scanned-PDF entry point: full-page-image pages with NO text layer,
    read by the det/rec OCR (functions/glyphs.ocr_page via
    pdf_to_boxes) — the role of the reference's rasterize → OCR flow
    (pdf_parser.py:994-1113 + deepdoc/vision/ocr.py:70-398). Rows-only
    per-(template, kind) evidence; span-sequence exactness is pinned by
    the frozen golden + tests/test_scanned_pdf.py."""
    return _extract_bytes_counts(sf_dir, ("doc-scan-",))


def _extract_office_bytes(sf_dir: str):
    """Raw-office entry points: table and presentation docs, ~40% of
    which enter as real .xlsx / .pptx BYTES (functions/xlsx.py /
    functions/pptx.py) and expand to row / slide spans before
    routing — the binary and pre-parsed variants land in the same
    per-(template, kind) counts, so a codec regression shifts the
    hash. Rows-only."""
    return _extract_bytes_counts(sf_dir, ("doc-table-", "doc-ppt-"))


def _chunk_docs(sf_dir: str):
    """Index-ready chunk docs with content_ltks / content_sm_ltks (role of
    rag/nlp/__init__.py:251-279 tokenize_chunks before the doc-store sink).
    No SQL oracle: the *_tks fields are the BiMM tokenizer's output."""
    from ragflow_core16_ray.stages.enrich import chunk_docs

    return chunk_docs(os.path.join(_extract_out(sf_dir), "docs"))


def _corpus_clean(sf_dir: str):
    """The composed four-stage cleaning pipeline (pipelines/clean.py) run
    end-to-end over the documents table; returns the surviving corpus as
    (doc_id, clean_fp) so the driver sees stable rows. No SQL oracle for
    the composition (each constituent stage is oracled individually:
    pii_scrub, boilerplate_removal, dedup_passages, gopher_filter,
    exact_dedup); the staged-resume behavior is pinned in pytest."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.clean import run_clean

    out_dir = os.path.join("/tmp/graft_clean_" + _src_digest(),
                           os.path.basename(os.path.normpath(sf_dir)))
    m = run_clean(sf_dir, out_dir)
    # one stable metrics row (the sf corpora are word soup, so the Gopher
    # gate legitimately drops everything — the per-stage counters are the
    # meaningful, reproducible driver artifact; surviving-text equality is
    # pinned in pytest on realistic fixtures)
    return pd.DataFrame([{k: int(m[k]) for k in
                          ("n_in", "n_pii_redactions",
                           "n_badwords_dropped", "n_encoding_dropped",
                           "n_lines_removed", "n_passages_removed",
                           "gopher_pass_len", "gopher_pass_meanlen",
                           "gopher_pass_alpha", "gopher_pass_stop",
                           "n_out")}])


def _jsonl_token_counts(sf_dir: str):
    """End-to-end proof of the jsonl source/sink: the sf documents table
    is written ONCE to partitioned jsonl.gz (cache keyed by a CONTENT
    digest of the parquet file — never the path basename, so a corpus
    change under the same path rebuilds), read back through the
    streaming jsonl source, and token-counted; the oracle is the plain
    parquet-based token_counts SQL, so a hash match proves the
    round-trip is byte-lossless for text."""
    import hashlib

    from ragflow_core16_ray.pipelines.text_analysis import token_counts
    from ragflow_core16_ray.sources.jsonl import (read_documents_jsonl,
                                                  write_documents_jsonl)

    src = os.path.join(sf_dir, "documents.parquet")
    with open(src, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    out_dir = f"/tmp/graft_jsonl_{digest}"
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        import ray.data as rd
        write_documents_jsonl(rd.read_parquet(src), out_dir)
        open(marker, "w").close()
    return token_counts(sf_dir, docs=read_documents_jsonl(out_dir))


def _csv_token_counts(sf_dir: str):
    """End-to-end proof of the CSV source/sink (same contract as
    _jsonl_token_counts): write once to partitioned csv.gz keyed by a
    content digest, read back through the streaming CSV source,
    token-count, and hash-match the parquet-based oracle."""
    import hashlib

    from ragflow_core16_ray.pipelines.text_analysis import token_counts
    from ragflow_core16_ray.sources.csv import (read_documents_csv,
                                                write_documents_csv)

    src = os.path.join(sf_dir, "documents.parquet")
    with open(src, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    out_dir = f"/tmp/graft_csv_{digest}"
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        import ray.data as rd
        write_documents_csv(rd.read_parquet(src), out_dir)
        open(marker, "w").close()
    return token_counts(sf_dir, docs=read_documents_csv(out_dir))


def _ipc_token_counts(sf_dir: str):
    """End-to-end proof of the Arrow IPC (feather v2) source/sink (same
    contract as _jsonl_token_counts): write once to partitioned .arrow
    shards keyed by a content digest, read back through the streaming
    IPC source, token-count, and hash-match the parquet-based oracle."""
    import hashlib

    from ragflow_core16_ray.pipelines.text_analysis import token_counts
    from ragflow_core16_ray.sources.ipc import (read_documents_ipc,
                                                write_documents_ipc)

    src = os.path.join(sf_dir, "documents.parquet")
    with open(src, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    out_dir = f"/tmp/graft_ipc_{digest}"
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        import ray.data as rd
        write_documents_ipc(rd.read_parquet(src), out_dir)
        open(marker, "w").close()
    return token_counts(sf_dir, docs=read_documents_ipc(out_dir))


def _warc_cache(sf_dir: str, as_html: bool, messy: bool = False,
                crawl2: bool = False) -> str:
    """Write the sf documents table ONCE as .warc.gz shards (cache keyed
    by a content digest of the parquet, never the path basename)."""
    import hashlib

    from ragflow_core16_ray.sources.warc import write_documents_warc

    src = os.path.join(sf_dir, "documents.parquet")
    with open(src, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    kind = "html" if as_html else ("messy" if messy else "plain")
    if crawl2:
        kind += "2"
    out_dir = f"/tmp/graft_warc_{kind}_{digest}"
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        import ray.data as rd
        write_documents_warc(rd.read_parquet(src), out_dir,
                             as_html=as_html, messy_urls=messy,
                             crawl2=crawl2)
        open(marker, "w").close()
    return out_dir


def _warc_crawl_delta(sf_dir: str, n_buckets: int = 32):
    """CDX-style crawl-over-crawl delta, keyed by CANONICAL URL: crawl 1
    and crawl 2 of the same site ship as messy-URI WARC shards (crawl 2
    drops 1/8 of pages and updates half the rest — deterministic md5
    rules the oracle replays); every record canonicalizes its
    WARC-Target-URI, and one url-hash-bucket co-partition joins the two
    crawls to classify each page changed / unchanged / removed by body
    md5. Scale shape: bodies reduce to (bucket, canon_url, crawl,
    doc_id, body_md5) inside the scan — text never shuffles — and each
    bucket classifies its own URLs; output is page-dimension sized."""
    import hashlib

    import pandas as pd

    from ragflow_core16_ray.functions.url import canonical_url
    from ragflow_core16_ray.sources.warc import read_warc

    dirs = {1: _warc_cache(sf_dir, as_html=False, messy=True),
            2: _warc_cache(sf_dir, as_html=False, messy=True,
                           crawl2=True)}

    def rows_for(crawl: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch[(batch["warc_type"] == "response")
                      & (batch["http_status"] == 200)]
            canon = [canonical_url(u) for u in b["target_uri"]]
            return pd.DataFrame({
                "bucket": pd.array(
                    [int(hashlib.md5(c.encode()).hexdigest()[:8], 16)
                     % n_buckets for c in canon], dtype="int32"),
                "canon_url": canon,
                "crawl": pd.array([crawl] * len(b), dtype="int8"),
                "doc_id": b["doc_id"].astype("int64"),
                "body_md5": [hashlib.md5(x).hexdigest()
                             for x in b["body"]],
            }).drop_duplicates(["canon_url", "crawl", "body_md5"])
        return fn

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for canon, grp in g.groupby("canon_url", sort=False):
            c1 = grp[grp["crawl"] == 1]
            c2 = grp[grp["crawl"] == 2]
            if c1.empty:
                status = "added"
            elif c2.empty:
                status = "removed"
            elif set(c1["body_md5"]) == set(c2["body_md5"]):
                status = "unchanged"
            else:
                status = "changed"
            out.append((int(grp["doc_id"].iloc[0]), status))
        return pd.DataFrame(out, columns=["doc_id", "status"]) \
            if out else pd.DataFrame({
                "doc_id": pd.array([], dtype="int64"),
                "status": pd.array([], dtype="string")})

    ds1 = read_warc(dirs[1]).map_batches(rows_for(1),
                                         batch_format="pandas")
    ds2 = read_warc(dirs[2]).map_batches(rows_for(2),
                                         batch_format="pandas")
    return (ds1.union(ds2)
            .groupby("bucket").map_groups(classify,
                                          batch_format="pandas"))


def _warc_url_dedup(sf_dir: str):
    """URL-canonicalization dedup over the crawl wire format: documents
    ship as WARC responses under four real-crawl URL variants (mixed
    case, explicit default port, dot-segments, fragments, tracking
    params; 25% of docs fetched TWICE under different variants — the
    crawler-frontier duplicate). Each record's WARC-Target-URI runs
    through functions/url.py::canonical_url inside map_batches and
    fetch counts aggregate per (doc_id, canonical URL) through the
    bucket combine. HASH-STRICT: the oracle rebuilds the canonical URL
    from (source, doc_id) directly and replays the md5 re-fetch rule —
    i.e. the driver proves canonicalization collapses every variant to
    exactly the canonical form, never merging distinct docs."""
    import pandas as pd

    from ragflow_core16_ray.functions.url import canonical_url
    from ragflow_core16_ray.sources.warc import read_warc
    from ragflow_core16_ray.stages.agg import combine_partials

    out_dir = _warc_cache(sf_dir, as_html=False, messy=True)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[(batch["warc_type"] == "response")
                  & (batch["http_status"] == 200)]
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "canon_url": [canonical_url(u) for u in b["target_uri"]],
            "n_fetches": pd.array([1] * len(b), dtype="int64")})

    return combine_partials(
        read_warc(out_dir).map_batches(canon, batch_format="pandas"),
        ["doc_id", "canon_url"], {"n_fetches": "sum"}, mode="bucket")


def _warc_token_counts(sf_dir: str):
    """End-to-end proof of the WARC source/sink (same contract as
    _jsonl_token_counts): the documents table is written once as
    .warc.gz shards of HTTP text/plain responses (per-record gzip
    members, the Common Crawl layout), read back through the streaming
    WARC source, and token-counted; a hash match against the
    parquet-based SQL oracle proves the container round-trip is
    byte-lossless for text."""
    from ragflow_core16_ray.pipelines.text_analysis import token_counts
    from ragflow_core16_ray.sources.warc import (read_warc,
                                                 warc_to_documents)

    out_dir = _warc_cache(sf_dir, as_html=False)
    return token_counts(sf_dir, docs=warc_to_documents(read_warc(out_dir)))


def _warc_main_content(sf_dir: str):
    """The extraction-tier flagship shape end-to-end on the crawl wire
    format: documents wrapped in deterministic link-dense nav/footer
    chrome, shipped as text/html WARC responses, read back through the
    streaming WARC source, and boilerplate-stripped by the SAME
    extract_html density scorer the html template uses. Output per doc:
    (doc_id, n_sections, content_md5) where content_md5 hashes the
    blank-line-joined recovered sections. HASH-STRICT against a SQL
    oracle that recomputes the original paragraph split — i.e. the
    driver proves the density scorer strips EXACTLY the injected chrome
    and returns EXACTLY the source paragraphs, per document."""
    import hashlib

    import pandas as pd

    from ragflow_core16_ray.functions.codec import decode_http_body
    from ragflow_core16_ray.functions.html_extract import extract_html
    from ragflow_core16_ray.sources.warc import read_warc

    out_dir = _warc_cache(sf_dir, as_html=True)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            if r["warc_type"] != "response" or r["http_status"] != 200:
                continue
            doc = extract_html(decode_http_body(r["body"], r["mime"]))
            joined = "\n\n".join(doc.sections)
            rows.append({
                "doc_id": int(r["doc_id"]),
                "n_sections": len(doc.sections),
                "content_md5": hashlib.md5(
                    joined.encode("utf-8")).hexdigest(),
            })
        return pd.DataFrame(rows, columns=["doc_id", "n_sections",
                                           "content_md5"])

    return read_warc(out_dir).map_batches(fn, batch_format="pandas")


def _tag_kb(sf_dir: str) -> list[tuple[str, list[str]]]:
    """The tag KB for this corpus: (tag, keywords) span pairs from the
    cached tag-template extraction."""
    import ray.data as rd

    from ragflow_core16_ray.schemas import explode_spans

    _extract_override(sf_dir, "tag")
    corpus = _corpus_for(sf_dir)
    out_dir = corpus + "_out_tag_" + _src_digest()

    def kb_rows(b):
        df = explode_spans(b).select(["kind", "text"]).to_pandas()
        # prune to KB pairs before anything leaves the task
        return df[df["kind"].isin(("tag", "tag_kwd"))]

    flat = (rd.read_parquet(os.path.join(out_dir, "docs"))
            .map_batches(kb_rows, batch_format="pyarrow").to_pandas())
    pairs: list[tuple[str, list[str]]] = []
    pending = None
    for kind, text in zip(flat["kind"], flat["text"]):
        if kind == "tag":
            pending = text
        elif kind == "tag_kwd" and pending is not None:
            pairs.append((pending, [t for t in text.split(",") if t]))
            pending = None
    return pairs


def _chunk_tags(sf_dir: str):
    """Chunk↔tag-KB assignment (the §2.4 tag lookup): the KB is the
    cached tag-template extraction of this corpus ((tag, tag_kwd) span
    pairs), broadcast once; the documents table is the chunk stream.
    Rows-only (the KB side is template extraction, not SQL-shaped);
    the scoring replica is pinned in pytest."""
    import ray.data as rd

    from ragflow_core16_ray.pipelines.tagging import chunk_tags

    pairs = _tag_kb(sf_dir)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    # keep_zero: the soup corpus legitimately clears no scoring bar (the
    # reference would fall to its LLM); the candidates' exact match
    # counts are the driver evidence
    return chunk_tags(docs, pairs, keep_zero=True)


def _tag_rank_feature(sf_dir: str):
    """The tag-feature rank boost (search.py:249-272): query tags from
    tag_query over the KB, chunk tags from chunk_tags, per-doc cosine
    ×10 quantized. Rows-only (KB side is template extraction); the
    formula replica is pinned in pytest."""
    import ray.data as rd

    from ragflow_core16_ray.pipelines.tagging import (chunk_tags,
                                                      rank_feature_scores,
                                                      tag_query)

    pairs = _tag_kb(sf_dir)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    # materialize: the fallback below and rank_feature_scores both
    # consume this dataset — without it the whole tagging pass over the
    # corpus would execute twice
    tags = chunk_tags(docs, pairs, keep_zero=True).materialize()
    q = dict(tag_query("what is the hash table scan", pairs))
    if not q:
        # the question shares no keywords with this KB (its tags are
        # the tag-template's literal values) — fall back to the user-
        # picked rank_feature dict the serving API accepts: the KB's
        # top-2 tags by corpus match count, weighted 2/1. Counted with
        # a per-batch partial + driver sum (distinct tags ≤ KB size).
        import pandas as pd

        def tag_counts(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby("tag", sort=False)["c"].sum().reset_index()
            return g

        cnt = (tags.map_batches(tag_counts, batch_format="pandas")
               .to_pandas().groupby("tag")["c"].sum()
               .sort_values(ascending=False))
        q = {t: w for t, w in zip(cnt.index[:2], (2, 1))}
    # value_col="c": this corpus's tag scores all floor to 0 (see
    # _chunk_tags), so the exact match counts stand in as the stored
    # tag values — same formula, informative evidence
    return rank_feature_scores(tags, q, value_col="c")


def _extract_override(sf_dir: str, template: str):
    """Template-override run: whole corpus through one forced chunking
    template — per-(template,kind) span counts PLUS an order-independent
    span-text hash (sum of per-span hash64, masked to int63), so a
    regression that keeps counts stable but changes any span text still
    shows as a row diff. Demonstrates the parser_id-style override
    surface (rag/svr/task_executor.py:67-84)."""
    import pandas as pd
    import ray.data as rd

    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.pipelines.extract import run_extract

    corpus = _corpus_for(sf_dir)
    out_dir = corpus + "_out_" + template + "_" + _src_digest()
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        run_extract(corpus, out_dir,
                    cfg=ExtractConfig(template_override=template))
        open(marker, "w").close()

    from ragflow_core16_ray.functions.hashing import hash64
    from ragflow_core16_ray.schemas import explode_spans

    _M63 = (1 << 63) - 1

    import numpy as np

    def counts(batch) -> pd.DataFrame:
        flat = explode_spans(batch, extra_cols=("template",))
        df = flat.select(["template", "kind", "text"]).to_pandas()
        # explicit int64: an empty batch (every doc in it produced zero
        # spans — common under sparse overrides like `tag`) would otherwise
        # default the column to float64 and break the bitwise mask below
        df["text_hash"] = np.fromiter(
            (hash64(t) & _M63 for t in df["text"]), dtype=np.int64,
            count=len(df))
        g = (df.groupby(["template", "kind"], sort=False)
             .agg(n=("text", "size"), text_hash=("text_hash", "sum")))
        # modular sum keeps the partial in int64 range and stays
        # order-independent under distributed combination
        g["text_hash"] &= _M63
        # explicit Arrow schema: an empty partial (sparse overrides) as a
        # pandas frame has object-dtype key columns that trip Ray's block
        # size estimator
        import pyarrow as _pa

        return _pa.Table.from_pandas(
            g.reset_index(),
            schema=_pa.schema([("template", _pa.string()),
                               ("kind", _pa.string()),
                               ("n", _pa.int64()),
                               ("text_hash", _pa.int64())]),
            preserve_index=False)

    from ragflow_core16_ray.stages.agg import combine_partials

    ds = rd.read_parquet(
        os.path.join(out_dir, "docs"), columns=["template", "spans"]
    ).map_batches(counts, batch_format="pyarrow")
    out = combine_partials(ds, ["template", "kind"],
                           {"n": "sum", "text_hash": "sum"})

    def mask(batch: pd.DataFrame) -> pd.DataFrame:
        batch["text_hash"] &= _M63
        return batch

    return out.map_batches(mask, batch_format="pandas")


def _extraction_metrics(sf_dir: str):
    """North-rule lineage surface: run the RESUMABLE partitioned pipeline
    (8 lineage partitions) and return the per-partition manifest metrics —
    the same rows an operator would watch on a 256-node run."""
    import json
    import pandas as pd

    from ragflow_core16_ray.state.lineage import run_partitioned

    corpus = _corpus_for(sf_dir)
    # digest-keyed like _extract_out: resume must never pick up partitions
    # produced by older parse code
    out_dir = corpus + "_out_lineage_" + _src_digest()
    run_partitioned(corpus, out_dir, n_partitions=8)  # resumes if present
    import glob

    rows = []
    for p in sorted(glob.glob(out_dir + "/_lineage/part-*.json")):
        m = json.load(open(p))
        rows.append({"partition": int(p.rsplit("-", 1)[1][:-5]),
                     "n_docs": m["n_docs"], "wall_sec": m["wall_sec"],
                     "docs_per_sec": m["docs_per_sec"]})
    return pd.DataFrame(rows)


def _media_features(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import media_features

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return media_features(extracted)


def _image_dhash_dups(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import image_dhash_dups

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return image_dhash_dups(extracted)


def _link_graph(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import link_graph

    corpus = _corpus_for(sf_dir)
    return link_graph(rd.read_parquet(corpus, columns=["doc_id", "spans"]))


def _anchor_text_index(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import anchor_text_index

    corpus = _corpus_for(sf_dir)
    return anchor_text_index(
        rd.read_parquet(corpus, columns=["doc_id", "spans"]))


def _image_dup_verified_pairs(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import (
        image_dup_verified_pairs)

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return image_dup_verified_pairs(extracted)


def _link_hits(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import link_hits

    corpus = _corpus_for(sf_dir)
    return link_hits(rd.read_parquet(corpus, columns=["doc_id", "spans"]))


def _frame_motion_stats(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import frame_motion_stats

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return frame_motion_stats(extracted)


def _frame_samples(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import frame_samples

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return frame_samples(extracted)


def _audio_segments(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import audio_segments

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return audio_segments(extracted)


def _video_scene_cuts(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import video_scene_cuts

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return video_scene_cuts(extracted)


def _audio_vad_segments(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import audio_vad_segments

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return audio_vad_segments(extracted)


def _media_collage(sf_dir: str):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import media_collage

    out_dir = _extract_out(sf_dir)
    extracted = rd.read_parquet(os.path.join(out_dir, "docs"),
                                columns=["doc_id", "spans"])
    return media_collage(extracted)


def _extract_positions(sf_dir: str):
    """keep_positions end-to-end at driver scale: the pdfish flow with
    in-band ``@@page\\tx0\\tx1\\ttop\\tbot##`` tags woven through the text
    (pdf_parser.py:893-908 _line_tag), then per-span tag accounting —
    (doc_id, offset, kind, n_tags, n_tag_chars) for every span that
    carries at least one tag. Exercises the tag codec (functions/postag)
    on the full corpus, not just unit fixtures. Rows-only (tag geometry
    has no SQL twin)."""
    import pandas as pd
    import ray.data as rd

    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.pipelines.extract import run_extract

    corpus = _corpus_for(sf_dir)
    out_dir = corpus + "_out_pos_" + _src_digest()
    marker = os.path.join(out_dir, "_GRAFT_DONE")
    if not os.path.exists(marker):
        run_extract(corpus, out_dir, cfg=ExtractConfig(keep_positions=True))
        open(marker, "w").close()

    from ragflow_core16_ray.functions.postag import strip_tags
    from ragflow_core16_ray.schemas import explode_spans

    def tag_stats(batch) -> pd.DataFrame:
        flat = explode_spans(batch)
        df = flat.select(["doc_id", "offset", "kind", "text"]).to_pandas()
        plain = df["text"].map(strip_tags)
        df["n_tag_chars"] = df["text"].str.len() - plain.str.len()
        df = df[df["n_tag_chars"] > 0]
        return df[["doc_id", "offset", "kind", "n_tag_chars"]]

    return rd.read_parquet(
        os.path.join(out_dir, "docs"), columns=["doc_id", "spans"]
    ).map_batches(tag_stats, batch_format="pyarrow")


def _doc_embedding_sums(sf_dir: str):
    from ragflow_core16_ray.stages.embed import doc_embedding_sums

    return doc_embedding_sums(sf_dir)


def _produced_emb_knn(sf_dir: str):
    from ragflow_core16_ray.stages.embed import produced_emb_knn

    return produced_emb_knn(sf_dir)


def _chunk_vectors(sf_dir: str):
    """The full production path: extract → chunk → ENCODE (q_vec per
    chunk, actor pool, batch 16 — task_executor.py:384-426)."""
    import os

    from ragflow_core16_ray.stages.embed import embed_chunks
    from ragflow_core16_ray.stages.enrich import chunk_docs

    out_dir = _extract_out(sf_dir)
    return embed_chunks(chunk_docs(os.path.join(out_dir, "docs")))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    return _extract_flat("/root/testdata/sf0.001")


# ORDERING CONTRACT: the driver's correctness gate covers the FIRST 50
# entries of queries() per round, comparing each against its oracle_sql()
# entry (rows + schema + value hash). Per the r4 verdict, every window
# slot must be an ORACLED query that has never received a driver hash row
# — rows-only (no-oracle) queries can never earn a green row, so they sit
# behind slot 50 with their pytest evidence. This list is computed from
# CORRECTNESS_r01–r04 (oracled ∧ never hash_match) plus the round-5
# additions, in that order; queries() applies it at return time.
_R5_WINDOW = [
    # round-5 additions (oracled, by definition never driver-verified)
    # — prepended as they land
    "entity_graph", "graph_communities", "community_reports",
    "entity_resolution_candidates", "rerank_hybrid_topk",
    "fusion_weighted_topk",
    "doc_embedding_sums", "produced_emb_knn", "weighted_query_bm25_topk",
    # oracled but never hash-verified by any driver round (r1–r4)
    "user_activity_span", "monthly_revenue_growth",
    "supplier_balance_deciles", "length_ks_by_source", "ipc_token_counts",
    "order_priority_check", "idle_customers", "customer_order_dist",
    "small_qty_revenue", "nation_trade_volume", "returned_revenue",
    "late_shipment_priority", "big_orders", "bracket_revenue",
    "knn_label_accuracy", "radius_neighbor_counts", "forecast_revenue",
    "market_share", "product_profit", "top_supplier", "waiting_suppliers",
    "textrank_keywords", "source_leakage_matrix", "nb_quality_scores",
    "embedding_gram", "event_volume_anomaly", "emb_text_dup_agreement",
    "csv_token_counts", "jaccard_threshold_sweep", "session_gap_sweep",
    "source_lang_entropy", "dup_share_by_source", "event_user_gini",
    "emb_norm_stats", "funnel_time_quantiles", "weighted_sample",
    "source_centroid_distances", "metric_correlation", "vocab_growth_curve",
    "contrastive_pairs", "dedup_retention_by_source", "event_trigrams",
    "zipf_exponent", "stopword_coverage", "doc_entropy",
    "quality_filter_agreement", "rfm_segments",
]


def queries() -> dict[str, Callable[[str], Any]]:
    from ragflow_core16_ray.pipelines import (dedup, graphrag, relational,
                                              similarity, text_analysis)

    all_q = {
        # --- round-5: GraphRAG / RAPTOR deterministic cores
        # (pipelines/graphrag.py — graphrag/general/*.py, rag/raptor.py
        # minus the north-rule-excluded LLM calls)
        "entity_graph": lambda sf: graphrag.entity_graph(sf),
        "graph_communities": lambda sf: graphrag.graph_communities(sf),
        "community_reports": lambda sf: graphrag.community_reports(sf),
        "entity_resolution_candidates":
            lambda sf: graphrag.entity_resolution_candidates(sf),
        # layered cluster tree per label group — rows-only (iterative
        # k-means isn't SQL); invariants + determinism pinned in pytest
        "raptor_tree": lambda sf: graphrag.raptor_tree(sf),
        # deterministic Louvain over the entity graph (the reference's
        # hierarchical-leiden role, leiden.py:72) — rows-only
        # (iterative); clique/weight/nesting fixtures in pytest
        "modularity_communities":
            lambda sf: graphrag.modularity_communities(sf),
        # --- round-5: embedding production stage (stages/embed.py — the
        # reference's encode step, task_executor.py:384-426)
        "doc_embedding_sums": _doc_embedding_sums,
        "produced_emb_knn": _produced_emb_knn,
        "chunk_vectors": _chunk_vectors,
        # --- round-5: query-side rewrite (functions/query_rewrite.py —
        # FulltextQueryer + synonym Dealer, rag/nlp/{query,synonym}.py)
        # feeding weighted BM25 retrieval
        "weighted_query_bm25_topk":
            lambda sf: similarity.weighted_query_bm25_topk(sf),
        # hybrid second-stage rerank (rag/nlp/search.py:274-312 via
        # query.py:203-239): 0.3·token_sim + 0.7·cos over PRODUCED
        # hash embeddings — exact int64 dots make the cosine
        # bit-identical to the SQL oracle
        "rerank_hybrid_topk": lambda sf: similarity.rerank_hybrid_topk(sf),
        # first-stage weighted-sum fusion (search.py:110-113
        # FusionExpr 0.05/0.95): raw BM25 + cosine, no rank conversion
        "fusion_weighted_topk":
            lambda sf: similarity.fusion_weighted_topk(sf),
        # answer-grounding citation insertion (search.py:158-245) run
        # doc-locally — rows-only (regex walk + threshold ladder), the
        # algorithm itself is fixture-pinned in tests/test_citations.py
        "citation_markers": lambda sf: similarity.citation_markers(sf),
        # tag-feature rank boost (search.py:249-272) — rows-only; the
        # cosine replica is pinned in pytest
        "tag_rank_feature": _tag_rank_feature,
        # --- never driver-verified through r3 (dedup / retrieval at the
        # 100-TB shapes, event analytics, TPC-H joins)
        "near_dup_removal_scalable":
            lambda sf: dedup.near_dup_removal_scalable(sf),
        "incremental_dedup": lambda sf: dedup.incremental_dedup(sf),
        "incremental_dedup_bloom":
            lambda sf: dedup.incremental_dedup_bloom(sf),
        "corpus_diff": lambda sf: dedup.corpus_diff(sf),
        # the default-named clusters query runs the DISTRIBUTED
        # label-propagation CC (the 100-TB shape); the driver union-find
        # variant survives as a pytest equality oracle
        "jaccard_clusters_dist": lambda sf: dedup.jaccard_clusters_dist(sf),
        # embedding-cluster-local near-dup (SemDeDup shape) — rows-only,
        # pytest-bound; named in the r3 verdict's never-verified list
        "semantic_dedup": lambda sf: dedup.semantic_dedup(sf),
        "winnow_matches": lambda sf: dedup.winnow_matches(sf),
        "dup_passage_stats": lambda sf: dedup.dup_passage_stats(sf),
        "ngram_novelty": lambda sf: dedup.ngram_novelty(sf),
        "boilerplate_removal": lambda sf: dedup.boilerplate_removal(sf),
        "dedup_passages": lambda sf: dedup.dedup_passages(sf),
        # bigram-LM fluency scoring (CCNet second-order) — hash-strict
        "bigram_lm_nll": lambda sf: text_analysis.bigram_lm_nll(sf),
        # jsonl.gz source/sink round-trip proven by the parquet oracle
        "jsonl_token_counts": _jsonl_token_counts,
        "emb_topk_batch": lambda sf: similarity.brute_topk_batch(sf),
        "bm25_topk": lambda sf: similarity.bm25_topk(sf),
        # posting-list (inverted-index) BM25 — the serving-shaped path:
        # only the query terms' hash-bucket partitions leave storage
        "bm25_indexed_topk": lambda sf: similarity.bm25_topk_indexed(sf),
        "hybrid_topk": lambda sf: similarity.hybrid_topk(sf),
        # position-exact substring-duplication coverage (overlapping
        # k-grams, per-doc interval union) — hash-strict gaps-and-islands
        # oracle
        "substring_dup_spans": lambda sf: dedup.substring_dup_spans(sf),
        "funnel_stages": lambda sf: relational.funnel_stages(sf),
        "event_transitions": lambda sf: relational.event_transitions(sf),
        "cohort_retention": lambda sf: relational.cohort_retention(sf),
        "events_hopping": lambda sf: relational.events_hopping(sf),
        "top_users_by_type": lambda sf: relational.top_users_by_type(sf),
        "hourly_active_users":
            lambda sf: relational.hourly_active_users(sf),
        "rolling_active_users":
            lambda sf: relational.rolling_active_users(sf),
        "value_quantiles": lambda sf: relational.value_quantiles(sf),
        "shipping_priority": lambda sf: relational.shipping_priority(sf),
        "region_supplier_revenue":
            lambda sf: relational.region_supplier_revenue(sf),
        "promo_revenue": lambda sf: relational.promo_revenue(sf),
        "event_props_stats": relational.event_props_stats,
        # --- round-4 additions slot here (inside the 50-entry window)
        "extract_tag": lambda sf: _extract_override(sf, "tag"),
        "extract_picture": lambda sf: _extract_override(sf, "picture"),
        "extract_pdf_bytes": _extract_pdf_bytes,
        # scanned pages (no text layer) through the det/rec OCR
        "extract_scanned_pdf": _extract_scanned_pdf,
        "extract_office_bytes": _extract_office_bytes,
        # WARC source/sink: container round-trip proven by the parquet
        # oracle; main-content extraction over the crawl wire format
        "warc_token_counts": _warc_token_counts,
        "warc_main_content": _warc_main_content,
        # URL-canonicalization dedup over messy crawl URIs — hash-strict
        "warc_url_dedup": _warc_url_dedup,
        # crawl-over-crawl delta by canonical URL — hash-strict
        "warc_crawl_delta": _warc_crawl_delta,
        # Benford first-digit audit over order totals — hash-strict
        "benford_digits": lambda sf: relational.benford_digits(sf),
        # C4-style token blocklist + per-domain quota cap — hash-strict
        "badwords_filter": lambda sf: text_analysis.badwords_filter(sf),
        "domain_quota_sample":
            lambda sf: text_analysis.domain_quota_sample(sf),
        # bi-directional FK audit and exact source-pair vocab Jaccard
        "ref_integrity_audit":
            lambda sf: relational.ref_integrity_audit(sf),
        "source_jaccard_matrix":
            lambda sf: text_analysis.source_jaccard_matrix(sf),
        "encoding_quality":
            lambda sf: text_analysis.encoding_quality(sf),
        "copurchase_pairs":
            lambda sf: relational.copurchase_pairs(sf),
        # iterative graph algorithm as Pregel supersteps over Dataset
        # shuffles (weighted PageRank on the co-purchase graph)
        "copurchase_pagerank":
            lambda sf: relational.copurchase_pagerank(sf),
        # streaming tumbling windows with per-partition watermarks and
        # bounded lateness, replayed deterministically in batch
        "events_watermark_hourly":
            lambda sf: relational.events_watermark_hourly(sf),
        # anchor-text aggregation over the outlink graph (rows-only:
        # markup lives in the interleaved corpus, not the documents
        # table; fixture pytest pins hand counts)
        "anchor_text_index": _anchor_text_index,
        # chunk↔tag-KB retrieval-based assignment (search.py:458-469,
        # the non-LLM tagging path) — rows-only, replica in pytest
        "chunk_tags": _chunk_tags,
        # MMR diversity rerank over the brute shortlist — rows-only
        # (inherently iterative; integer-exact replica in pytest)
        "emb_mmr_topk": lambda sf: similarity.mmr_topk(sf),
        "user_activity_span":
            lambda sf: relational.user_activity_span(sf),
        "monthly_revenue_growth":
            lambda sf: relational.monthly_revenue_growth(sf),
        "supplier_balance_deciles":
            lambda sf: relational.supplier_balance_deciles(sf),
        "length_ks_by_source":
            lambda sf: text_analysis.length_ks_by_source(sf),
        # Arrow IPC (feather v2) source/sink round-trip proof
        "ipc_token_counts": _ipc_token_counts,
        "order_priority_check":
            lambda sf: relational.order_priority_check(sf),
        "idle_customers": lambda sf: relational.idle_customers(sf),
        "customer_order_dist":
            lambda sf: relational.customer_order_dist(sf),
        "small_qty_revenue": lambda sf: relational.small_qty_revenue(sf),
        "nation_trade_volume":
            lambda sf: relational.nation_trade_volume(sf),
        "returned_revenue": lambda sf: relational.returned_revenue(sf),
        "late_shipment_priority":
            lambda sf: relational.late_shipment_priority(sf),
        "big_orders": lambda sf: relational.big_orders(sf),
        "bracket_revenue": lambda sf: relational.bracket_revenue(sf),
        # supervised embedding eval — exact quantized geometry makes a
        # float NN ranking hash-strict against SQL
        "knn_label_accuracy":
            lambda sf: similarity.knn_label_accuracy(sf),
        "radius_neighbor_counts":
            lambda sf: similarity.radius_neighbor_counts(sf),
        "forecast_revenue": lambda sf: relational.forecast_revenue(sf),
        "market_share": lambda sf: relational.market_share(sf),
        "product_profit": lambda sf: relational.product_profit(sf),
        "top_supplier": lambda sf: relational.top_supplier(sf),
        "waiting_suppliers": lambda sf: relational.waiting_suppliers(sf),
        # iterative distributed graph algorithm — exact-int64 TextRank,
        # hash-strict vs an unrolled 3-iteration DuckDB CTE
        "textrank_keywords":
            lambda sf: text_analysis.textrank_keywords(sf),
        # slot 51+: the window is full of never-verified oracled queries;
        # these keep local check_oracle + pytest evidence and are first
        # in line for the next rotation
        "source_leakage_matrix":
            lambda sf: dedup.source_leakage_matrix(sf),
        # Naive-Bayes quality-classifier scoring (the fastText-filter
        # stand-in) — hash-strict via the bigram_lm_nll ln-parity contract
        "nb_quality_scores":
            lambda sf: text_analysis.nb_quality_scores(sf),
        # exact-int64 Gram matrix of the embedding column (hash-strict);
        # its derived eigenspectrum probe is pytest-bound (no-oracle)
        "embedding_gram": lambda sf: similarity.embedding_gram(sf),
        "pca_spectrum": lambda sf: similarity.pca_spectrum(sf),
        # perceptual-hash (dHash) cross-format image dedup over the real
        # decoders — no-oracle (decode is not SQL); fixture pytest pins
        # PNG==GIF exact pairs, JPEG re-encode within the hamming bound
        "image_dhash_dups": _image_dhash_dups,
        # exact-integer hourly volume anomalies (division-free z-test,
        # zero-filled silent hours) — hash-strict, no float contract
        "event_volume_anomaly":
            lambda sf: relational.event_volume_anomaly(sf),
        # embedding-vs-text dedup threshold calibration (confusion
        # counts + integer-floor precision/recall) — hash-strict
        "emb_text_dup_agreement":
            lambda sf: dedup.emb_text_dup_agreement(sf),
        # MinHash signature-size calibration: per-candidate estimate vs
        # exact Jaccard (no-oracle: crc32 permutations aren't SQL;
        # pytest pins replica equality + the Broder concentration bound)
        "minhash_estimator_accuracy":
            lambda sf: dedup.minhash_estimator_accuracy(sf),
        # CSV(.gz) source/sink round-trip proven by the parquet oracle
        "csv_token_counts": _csv_token_counts,
        # dedup-threshold tuning curve (pairs retained per 10% cutoff) —
        # hash-strict
        "jaccard_threshold_sweep":
            lambda sf: dedup.jaccard_threshold_sweep(sf),
        # per-language BPE fertility / bytes-per-token (frozen merges;
        # no-oracle — BPE is iterative; replica-pinned in pytest)
        "bpe_fertility": lambda sf: text_analysis.bpe_fertility(sf),
        # exact-integer motion energy over REAL decoded frame sequences
        # (no-oracle: decode isn't SQL; fixture pins hand-built fades)
        "frame_motion_stats": _frame_motion_stats,
        # shot-boundary list per animated payload (actor-pool, no
        # pixel shuffle); energy-VAD speech segments per WAV payload
        "video_scene_cuts": _video_scene_cuts,
        "audio_vad_segments": _audio_vad_segments,
        # session-gap calibration curve (sessions per candidate
        # inactivity threshold, one co-partition pass) — hash-strict
        "session_gap_sweep":
            lambda sf: relational.session_gap_sweep(sf),
        # HLL sketch calibration: estimate vs exact distinct + rel err
        # (no-oracle: register hash isn't SQL; pytest pins exact side
        # against COUNT(DISTINCT) and a 5σ error bound)
        "hll_accuracy": lambda sf: text_analysis.hll_accuracy(sf),
        # per-source language entropy (mixing diagnostic) — hash-strict
        "source_lang_entropy":
            lambda sf: text_analysis.source_lang_entropy(sf),
        # per-source exact-dup share (which crawl to de-weight) —
        # hash-strict
        "dup_share_by_source":
            lambda sf: text_analysis.dup_share_by_source(sf),
        # events-per-user Gini (traffic concentration) — hash-strict
        "event_user_gini": lambda sf: relational.event_user_gini(sf),
        # zlib compression-ratio quality signal (no-oracle: DuckDB has
        # no zlib; replica + ordering pinned in pytest)
        "compression_ratio":
            lambda sf: text_analysis.compression_ratio(sf),
        # per-vector exact-int squared norms (Gram diagonal per vector;
        # norm-collapse screen) — hash-strict
        "emb_norm_stats": lambda sf: similarity.emb_norm_stats(sf),
        # time-to-convert quantiles per funnel transition (lower-rule
        # histogram, integer seconds) — hash-strict
        "funnel_time_quantiles":
            lambda sf: relational.funnel_time_quantiles(sf),
        # Efraimidis-Spirakis weighted sampling (md5 uniforms, no RNG
        # state) — hash-strict via ln parity
        "weighted_sample": lambda sf: text_analysis.weighted_sample(sf),
        # per-source centroid distance matrix (subset redundancy) —
        # hash-strict via exact-int cross-multiplied numerators
        "source_centroid_distances":
            lambda sf: similarity.source_centroid_distances(sf),
        # Pearson r between length and token count via exact-int
        # sufficient statistics — hash-strict
        "metric_correlation":
            lambda sf: text_analysis.metric_correlation(sf),
        # Heaps-law vocabulary growth (first-doc min-combiner, no
        # sequential scan) — hash-strict
        "vocab_growth_curve":
            lambda sf: text_analysis.vocab_growth_curve(sf),
        # contrastive (anchor, positive, negative) mining from the dup
        # graph with md5-argmin negatives (no RNG) — hash-strict
        "contrastive_pairs": lambda sf: dedup.contrastive_pairs(sf),
        # per-source docs/tokens retained after near-dup removal —
        # hash-strict vs the recursive-CTE CC oracle
        "dedup_retention_by_source":
            lambda sf: dedup.dedup_retention_by_source(sf),
        # outlink harvest over raw HTML spans (no-oracle: markup lives
        # in the interleaved corpus, not the documents table; fixture
        # pins hand HTML)
        "link_graph": _link_graph,
        # exact-int two-step HITS over the doc→href graph (no-oracle;
        # fixture pins a pure-Python replica)
        "link_hits": _link_hits,
        # top-k event path trigrams ((ts, event_id) order) — hash-strict
        "event_trigrams": lambda sf: relational.event_trigrams(sf),
        # Zipf rank-frequency OLS fit (ln-parity, sequential sums) —
        # hash-strict
        "zipf_exponent": lambda sf: text_analysis.zipf_exponent(sf),
        # per-doc own-language stopword coverage (lang-label QA) —
        # hash-strict
        "stopword_coverage":
            lambda sf: text_analysis.stopword_coverage(sf),
        # per-doc unigram entropy (diversity vs boilerplate) —
        # hash-strict via ln parity
        "doc_entropy": lambda sf: text_analysis.doc_entropy(sf),
        # Gopher-gate vs NB-classifier confusion (filter-stack
        # calibration) — hash-strict by composing the two oracles
        "quality_filter_agreement":
            lambda sf: text_analysis.quality_filter_agreement(sf),
        # RFM customer segmentation on fixed integer bucket edges —
        # hash-strict, pure integer arithmetic
        "rfm_segments": lambda sf: relational.rfm_segments(sf),
        # Bloom-filter measured-vs-theory FPR (sizing check; no-oracle:
        # bit arrays aren't SQL; pytest pins replica + theory bound)
        "bloom_fpr_calibration":
            lambda sf: dedup.bloom_fpr_calibration(sf),
        # dHash candidates verified against REAL decoded pixels (exact
        # digest match or 16x16 thumbnail MAE) — no-oracle; fixture
        # pins exact/lossy/flipped outcomes
        "image_dup_verified_pairs": _image_dup_verified_pairs,
        # PQ reconstruction-error distribution (codebook sizing check;
        # no-oracle — k-means codebooks; pytest pins replica +
        # monotonicity in n_codes)
        "pq_distortion_stats":
            lambda sf: similarity.pq_distortion_stats(sf),
        # pushed past the 50-slot driver window: all no-oracle and
        # pytest-bounded (kmeans == numpy-Lloyd replica; PQ recall
        # floor; coreset == exact-greedy k-center equality), so a
        # rows-only driver row adds the least signal
        "kmeans_clusters": lambda sf: similarity.kmeans_clusters(sf),
        "emb_pq_topk": lambda sf: similarity.pq_topk(sf),
        "coreset_sample": lambda sf: similarity.coreset_sample(sf),
        # SemDeDup (rows-only; pytest pins precision 1.0 vs brute force)
        # indexed IVF (rows-only; pytest pins parity with the streaming
        # IVF path, whose r2 driver rows cover the semantics)
        "emb_ivf_indexed_topk": lambda sf: similarity.ivf_topk_indexed(sf),
        # fully-indexed hybrid (pruned IVF arm → approximate by design:
        # rows-only; pytest pins exhaustive-probe == streaming hybrid,
        # and hybrid_topk in-window driver-verifies the fusion semantics)
        "hybrid_indexed_topk":
            lambda sf: similarity.hybrid_indexed_topk(sf),
        # --- r2-verified rotations (no r3 driver row)
        "jaccard_pairs": lambda sf: dedup.jaccard_dup_pairs(sf),
        "char_jaccard_pairs": lambda sf: dedup.jaccard_dup_pairs(
            sf, k=4, threshold=0.6, grams="char"),
        "jaccard_clusters": lambda sf: dedup.jaccard_clusters_dist(sf),
        "minhash_lsh_pairs": lambda sf: dedup.minhash_lsh_pairs(sf),
        "minhash_verified_pairs": lambda sf: dedup.minhash_verified_pairs(sf),
        "simhash_pairs": lambda sf: dedup.simhash_pairs(sf),
        "emb_near_dup": lambda sf: dedup.embedding_near_dup(sf),
        "emb_topk": lambda sf: similarity.brute_topk(sf),
        "emb_lsh_topk": lambda sf: similarity.lsh_topk(sf),
        "emb_ivf_topk": lambda sf: similarity.ivf_topk(sf),
        "pricing_summary": relational.pricing_summary,
        "nation_revenue": relational.nation_revenue,
        "top_customers": lambda sf: relational.top_customers(sf),
        "events_hourly": relational.events_hourly,
        "events_sessions": relational.events_sessions,
        "events_asof_orders": relational.events_asof_orders,
        "events_window_orders": lambda sf: relational.events_window_orders(sf),
        # --- r3-hash-verified, rotated behind the window
        # extraction engine (rows-only; golden equality lives in pytest)
        "extract_spans": _extract_flat,
        "extract_paper": lambda sf: _extract_override(sf, "paper"),
        "extract_laws": lambda sf: _extract_override(sf, "laws"),
        "extract_manual": lambda sf: _extract_override(sf, "manual"),
        "extract_one": lambda sf: _extract_override(sf, "one"),
        "extract_qa": lambda sf: _extract_override(sf, "qa"),
        "positions_spans": _extract_positions,
        "extraction_metrics": _extraction_metrics,
        "chunk_docs": _chunk_docs,
        "corpus_clean": _corpus_clean,
        "media_features": _media_features,
        "media_collage": _media_collage,
        "frame_samples": _frame_samples,
        "audio_segments": _audio_segments,
        # text analysis over documents
        "token_counts": text_analysis.token_counts,
        "quality_stats": text_analysis.quality_stats,
        "fingerprints": text_analysis.fingerprints,
        "top_words": lambda sf: text_analysis.top_words(sf),
        "lang_pred": text_analysis.lang_pred,
        "quality_filter": lambda sf: text_analysis.quality_filter(sf),
        "length_histogram": lambda sf: text_analysis.length_histogram(sf),
        "stratified_sample": lambda sf: text_analysis.stratified_sample(sf),
        "source_profile": text_analysis.source_profile,
        "approx_distinct_words": lambda sf: text_analysis.approx_distinct_words(sf),
        "lang_confusion": text_analysis.lang_confusion,
        "top_bigrams": lambda sf: text_analysis.top_bigrams(sf),
        "collocations": lambda sf: text_analysis.collocations(sf),
        "term_weights": lambda sf: text_analysis.term_weights(sf),
        "repetition_stats": text_analysis.repetition_stats,
        "decontam_ngrams": lambda sf: text_analysis.decontam_ngrams(sf),
        "lm_quality_rank": lambda sf: text_analysis.lm_quality_rank(sf),
        "pack_sequences": lambda sf: text_analysis.pack_sequences(sf),
        "corpus_shuffle": lambda sf: text_analysis.corpus_shuffle(sf),
        "source_vocab": text_analysis.source_vocab,
        "pii_scrub": text_analysis.pii_scrub,
        "source_mix_weights": lambda sf: text_analysis.source_mix_weights(sf),
        "source_mix_sample": lambda sf: text_analysis.source_mix_sample(sf),
        "source_mix_epochs": lambda sf: text_analysis.source_mix_epochs(sf),
        "gopher_filter": text_analysis.gopher_filter,
        "script_stats": text_analysis.script_stats,
        "length_quantiles": lambda sf: text_analysis.length_quantiles(sf),
        "lang_length_quantiles":
            lambda sf: text_analysis.lang_length_quantiles(sf),
        "sliding_chunks": lambda sf: text_analysis.sliding_chunks(sf),
        "dataset_split": lambda sf: text_analysis.dataset_split(sf),
        "dsir_select": lambda sf: text_analysis.dsir_select(sf),
        "train_bpe": lambda sf: text_analysis.train_bpe(sf),
        "top_words_cms": lambda sf: text_analysis.top_words_cms(sf),
        "bpe_token_counts": lambda sf: text_analysis.bpe_token_counts(sf),
        # dedup (r1–r3 verified)
        "exact_dedup": dedup.exact_dedup,
        "near_dup_removal": lambda sf: dedup.near_dup_removal(sf),
    }
    head = [q for q in _R5_WINDOW if q in all_q]
    head_set = set(head)
    return {k: all_q[k]
            for k in (*head, *(q for q in all_q if q not in head_set))}


_STOPWORDS_SQL = "('the','and','of','to','is','in','that','it','for','with')"


def oracle_sql() -> dict[str, str]:
    out = {
        # GraphRAG entity co-occurrence graph: entities = per-doc top-12
        # tokens of length ≥ 4 by (tf desc, token asc); edge weight =
        # co-occurring doc count. Pure string/int — hash-strict.
        "entity_graph": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), toks AS (
              SELECT doc_id, t.tok FROM d, LATERAL unnest(d.ws) AS t(tok)
              WHERE len(t.tok) >= 4
            ), cnt AS (
              SELECT doc_id, tok, COUNT(*) AS c
              FROM toks GROUP BY doc_id, tok
            ), ranked AS (
              SELECT doc_id, tok, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
              FROM cnt
            ), ents AS (SELECT doc_id, tok FROM ranked WHERE rn <= 12)
            SELECT a.tok AS src, b.tok AS dst,
                   CAST(COUNT(*) AS BIGINT) AS weight
            FROM ents a JOIN ents b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2
        """,
        # connected components over the entity graph, community id =
        # lexicographically-min member (min-label propagation replica)
        "graph_communities": r"""
            WITH RECURSIVE d AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), toks AS (
              SELECT doc_id, t.tok FROM d, LATERAL unnest(d.ws) AS t(tok)
              WHERE len(t.tok) >= 4
            ), cnt AS (
              SELECT doc_id, tok, COUNT(*) AS c
              FROM toks GROUP BY doc_id, tok
            ), ranked AS (
              SELECT doc_id, tok, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
              FROM cnt
            ), ents AS (SELECT doc_id, tok FROM ranked WHERE rn <= 12
            ), ew AS (
              SELECT a.tok AS src, b.tok AS dst
              FROM ents a JOIN ents b
                ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY 1, 2
            ), und AS (
              SELECT src AS a, dst AS b FROM ew
              UNION SELECT dst, src FROM ew
              UNION SELECT src, src FROM ew
              UNION SELECT dst, dst FROM ew
            ), reach(src, dst) AS (
              SELECT a, b FROM und
              UNION
              SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
            )
            SELECT src AS entity, MIN(dst) AS community
            FROM reach GROUP BY src
        """,
        # entity-resolution CANDIDATE pairs (the deterministic gate of
        # graphrag/entity_resolution.py:215-223; the LLM merge decision
        # is excluded): English pairs within edit distance
        # floor(min(len)/2), or any pair sharing > 1 distinct char
        "entity_resolution_candidates": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), toks AS (
              SELECT doc_id, t.tok FROM d, LATERAL unnest(d.ws) AS t(tok)
              WHERE len(t.tok) >= 4
            ), cnt AS (
              SELECT doc_id, tok, COUNT(*) AS c
              FROM toks GROUP BY doc_id, tok
            ), ranked AS (
              SELECT doc_id, tok, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
              FROM cnt
            ), ents AS (SELECT doc_id, tok FROM ranked WHERE rn <= 12
            ), ew AS (
              SELECT a.tok AS src, b.tok AS dst
              FROM ents a JOIN ents b
                ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY 1, 2
            ), vocab AS (
              SELECT DISTINCT tok FROM (
                SELECT src AS tok FROM ew
                UNION ALL SELECT dst AS tok FROM ew) u
            )
            SELECT a.tok AS ent_a, b.tok AS ent_b,
                   CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS lev,
                   CAST(len(list_intersect(
                       list_distinct(string_split(a.tok, '')),
                       list_distinct(string_split(b.tok, ''))))
                       AS BIGINT) AS n_common_chars
            FROM vocab a JOIN vocab b ON a.tok < b.tok
            WHERE (regexp_matches(a.tok, '^[A-Za-z]+$')
                   AND regexp_matches(b.tok, '^[A-Za-z]+$')
                   AND levenshtein(a.tok, b.tok)
                       <= least(len(a.tok), len(b.tok)) // 2)
               OR len(list_intersect(
                      list_distinct(string_split(a.tok, '')),
                      list_distinct(string_split(b.tok, '')))) > 1
        """,
        # extractive community report: per community entity/edge/weight
        # rollups + top entity by weighted degree (tie → lex smaller)
        "community_reports": r"""
            WITH RECURSIVE d AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), toks AS (
              SELECT doc_id, t.tok FROM d, LATERAL unnest(d.ws) AS t(tok)
              WHERE len(t.tok) >= 4
            ), cnt AS (
              SELECT doc_id, tok, COUNT(*) AS c
              FROM toks GROUP BY doc_id, tok
            ), ranked AS (
              SELECT doc_id, tok, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
              FROM cnt
            ), ents AS (SELECT doc_id, tok FROM ranked WHERE rn <= 12
            ), ew AS (
              SELECT a.tok AS src, b.tok AS dst,
                     CAST(COUNT(*) AS BIGINT) AS weight
              FROM ents a JOIN ents b
                ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY 1, 2
            ), und AS (
              SELECT src AS a, dst AS b FROM ew
              UNION SELECT dst, src FROM ew
              UNION SELECT src, src FROM ew
              UNION SELECT dst, dst FROM ew
            ), reach(src, dst) AS (
              SELECT a, b FROM und
              UNION
              SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
            ), comm AS (
              SELECT src AS entity, MIN(dst) AS community
              FROM reach GROUP BY src
            ), deg AS (
              SELECT tok, CAST(SUM(w) AS BIGINT) AS dg FROM (
                SELECT src AS tok, weight AS w FROM ew
                UNION ALL SELECT dst AS tok, weight AS w FROM ew) u
              GROUP BY tok
            ), rke AS (
              SELECT c.community, c.entity, deg.dg, ROW_NUMBER() OVER (
                  PARTITION BY c.community
                  ORDER BY deg.dg DESC, c.entity) AS rn
              FROM comm c JOIN deg ON deg.tok = c.entity
            ), sizes AS (
              SELECT community, CAST(COUNT(*) AS BIGINT) AS n_entities
              FROM comm GROUP BY community
            ), eper AS (
              SELECT c.community, CAST(COUNT(*) AS BIGINT) AS n_edges,
                     CAST(SUM(ew.weight) AS BIGINT) AS total_weight
              FROM ew JOIN comm c ON c.entity = ew.src
              GROUP BY c.community
            )
            SELECT s.community, s.n_entities, e.n_edges, e.total_weight,
                   r.entity AS top_entity, r.dg AS top_degree
            FROM sizes s
            JOIN eper e ON e.community = s.community
            JOIN rke r ON r.community = s.community AND r.rn = 1
        """,
        # feature-hash embedder probe (stages/embed.py): exact signed
        # bucket sums — md5_hash64 == DuckDB md5_number_lower, bucket =
        # h % 64, sign = bit 6 of h; zero buckets omitted on both sides
        "doc_embedding_sums": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(
                         trim(lower(text), ' ' || chr(9) || chr(10)
                              || chr(13) || chr(12) || chr(11)),
                         '\s+')) AS w
              FROM documents
            ), h AS (
              SELECT doc_id, md5_number_lower(w) AS hv
              FROM toks WHERE w <> ''
            )
            SELECT doc_id,
                   CAST(hv % 64 AS BIGINT) AS bucket,
                   CAST(SUM(CASE WHEN ((hv // 64) % 2) = 0
                                 THEN 1 ELSE -1 END) AS BIGINT) AS v
            FROM h GROUP BY doc_id, bucket
            HAVING SUM(CASE WHEN ((hv // 64) % 2) = 0
                            THEN 1 ELSE -1 END) <> 0
        """,
        # similarity search over PRODUCED embeddings: exact integer dot
        # products against the min-doc_id query vector
        "produced_emb_knn": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(
                         trim(lower(text), ' ' || chr(9) || chr(10)
                              || chr(13) || chr(12) || chr(11)),
                         '\s+')) AS w
              FROM documents
            ), h AS (
              SELECT doc_id, md5_number_lower(w) AS hv
              FROM toks WHERE w <> ''
            ), v AS (
              SELECT doc_id,
                     CAST(hv % 64 AS BIGINT) AS bucket,
                     CAST(SUM(CASE WHEN ((hv // 64) % 2) = 0
                                   THEN 1 ELSE -1 END) AS BIGINT) AS v
              FROM h GROUP BY doc_id, bucket
            ), q AS (
              SELECT bucket, v FROM v
              WHERE doc_id = (SELECT min(doc_id) FROM documents)
            ), d AS (
              SELECT v.doc_id,
                     CAST(COALESCE(SUM(v.v * q.v), 0) AS BIGINT) AS dot
              FROM v LEFT JOIN q USING (bucket)
              WHERE v.doc_id <> (SELECT min(doc_id) FROM documents)
              GROUP BY v.doc_id
            )
            SELECT doc_id, dot FROM d
            ORDER BY dot DESC, doc_id LIMIT 10
        """,
        # query-rewrite retrieval: the (term/synonym/phrase, ratio)
        # literals below are the DETERMINISTIC rewrite of the default
        # question "what is the hash table scan" (fixture-pinned in
        # tests/test_query_rewrite.py); weights = normalized unigram
        # idf, synonyms at w/4, phrases at 2·max(w) — the FulltextQueryer
        # ratios (rag/nlp/query.py:96-112)
        # hybrid rerank: 0.3·token_sim + 0.7·cosine, token weights =
        # normalized unigram idf (synonyms at w/4 — the same VALUES
        # literals as the weighted-query oracle), vectors = the
        # md5_number_lower feature-hash bucket sums of the lowercased
        # token stream (the produced-embedding idiom). All dots/norms
        # are exact BIGINTs, so dot/sqrt(qq·vv) is the same
        # correctly-rounded double in both engines.
        "rerank_hybrid_topk": r"""
            WITH d AS (
              SELECT doc_id,
                     string_split_regex(
                         trim(lower(text), ' ' || chr(9) || chr(10)
                              || chr(13) || chr(12) || chr(11)),
                         '\s+') AS ws
              FROM documents
            ), stats AS (
              SELECT (SELECT COUNT(*) FROM documents
                      WHERE trim(text) <> '') AS n
            ), uni AS (
              SELECT * FROM (VALUES ('hash'), ('table'), ('scan'))
                  AS t(term)
            ), uw AS (
              SELECT uni.term,
                     ln(1.0 + ((SELECT n FROM stats)
                               - (SELECT COUNT(*) FROM d
                                  WHERE list_contains(d.ws, uni.term))
                               + 0.5)
                        / ((SELECT COUNT(*) FROM d
                            WHERE list_contains(d.ws, uni.term)) + 0.5))
                         AS idf
              FROM uni
            ), wn AS (
              SELECT term, idf / (SELECT SUM(idf) FROM uw) AS w FROM uw
            ), tk AS (
              SELECT term, w FROM wn
              UNION ALL
              SELECT s.syn, wn.w / 4
              FROM (VALUES ('hash', 'digest'), ('hash', 'checksum'),
                           ('hash', 'key'), ('table', 'relation'),
                           ('table', 'grid'), ('scan', 'sweep'),
                           ('scan', 'read'), ('scan', 'filter'))
                   AS s(parent, syn)
              JOIN wn ON wn.term = s.parent
            ), tot AS (
              SELECT SUM(w) AS tw FROM tk
            ), m AS (
              SELECT d.doc_id, SUM(tk.w) AS mw
              FROM d JOIN tk ON list_contains(d.ws, tk.term)
              GROUP BY d.doc_id
            ), toks AS (
              SELECT doc_id, unnest(ws) AS t FROM d
            ), h AS (
              SELECT doc_id, md5_number_lower(t) AS hv
              FROM toks WHERE t <> ''
            ), v AS (
              SELECT doc_id, CAST(hv % 64 AS BIGINT) AS bucket,
                     CAST(SUM(CASE WHEN ((hv // 64) % 2) = 0
                                   THEN 1 ELSE -1 END) AS BIGINT) AS v
              FROM h GROUP BY doc_id, bucket
            ), qv AS (
              SELECT CAST(hv % 64 AS BIGINT) AS bucket,
                     CAST(SUM(CASE WHEN ((hv // 64) % 2) = 0
                                   THEN 1 ELSE -1 END) AS BIGINT) AS q
              FROM (SELECT md5_number_lower(term) AS hv FROM uni)
              GROUP BY bucket
            ), qq AS (
              SELECT SUM(q * q) AS qq FROM qv
            ), vv AS (
              SELECT doc_id, SUM(v * v) AS vv FROM v GROUP BY doc_id
            ), dt AS (
              SELECT v.doc_id, SUM(v.v * qv.q) AS dot
              FROM v JOIN qv USING (bucket) GROUP BY v.doc_id
            ), sc AS (
              SELECT docs.doc_id,
                     0.3 * ((1e-9 + COALESCE(m.mw, 0))
                            / (1e-9 + (SELECT tw FROM tot)))
                     + 0.7 * (CASE WHEN COALESCE(vv.vv, 0) > 0
                                   THEN COALESCE(dt.dot, 0)
                                        / sqrt((SELECT qq FROM qq)
                                               * vv.vv)
                                   ELSE 0 END) AS s
              FROM documents docs
              LEFT JOIN m ON m.doc_id = docs.doc_id
              LEFT JOIN vv ON vv.doc_id = docs.doc_id
              LEFT JOIN dt ON dt.doc_id = docs.doc_id
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY round(s * 1000000) DESC, doc_id
                   ) AS BIGINT) AS rank,
                   doc_id,
                   CAST(round(s * 1000000) AS BIGINT) AS score_q
            FROM sc ORDER BY rank LIMIT 10
        """,
        # weighted-sum retrieval fusion: the bm25_topk oracle's lexical
        # half + the rerank oracle's exact-int cosine half, combined
        # 0.05/0.95 over every document (raw scores, no positivity
        # filter — cosine can be negative)
        "fusion_weighted_topk": r"""
            WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), stats AS (
              SELECT COUNT(*) AS n, AVG(len(ws)) AS avgdl FROM d
            ), q AS (
              SELECT unnest(['hash', 'table', 'scan']) AS term
            ), df AS (
              SELECT term, COUNT(*) AS df
              FROM q JOIN d ON list_contains(d.ws, q.term)
              GROUP BY term
            ), tf AS (
              SELECT d.doc_id, q.term, len(d.ws) AS dl,
                     len(list_filter(d.ws, x -> x = q.term)) AS tf
              FROM d CROSS JOIN q
            ), lex AS (
              SELECT tf.doc_id,
                     SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1))
                         / (tf.tf + 1.2 * (1 - 0.75
                                           + 0.75 * tf.dl / stats.avgdl))
                     ) AS s
              FROM tf
              JOIN df USING (term) CROSS JOIN stats
              WHERE tf.tf > 0
              GROUP BY tf.doc_id
            ), ld AS (
              SELECT doc_id,
                     string_split_regex(
                         trim(lower(text), ' ' || chr(9) || chr(10)
                              || chr(13) || chr(12) || chr(11)),
                         '\s+') AS ws
              FROM documents
            ), h AS (
              SELECT doc_id, md5_number_lower(t) AS hv
              FROM (SELECT doc_id, unnest(ws) AS t FROM ld)
              WHERE t <> ''
            ), v AS (
              SELECT doc_id, CAST(hv % 64 AS BIGINT) AS bucket,
                     CAST(SUM(CASE WHEN ((hv // 64) % 2) = 0
                                   THEN 1 ELSE -1 END) AS BIGINT) AS v
              FROM h GROUP BY doc_id, bucket
            ), qv AS (
              SELECT CAST(hv % 64 AS BIGINT) AS bucket,
                     CAST(SUM(CASE WHEN ((hv // 64) % 2) = 0
                                   THEN 1 ELSE -1 END) AS BIGINT) AS qd
              FROM (SELECT md5_number_lower(term) AS hv FROM q)
              GROUP BY bucket
            ), qq AS (
              SELECT SUM(qd * qd) AS qq FROM qv
            ), vv AS (
              SELECT doc_id, SUM(v * v) AS vv FROM v GROUP BY doc_id
            ), dt AS (
              SELECT v.doc_id, SUM(v.v * qv.qd) AS dot
              FROM v JOIN qv USING (bucket) GROUP BY v.doc_id
            ), fused AS (
              SELECT docs.doc_id,
                     0.05 * COALESCE(lex.s, 0)
                     + 0.95 * (CASE WHEN COALESCE(vv.vv, 0) > 0
                                    THEN COALESCE(dt.dot, 0)
                                         / sqrt((SELECT qq FROM qq)
                                                * vv.vv)
                                    ELSE 0 END) AS s
              FROM documents docs
              LEFT JOIN lex ON lex.doc_id = docs.doc_id
              LEFT JOIN vv ON vv.doc_id = docs.doc_id
              LEFT JOIN dt ON dt.doc_id = docs.doc_id
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY round(s * 1000000) DESC, doc_id
                   ) AS BIGINT) AS rank,
                   doc_id,
                   CAST(round(s * 1000000) AS BIGINT) AS score_q
            FROM fused ORDER BY rank LIMIT 10
        """,
        "weighted_query_bm25_topk": r"""
            WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), stats AS (
              SELECT COUNT(*) AS n, AVG(len(ws)) AS avgdl FROM d
            ), uni AS (
              SELECT * FROM (VALUES ('hash'), ('table'), ('scan'))
                  AS t(term)
            ), uw AS (
              SELECT uni.term,
                     ln(1.0 + ((SELECT n FROM stats)
                               - (SELECT COUNT(*) FROM d
                                  WHERE list_contains(d.ws, uni.term))
                               + 0.5)
                        / ((SELECT COUNT(*) FROM d
                            WHERE list_contains(d.ws, uni.term)) + 0.5))
                         AS idf
              FROM uni
            ), wn AS (
              SELECT term, idf / (SELECT SUM(idf) FROM uw) AS w FROM uw
            ), terms AS (
              SELECT term, w FROM wn
              UNION ALL
              SELECT s.syn, wn.w / 4
              FROM (VALUES ('hash', 'digest'), ('hash', 'checksum'),
                           ('hash', 'key'), ('table', 'relation'),
                           ('table', 'grid'), ('scan', 'sweep'),
                           ('scan', 'read'), ('scan', 'filter'))
                   AS s(parent, syn)
              JOIN wn ON wn.term = s.parent
            ), tw AS (
              SELECT terms.term, terms.w,
                     (SELECT COUNT(*) FROM d
                      WHERE list_contains(d.ws, terms.term)) AS df
              FROM terms
            ), sc1 AS (
              SELECT d.doc_id,
                     SUM(tw.w
                         * ln(1.0 + ((SELECT n FROM stats) - tw.df + 0.5)
                              / (tw.df + 0.5))
                         * (len(list_filter(d.ws, x -> x = tw.term))
                            * (1.2 + 1))
                         / (len(list_filter(d.ws, x -> x = tw.term))
                            + 1.2 * (1 - 0.75 + 0.75 * len(d.ws)
                                     / (SELECT avgdl FROM stats)))) AS s
              FROM d CROSS JOIN tw
              WHERE list_contains(d.ws, tw.term)
              GROUP BY d.doc_id
            ), ph AS (
              SELECT p.phrase, 2 * greatest(a.w, b.w) AS w
              FROM (VALUES ('hash table', 'hash', 'table'),
                           ('table scan', 'table', 'scan'))
                   AS p(phrase, l, r)
              JOIN wn a ON a.term = p.l
              JOIN wn b ON b.term = p.r
            ), sc2 AS (
              SELECT d.doc_id,
                     SUM(ph.w * CAST(
                         (len(' ' || array_to_string(d.ws, ' ') || ' ')
                          - len(replace(
                              ' ' || array_to_string(d.ws, ' ') || ' ',
                              ' ' || ph.phrase || ' ', '')))
                         / len(' ' || ph.phrase || ' ') AS DOUBLE)) AS s
              FROM d CROSS JOIN ph
              GROUP BY d.doc_id
            ), tot AS (
              SELECT doc_id, SUM(s) AS s
              FROM (SELECT * FROM sc1 UNION ALL SELECT * FROM sc2)
              GROUP BY doc_id
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY round(s * 1000000) DESC, doc_id
                   ) AS BIGINT) AS rank,
                   doc_id,
                   CAST(round(s * 1000000) AS BIGINT) AS score_q
            FROM tot
            WHERE round(s * 1000000) > 0
            ORDER BY rank LIMIT 10
        """,
        # same SQL as token_counts but the Ray side reads documents
        # through the jsonl.gz round-trip — a hash match proves the
        # source/sink is byte-lossless
        "jsonl_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents
        """,
        # same proof for the Arrow IPC (feather v2) source/sink
        "ipc_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents
        """,
        # boilerplate-strip EXACTNESS: the extractor must return exactly
        # the source paragraphs after the chrome wrap round-trip
        "warc_main_content": r"""
            WITH p AS (
              SELECT doc_id,
                     list_filter(list_transform(
                         string_split(text, chr(10) || chr(10)),
                         x -> trim(x)), x -> x <> '') AS paras
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(paras) AS BIGINT) AS n_sections,
                   md5(array_to_string(paras, chr(10) || chr(10)))
                       AS content_md5
            FROM p
        """,
        # URL canonicalization collapses every crawl variant to the
        # canonical form; the md5 re-fetch rule replays the writer's
        "warc_url_dedup": r"""
            SELECT doc_id,
                   'https://graft.example/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS canon_url,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                             < '4'
                        THEN CAST(2 AS BIGINT)
                        ELSE CAST(1 AS BIGINT) END AS n_fetches
            FROM documents
        """,
        # the crawl-2 writer's md5 drop/update rules, replayed: 4th hex
        # digit < '2' → page gone; else 3rd < '8' → content changed
        "warc_crawl_delta": r"""
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)
                             < '2' THEN 'removed'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)
                             < '8' THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents
        """,
        # same proof for the WARC source/sink (Common Crawl wire format)
        "warc_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents
        """,
        # same proof for the CSV(.gz) source/sink
        "csv_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_tokens
            FROM documents
        """,
        "quality_stats": rf"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                       AS n_ws_tokens,
                   length(regexp_replace(text, '[\w\s]', '', 'g')) AS n_punct,
                   len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                                   w -> w IN {_STOPWORDS_SQL})) AS n_stop,
                   length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                   COALESCE(list_max(list_transform(
                       string_split_regex(trim(text), '\s+'),
                       w -> length(w))), 0) AS max_word_len
            FROM documents
        """,
        "fingerprints": "SELECT doc_id, md5(text) AS fp FROM documents",
        "lang_pred": r"""
            WITH c AS (
              SELECT doc_id,
                     length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk,
                     len(regexp_extract_all(lower(text), '[a-zà-ÿ]+')) AS n_words,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('the','and','of','to','is','in','that','it','for','with'))) AS n_en,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('le','la','les','de','et','est','une','que','des','dans'))) AS n_fr,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('el','la','los','de','y','es','una','que','las','en'))) AS n_es,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('der','die','das','und','ist','ein','nicht','mit','den','von'))) AS n_de
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN n_cjk > greatest(1, n_words) * 0.5 THEN 'zh'
                        WHEN n_en >= n_fr AND n_en >= n_es AND n_en >= n_de THEN 'en'
                        WHEN n_fr >= n_es AND n_fr >= n_de THEN 'fr'
                        WHEN n_es >= n_de THEN 'es'
                        ELSE 'de' END AS lang_pred
            FROM c
        """,
        "quality_filter": r"""
            SELECT doc_id FROM documents
            WHERE length(text) BETWEEN 200 AND 5000
              AND len(regexp_extract_all(text, '\S+')) >= 30
        """,
        "length_histogram": r"""
            SELECT length(text) // 100 AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "source_profile": r"""
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents GROUP BY source ORDER BY source
        """,
        "lang_confusion": r"""
            WITH c AS (
              SELECT doc_id, lang,
                     length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk,
                     len(regexp_extract_all(lower(text), '[a-zà-ÿ]+')) AS n_words,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('the','and','of','to','is','in','that','it','for','with'))) AS n_en,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('le','la','les','de','et','est','une','que','des','dans'))) AS n_fr,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('el','la','los','de','y','es','una','que','las','en'))) AS n_es,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('der','die','das','und','ist','ein','nicht','mit','den','von'))) AS n_de
              FROM documents
            )
            SELECT lang,
                   CASE WHEN n_cjk > greatest(1, n_words) * 0.5 THEN 'zh'
                        WHEN n_en >= n_fr AND n_en >= n_es AND n_en >= n_de THEN 'en'
                        WHEN n_fr >= n_es AND n_fr >= n_de THEN 'fr'
                        WHEN n_es >= n_de THEN 'es'
                        ELSE 'de' END AS lang_pred,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_props_stats": r"""
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(COALESCE(CAST(
                       json_extract(props, '$.k') AS BIGINT), 0)) AS BIGINT)
                       AS sum_k
            FROM events GROUP BY event_type
        """,
        # stratified deterministic sampling: stratum = the lang_pred
        # heuristic; keep iff the first 8 hex chars of md5(doc_id) sort
        # under the stratum's rate cutoff (lexicographic == numeric for
        # fixed-width lowercase hex) — cutoffs must match
        # text_analysis.STRATA_RATES via sample_cutoff_hex
        "stratified_sample": r"""
            WITH c AS (
              SELECT doc_id, text,
                     length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk,
                     len(regexp_extract_all(lower(text), '[a-zà-ÿ]+')) AS n_words,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('the','and','of','to','is','in','that','it','for','with'))) AS n_en,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('le','la','les','de','et','est','une','que','des','dans'))) AS n_fr,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('el','la','los','de','y','es','una','que','las','en'))) AS n_es,
                     len(list_filter(regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                         w -> w IN ('der','die','das','und','ist','ein','nicht','mit','den','von'))) AS n_de
              FROM documents
            ), lp AS (
              SELECT doc_id,
                     CASE WHEN n_cjk > greatest(1, n_words) * 0.5 THEN 'zh'
                          WHEN n_en >= n_fr AND n_en >= n_es AND n_en >= n_de THEN 'en'
                          WHEN n_fr >= n_es AND n_fr >= n_de THEN 'fr'
                          WHEN n_es >= n_de THEN 'es'
                          ELSE 'de' END AS lang_pred
              FROM c
            )
            SELECT doc_id, lang_pred FROM lp
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
                  CASE lang_pred
                       WHEN 'en' THEN '33333333'
                       WHEN 'fr' THEN '80000000'
                       WHEN 'es' THEN '80000000'
                       WHEN 'de' THEN 'g'
                       WHEN 'zh' THEN 'g'
                       ELSE '00000000' END
        """,
        "near_dup_removal": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
              FROM words,
                   LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
            ), und AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
              UNION SELECT id_a, id_a FROM pairs
              UNION SELECT id_b, id_b FROM pairs
            ), reach(src, dst) AS (
              SELECT a, b FROM und
              UNION
              SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
            ), drops AS (
              SELECT src AS doc_id FROM reach
              GROUP BY src HAVING MIN(dst) <> src
            )
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
        """,
        "top_words": r"""
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
                  FROM documents WHERE trim(text) <> '')
            GROUP BY word
            ORDER BY cnt DESC, word
            LIMIT 20
        """,
        "top_bigrams": r"""
            WITH toks AS (
                SELECT string_split_regex(trim(text), '\s+') AS ts
                FROM documents WHERE trim(text) <> ''
            ), pairs AS (
                SELECT ts[i] || ' ' || ts[i + 1] AS bigram
                FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
            )
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM pairs
            GROUP BY bigram
            ORDER BY cnt DESC, bigram
            LIMIT 20
        """,
        # ranking key (tf desc, df asc, term asc) is integer-exact on both
        # sides; tokens are ascii runs so lower() is locale-independent
        "term_weights": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_transform(
                           regexp_extract_all(text, '[A-Za-z0-9]+'),
                           x -> lower(x))) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM toks WHERE length(term) >= 2
                GROUP BY doc_id, term
            ), df AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM tf GROUP BY term
            ), ranked AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC
                       ) AS BIGINT) AS rank
                FROM tf JOIN df USING (term)
            )
            SELECT doc_id, term, tf, df, rank
            FROM ranked WHERE rank <= 5
        """,
        # integer repetition counters only — the filter ratios are floats
        # computed client-side, so the hash compare stays exact
        "repetition_stats": r"""
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), t2 AS (
              SELECT doc_id, ws, len(ws) AS n,
                     list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1]) AS bis,
                     list_transform(range(1, len(ws) - 1),
                                    i -> ws[i] || ' ' || ws[i + 1] || ' '
                                         || ws[i + 2]) AS tris
              FROM t
            ), wc AS (
              SELECT doc_id, MAX(c) AS mx FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(ws) AS w FROM t2)
                GROUP BY doc_id, w) GROUP BY doc_id
            ), bc AS (
              SELECT doc_id, MAX(c) AS mx FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(bis) AS b FROM t2)
                GROUP BY doc_id, b) GROUP BY doc_id
            ), tc AS (
              SELECT doc_id, SUM(c) AS dup FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(tris) AS g FROM t2)
                GROUP BY doc_id, g) WHERE c > 1 GROUP BY doc_id
            )
            SELECT t2.doc_id,
                   CAST(t2.n AS BIGINT) AS n_words,
                   CAST(wc.mx AS BIGINT) AS max_word_cnt,
                   CAST(greatest(t2.n - 1, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(bc.mx, 0) AS BIGINT) AS top_bigram_cnt,
                   CAST(greatest(t2.n - 2, 0) AS BIGINT) AS n_trigrams,
                   CAST(COALESCE(tc.dup, 0) AS BIGINT) AS dup_trigram_cnt
            FROM t2
            JOIN wc USING (doc_id)
            LEFT JOIN bc USING (doc_id)
            LEFT JOIN tc USING (doc_id)
        """,
        # eval split = doc_id % 29 == 0; n-grams are distinct per doc on
        # both sides, mirroring decontam_ngrams' gram_set()
        "decontam_ngrams": r"""
            WITH g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, len(ws) - 3),
                         i -> array_to_string(ws[i:i + 4], ' '))) AS grams
              FROM (SELECT doc_id,
                           string_split_regex(trim(text), '\s+') AS ws
                    FROM documents WHERE trim(text) <> '')
              WHERE len(ws) >= 5
            ), ev AS (
              SELECT DISTINCT unnest(grams) AS gr FROM g
              WHERE doc_id % 29 = 0
            ), tr AS (
              SELECT doc_id, unnest(grams) AS gr FROM g
              WHERE doc_id % 29 <> 0
            )
            SELECT tr.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN ev.gr IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits
            FROM tr LEFT JOIN ev USING (gr)
            GROUP BY tr.doc_id
        """,
        "exact_dedup": """
            SELECT text, MIN(doc_id) AS keep_id,
                   CAST(COUNT(*) AS BIGINT) AS n_dups
            FROM documents GROUP BY text
        """,
        "incremental_dedup": r"""
            SELECT doc_id FROM documents
            WHERE CAST(substr(source, 4) AS BIGINT) % 2 = 1
              AND text NOT IN (
                  SELECT text FROM documents
                  WHERE CAST(substr(source, 4) AS BIGINT) % 2 = 0)
        """,
        "jaccard_pairs": r"""
            WITH words AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
              FROM words,
                   LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        """,
        "minhash_verified_pairs": r"""
            WITH words AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
              FROM words,
                   LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        """,
        "char_jaccard_pairs": r"""
            -- lower() FIRST, then derive gram positions from the lowered
            -- string: lowercasing can change string length (e.g. 'İ'),
            -- and Python's _char_grams slides over text.lower()
            WITH d AS (
              SELECT doc_id, lower(text) AS t FROM documents
              WHERE length(text) > 0
            ), sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN length(t) <= 4 THEN t
                          ELSE substr(t, i, 4) END AS g
              FROM d,
                   LATERAL unnest(generate_series(
                       1, greatest(length(t) - 3, 1))) AS u(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.6
        """,
        "simhash_pairs": r"""
            WITH th AS (
              -- trim's default strips only spaces; list every whitespace
              -- char and drop empty tokens so the split matches Python's
              -- str.split() exactly
              SELECT doc_id, md5_number_lower(w) AS h
              FROM (SELECT doc_id,
                           unnest(string_split_regex(
                               trim(lower(text), ' ' || chr(9) || chr(10)
                                    || chr(13) || chr(12) || chr(11)),
                               '\s+')) AS w
                    FROM documents)
              WHERE w <> ''
            ), bits AS (
              SELECT doc_id, i,
                     CASE WHEN SUM(CASE WHEN (h >> i) & 1 = 1
                                        THEN 1 ELSE -1 END) > 0
                          THEN (1::UBIGINT << i) ELSE 0::UBIGINT END AS bv
              FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
              GROUP BY doc_id, i
            ), sims AS (
              SELECT d.doc_id,
                     COALESCE(s.sim, 0::UBIGINT) AS sim
              FROM (SELECT DISTINCT doc_id FROM documents) d
              LEFT JOIN (SELECT doc_id, CAST(SUM(bv) AS UBIGINT) AS sim
                         FROM bits GROUP BY doc_id) s USING (doc_id)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sim, b.sim)) <= 3
        """,
        # winnowing (k=16, w=8): per window of 8 consecutive k-gram md5
        # hashes select the min, rightmost on ties (list_position on the
        # reversed window finds the LAST minimum), then count distinct
        # shared fingerprints per doc pair
        "winnow_matches": r"""
            WITH h AS (
              SELECT doc_id,
                     list_transform(range(1, length(text) - 16 + 2),
                                    i -> md5_number_lower(substr(text, i, 16))
                     ) AS hs
              FROM documents WHERE length(text) >= 16 + 8 - 1
            ), sel AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(
                         range(1, len(hs) - 8 + 2),
                         p -> hs[p + 8 - list_position(
                                  list_reverse(hs[p:p + 7]),
                                  list_min(hs[p:p + 7]))])) AS fp
              FROM h WHERE len(hs) >= 8
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM sel a JOIN sel b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 5
        """,
        "source_vocab": r"""
            WITH sw AS (
              SELECT source, w, COUNT(*) AS cnt FROM (
                SELECT source,
                       unnest(string_split_regex(trim(text), '\s+')) AS w
                FROM documents WHERE trim(text) <> ''
              ) GROUP BY source, w
            ), top AS (
              SELECT source, w AS top_word, cnt AS top_word_cnt,
                     ROW_NUMBER() OVER (
                         PARTITION BY source ORDER BY cnt DESC, w ASC
                     ) AS rn
              FROM sw
            )
            SELECT sw.source,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(sw.cnt) AS BIGINT) AS n_tokens,
                   ANY_VALUE(top.top_word) AS top_word,
                   CAST(ANY_VALUE(top.top_word_cnt) AS BIGINT)
                       AS top_word_cnt
            FROM sw JOIN top ON sw.source = top.source AND top.rn = 1
            GROUP BY sw.source
        """,
        # shuffle key = md5('epoch0:' || doc_id); first byte picks the
        # shard, key order gives the within-shard position
        "corpus_shuffle": r"""
            WITH k AS (
              SELECT doc_id,
                     md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS key,
                     CAST(('0x' || substr(
                         md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 2)
                     )::INT % 16 AS BIGINT) AS shard
              FROM documents
            )
            SELECT doc_id, shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY shard ORDER BY key, doc_id
                   ) - 1 AS BIGINT) AS pos
            FROM k
        """,
        # shard-local greedy packing: cumulative token offsets in doc_id
        # order, bins of 256 tokens, docs may span bins
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id, doc_id % 16 AS shard,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens
              FROM documents WHERE trim(text) <> ''
            ), c AS (
              SELECT doc_id, shard, n_tokens,
                     SUM(n_tokens) OVER (
                         PARTITION BY shard ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) - n_tokens AS start_offset
              FROM t
            )
            SELECT doc_id, shard,
                   CAST(start_offset AS BIGINT) AS start_offset,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(start_offset // 256 AS BIGINT) AS first_bin,
                   CAST((start_offset + n_tokens - 1) // 256 AS BIGINT)
                       AS last_bin
            FROM c
        """,
        # unigram LM with add-one smoothing trained on the corpus itself;
        # avg per-word logprob quantized to 1e-6 so ROW_NUMBER ordering
        # is float-order-independent
        "lm_quality_rank": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents WHERE trim(text) <> ''
            ), c AS (
              SELECT w, COUNT(*) AS cnt FROM w GROUP BY w
            ), tot AS (
              SELECT SUM(cnt) AS t, COUNT(*) AS v FROM c
            ), d AS (
              SELECT w.doc_id,
                     SUM(ln((c.cnt + 1.0) / (tot.t + tot.v))) AS lp,
                     COUNT(*) AS n
              FROM w JOIN c USING (w) CROSS JOIN tot
              GROUP BY w.doc_id
            )
            SELECT doc_id,
                   CAST(floor(lp / n * 1000000 + 0.5) AS BIGINT)
                       AS avg_logprob_q,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY floor(lp / n * 1000000 + 0.5) DESC, doc_id
                   ) AS BIGINT) AS rank
            FROM d
        """,
        # non-overlapping 10-word passages, tail dropped; a passage is dup
        # iff its exact text occurs >1 time corpus-wide (within-doc too)
        "dup_passage_stats": r"""
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), p AS (
              SELECT doc_id,
                     array_to_string(ws[(j - 1) * 10 + 1 : j * 10],
                                     ' ') AS passage
              FROM t, LATERAL unnest(generate_series(1, len(ws) // 10))
                           AS g(j)
            ), c AS (
              SELECT passage, COUNT(*) AS cnt FROM p GROUP BY passage
            )
            SELECT p.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_passages,
                   CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_passages
            FROM p JOIN c USING (passage)
            GROUP BY p.doc_id
        """,
        "jaccard_clusters": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
              FROM words,
                   LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
            ), und AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
              UNION SELECT id_a, id_a FROM pairs
              UNION SELECT id_b, id_b FROM pairs
            ), reach(src, dst) AS (
              SELECT a, b FROM und
              UNION
              SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
            )
            SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY src
        """,
        "emb_near_dup": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM embeddings a
            JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
        "emb_topk": """
            SELECT vec_id FROM embeddings
            ORDER BY list_cosine_similarity(
                embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                vec_id
            LIMIT 10
        """,
        # money/quantity sums are in exact integer cents (×100; discounted
        # price in 10^-4 dollar units): integer sums are order-independent,
        # so the distributed result hashes bit-equal to this oracle
        # Okapi/Lucene BM25, k1=1.2 b=0.75, query = 'hash table scan';
        # scores quantized to round(s*1e6) so float accumulation order
        # can't break the hash compare; ties break on doc_id
        "bm25_topk": r"""
            WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), stats AS (
              SELECT COUNT(*) AS n, AVG(len(ws)) AS avgdl FROM d
            ), q AS (
              SELECT unnest(['hash', 'table', 'scan']) AS term
            ), df AS (
              SELECT term, COUNT(*) AS df
              FROM q JOIN d ON list_contains(d.ws, q.term)
              GROUP BY term
            ), tf AS (
              SELECT d.doc_id, q.term, len(d.ws) AS dl,
                     len(list_filter(d.ws, x -> x = q.term)) AS tf
              FROM d CROSS JOIN q
            ), sc AS (
              SELECT tf.doc_id,
                     SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1))
                         / (tf.tf + 1.2 * (1 - 0.75
                                           + 0.75 * tf.dl / stats.avgdl))
                     ) AS s
              FROM tf
              JOIN df USING (term) CROSS JOIN stats
              WHERE tf.tf > 0
              GROUP BY tf.doc_id
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY round(s * 1000000) DESC, doc_id
                   ) AS BIGINT) AS rank,
                   doc_id,
                   CAST(round(s * 1000000) AS BIGINT) AS score_q
            FROM sc
            WHERE round(s * 1000000) > 0
            ORDER BY rank LIMIT 10
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS sum_disc_price_u,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-03'
            GROUP BY l_returnflag, l_linestatus
        """,
        "nation_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_c,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_customers": """
            SELECT o_custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_c
            FROM orders GROUP BY o_custkey
            ORDER BY total_c DESC, o_custkey
            LIMIT 10
        """,
        "events_hourly": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_epoch,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_c,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_asof_orders": """
            SELECT event_id, o_orderkey
            FROM (
              SELECT e.event_id, o.o_orderkey,
                     row_number() OVER (
                         PARTITION BY e.event_id
                         ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e
              JOIN orders o
                ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
        """,
        "events_window_orders": """
            SELECT e.event_id,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id
             AND o.o_orderdate > e.ts - INTERVAL 7 DAY
             AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "events_sessions": """
            WITH d AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(new_s) AS BIGINT) AS n_sessions
            FROM d GROUP BY user_id
        """,
        # sequential redaction: emails on the raw text, IPs on the
        # email-redacted text, phones on the email+IP-redacted text —
        # nested regexp_replace mirrors the engine's pass order exactly.
        # Patterns are the RE2∩re ASCII subset (engine compiles re.ASCII).
        "pii_scrub": r"""
            WITH r1 AS (
              SELECT doc_id, text, regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g') AS t1
              FROM documents
            ), r2 AS (
              SELECT *, regexp_replace(t1,
                  '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                  '<IP>', 'g') AS t2
              FROM r1
            ), r3 AS (
              SELECT *, regexp_replace(t2,
                  '\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b',
                  '<PHONE>', 'g') AS t3
              FROM r2
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t1,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS BIGINT) AS n_ips,
                   CAST(len(regexp_extract_all(t2,
                       '\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b'))
                       AS BIGINT) AS n_phones,
                   CAST(length(t3) AS BIGINT) AS clean_len,
                   md5(t3) AS clean_fp
            FROM r3
        """,
        # line df = count(DISTINCT doc_id) over candidate lines
        # (trimmed length >= 5); lines with df >= 3 are boilerplate and
        # dropped; clean_fp = md5 of the kept lines rejoined with \n
        "boilerplate_removal": r"""
            WITH split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls
              FROM documents
            ), l AS (
              SELECT doc_id, unnest(ls) AS line,
                     generate_subscripts(ls, 1) AS i
              FROM split
            ), cand AS (
              SELECT doc_id, line, i,
                     length(trim(line, ' ' || chr(9) || chr(13))) >= 5
                         AS is_cand
              FROM l
            ), df AS (
              SELECT line, COUNT(DISTINCT doc_id) AS df
              FROM cand WHERE is_cand GROUP BY line
            ), kept AS (
              SELECT c.doc_id, c.i, c.line
              FROM cand c LEFT JOIN df ON c.line = df.line AND c.is_cand
              WHERE NOT c.is_cand OR df.df IS NULL OR df.df < 3
            ), agg AS (
              SELECT doc_id, COUNT(*) AS n_kept,
                     string_agg(line, chr(10) ORDER BY i) AS joined
              FROM kept GROUP BY doc_id
            )
            SELECT sp.doc_id,
                   CAST(len(sp.ls) AS BIGINT) AS n_lines,
                   CAST(len(sp.ls) - COALESCE(a.n_kept, 0) AS BIGINT)
                       AS n_removed,
                   md5(COALESCE(a.joined, '')) AS clean_fp
            FROM split sp LEFT JOIN agg a ON sp.doc_id = a.doc_id
        """,
        # RRF fusion of the BM25 and cosine rankings (both k_each=20);
        # integer contributions floor(1e9/(60+rank)+0.5) summed, ties on
        # doc_id — identical quantization to the engine
        "hybrid_topk": r"""
            WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
              FROM documents WHERE trim(text) <> ''
            ), stats AS (
              SELECT COUNT(*) AS n, AVG(len(ws)) AS avgdl FROM d
            ), q AS (
              SELECT unnest(['hash', 'table', 'scan']) AS term
            ), df AS (
              SELECT term, COUNT(*) AS df
              FROM q JOIN d ON list_contains(d.ws, q.term)
              GROUP BY term
            ), tf AS (
              SELECT d.doc_id, q.term, len(d.ws) AS dl,
                     len(list_filter(d.ws, x -> x = q.term)) AS tf
              FROM d CROSS JOIN q
            ), sc AS (
              SELECT tf.doc_id,
                     SUM(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1))
                         / (tf.tf + 1.2 * (1 - 0.75
                                           + 0.75 * tf.dl / stats.avgdl))
                     ) AS s
              FROM tf
              JOIN df USING (term) CROSS JOIN stats
              WHERE tf.tf > 0
              GROUP BY tf.doc_id
            ), lex AS (
              SELECT doc_id, ROW_NUMBER() OVER (
                         ORDER BY round(s * 1000000) DESC, doc_id) AS r
              FROM sc QUALIFY r <= 20
            ), vec AS (
              SELECT vec_id AS doc_id, ROW_NUMBER() OVER (
                         ORDER BY list_cosine_similarity(
                             embedding,
                             (SELECT embedding FROM embeddings
                              WHERE vec_id = 0)) DESC, vec_id) AS r
              FROM embeddings QUALIFY r <= 20
            ), contrib AS (
              SELECT doc_id,
                     CAST(floor(1000000000.0 / (60 + r) + 0.5) AS BIGINT)
                         AS c
              FROM lex
              UNION ALL
              SELECT doc_id,
                     CAST(floor(1000000000.0 / (60 + r) + 0.5) AS BIGINT)
                         AS c
              FROM vec
            ), fused AS (
              SELECT doc_id, SUM(c) AS rrf_q FROM contrib GROUP BY doc_id
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY rrf_q DESC, doc_id) AS BIGINT) AS rank,
                   doc_id, CAST(rrf_q AS BIGINT) AS rrf_q
            FROM fused
            ORDER BY rrf_q DESC, doc_id
            LIMIT 10
        """,
        # lower-quantile rule: smallest v with cum-count >= ceil(q*N/100)
        "length_quantiles": r"""
            WITH h AS (
              SELECT n_chars AS v, COUNT(*) AS c
              FROM documents GROUP BY n_chars
            ), cum AS (
              SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM h
            ), t AS (
              SELECT COUNT(*) AS n FROM documents
            ), qs AS (
              SELECT unnest([25, 50, 75, 90, 99]) AS q
            )
            SELECT CAST(qs.q AS BIGINT) AS q,
                   CAST((SELECT MIN(v) FROM cum, t
                         WHERE cc >= CEIL(qs.q * n / 100.0)) AS BIGINT)
                       AS value
            FROM qs
        """,
        # non-overlapping 10-word passages; the canonical occurrence of a
        # duplicated passage = ROW_NUMBER() 1 ordered by (doc_id, idx);
        # cleaned text = surviving passage words + tail, single-spaced
        "dedup_passages": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\s+')
                     END AS ws
              FROM documents
            ), t2 AS (
              SELECT doc_id, ws,
                     list_transform(range(0, len(ws) // 10), j ->
                         array_to_string(
                             list_slice(ws, j * 10 + 1, j * 10 + 10), ' ')
                     ) AS ps,
                     COALESCE(array_to_string(
                         list_slice(ws, (len(ws) // 10) * 10 + 1, len(ws)),
                         ' '), '') AS tail
              FROM t
            ), occ AS (
              SELECT doc_id, unnest(ps) AS passage,
                     generate_subscripts(ps, 1) - 1 AS j
              FROM t2
            ), marked AS (
              SELECT doc_id, passage, j,
                     ROW_NUMBER() OVER (PARTITION BY passage
                                        ORDER BY doc_id, j) AS rn
              FROM occ
            ), kept AS (
              SELECT doc_id, j, passage FROM marked WHERE rn = 1
            ), rebuilt AS (
              SELECT doc_id, COUNT(*) AS n_kept,
                     string_agg(passage, ' ' ORDER BY j) AS body
              FROM kept GROUP BY doc_id
            )
            SELECT t2.doc_id,
                   CAST(len(t2.ps) AS BIGINT) AS n_passages,
                   CAST(len(t2.ps) - COALESCE(r.n_kept, 0) AS BIGINT)
                       AS n_removed,
                   md5(CASE
                       WHEN COALESCE(r.body, '') = '' THEN t2.tail
                       WHEN t2.tail = '' THEN r.body
                       ELSE r.body || ' ' || t2.tail END) AS clean_fp
            FROM t2 LEFT JOIN rebuilt r USING (doc_id)
        """,
        # Gopher lexical rules in integer math (3n <= chars <= 10n etc.);
        # pass flags are 0/1 BIGINT so the value hash is strict
        "gopher_filter": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\s+')
                     END AS ws
              FROM documents
            ), w AS (
              SELECT doc_id, unnest(ws) AS w FROM t
            ), a AS (
              SELECT doc_id,
                     COUNT(*) AS n_words,
                     SUM(length(w)) AS n_chars,
                     SUM(CASE WHEN regexp_matches(w, '[A-Za-z]')
                              THEN 1 ELSE 0 END) AS n_alpha,
                     COUNT(DISTINCT CASE WHEN lower(w) IN
                         ('the','be','to','of','and','that','have','with')
                         THEN lower(w) END) AS n_stop
              FROM w GROUP BY doc_id
            ), c AS (
              SELECT t.doc_id,
                     COALESCE(a.n_words, 0) AS nw,
                     COALESCE(a.n_chars, 0) AS nc,
                     COALESCE(a.n_alpha, 0) AS na,
                     COALESCE(a.n_stop, 0) AS ns
              FROM t LEFT JOIN a USING (doc_id)
            )
            SELECT doc_id,
                   CAST(nw AS BIGINT) AS n_words,
                   CAST(nc AS BIGINT) AS n_word_chars,
                   CAST(na AS BIGINT) AS n_alpha_words,
                   CAST(ns AS BIGINT) AS n_stopwords,
                   CAST(CASE WHEN nw BETWEEN 50 AND 100000
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_len,
                   CAST(CASE WHEN 3 * nw <= nc AND nc <= 10 * nw
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_word_len,
                   CAST(CASE WHEN 5 * na >= 4 * nw
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_alpha,
                   CAST(CASE WHEN ns >= 2
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_stop,
                   CAST(CASE WHEN nw BETWEEN 50 AND 100000
                             AND 3 * nw <= nc AND nc <= 10 * nw
                             AND 5 * na >= 4 * nw AND ns >= 2
                        THEN 1 ELSE 0 END AS BIGINT) AS pass_gopher
            FROM c
        """,
        # same code-point classes as the engine; RE2 spells the unicode
        # ranges \x{....} where Python uses \uXXXX
        "script_stats": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                       AS BIGINT) AS n_latin,
                   CAST(len(regexp_extract_all(text, '[0-9]'))
                       AS BIGINT) AS n_digit,
                   CAST(len(regexp_extract_all(text,
                       '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]'))
                       AS BIGINT) AS n_cjk,
                   CAST(len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]'))
                       AS BIGINT) AS n_cyrillic,
                   CAST(len(regexp_extract_all(text, '[ \t\n\r]'))
                       AS BIGINT) AS n_space,
                   CAST(length(text) AS BIGINT) AS n_total,
                   CAST(length(text)
                        - len(regexp_extract_all(text, '[A-Za-z]'))
                        - len(regexp_extract_all(text, '[0-9]'))
                        - len(regexp_extract_all(text,
                          '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]'))
                        - len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]'))
                        - len(regexp_extract_all(text, '[ \t\n\r]'))
                       AS BIGINT) AS n_other
            FROM documents
        """,
        # w_s ∝ n_s^alpha (alpha=0.3), quantized with floor(x*1e6+0.5)
        # (identical in numpy and DuckDB; round() would diverge half-even
        # vs half-away)
        "source_mix_weights": r"""
            WITH c AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY source
            ), s AS (
              SELECT SUM(pow(n_docs, 0.3)) AS tot FROM c
            )
            SELECT c.source, c.n_docs,
                   CAST(floor(pow(c.n_docs, 0.3) / s.tot * 1000000 + 0.5)
                       AS BIGINT) AS weight_q
            FROM c, s
        """,
    }
    # The distributed label-propagation CC has the identical output
    # contract (doc_id, cluster_id = min doc_id in the component) as the
    # driver union-find variant, so it shares that oracle verbatim.
    out["jaccard_clusters_dist"] = out["jaccard_clusters"]
    # Bloom-positive docs are exactly verified and Bloom has no false
    # negatives, so the scale path's output is identical to the exact
    # anti-join and shares its oracle.
    out["incremental_dedup_bloom"] = out["incremental_dedup"]
    # LSH candidates are exactly verified (≈1e-4 miss at the banding
    # used) and the distributed CC emits the same min-label components,
    # so the all-scale-shape composition shares the exact variant's
    # oracle.
    out["near_dup_removal_scalable"] = out["near_dup_removal"]
    # keep-cutoff is pure integer math over the (already hash-strict)
    # quantized weights; the md5-prefix draw mirrors stratified_sample's
    out["source_mix_sample"] = r"""
        WITH c AS (
          SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), s AS (
          SELECT SUM(pow(n_docs, 0.3)) AS tot, SUM(n_docs) AS n_tot FROM c
        ), w AS (
          SELECT c.source, c.n_docs,
                 CAST(floor(pow(c.n_docs, 0.3) / s.tot * 1000000 + 0.5)
                     AS BIGINT) AS weight_q,
                 s.n_tot
          FROM c, s
        ), cut AS (
          SELECT source,
                 (CAST(weight_q AS HUGEINT) * (n_tot * 1 // 2)
                  * 4294967296) // (1000000 * n_docs) AS cutoff
          FROM w
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN cut USING (source)
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) < cutoff
    """
    # repetition plan: same integer rule with a 2x budget; whole repeats
    # = q div 16^8, fractional repeat drawn against q mod 16^8
    out["source_mix_epochs"] = r"""
        WITH c AS (
          SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), s AS (
          SELECT SUM(pow(n_docs, 0.3)) AS tot, SUM(n_docs) AS n_tot FROM c
        ), w AS (
          SELECT c.source, c.n_docs,
                 CAST(floor(pow(c.n_docs, 0.3) / s.tot * 1000000 + 0.5)
                     AS BIGINT) AS weight_q,
                 s.n_tot
          FROM c, s
        ), q AS (
          SELECT source,
                 (CAST(weight_q AS HUGEINT) * (n_tot * 2 // 1)
                  * 4294967296) // (1000000 * n_docs) AS qv
          FROM w
        ), plan AS (
          SELECT d.doc_id, d.source,
                 CAST(qv // 4294967296 +
                      CASE WHEN CAST(('0x' ||
                               substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) < qv % 4294967296
                           THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
          FROM documents d JOIN q USING (source)
        )
        SELECT doc_id, source, n_repeats FROM plan WHERE n_repeats > 0
    """
    # Q5-flavored supplier arm; distinct suppliers = rows of the
    # per-supplier rollup
    out["region_supplier_revenue"] = r"""
        WITH per_sup AS (
          SELECT l_suppkey,
                 SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                     AS revenue_u
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT r.r_name,
               CAST(SUM(p.revenue_u) AS BIGINT) AS revenue_u,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM per_sup p
        JOIN supplier s ON s.s_suppkey = p.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
    """
    # Q14-flavored promo share as two exact integer sums
    out["promo_revenue"] = r"""
        SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN rev ELSE 0 END) AS BIGINT)
                   AS promo_revenue_u,
               CAST(SUM(rev) AS BIGINT) AS total_revenue_u
        FROM (
          SELECT l_partkey,
                 CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS rev
          FROM lineitem
        ) l JOIN part p ON p.p_partkey = l.l_partkey
    """
    # Q4-shaped semijoin: EXISTS is monotone in l_shipdate, so the Ray
    # side ships per-orderkey MAX-shipdate partials (see
    # relational.order_priority_check)
    out["order_priority_check"] = r"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate >= o.o_orderdate
                                            + INTERVAL 30 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """
    # Q22-shaped anti-join: fixed recency cutoff + fixed 0.00 balance
    # floor keep the predicate float-hazard-free (see
    # relational.idle_customers)
    out["idle_customers"] = r"""
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_idle,
               CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))
                    AS BIGINT) AS acctbal_c
        FROM customer c
        WHERE c_acctbal > 0.0
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-05-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """
    # Q13-shaped outer-join distribution: per-customer order counts
    # histogrammed (zero-order customers included by the LEFT JOIN; see
    # relational.customer_order_dist)
    out["customer_order_dist"] = r"""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
          SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey)
        GROUP BY c_count ORDER BY c_count
    """
    # Q17-shaped join-against-group-aggregate: qty*5*cnt < sum_qty is
    # the exact-integer form of qty < 0.2*avg(qty) — no float average
    # on either side (see relational.small_qty_revenue)
    out["small_qty_revenue"] = r"""
        SELECT p_brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_small
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (SELECT l_partkey,
                     CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT))
                          AS BIGINT) AS sum_qty,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY l_partkey) a
          ON a.l_partkey = l.l_partkey
        WHERE CAST(ROUND(l.l_quantity, 0) AS BIGINT) * 5 * a.cnt
              < a.sum_qty
        GROUP BY p_brand ORDER BY p_brand
    """
    # Q7-shaped two-dimension trade matrix: supplier nation resolves via
    # a true-dimension broadcast, customer nation via a custkey-bucket
    # co-partition (see relational.nation_trade_volume)
    out["nation_trade_volume"] = r"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT) AS revenue_u
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # Q10-shaped returned-item top-k: per-bucket local top-k, the k
    # winners' names resolve driver-side (see relational.returned_revenue)
    out["returned_revenue"] = r"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT) AS revenue_u
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3 ORDER BY revenue_u DESC, c_custkey LIMIT 20
    """
    # Q12-shaped conditional-count join: delay buckets compare raw
    # timestamps against interval edges — no day division on either side
    # (see relational.late_shipment_priority)
    out["late_shipment_priority"] = r"""
        SELECT CASE WHEN l.l_shipdate < o.o_orderdate THEN '0-early'
                    WHEN l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
                         THEN '1-within-30d'
                    WHEN l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
                         THEN '2-within-90d'
                    ELSE '3-over-90d' END AS delay_bucket,
               CAST(SUM(CASE WHEN o.o_orderpriority
                                  IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(SUM(CASE WHEN o.o_orderpriority
                                  IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS n_low
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1 ORDER BY 1
    """
    # Q18-shaped having-semijoin top-k over integer quantity sums
    # (see relational.big_orders)
    out["big_orders"] = r"""
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
                   AS o_totalprice_c,
               CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS sum_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
        HAVING SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) > 300
        ORDER BY sum_qty DESC, o_orderkey LIMIT 100
    """
    # Q19-shaped disjunctive bracket join: the (brand, size) arms select
    # a tiny part subset that broadcasts; quantity brackets evaluate
    # vectorized per batch (see relational.bracket_revenue)
    out["bracket_revenue"] = r"""
        SELECT CAST(COALESCE(
                   SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100, 0)
                                     AS BIGINT))), 0) AS BIGINT)
                   AS revenue_u,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND CAST(ROUND(l.l_quantity, 0) AS BIGINT)
                   BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
               AND CAST(ROUND(l.l_quantity, 0) AS BIGINT)
                   BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
               AND CAST(ROUND(l.l_quantity, 0) AS BIGINT)
                   BETWEEN 20 AND 40)
    """
    # leave-one-out kNN label accuracy — engine and oracle rank by the
    # SAME exact integer squared distances (components quantized
    # floor(x·2^20 + 0.5); every intermediate < 2^53 so BLAS matmul and
    # DuckDB's sequential list_sum agree bit-for-bit); plurality vote
    # tie-breaks (count desc, label asc) on both sides
    out["knn_label_accuracy"] = r"""
        WITH q AS (
          SELECT vec_id, label,
                 list_transform(embedding,
                     x -> FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5)) AS e
          FROM embeddings
        ), nb AS (
          SELECT a.vec_id AS eval_id, a.label AS true_label,
                 b.label AS nb_label,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                     list_sum(list_transform(list_zip(a.e, b.e),
                              p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                     b.vec_id ASC) AS rk
          FROM q a JOIN q b ON b.vec_id <> a.vec_id
          WHERE a.vec_id % 5 = 0
        ), votes AS (
          SELECT eval_id, true_label, nb_label, COUNT(*) AS c
          FROM nb WHERE rk <= 10 GROUP BY 1, 2, 3
        ), pred AS (
          SELECT eval_id, true_label,
                 (array_agg(nb_label ORDER BY c DESC, nb_label))[1] AS p
          FROM votes GROUP BY 1, 2
        )
        SELECT CAST(true_label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(CASE WHEN p = true_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM pred GROUP BY 1 ORDER BY 1
    """
    # range-search density probe; threshold = floor(1.2·2^20 + 0.5)²
    # = 1258291² = 1583296240681, integer vs integer on both sides
    out["radius_neighbor_counts"] = r"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding,
                     x -> FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5)) AS e
          FROM embeddings
        )
        SELECT a.vec_id,
               CAST(COUNT(b.vec_id) AS BIGINT) AS n_within
        FROM q a LEFT JOIN q b
          ON b.vec_id <> a.vec_id
         AND list_sum(list_transform(list_zip(a.e, b.e),
                      p -> (p[1] - p[2]) * (p[1] - p[2])))
             <= 1583296240681
        WHERE a.vec_id % 5 = 0
        GROUP BY 1 ORDER BY 1
    """
    # cross-source shared-passage matrix (disjoint 10-word tiles, same
    # tiling as dup_passage_stats); see dedup.source_leakage_matrix
    out["source_leakage_matrix"] = r"""
        WITH toks AS (
            SELECT source, string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), p AS (
            SELECT source,
                   md5(array_to_string(
                       ts[(j * 10 + 1):(j * 10 + 10)], ' ')) AS h
            FROM toks,
                 unnest(generate_series(0, len(ts) // 10 - 1)) AS g(j)
        ), sh AS (
            SELECT DISTINCT source, h FROM p
        )
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b
          ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # add-one-smoothed bigram-LM average NLL; the LN argument is
    # (c+1.0)/(ctot+V) with exact-int operands on both sides and the
    # floor(x*1e6+0.5) quantization contract; see
    # text_analysis.bigram_lm_nll
    out["bigram_lm_nll"] = r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), uni AS (
            SELECT COUNT(DISTINCT w) AS v FROM toks, unnest(ts) AS u(w)
        ), pairs AS (
            SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
            FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        ), c2 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM pairs GROUP BY w1, w2
        ), c1 AS (
            SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot FROM c2 GROUP BY w1
        )
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(FLOOR(SUM(-LN((c2.c + 1.0) / (c1.ctot + uni.v)))
                          / COUNT(*) * 1e6 + 0.5) AS BIGINT) AS nll_q
        FROM pairs p
        JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        CROSS JOIN uni
        GROUP BY p.doc_id
        ORDER BY p.doc_id
    """
    # fixed-integer-edge RFM buckets over per-customer rollups; cents
    # via ROUND(x*100) (the events_hourly precedent); see
    # relational.rfm_segments
    out["rfm_segments"] = r"""
        WITH c AS (
            SELECT o_custkey,
                   MAX(CAST(epoch_us(o_orderdate) AS BIGINT)
                       // 86400000000) AS last_day,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ), mx AS (
            SELECT MAX(last_day) AS md FROM c
        )
        SELECT CAST(LEAST((mx.md - c.last_day) // 30, 4) AS BIGINT)
                   AS r_bucket,
               CAST(LEAST(c.n, 5) AS BIGINT) AS f_bucket,
               CAST(LEAST(c.cents // 10000000, 4) AS BIGINT) AS m_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM c, mx
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """
    # gopher pass_gopher × NB logodds>0 confusion; both sides'
    # oracles reproduced verbatim; see
    # text_analysis.quality_filter_agreement
    out["quality_filter_agreement"] = r"""
        WITH toks AS (
            SELECT doc_id, source,
                   string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), tok AS (
            SELECT doc_id, source, w FROM toks, unnest(ts) AS u(w)
        ), cls AS (
            SELECT w AS word,
                   CAST(SUM(CASE WHEN source = 'src0'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
                   CAST(SUM(CASE WHEN source <> 'src0'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
            FROM tok GROUP BY w
        ), tot AS (
            SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
                   CAST(SUM(c_neg) AS BIGINT) AS n_neg,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM cls
        ), prior AS (
            SELECT LN(CAST(SUM(CASE WHEN source = 'src0'
                              THEN 1 ELSE 0 END) AS DOUBLE)
                      / SUM(CASE WHEN source <> 'src0'
                            THEN 1 ELSE 0 END)) AS lp
            FROM toks
        ), nbq AS (
            SELECT t.doc_id,
                   CAST(FLOOR((SUM(LN(((c.c_pos + 1.0)
                                       * (tot.n_neg + tot.v))
                                      / ((c.c_neg + 1.0)
                                         * (tot.n_pos + tot.v))))
                               + ANY_VALUE(prior.lp)) * 1e6 + 0.5)
                        AS BIGINT) AS logodds_q
            FROM tok t
            JOIN cls c ON t.w = c.word
            CROSS JOIN tot CROSS JOIN prior
            GROUP BY t.doc_id
        ), gt AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = ''
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(trim(text), '\s+')
                   END AS ws
            FROM documents
        ), gw AS (
            SELECT doc_id, unnest(ws) AS w FROM gt
        ), ga AS (
            SELECT doc_id,
                   COUNT(*) AS n_words,
                   SUM(length(w)) AS n_chars,
                   SUM(CASE WHEN regexp_matches(w, '[A-Za-z]')
                            THEN 1 ELSE 0 END) AS n_alpha,
                   COUNT(DISTINCT CASE WHEN lower(w) IN
                       ('the','be','to','of','and','that','have','with')
                       THEN lower(w) END) AS n_stop
            FROM gw GROUP BY doc_id
        ), flags AS (
            SELECT gt.doc_id,
                   CASE WHEN COALESCE(ga.n_words, 0) BETWEEN 50
                             AND 100000
                         AND 3 * COALESCE(ga.n_words, 0)
                             <= COALESCE(ga.n_chars, 0)
                         AND COALESCE(ga.n_chars, 0)
                             <= 10 * COALESCE(ga.n_words, 0)
                         AND 5 * COALESCE(ga.n_alpha, 0)
                             >= 4 * COALESCE(ga.n_words, 0)
                         AND COALESCE(ga.n_stop, 0) >= 2
                        THEN 1 ELSE 0 END AS g,
                   CASE WHEN COALESCE(nbq.logodds_q, 0) > 0
                        THEN 1 ELSE 0 END AS nb
            FROM gt LEFT JOIN ga USING (doc_id)
            LEFT JOIN nbq USING (doc_id)
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(g) AS BIGINT) AS n_gopher,
               CAST(SUM(nb) AS BIGINT) AS n_nb,
               CAST(SUM(g * nb) AS BIGINT) AS n_both,
               CAST(SUM(g * nb) * 1000000
                    // greatest(SUM(g) + SUM(nb) - SUM(g * nb), 1)
                    AS BIGINT) AS jaccard_q
        FROM flags
    """
    # own-language function-word coverage (the lang_id marker lists,
    # reproduced verbatim); zh counts CJK chars, no Latin markers; see
    # text_analysis.stopword_coverage
    out["stopword_coverage"] = r"""
        WITH base AS (
            SELECT doc_id, lang,
                   CASE WHEN lang = 'zh'
                        THEN length(regexp_replace(text, '[^一-鿿]', '',
                                                   'g'))
                        ELSE len(regexp_extract_all(lower(text),
                                                    '[a-zà-ÿ]+'))
                   END AS n_words,
                   CASE
                     WHEN lang = 'zh' THEN 0
                     WHEN lang = 'en' THEN len(list_filter(
                       regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                       w -> w IN ('the','and','of','to','is','in','that',
                                  'it','for','with')))
                     WHEN lang = 'fr' THEN len(list_filter(
                       regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                       w -> w IN ('le','la','les','de','et','est','une',
                                  'que','des','dans')))
                     WHEN lang = 'es' THEN len(list_filter(
                       regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                       w -> w IN ('el','la','los','de','y','es','una',
                                  'que','las','en')))
                     WHEN lang = 'de' THEN len(list_filter(
                       regexp_extract_all(lower(text), '[a-zà-ÿ]+'),
                       w -> w IN ('der','die','das','und','ist','ein',
                                  'nicht','mit','den','von')))
                     ELSE 0
                   END AS n_stop
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_stop AS BIGINT) AS n_stop,
               CAST(n_stop * 1000000 // greatest(n_words, 1) AS BIGINT)
                   AS cover_q
        FROM base ORDER BY doc_id
    """
    # per-doc unigram entropy; int-ratio LN args, floor(x*1e6+0.5); see
    # text_analysis.doc_entropy
    out["doc_entropy"] = r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), w AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks, unnest(ts) AS u(w) GROUP BY 1, 2
        ), t AS (
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM w GROUP BY 1
        )
        SELECT w.doc_id,
               ANY_VALUE(t.t) AS n_tokens,
               CAST(FLOOR(-SUM((w.c / CAST(t.t AS DOUBLE))
                               * LN(w.c / CAST(t.t AS DOUBLE)))
                          * 1e6 + 0.5) AS BIGINT) AS entropy_q
        FROM w JOIN t USING (doc_id)
        GROUP BY w.doc_id
        ORDER BY w.doc_id
    """
    # second-order Markov path counts in (ts, event_id) order; see
    # relational.event_trigrams
    out["event_trigrams"] = r"""
        WITH o AS (
            SELECT user_id, event_type,
                   lag(event_type, 1) OVER w AS t2p,
                   lag(event_type, 2) OVER w AS t1p
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), tri AS (
            SELECT t1p AS t1, t2p AS t2, event_type AS t3,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM o WHERE t1p IS NOT NULL
            GROUP BY 1, 2, 3
        )
        SELECT t1, t2, t3, n FROM tri
        ORDER BY n DESC, t1, t2, t3 LIMIT 25
    """
    # OLS of LN(freq) on LN(rank) over the top-100 words; identical
    # expression order both sides; see text_analysis.zipf_exponent
    out["zipf_exponent"] = r"""
        WITH cnts AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
                      AS word
                  FROM documents WHERE trim(text) <> '')
            GROUP BY word
        ), top AS (
            SELECT cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rk
            FROM cnts ORDER BY cnt DESC, word LIMIT 100
        ), s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(LN(rk)) AS sx, SUM(LN(cnt)) AS sy,
                   SUM(LN(rk) * LN(cnt)) AS sxy,
                   SUM(LN(rk) * LN(rk)) AS sxx
            FROM top
        )
        SELECT n AS n_terms,
               CAST(FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx)
                          * 1e6 + 0.5) AS BIGINT) AS slope_q,
               CAST(FLOOR((sy - ((n * sxy - sx * sy)
                                 / (n * sxx - sx * sx)) * sx) / n
                          * 1e6 + 0.5) AS BIGINT) AS intercept_q
        FROM s
    """
    # near_dup_removal's recursive-CTE components + per-source doc and
    # token retention; see dedup.dedup_retention_by_source
    out["dedup_retention_by_source"] = r"""
        WITH RECURSIVE words AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM documents WHERE trim(text) <> ''
        ), sh AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
          FROM words,
               LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1)))
               AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        ), und AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
          UNION SELECT id_a, id_a FROM pairs
          UNION SELECT id_b, id_b FROM pairs
        ), reach(src, dst) AS (
          SELECT a, b FROM und
          UNION
          SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        ), drops AS (
          SELECT src AS doc_id FROM reach
          GROUP BY src HAVING MIN(dst) <> src
        ), kept AS (
          SELECT d.source,
                 CASE WHEN trim(d.text) = '' THEN 0
                      ELSE len(string_split_regex(trim(d.text), '\s+'))
                 END AS toks,
                 CASE WHEN d.doc_id IN (SELECT doc_id FROM drops)
                      THEN 0 ELSE 1 END AS k
          FROM documents d
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(k) AS BIGINT) AS n_kept,
               CAST(SUM(toks) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN k = 1 THEN toks ELSE 0 END)
                    AS BIGINT) AS n_tokens_kept,
               CAST(SUM(k) * 1000000 // COUNT(*) AS BIGINT)
                   AS kept_share_q
        FROM kept GROUP BY source ORDER BY source
    """
    # positives = the jaccard_pairs CTEs; negative(a) = md5-argmin
    # non-partner (ties by doc id); pure strings/ints, no float
    # contract; see dedup.contrastive_pairs
    out["contrastive_pairs"] = r"""
        WITH words AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM documents WHERE trim(text) <> ''
        ), sh AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
          FROM words,
               LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1)))
               AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), tpairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        ), anchors AS (
          SELECT DISTINCT id_a AS a FROM tpairs
        ), banned AS (
          SELECT id_a AS a, id_b AS d FROM tpairs
          UNION SELECT id_b, id_a FROM tpairs
          UNION SELECT a, a FROM anchors
        ), cand AS (
          SELECT an.a, dd.doc_id AS d,
                 md5(CAST(an.a AS VARCHAR) || ':'
                     || CAST(dd.doc_id AS VARCHAR)) AS h
          FROM anchors an CROSS JOIN documents dd
          WHERE NOT EXISTS (SELECT 1 FROM banned b
                            WHERE b.a = an.a AND b.d = dd.doc_id)
        ), neg AS (
          SELECT a, (array_agg(d ORDER BY h, d))[1] AS negative
          FROM cand GROUP BY a
        )
        SELECT p.id_a AS anchor, p.id_b AS positive,
               CAST(COALESCE(n.negative, -1) AS BIGINT) AS negative
        FROM tpairs p LEFT JOIN neg n ON n.a = p.id_a
        ORDER BY anchor, positive
    """
    # Pearson r from exact-int sufficient statistics; one sqrt + one
    # division in doubles on both sides; see
    # text_analysis.metric_correlation
    out["metric_correlation"] = r"""
        WITH v AS (
            SELECT n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+'))
                   END AS y
            FROM documents
        ), s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(n_chars) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(n_chars * y) AS BIGINT) AS sxy,
                   CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM v
        )
        SELECT n,
               CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                 * CAST(n * syy - sy * sy AS DOUBLE))
                          * 1e6 + 0.5) AS BIGINT) AS r_q
        FROM s
    """
    # distinct words whose FIRST doc_id falls inside each prefix;
    # see text_analysis.vocab_growth_curve
    out["vocab_growth_curve"] = r"""
        WITH toks AS (
            SELECT doc_id, w
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), '\s+') AS ts
                  FROM documents WHERE trim(text) <> ''),
                 unnest(ts) AS u(w)
        ), first AS (
            SELECT w, MIN(doc_id) AS d FROM toks GROUP BY w
        ), nd AS (
            SELECT MAX(doc_id) + 1 AS n FROM documents
        ), grid AS (
            SELECT g FROM nd,
                 unnest(generate_series(50, CAST(nd.n AS BIGINT), 50))
                 AS t(g)
            UNION
            SELECT n FROM nd
        )
        SELECT CAST(g AS BIGINT) AS n_docs_prefix,
               CAST((SELECT COUNT(*) FROM first WHERE d <= g - 1)
                    AS BIGINT) AS n_distinct_words
        FROM grid ORDER BY n_docs_prefix
    """
    # key = LN((md5_int32(id)+1)/2^32)/w, top-k by (key DESC, id);
    # see text_analysis.weighted_sample
    out["weighted_sample"] = r"""
        WITH k AS (
            SELECT doc_id, n_chars AS w,
                   LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) + 1)
                      / 4294967296.0) / n_chars AS key
            FROM documents WHERE n_chars > 0
        ), top AS (
            SELECT doc_id, w, key FROM k
            ORDER BY key DESC, doc_id LIMIT 100
        )
        SELECT doc_id, CAST(w AS BIGINT) AS w,
               CAST(FLOOR(key * 1e6 + 0.5) AS BIGINT) AS key_q
        FROM top ORDER BY doc_id
    """
    # centroid distances on the cross-multiplied integer lattice:
    # numerator sums are exact (HUGEINT), ONE final double division;
    # see similarity.source_centroid_distances
    out["source_centroid_distances"] = r"""
        WITH m AS (
            SELECT d.source, u.i,
                   CAST(FLOOR(CAST(e.embedding[u.i] AS DOUBLE) * 1048576
                              + 0.5) AS BIGINT) AS q
            FROM embeddings e
            JOIN documents d ON d.doc_id = e.vec_id,
                 unnest(generate_series(1, len(e.embedding))) AS u(i)
        ), s AS (
            SELECT source, i, CAST(SUM(q) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM m GROUP BY 1, 2
        )
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(FLOOR(CAST(SUM((a.s * b.n - b.s * a.n)
                                   * (a.s * b.n - b.s * a.n)) AS DOUBLE)
                          / CAST((ANY_VALUE(a.n) * ANY_VALUE(b.n))
                                 * (ANY_VALUE(a.n) * ANY_VALUE(b.n))
                                 * CAST(1099511627776 AS BIGINT)
                                 AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT) AS dist2_q
        FROM s a JOIN s b ON a.i = b.i AND a.source < b.source
        GROUP BY a.source, b.source
        ORDER BY src_a, src_b
    """
    # same funnel CTEs as funnel_stages; quantile = lower rule with
    # need = (q·n+99)//100 on both sides, deltas in integer seconds;
    # see relational.funnel_time_quantiles
    out["funnel_time_quantiles"] = r"""
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(epoch_us(ts) AS BIGINT) AS t
          FROM events
        ), s1 AS (
          SELECT user_id, MIN(t) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(t) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND t >= t1 GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(t) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND t >= t2 GROUP BY e.user_id
        ), d AS (
          SELECT 'view_to_click' AS transition,
                 (t2 - t1) // 1000000 AS delta_s
          FROM s2 JOIN s1 USING (user_id)
          UNION ALL
          SELECT 'click_to_purchase', (t3 - t2) // 1000000
          FROM s3 JOIN s2 USING (user_id)
        ), agg AS (
          SELECT transition,
                 array_agg(delta_s ORDER BY delta_s) AS arr,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY transition
        ), qs AS (
          SELECT unnest([25, 50, 75, 90]) AS q
        )
        SELECT agg.transition, CAST(qs.q AS BIGINT) AS q,
               CAST(agg.arr[CAST((qs.q * agg.n + 99) // 100 AS INT)]
                    AS BIGINT) AS delta_s
        FROM agg, qs
        ORDER BY transition, q
    """
    # per-vector exact-int64 squared norm on the 2^20 grid; see
    # similarity.emb_norm_stats
    out["emb_norm_stats"] = r"""
        SELECT vec_id,
               CAST(list_sum(list_transform(embedding,
                   x -> FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5)
                        * FLOOR(CAST(x AS DOUBLE) * 1048576 + 0.5)))
                    AS BIGINT) AS norm2_q
        FROM embeddings
        ORDER BY vec_id
    """
    # per-source language entropy in nats; ln-parity (int-ratio LN
    # args, lang-ordered sum); see text_analysis.source_lang_entropy
    out["source_lang_entropy"] = r"""
        WITH c AS (
            SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ), t AS (
            SELECT source, CAST(SUM(n) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS nl
            FROM c GROUP BY 1
        )
        SELECT c.source,
               ANY_VALUE(t.t) AS n_docs,
               ANY_VALUE(t.nl) AS n_langs,
               CAST(FLOOR(-SUM((c.n / CAST(t.t AS DOUBLE))
                               * LN(c.n / CAST(t.t AS DOUBLE)))
                          * 1e6 + 0.5) AS BIGINT) AS entropy_q
        FROM c JOIN t USING (source)
        GROUP BY c.source
        ORDER BY c.source
    """
    # per-source exact-dup share (md5 occurring >= 2 corpus-wide),
    # integer floor division; see text_analysis.dup_share_by_source
    out["dup_share_by_source"] = r"""
        WITH c AS (
            SELECT md5(text) AS h, source,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ), tot AS (
            SELECT h, SUM(n) AS t FROM c GROUP BY h
        )
        SELECT c.source,
               CAST(SUM(c.n) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN tot.t >= 2 THEN c.n ELSE 0 END)
                    AS BIGINT) AS n_dup_docs,
               CAST(SUM(CASE WHEN tot.t >= 2 THEN c.n ELSE 0 END)
                    * 1000000 // SUM(c.n) AS BIGINT) AS dup_share_q
        FROM c JOIN tot USING (h)
        GROUP BY c.source
        ORDER BY c.source
    """
    # Gini of events-per-user: integer numerator over (count, user)
    # order, one quantized division; see relational.event_user_gini
    out["event_user_gini"] = r"""
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ), r AS (
            SELECT n,
                   ROW_NUMBER() OVER (ORDER BY n, user_id) AS i,
                   COUNT(*) OVER () AS nu
            FROM c
        )
        SELECT CAST(ANY_VALUE(nu) AS BIGINT) AS n_users,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(FLOOR(SUM((2 * i - nu - 1) * n)
                          / CAST(ANY_VALUE(nu) * SUM(n) AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT) AS gini_q
        FROM r
    """
    # sessions(g) = distinct users + inter-event deltas > g, exact
    # integer microseconds; see relational.session_gap_sweep
    out["session_gap_sweep"] = r"""
        WITH gaps AS (
            SELECT unnest([5, 10, 30, 60, 120]) AS gap_minutes
        ), d AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS delta
            FROM events
        ), u AS (
            SELECT COUNT(DISTINCT user_id) AS nu FROM events
        )
        SELECT CAST(gaps.gap_minutes AS BIGINT) AS gap_minutes,
               CAST(u.nu + (SELECT COUNT(*) FROM d
                            WHERE d.delta > gaps.gap_minutes
                                  * CAST(60000000 AS BIGINT))
                    AS BIGINT) AS n_sessions
        FROM gaps, u
        ORDER BY gap_minutes
    """
    # cumulative pair counts on the 10% threshold grid over the same
    # shingle/inter CTEs as jaccard_pairs; the grid divisions (g/10.0,
    # t/100.0) are identical correctly-rounded doubles on both sides;
    # see dedup.jaccard_threshold_sweep
    out["jaccard_threshold_sweep"] = r"""
        WITH words AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM documents WHERE trim(text) <> ''
        ), sh AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
          FROM words,
               LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1)))
               AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), pj AS (
          SELECT CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS j
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.1
        )
        SELECT CAST(t.g * 10 AS BIGINT) AS threshold_pct,
               CAST((SELECT COUNT(*) FROM pj
                     WHERE pj.j >= t.g / 10.0) AS BIGINT) AS n_pairs
        FROM unnest(generate_series(1, 9)) AS t(g)
        ORDER BY threshold_pct
    """
    # confusion counts between the emb_near_dup and jaccard_pairs
    # semantics (both reproduced verbatim); ratios in exact integer
    # floor division; see dedup.emb_text_dup_agreement
    out["emb_text_dup_agreement"] = r"""
        WITH words AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM documents WHERE trim(text) <> ''
        ), sh AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
          FROM words,
               LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1)))
               AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), tpairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        ), epairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a
          JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        ), counts AS (
          SELECT (SELECT COUNT(*) FROM epairs) AS n_emb_pairs,
                 (SELECT COUNT(*) FROM tpairs) AS n_text_pairs,
                 (SELECT COUNT(*) FROM epairs e
                  JOIN tpairs t USING (id_a, id_b)) AS n_both
        )
        SELECT CAST(n_emb_pairs AS BIGINT) AS n_emb_pairs,
               CAST(n_text_pairs AS BIGINT) AS n_text_pairs,
               CAST(n_both AS BIGINT) AS n_both,
               CAST(n_both * 1000000 // greatest(n_emb_pairs, 1)
                    AS BIGINT) AS precision_q,
               CAST(n_both * 1000000 // greatest(n_text_pairs, 1)
                    AS BIGINT) AS recall_q
        FROM counts
    """
    # division-free integer z-test over zero-filled per-type hourly
    # counts; flag ⟺ (H·n−T)² > 9·(H·S−T²); see
    # relational.event_volume_anomaly
    out["event_volume_anomaly"] = r"""
        WITH c AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_epoch,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), rng AS (
            SELECT MIN(hour_epoch) AS lo, MAX(hour_epoch) AS hi FROM c
        ), grid AS (
            SELECT t.event_type, g.h AS hour_epoch
            FROM (SELECT DISTINCT event_type FROM c) t, rng,
                 unnest(generate_series(rng.lo, rng.hi)) AS g(h)
        ), filled AS (
            SELECT grid.event_type, grid.hour_epoch,
                   COALESCE(c.n, 0) AS n
            FROM grid LEFT JOIN c USING (event_type, hour_epoch)
        ), stats AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS hh,
                   CAST(SUM(n) AS BIGINT) AS t,
                   CAST(SUM(n * n) AS BIGINT) AS s
            FROM filled GROUP BY 1
        )
        SELECT f.event_type, f.hour_epoch, CAST(f.n AS BIGINT) AS n,
               CAST(CASE WHEN st.hh * f.n - st.t < 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS is_low
        FROM filled f JOIN stats st USING (event_type)
        WHERE (st.hh * f.n - st.t) * (st.hh * f.n - st.t)
              > 9 * (st.hh * st.s - st.t * st.t)
        ORDER BY f.event_type, f.hour_epoch
    """
    # exact-int64 Gram matrix on the 2^20 quantized grid — every
    # product and sum is integer-valued, so no float contract is even
    # needed; see similarity.embedding_gram
    out["embedding_gram"] = r"""
        WITH comp AS (
            SELECT vec_id, i,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576
                              + 0.5) AS BIGINT) AS q
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        )
        SELECT a.i - 1 AS i, b.i - 1 AS j,
               CAST(SUM(a.q * b.q) AS BIGINT) AS g
        FROM comp a JOIN comp b
          ON a.vec_id = b.vec_id AND b.i >= a.i
        GROUP BY a.i, b.i
        ORDER BY i, j
    """
    # add-one multinomial Naive-Bayes log-odds vs the src0 reference
    # class; every LN argument is a ratio of exact-int products formed
    # identically on both sides, the doc-prior adds after the sum, and
    # the quantization is floor(x*1e6+0.5); see
    # text_analysis.nb_quality_scores
    out["nb_quality_scores"] = r"""
        WITH toks AS (
            SELECT doc_id, source,
                   string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), tok AS (
            SELECT doc_id, source, w FROM toks, unnest(ts) AS u(w)
        ), cls AS (
            SELECT w AS word,
                   CAST(SUM(CASE WHEN source = 'src0'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
                   CAST(SUM(CASE WHEN source <> 'src0'
                            THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
            FROM tok GROUP BY w
        ), tot AS (
            SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
                   CAST(SUM(c_neg) AS BIGINT) AS n_neg,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM cls
        ), prior AS (
            SELECT LN(CAST(SUM(CASE WHEN source = 'src0'
                              THEN 1 ELSE 0 END) AS DOUBLE)
                      / SUM(CASE WHEN source <> 'src0'
                            THEN 1 ELSE 0 END)) AS lp
            FROM toks
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(FLOOR((SUM(LN(((c.c_pos + 1.0) * (tot.n_neg + tot.v))
                                  / ((c.c_neg + 1.0)
                                     * (tot.n_pos + tot.v))))
                           + ANY_VALUE(prior.lp)) * 1e6 + 0.5)
                    AS BIGINT) AS logodds_q
        FROM tok t
        JOIN cls c ON t.w = c.word
        CROSS JOIN tot CROSS JOIN prior
        GROUP BY t.doc_id
        ORDER BY t.doc_id
    """
    # substring-duplication coverage: overlapping 8-gram hits, per-doc
    # interval union via the gaps-and-islands window scan; see
    # dedup.substring_dup_spans
    out["substring_dup_spans"] = r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), grams AS (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(ts[i:i + 7], ' ')) AS h
            FROM toks, unnest(generate_series(1, len(ts) - 7)) AS g(i)
        ), dup AS (
            SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= 2
        ), occ AS (
            SELECT doc_id, pos, pos + 7 AS e
            FROM grams WHERE h IN (SELECT h FROM dup)
        ), m AS (
            SELECT doc_id, pos, e,
                   MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
            FROM occ
        ), cov AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN pm IS NULL OR pos > pm THEN 8
                                 WHEN e > pm THEN e - pm
                                 ELSE 0 END) AS BIGINT) AS n_dup_tokens,
                   CAST(SUM(CASE WHEN pm IS NULL OR pos > pm
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
            FROM m GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(CASE WHEN trim(d.text) = '' THEN 0
                         ELSE len(string_split_regex(trim(d.text), '\s+'))
                    END AS BIGINT) AS n_tokens,
               COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
               COALESCE(c.n_spans, 0) AS n_spans
        FROM documents d LEFT JOIN cov c ON c.doc_id = d.doc_id
        ORDER BY d.doc_id
    """
    # exact-int64 TextRank over the symmetrized adjacent-word graph —
    # 3 unrolled power iterations at scale 2^20, damping 17/20, floor
    # division on both sides (all operands positive, so DuckDB // ==
    # Python //); see text_analysis.textrank_keywords
    out["textrank_keywords"] = r"""
        WITH toks AS (
            SELECT string_split_regex(trim(text), '\s+') AS ts
            FROM documents WHERE trim(text) <> ''
        ), adj AS (
            SELECT ts[i] AS a, ts[i + 1] AS b
            FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
            WHERE ts[i] <> ts[i + 1]
        ), edges AS (
            SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
            FROM (SELECT a AS src, b AS dst FROM adj
                  UNION ALL SELECT b AS src, a AS dst FROM adj)
            GROUP BY src, dst
        ), outw AS (
            SELECT src, CAST(SUM(w) AS BIGINT) AS wtot
            FROM edges GROUP BY src
        ), r1 AS (
            SELECT e.dst AS node,
                   CAST(157286 + (17 * SUM((1048576 * e.w) // o.wtot))
                        // 20 AS BIGINT) AS r
            FROM edges e JOIN outw o ON o.src = e.src
            GROUP BY e.dst
        ), r2 AS (
            SELECT e.dst AS node,
                   CAST(157286 + (17 * SUM((p.r * e.w) // o.wtot))
                        // 20 AS BIGINT) AS r
            FROM edges e JOIN outw o ON o.src = e.src
                         JOIN r1 p ON p.node = e.src
            GROUP BY e.dst
        ), r3 AS (
            SELECT e.dst AS node,
                   CAST(157286 + (17 * SUM((p.r * e.w) // o.wtot))
                        // 20 AS BIGINT) AS r
            FROM edges e JOIN outw o ON o.src = e.src
                         JOIN r2 p ON p.node = e.src
            GROUP BY e.dst
        )
        SELECT node AS word, r AS rank_q
        FROM r3 ORDER BY rank_q DESC, word LIMIT 20
    """
    # Q6-shaped global filter-aggregate (see relational.forecast_revenue)
    out["forecast_revenue"] = r"""
        SELECT CAST(COALESCE(
                   SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                       * CAST(ROUND(l_discount * 100, 0) AS BIGINT)),
                   0) AS BIGINT) AS revenue_u,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) = 1999
          AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
          AND CAST(ROUND(l_quantity, 0) AS BIGINT) < 24
    """
    # Q8-shaped market share; share quantizes floor(x*1e6 + 0.5), the
    # repo-wide oracle rounding convention (see relational.market_share)
    out["market_share"] = r"""
        WITH vol AS (
          SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                     AS o_year,
                 CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))
                     AS volume_u,
                 sn.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
                     AND p.p_type = 'ECONOMY'
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation sn ON sn.n_nationkey = s.s_nationkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation cn ON cn.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = cn.n_regionkey
                       AND r.r_name = 'ASIA'
        )
        SELECT o_year,
               CAST(SUM(volume_u) AS BIGINT) AS total_u,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                             THEN volume_u ELSE 0 END) AS BIGINT)
                   AS nation_u,
               CAST(FLOOR(SUM(CASE WHEN supp_nation = 'NATION_3'
                                   THEN volume_u ELSE 0 END) * 1.0
                          / SUM(volume_u) * 1000000 + 0.5) AS BIGINT)
                   AS mkt_share_micros
        FROM vol GROUP BY 1 ORDER BY 1
    """
    # Q9-shaped profit matrix — no partsupp/supplycost in this corpus,
    # profit = discounted revenue (see relational.product_profit)
    out["product_profit"] = r"""
        SELECT sn.n_name AS supp_nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT) AS profit_u
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
                   AND p.p_type = 'STANDARD'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # Q15-shaped argmax with ties (see relational.top_supplier)
    out["top_supplier"] = r"""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                          * (100 - CAST(ROUND(l_discount * 100, 0)
                                        AS BIGINT))) AS BIGINT)
                     AS total_revenue_u
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1999-07-01'
            AND l_shipdate < TIMESTAMP '1999-10-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue_u
        FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_revenue_u = (SELECT MAX(total_revenue_u) FROM rev)
        ORDER BY s.s_suppkey
    """
    # Q21-shaped sole-late-shipper count — late = shipped > 90 days
    # after the order date, this corpus has no commit/receipt dates
    # (see relational.waiting_suppliers)
    out["waiting_suppliers"] = r"""
        WITH ls AS (
          SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
                 MAX(l.l_shipdate) AS max_ship
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
                       AND o.o_orderstatus = 'F'
          GROUP BY 1, 2
        ), flag AS (
          SELECT ls.okey, ls.skey,
                 (ls.max_ship > o.o_orderdate + INTERVAL 90 DAY) AS late
          FROM ls JOIN orders o ON o.o_orderkey = ls.okey
        ), ag AS (
          SELECT okey, COUNT(*) AS n_supp,
                 SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
          FROM flag GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM flag f
        JOIN ag a ON a.okey = f.okey
        JOIN supplier s ON s.s_suppkey = f.skey
        WHERE f.late AND a.n_supp >= 2 AND a.n_late = 1
        GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey LIMIT 25
    """
    # Q3-shaped top-k: the same exact-integer money convention as
    # pricing_summary; order date as int64 epoch days
    out["shipping_priority"] = r"""
        WITH c AS (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ), o AS (
          SELECT o_orderkey,
                 epoch_us(o_orderdate) // 86400000000 AS o_day
          FROM orders JOIN c ON o_custkey = c_custkey
          WHERE o_orderdate < TIMESTAMP '1998-06-01'
        ), r AS (
          SELECT l_orderkey,
                 SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                     AS revenue_u
          FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
          GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, CAST(o.o_day AS BIGINT) AS o_day,
               CAST(r.revenue_u AS BIGINT) AS revenue_u
        FROM o JOIN r ON o.o_orderkey = r.l_orderkey
        ORDER BY revenue_u DESC, o_orderkey LIMIT 10
    """
    # per-type lower-rule quantiles over cent-rounded values — the same
    # windowed-cumsum rule as lang_length_quantiles
    out["badwords_filter"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+') END
                     AS toks
          FROM documents
        ), c AS (
          SELECT doc_id,
                 len(list_filter(toks,
                     x -> x IN ('slow', 'legacy', 'stale'))) AS nb
          FROM t
        )
        SELECT doc_id, CAST(nb AS BIGINT) AS n_bad,
               CAST(CASE WHEN nb = 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM c
    """
    out["domain_quota_sample"] = r"""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (
                     PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
          FROM documents) WHERE rk <= 12
    """
    out["length_ks_by_source"] = r"""
        WITH l AS (
          SELECT source, length(text) AS len FROM documents
        ), sup AS (SELECT DISTINCT len FROM l),
        ns AS (SELECT source, count(*) AS n FROM l GROUP BY source),
        ng AS (SELECT count(*) AS n FROM l),
        cs AS (
          SELECT s.source, p.len,
                 (SELECT count(*) FROM l
                  WHERE l.source = s.source AND l.len <= p.len) AS c
          FROM (SELECT DISTINCT source FROM l) s, sup p
        ), cg AS (
          SELECT p.len,
                 (SELECT count(*) FROM l WHERE l.len <= p.len) AS c
          FROM sup p
        )
        SELECT cs.source,
               CAST(ns.n AS BIGINT) AS ns,
               CAST(ng.n AS BIGINT) AS ng,
               CAST(MAX(ABS(cs.c * ng.n - cg.c * ns.n)) AS BIGINT)
                   AS ks_num
        FROM cs JOIN cg USING (len)
        JOIN ns ON ns.source = cs.source, ng
        GROUP BY cs.source, ns.n, ng.n
    """
    out["user_activity_span"] = r"""
        SELECT user_id,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
                   AS span_us
        FROM events GROUP BY user_id
    """
    out["monthly_revenue_growth"] = r"""
        WITH m AS (
          SELECT CAST(strftime(o_orderdate, '%Y%m') AS BIGINT) AS ym,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                      AS BIGINT) AS revenue_c
          FROM orders GROUP BY 1
        )
        SELECT ym, revenue_c,
               CAST(revenue_c - COALESCE(
                   LAG(revenue_c) OVER (ORDER BY ym), revenue_c)
                   AS BIGINT) AS growth_c
        FROM m
    """
    out["supplier_balance_deciles"] = r"""
        WITH h AS (
          SELECT CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS v,
                 COUNT(*) AS c
          FROM supplier GROUP BY v
        ), cum AS (
          SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM h
        ), t AS (SELECT COUNT(*) AS n FROM supplier),
        qs AS (SELECT unnest(range(10, 101, 10)) AS q)
        SELECT CAST(qs.q AS BIGINT) AS q,
               CAST((SELECT MIN(v) FROM cum
                     WHERE cc >= CEIL(qs.q * t.n / 100.0)) AS BIGINT)
                   AS bal_c
        FROM t, qs
    """
    out["copurchase_pairs"] = r"""
        WITH pp AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), pr AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
          FROM pp a JOIN pp b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
        )
        SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb,
               CAST(n AS BIGINT) AS n
        FROM pr ORDER BY n DESC, pa, pb LIMIT 20
    """
    out["events_watermark_hourly"] = r"""
        WITH e AS (
          SELECT epoch_us(ts) AS t, user_id % 64 AS bucket,
                 epoch_us(ts)
                     + ((event_id % 1800000000) * 854435761)
                       % 1800000000
                     - 900000000 AS arr,
                 event_id
          FROM events
        ), w AS (
          SELECT t,
                 MAX(t) OVER (PARTITION BY bucket ORDER BY arr, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS wm
          FROM e
        )
        SELECT CAST(t // 3600000000 AS BIGINT) AS hour_epoch,
               CAST(COUNT(*) FILTER (WHERE wm IS NULL
                                     OR t >= wm - 600000000)
                    AS BIGINT) AS n_on_time,
               CAST(COUNT(*) FILTER (WHERE wm IS NOT NULL
                                     AND t < wm - 600000000)
                    AS BIGINT) AS n_late
        FROM w GROUP BY 1
    """
    out["copurchase_pagerank"] = r"""
        WITH lp AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        ), pp AS (
          SELECT a.pk AS src, b.pk AS dst
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk <> b.pk
        ), edges AS (
          SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
          FROM pp GROUP BY 1, 2
        ), deg AS (
          SELECT src, SUM(w) AS wd FROM edges GROUP BY 1
        ), ew AS (
          SELECT e.src, e.dst, e.w / d.wd AS f
          FROM edges e JOIN deg d ON d.src = e.src
        ), nodes AS (
          SELECT DISTINCT src AS pk FROM edges
        ), r0 AS (
          SELECT pk, CAST(1.0 AS DOUBLE) AS r FROM nodes
        ), c1 AS (
          SELECT ew.dst AS pk, SUM(ew.f * r0.r) AS s
          FROM ew JOIN r0 ON r0.pk = ew.src GROUP BY ew.dst
        ), r1 AS (
          SELECT n.pk, CAST(0.15 AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * COALESCE(c1.s, 0) AS r
          FROM nodes n LEFT JOIN c1 ON c1.pk = n.pk
        ), c2 AS (
          SELECT ew.dst AS pk, SUM(ew.f * r1.r) AS s
          FROM ew JOIN r1 ON r1.pk = ew.src GROUP BY ew.dst
        ), r2 AS (
          SELECT n.pk, CAST(0.15 AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * COALESCE(c2.s, 0) AS r
          FROM nodes n LEFT JOIN c2 ON c2.pk = n.pk
        ), c3 AS (
          SELECT ew.dst AS pk, SUM(ew.f * r2.r) AS s
          FROM ew JOIN r2 ON r2.pk = ew.src GROUP BY ew.dst
        ), r3 AS (
          SELECT n.pk, CAST(0.15 AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * COALESCE(c3.s, 0) AS r
          FROM nodes n LEFT JOIN c3 ON c3.pk = n.pk
        ), c4 AS (
          SELECT ew.dst AS pk, SUM(ew.f * r3.r) AS s
          FROM ew JOIN r3 ON r3.pk = ew.src GROUP BY ew.dst
        ), r4 AS (
          SELECT n.pk, CAST(0.15 AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * COALESCE(c4.s, 0) AS r
          FROM nodes n LEFT JOIN c4 ON c4.pk = n.pk
        ), c5 AS (
          SELECT ew.dst AS pk, SUM(ew.f * r4.r) AS s
          FROM ew JOIN r4 ON r4.pk = ew.src GROUP BY ew.dst
        ), r5 AS (
          SELECT n.pk, CAST(0.15 AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * COALESCE(c5.s, 0) AS r
          FROM nodes n LEFT JOIN c5 ON c5.pk = n.pk
        )
        SELECT CAST(pk AS BIGINT) AS l_partkey,
               CAST(FLOOR(r * 1e6 + 0.5) AS BIGINT) AS rank_q
        FROM r5 ORDER BY rank_q DESC, l_partkey LIMIT 100
    """
    out["encoding_quality"] = r"""
        SELECT doc_id,
               CAST(length(text) - length(replace(text, '�', ''))
                    AS BIGINT) AS n_fffd,
               CAST(length(text) - length(regexp_replace(text,
                        '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'))
                    AS BIGINT) AS n_control,
               CAST((length(text) - length(replace(text, 'Ã', '')))
                    + (length(text) - length(replace(text, 'Â', '')))
                    + (length(text) - length(replace(text, 'â€', ''))) // 2
                    AS BIGINT) AS n_mojibake
        FROM documents
    """
    out["ref_integrity_audit"] = r"""
        SELECT
          CAST((SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
               AS BIGINT) AS n_orphan_lines,
          CAST((SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
               AS BIGINT) AS n_childless_orders
    """
    out["source_jaccard_matrix"] = r"""
        WITH t AS (
          SELECT DISTINCT source,
                 unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents WHERE trim(text) <> ''
        ), sz AS (
          SELECT source, count(*) AS n FROM t GROUP BY source
        ), p AS (
          SELECT t1.source AS sa, t2.source AS sb, count(*) AS inter
          FROM t t1 JOIN t t2 USING (word)
          WHERE t1.source < t2.source
          GROUP BY 1, 2
        )
        SELECT s1.source AS source_a, s2.source AS source_b,
               CAST(COALESCE(p.inter, 0) AS BIGINT) AS inter,
               CAST(s1.n + s2.n - COALESCE(p.inter, 0) AS BIGINT) AS uni,
               CAST((2000000 * COALESCE(p.inter, 0)
                     + (s1.n + s2.n - COALESCE(p.inter, 0)))
                    // (2 * (s1.n + s2.n - COALESCE(p.inter, 0)))
                    AS BIGINT) AS jaccard_q
        FROM sz s1 JOIN sz s2 ON s1.source < s2.source
        LEFT JOIN p ON p.sa = s1.source AND p.sb = s2.source
    """
    out["benford_digits"] = r"""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS BIGINT)
                     AS first_digit
          FROM orders
        ), h AS (
          SELECT first_digit, COUNT(*) AS n FROM d GROUP BY first_digit
        ), t AS (SELECT SUM(n) AS total FROM h)
        SELECT h.first_digit, CAST(h.n AS BIGINT) AS n,
               CAST((2000000 * h.n + t.total) // (2 * t.total)
                    AS BIGINT) AS share_q
        FROM h, t
    """
    out["value_quantiles"] = r"""
        WITH e AS (
          SELECT event_type,
                 CAST(ROUND(value * 100, 0) AS BIGINT) AS v
          FROM events
        ), h AS (
          SELECT event_type, v, COUNT(*) AS c FROM e GROUP BY event_type, v
        ), cum AS (
          SELECT event_type, v,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cc
          FROM h
        ), t AS (
          SELECT event_type, COUNT(*) AS n FROM e GROUP BY event_type
        ), qs AS (
          SELECT unnest([25, 50, 75, 90, 99]) AS q
        )
        SELECT t.event_type, CAST(qs.q AS BIGINT) AS q,
               CAST((SELECT MIN(v) FROM cum
                     WHERE cum.event_type = t.event_type
                       AND cc >= CEIL(qs.q * t.n / 100.0)) AS BIGINT)
                   AS value_c
        FROM t, qs
    """
    # sliding 24h DAU: hopping fan-out + COUNT(DISTINCT)
    out["rolling_active_users"] = r"""
        WITH x AS (
          SELECT DISTINCT (epoch_us(ts) // 3600000000 - j) AS window_hour,
                 user_id
          FROM events, LATERAL unnest(range(0, 24)) AS u(j)
        )
        SELECT CAST(window_hour AS BIGINT) AS window_hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM x GROUP BY window_hour
    """
    # exact COUNT(DISTINCT) per hour, int64 epoch hours
    out["hourly_active_users"] = r"""
        SELECT epoch_us(ts) // 3600000000 AS hour,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        FROM events GROUP BY hour
    """
    # grouped top-k, ties to the smaller user_id
    out["top_users_by_type"] = r"""
        WITH c AS (
          SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY event_type, user_id
        ), r AS (
          SELECT event_type, user_id, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY n DESC, user_id) AS rk
          FROM c
        )
        SELECT event_type, user_id, n FROM r WHERE rk <= 5
    """
    # hopping windows: W=60min, H=15min ⇒ each event in exactly 4
    # windows {H*(t//H - j)}, integer epoch seconds
    out["events_hopping"] = r"""
        WITH e AS (
          SELECT epoch_us(ts) AS t, event_type FROM events
        ), x AS (
          SELECT ((t // 900000000 - j) * 900000000) // 1000000
                     AS window_start,
                 event_type
          FROM e, LATERAL unnest(range(0, 4)) AS u(j)
        )
        SELECT CAST(window_start AS BIGINT) AS window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM x GROUP BY window_start, event_type
    """
    # retention matrix: int64 epoch days via the same floor division
    out["cohort_retention"] = r"""
        WITH d AS (
          SELECT user_id,
                 epoch_us(ts) // 86400000000 AS day
          FROM events
        ), f AS (
          SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
        ), a AS (
          SELECT DISTINCT d.user_id, f.cohort_day,
                 d.day - f.cohort_day AS day_offset
          FROM d JOIN f USING (user_id)
        )
        SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
               CAST(day_offset AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM a GROUP BY cohort_day, day_offset
    """
    # Markov bigram table: LAG over the same deterministic
    # (ts, event_id) per-user order the pipeline sorts by
    out["event_transitions"] = r"""
        WITH o AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events
        )
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """
    # ordered first-reach funnel: stage k+1 counts at/after stage k's
    # first-reach; -1 sentinels keep the output pure int64 (epoch micros)
    out["funnel_stages"] = r"""
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(epoch_us(ts) AS BIGINT) AS t
          FROM events
        ), s1 AS (
          SELECT user_id, MIN(t) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(t) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND t >= t1 GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(t) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND t >= t2 GROUP BY e.user_id
        )
        SELECT u.user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS n_reached,
               COALESCE(t1, -1) AS t_view,
               COALESCE(t2, -1) AS t_click,
               COALESCE(t3, -1) AS t_purchase
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """
    # batched query matrix: per-query ROW_NUMBER, same float-cosine
    # ordering convention as emb_topk
    out["emb_topk_batch"] = r"""
        WITH q AS (
          SELECT vec_id AS query_vec_id, embedding AS qe
          FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
        ), s AS (
          SELECT q.query_vec_id, e.vec_id,
                 ROW_NUMBER() OVER (
                     PARTITION BY q.query_vec_id
                     ORDER BY list_cosine_similarity(e.embedding, q.qe)
                         DESC, e.vec_id) AS rank
          FROM embeddings e CROSS JOIN q
        )
        SELECT query_vec_id, CAST(rank AS BIGINT) AS rank, vec_id
        FROM s WHERE rank <= 10
    """
    # DSIR importance selection: same floor(avg·1e6+0.5) ln-parity
    # convention as lm_quality_rank; top nd//4 by (score desc, doc_id)
    out["dsir_select"] = r"""
        WITH d AS (
          SELECT doc_id, lang,
                 string_split_regex(trim(text), '\s+') AS ws
          FROM documents WHERE trim(text) <> ''
        ), w AS (
          SELECT doc_id, lang, unnest(ws) AS word FROM d
        ), cnt AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS cr,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     AS BIGINT) AS ct
          FROM w GROUP BY word
        ), tot AS (
          SELECT SUM(cr) AS tr, SUM(ct) AS tt, COUNT(*) AS v FROM cnt
        ), sc AS (
          SELECT w.doc_id,
                 CAST(floor(SUM(ln((cnt.ct + 1.0) / (tot.tt + tot.v))
                                - ln((cnt.cr + 1.0) / (tot.tr + tot.v)))
                            / COUNT(*) * 1000000 + 0.5) AS BIGINT)
                     AS score_q
          FROM w JOIN cnt USING (word) CROSS JOIN tot
          GROUP BY w.doc_id
        ), n AS (
          SELECT COUNT(*) AS nd FROM d
        )
        SELECT doc_id, score_q
        FROM (SELECT doc_id, score_q,
                     ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id)
                         AS rk
              FROM sc), n
        WHERE rk <= nd * 1 // 4
    """
    # deterministic split: same md5-prefix integer draw as the
    # sampling family; thresholds are integer fractions of 16^8
    out["dataset_split"] = r"""
        SELECT doc_id,
               CASE WHEN u < 80 * 4294967296 // 100 THEN 'train'
                    WHEN u < 90 * 4294967296 // 100 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) AS u
          FROM documents
        )
    """
    # snapshot diff over distinct text hashes, A = even sources
    out["corpus_diff"] = r"""
        WITH h AS (
          SELECT DISTINCT md5(text) AS h,
                 CAST(source[4:] AS BIGINT) % 2 = 0 AS in_a
          FROM documents
        ), s AS (
          SELECT h, BOOL_OR(in_a) AS a, BOOL_OR(NOT in_a) AS b FROM h
          GROUP BY h
        )
        SELECT CAST(SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM s
    """
    # integer PMI surrogate: pair_n*W*1e6 // (a_n*b_n) preserves the
    # PMI ordering with no float log in the hash
    out["collocations"] = r"""
        WITH toks AS (
          SELECT string_split_regex(trim(text), '\s+') AS ts
          FROM documents WHERE trim(text) <> ''
        ), pairs AS (
          SELECT ts[i] || ' ' || ts[i + 1] AS bigram
          FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        ), bc AS (
          SELECT bigram, CAST(COUNT(*) AS BIGINT) AS pair_n
          FROM pairs GROUP BY bigram
        ), cand AS (
          SELECT bigram, pair_n FROM bc WHERE pair_n >= 5
          ORDER BY pair_n DESC, bigram LIMIT 1000
        ), words AS (
          SELECT unnest(ts) AS w FROM toks
        ), wc AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM words GROUP BY w
        ), tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS tw FROM words
        )
        SELECT c.bigram, c.pair_n,
               CAST((CAST(c.pair_n AS HUGEINT) * t.tw * 1000000)
                    // (a.n * b.n) AS BIGINT) AS score_q
        FROM cand c
        CROSS JOIN tot t
        JOIN wc a ON a.w = string_split(c.bigram, ' ')[1]
        JOIN wc b ON b.w = string_split(c.bigram, ' ')[2]
        ORDER BY score_q DESC, c.bigram LIMIT 20
    """
    # per-doc shingle novelty: owner = min doc_id; same gram expression
    # as the jaccard family
    out["ngram_novelty"] = r"""
        WITH words AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM documents WHERE trim(text) <> ''
        ), g AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
          FROM words,
               LATERAL unnest(generate_series(1, greatest(len(ws) - 2, 1)))
                   AS t(i)
        ), own AS (
          SELECT g, MIN(doc_id) AS owner FROM g GROUP BY g
        )
        SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN o.owner = d.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM g d JOIN own o USING (g) GROUP BY d.doc_id
    """
    # sliding windows: size 256, stride 192; ceil(n/stride) windows,
    # final short window kept
    out["sliding_chunks"] = r"""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS n
          FROM documents
        )
        SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
               CAST(j * 192 AS BIGINT) AS start_tok,
               CAST(LEAST(256, n - j * 192) AS BIGINT) AS n_toks
        FROM d, LATERAL unnest(range(0, (n + 191) // 192)) AS u(j)
        WHERE j * 192 < n
    """
    # grouped lower-rule quantiles: same ceil rule as length_quantiles,
    # windowed cumsum partitioned by lang
    out["lang_length_quantiles"] = r"""
        WITH h AS (
          SELECT lang, n_chars AS v, COUNT(*) AS c
          FROM documents GROUP BY lang, n_chars
        ), cum AS (
          SELECT lang, v,
                 SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cc
          FROM h
        ), t AS (
          SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ), qs AS (
          SELECT unnest([25, 50, 75, 90, 99]) AS q
        )
        SELECT t.lang, CAST(qs.q AS BIGINT) AS q,
               CAST((SELECT MIN(v) FROM cum
                     WHERE cum.lang = t.lang
                       AND cc >= CEIL(qs.q * t.n / 100.0)) AS BIGINT)
                   AS value
        FROM t, qs
    """
    # the posting-list index returns bit-identical quantized scores to
    # the streaming scan (same formula, same term-order float
    # accumulation) — one oracle serves both
    out["bm25_indexed_topk"] = out["bm25_topk"]
    return out
