"""The flagship extraction pipeline.

Topology (designed for 100 TB / multi-node; tested single-node):

    pass 1 (one streaming read of the input, NO shuffle):
        read_documents → map_batches(ExtractRouter — stateless task pool by
        default; actor pool via RuntimeConfig.use_actor_pool when the parse
        hosts model state)
          - docs whose span count ≤ threshold (99.96% of the corpus):
            phase A + B fused in-place → final extracted rows
          - mega-docs: split into page/row-range shards (stages/shard.py)
            and STAGED to a side parquet dir keyed by doc_id
            (deterministic filename ⇒ idempotent under Ray task retries);
            nothing emitted downstream
        → write final rows to <out>/docs/

    pass 2 (mega-docs only — a tiny fraction of the data):
        read staging → repartition (spread shards across workers: the
        explicit repartition-by-estimated-cost step) → map_batches phase A
        → groupby(doc_id).map_groups(phase B reassembly)  ← the ONE
        semantic shuffle, carrying only mega-doc spans → append to
        <out>/docs/

    Shuffle cost therefore scales with the skewed tail, not the corpus.
    (The alternative — filter-branching one Dataset into singles/shards —
    re-executes the shared read+parse prefix per branch in Ray Data, i.e.
    2× the scan at 100 TB; the staging dir costs one extra write+read of
    only the mega-doc bytes and doubles as the resume checkpoint.)

Role mapping to the reference: pass-1 fusion = its unsharded tasks; the
staging dir = its Redis/MySQL task queue for page-range tasks
(task_service.py:292-388); the groupby = its per-doc chunk reassembly.

Multi-node storage contract: the staging dir, blob dir, output dir and
lineage manifests are ``pyarrow.fs``-resolvable URIs (or pre-resolved
(FileSystem, path) pairs) routed through ``state/fsio.py`` — every
worker writes/reads them by name on shared storage (NFS or an S3-style
object store); writes are atomic publishes. Resolution happens on the
DRIVER; the resolved filesystem objects are pickled into the stage
constructors, so workers never re-resolve.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG, DEFAULT_RUNTIME, ExtractConfig, RuntimeConfig
from ..schemas import EXTRACTED_SCHEMA, SHARD_SCHEMA
from ..sources.interleaved import read_documents
from ..stages.extract import (ExtractShard, extract_doc, make_reassembler,
                              route_template)
from ..stages.shard import split_shards
from ..state import fsio


class ExtractRouter:
    """Pass-1 actor: fused extraction for regular docs; mega-docs staged."""

    def __init__(self, cfg: ExtractConfig, staging_dir):
        self.cfg = cfg
        # resolve ONCE (driver for task pools / fn_constructor unpickle
        # for actor pools — either way the fs object travels by pickle)
        self.staging = fsio.resolve(staging_dir)
        fsio.makedirs(self.staging)
        # model-backed OCR: load the det/rec sessions ONCE per actor
        # (the reference's per-process model cache, ocr.py:70-126) and
        # install them as the glyph core; weights absent → rule kernels
        # (a warning, not a failure — the rule path is golden-pinned)
        # models load LAZILY in the worker (__call__) through a
        # per-process session cache: this instance may be pickled per
        # TASK, and sessions must neither travel by pickle (real
        # onnxruntime sessions can't) nor load on the driver
        self.ocr = None
        self.layout = None
        self._onnx_weights = None
        self._models_ready = False
        if cfg.layout_recognize == "onnx":
            self._onnx_weights = (cfg.onnx_dir
                                  or os.environ.get("RAGFLOW_ONNX_DIR"))

    def _ensure_models(self) -> None:
        if self._models_ready or not self._onnx_weights:
            return
        from ..functions.vision_onnx import load_layout, load_ocr

        try:
            self.ocr = load_ocr(self._onnx_weights)
        except (FileNotFoundError, OSError):
            self.ocr = None
        try:  # independent: a weights dir may carry det/rec only,
            # layout.onnx only, or both — each model falls back to
            # its rule head on its own
            self.layout = load_layout(self._onnx_weights)
        except (FileNotFoundError, OSError):
            self.layout = None
        self._models_ready = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        # install the model-backed OCR/layout heads for THIS batch only
        # (tasks run sequentially within a worker, so the scope is
        # race-free; the load itself is once per worker process via the
        # vision_onnx session cache, wherever the instance was pickled)
        self._ensure_models()
        if self.ocr is not None:
            from ..functions.glyphs import set_core_ocr

            set_core_ocr(self.ocr.ocr_binary)
        if self.layout is not None:
            from ..functions.pdfish import set_layout_model

            set_layout_model(self.layout.classify)
        try:
            return self._extract_batch(batch)
        finally:
            if self.ocr is not None:
                set_core_ocr(None)
            if self.layout is not None:
                set_layout_model(None)

    def _extract_batch(self, batch: pa.Table) -> pa.Table:
        from ..schemas import spans_column_to_pylists

        rows = []
        staged_rows = []
        from ..functions.doc_legacy import expand_doc_spans
        from ..functions.pdf_bytes import expand_pdf_spans
        from ..functions.pptx import expand_pptx_spans
        from ..functions.xlsx import expand_xlsx_spans

        for doc_id, spans in zip(batch["doc_id"].to_pylist(),
                                 spans_column_to_pylists(batch["spans"])):
            try:
                # a BIG raw PDF (≥ pdf_page_shard_min pages, metadata
                # probe only) fans its PARSE out into page-range shard
                # tasks — content interpretation + scanned-page OCR are
                # the dominant cost, and one 10k-page scan must not
                # hot-spot one worker (the reference's from_page/to_page
                # tasks, task_service.py:321-327). The blob stages ONCE
                # next to the shard parquet; shard rows carry a
                # (path, range) ref that ExtractShard expands.
                pr = self._maybe_stage_pdf_ranges(doc_id, spans)
                if pr is not None:
                    staged_rows.extend(pr)
                    continue
                # raw-binary payloads expand BEFORE the shard decision so
                # a many-page PDF page-range-shards like any pdfish doc, a
                # big workbook row-shards like any table doc and a deck
                # slide-shards like any presentation
                spans = expand_doc_spans(expand_pptx_spans(
                    expand_xlsx_spans(expand_pdf_spans(spans))))
                template = route_template(spans)
                shards = split_shards(spans, template, self.cfg)
                if len(shards) == 1:
                    tmpl, out, _ = extract_doc(spans, self.cfg)
                    rows.append({"doc_id": doc_id, "template": tmpl,
                                 "spans": out, "n_input_spans": len(spans),
                                 "n_shards": 1})
                else:
                    for si, sh in enumerate(shards):
                        staged_rows.append({
                            "doc_id": doc_id, "template": template,
                            "shard_id": si, "n_shards": len(shards),
                            "n_input_spans": len(spans), "spans": sh})
            except Exception:  # noqa: BLE001 — poison-row containment
                # one malformed document must not kill the job (the
                # reference's per-task failure containment,
                # task_executor.py:604-616); the error row is filterable
                # downstream by template == "error"
                rows.append({"doc_id": doc_id, "template": "error",
                             "spans": [], "n_input_spans": len(spans or []),
                             "n_shards": 1})
        if staged_rows:
            # deterministic name per first doc in the group ⇒ a retried
            # task overwrites its own file instead of duplicating shards;
            # atomic publish ⇒ pass 2 never reads a partial file
            tbl = pa.Table.from_pylist(staged_rows, schema=SHARD_SCHEMA)
            name = staged_rows[0]["doc_id"]
            fsio.write_table(fsio.join(self.staging, f"{name}.parquet"),
                             tbl)
        return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)

    def _maybe_stage_pdf_ranges(self, doc_id: str,
                                spans: list) -> list | None:
        """Page-range parse fan-out for big raw PDFs: stage the blob once
        (idempotent write: <staging>_blobs/<doc_id>.pdf), route the
        template from the FIRST range's parse, and emit one shard row per
        ``task_page_size`` pages whose single ``pdf_ref`` span carries
        only (path, from, to). Returns None when the doc is not a
        big-PDF candidate (any other span mix parses in pass 1)."""
        import base64
        import json as _json

        from ..functions.pdf_bytes import (expand_pdf_spans,
                                           pdf_page_count)
        from ..schemas import make_span
        from ..stages.extract import route_template

        if len(spans) != 1 or spans[0]["kind"] != "pdf":
            return None
        # size gate before the page-tree probe: a payload too small to
        # hold pdf_page_shard_min pages (~160 B of objects per page at
        # minimum) skips the object scan entirely — the 97% small-PDF
        # case costs one length check
        if len(spans[0]["text"]) * 3 // 4 \
                < 160 * self.cfg.pdf_page_shard_min:
            return None
        try:
            raw = base64.b64decode(spans[0]["text"])
            n_pages = pdf_page_count(raw)
        except Exception:  # noqa: BLE001 — not probeable: normal path
            return None
        if n_pages < self.cfg.pdf_page_shard_min:
            return None
        fs, staging_path = self.staging
        blob_dir = (fs, staging_path + "_blobs")
        fsio.makedirs(blob_dir)
        # atomic publish; the pdf_ref span carries the IN-FS path — the
        # shard task gets the filesystem object from its constructor
        blob_fs, blob_path = fsio.join(blob_dir, f"{doc_id}.pdf")
        fsio.write_bytes((blob_fs, blob_path), raw)
        step = self.cfg.task_page_size
        ranges = [(a, min(a + step, n_pages))
                  for a in range(0, n_pages, step)]
        # route from the first range with NON-TOC content — equivalent to
        # whole-doc routing because any non-empty PDF range yields box
        # spans (blank cover pages yield nothing — or, when the doc has
        # outlines, only from_page==0 toc_entry spans — and neither must
        # route the doc to 'naive'); the probed ranges' spans are staged
        # as-is so the probe parse is never repeated by a shard task
        pre: dict[int, list] = {}
        template = None
        for si, (a, b) in enumerate(ranges):
            got = expand_pdf_spans(spans, a, b)
            pre[si] = got
            if [s for s in got if s["kind"] != "toc_entry"]:
                template = route_template(got)
                break
        if template is None:
            return None     # fully blank doc: the normal path handles it
        return [{
            "doc_id": doc_id, "template": template, "shard_id": si,
            "n_shards": len(ranges), "n_input_spans": 1,
            "spans": (pre[si] if si in pre else
                      [make_span("pdf_ref", _json.dumps(
                          {"path": blob_path, "from": a, "to": b},
                          sort_keys=True))]),
        } for si, (a, b) in enumerate(ranges)]


def extract_dataset(input_uri: str, staging_dir: str,
                    cfg: ExtractConfig = DEFAULT_CONFIG,
                    runtime: RuntimeConfig = DEFAULT_RUNTIME) -> rd.Dataset:
    """Pass 1 as a lazy Dataset (consume it, then run
    :func:`reassemble_staged` for the mega-doc tail).

    Default is STATELESS tasks: this parse's only state is module-level
    compiled regexes (once per worker process), and a task pool skips the
    actor-pool ramp-up (~0.6s faster at sf0.1). Set
    ``runtime.use_actor_pool`` for a model-backed parse (ONNX OCR/layout à
    la the reference) where per-actor model load must amortize.
    """
    ds = read_documents(input_uri)
    batch_size = runtime.parse_batch_size or _auto_batch_size(input_uri)
    # resolve the staging URI HERE (on the driver — registered test
    # schemes only exist driver-side); the (fs, path) pair pickles into
    # the task closure / actor constructor args
    staging = fsio.resolve(staging_dir)
    if runtime.use_actor_pool:
        return ds.map_batches(
            ExtractRouter,
            fn_constructor_args=(cfg, staging),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=runtime.parse_concurrency,
        )
    return ds.map_batches(
        ExtractRouter(cfg, staging),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def _auto_batch_size(input_uri, per_core_batches: int = 4,
                     lo: int = 16, hi: int = 128) -> int:
    """Metadata-only batch sizing: ≈``per_core_batches`` parse tasks per
    cluster core, clamped to [lo, hi]. A small corpus gets small batches
    (task count, not per-batch overhead, limits wall time there); a big
    corpus hits the ``hi`` cap where per-batch overhead amortizes. Falls
    back to ``hi`` when the row count isn't cheaply knowable (at 100 TB
    every corpus is in the capped regime anyway)."""
    import glob

    import pyarrow.parquet as pq
    import ray

    try:
        if isinstance(input_uri, str) and os.path.isdir(input_uri):
            files = glob.glob(os.path.join(input_uri, "*.parquet"))
        elif isinstance(input_uri, (list, tuple)):
            files = [f for f in input_uri if str(f).endswith(".parquet")]
        elif isinstance(input_uri, str) and input_uri.endswith(".parquet"):
            files = [input_uri]
        else:
            return hi
        if not files:
            return hi  # non-parquet layout (lance/hive): not cheaply knowable
        n_rows = sum(pq.read_metadata(f).num_rows for f in files)
        cores = int(ray.cluster_resources().get("CPU", 8)) or 8
        return max(lo, min(hi, n_rows // (cores * per_core_batches) or lo))
    except Exception:  # noqa: BLE001 — sizing is best-effort, never fatal
        return hi


def reassemble_staged(staging_dir: str,
                      cfg: ExtractConfig = DEFAULT_CONFIG,
                      runtime: RuntimeConfig = DEFAULT_RUNTIME) -> rd.Dataset | None:
    """Pass 2: distributed phase A over staged shards, then the
    groupby(doc_id) reassembly shuffle + phase B."""
    fs, _spath = fsio.resolve(staging_dir)
    files = fsio.list_files(staging_dir, ".parquet")
    if not files:
        return None
    # metadata-only shard count (no payload read) sizes the skew leveling
    n_shards = sum(fsio.read_metadata((fs, f)).num_rows for f in files)
    # one read task per staged file — more tasks than files yields empty
    # schemaless blocks (and a noisy executor warning) on this tiny tail
    shards = rd.read_parquet(files, filesystem=fs,
                             override_num_blocks=min(len(files), 512))
    # spread shards of the same (huge) doc across workers before the
    # heavy parse — the explicit skew-leveling repartition. Only worth its
    # all-to-all when the tail is big; below that the per-file read blocks
    # (plus Ray's dynamic block splitting of any single giant file)
    # already spread the work, and the repartition's fixed latency
    # dominates this small pass.
    if n_shards > 16 * len(files):
        shards = shards.repartition(max(8, min(512, n_shards // 8)))
    # stateless tasks (no model state) — skips actor-pool ramp-up, which
    # otherwise dominates this small pass's wall time
    parsed = shards.map_batches(
        ExtractShard(cfg, blob_fs=fs),
        batch_format="pyarrow",
        batch_size=8,
    )
    return parsed.groupby("doc_id").map_groups(
        make_reassembler(cfg), batch_format="pandas")


def run_extract(input_uri: str, output_dir: str,
                cfg: ExtractConfig = DEFAULT_CONFIG,
                runtime: RuntimeConfig = DEFAULT_RUNTIME) -> dict:
    """Full two-pass run, writing partitioned parquet under
    ``output_dir/docs``. ``output_dir`` may be a ``pyarrow.fs`` URI.
    Returns counters for lineage/metrics."""
    staging = fsio.join(output_dir, "_staging")
    docs_dir = fsio.join(output_dir, "docs")
    docs_fs, docs_path = fsio.resolve(docs_dir)
    # a naive rerun must not append duplicates; partition-level resume is
    # the job of state/lineage.py, which skips completed partitions BEFORE
    # calling this
    sfs, spath = fsio.resolve(staging)
    fsio.rmtree((sfs, spath))
    # resolve-then-suffix: string-concatenating fsio.join's result would
    # build a malformed 3-tuple when the caller passed a pre-resolved
    # (FileSystem, path) pair
    fsio.rmtree((sfs, spath + "_blobs"))
    fsio.rmtree(docs_dir)
    pass1 = extract_dataset(input_uri, staging, cfg, runtime)
    pass1.write_parquet(docs_path, filesystem=docs_fs)
    n1 = None  # write_parquet consumed the stream; count from output later
    pass2 = reassemble_staged(staging, cfg, runtime)
    n2 = 0
    if pass2 is not None:
        pass2.write_parquet(docs_path, filesystem=docs_fs)
        n2 = 1
    # total seconds spent INSIDE the parse UDF across all tasks: wall ×
    # cores vs this number is the scheduler-packing evidence for the
    # scaling run (bench.py --scaling)
    import re as _re

    m = _re.search(r"UDF time:.*?([\d\.]+)s total", pass1.stats())
    return {"output": docs_dir, "staging": staging, "had_mega": bool(n2),
            "n_pass1": n1,
            "pass1_udf_cpu_sec": float(m.group(1)) if m else None}
