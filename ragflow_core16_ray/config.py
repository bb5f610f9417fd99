"""Pipeline configuration.

Mirrors the reference's ``parser_config`` dict surface
(rag/app/naive.py:325-327, api/db/services/task_service.py:321-344) as a
plain frozen dataclass threaded into stage constructors.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    # token budget per emitted section chunk (reference default 128,
    # rag/app/naive.py:326)
    chunk_token_num: int = 128
    # sentence-boundary delimiter set for chunk packing
    # (reference default "\n!?。；！？", rag/app/naive.py:326)
    delimiter: str = "\n!?。；！？"
    # page-range shard size for pdfish mega-docs (reference task_page_size
    # default 12, paper 22 — task_service.py:321-327)
    task_page_size: int = 12
    # row shard size for table mega-docs (reference 3000 rows/task,
    # task_service.py:338-344)
    table_shard_rows: int = 3000
    # span-count threshold above which a doc is exploded into shard rows
    # before the parse stage (skew leveling); docs at/below this bypass the
    # reassembly shuffle entirely.
    shard_span_threshold: int = 2048
    # page count at/above which a raw-PDF doc's PARSE (content-stream
    # interpretation + scanned-page OCR) fans out into page-range shard
    # tasks instead of parsing whole in one task — the reference's
    # from_page/to_page task unit (task_service.py:321-327). The blob is
    # staged ONCE; shard rows carry only a (path, range) ref.
    pdf_page_shard_min: int = 48
    # synthetic page height used for cumulative-Y reading order
    # (the reference uses real rasterized page heights, pdf_parser.py:1110)
    page_height: int = 1000
    # max hierarchy depth for book/bullet chunking (reference depth 5,
    # rag/nlp/__init__.py:420-507)
    max_hierarchy_depth: int = 5
    # emit table docs as chunked HTML <table>s instead of typed row lines
    # (the reference's html4excel parser_config flag, rag/app/naive.py:418,
    # 12 rows per chunk via excel_parser.html)
    html4excel: bool = False
    html_chunk_rows: int = 12
    # weave the reference's in-band positional tags
    # (@@page\tx0\tx1\ttop\tbottom##, pdf_parser.py:893-908) into pdfish
    # title/section text; strip/parse with functions/postag.py
    keep_positions: bool = False
    # "deepdoc" = full layout analysis (ordering, two-column, tables,
    # ToC, header/footer); "plain" = the reference's "Plain Text"
    # layout_recognize mode (rag/app/naive.py:282-299 PlainParser): raw
    # text lines in input order, no layout machinery at all; "onnx" =
    # deepdoc layout with the model heads loaded from ``onnx_dir``
    # .onnx files (functions/vision_onnx.py): det.onnx/rec.onnx for
    # scanned-page OCR (the reference's ocr.py:70-126 slot) and
    # layout.onnx for box classification (layout_recognizer.py:31-161
    # slot), one session each per actor; each model independently
    # falls back to its rule head when its weights file is absent
    layout_recognize: str = "deepdoc"
    # weights dir (pyarrow.fs URI ok) for layout_recognize="onnx";
    # None reads $RAGFLOW_ONNX_DIR
    onnx_dir: str | None = None
    # force a chunking template for all docs (role of the reference's
    # user-selected parser_id, task_executor.py:67-84): None = content
    # routing; "one" = whole-doc single chunk (rag/app/one.py); "qa" =
    # question/answer pairing (rag/app/qa.py)
    template_override: str | None = None
    # token currency for chunk budgets: "maxmatch" = the BiMM max-match
    # counter (functions.tokenizer.num_tokens); "bpe" = the frozen-vocab
    # BPE counter (functions/bpe_counter.py + data/bpe_merges.tsv), the
    # reproducible substitute for the reference's tiktoken budgets
    # (rag/utils/__init__.py:81-90)
    token_counter: str = "maxmatch"

    def digest_payload(self) -> str:
        """Stable string for lineage digests (mirrors the reference's
        sorted-config digest, task_service.py:349-360)."""
        items = sorted(self.__dict__.items())
        return ";".join(f"{k}={v}" for k, v in items)


DEFAULT_CONFIG = ExtractConfig()


@dataclass(frozen=True)
class RuntimeConfig:
    """Per-stage resource sizing for the Ray pipeline."""

    # actor-pool size for the parse stage when use_actor_pool is set
    # ((min,max) autoscaling; Ray caps at available CPUs)
    parse_concurrency: tuple = (4, 28)
    # parse batch size; 0 = auto-size from the corpus row count at build
    # time (target ≈4 batches per core, clamped to [16, 128]). The two
    # regimes pull opposite ways — measured at 32 cpus: 200k docs wants
    # 128 (13.3s vs 16s at bs=16: batch overhead dominates), a 2k-doc
    # corpus wants 16 (1.75s vs 4.7s at bs=128: 13 tasks starve 32
    # cores). Auto picks both optima; a fixed value still overrides.
    parse_batch_size: int = 0
    # False → stateless task pool (parse state is just module-level
    # regexes; no pool ramp-up). True → actor pool, required once the
    # parse hosts real model state (ONNX sessions etc.).
    use_actor_pool: bool = False
    # stateless merge stage batch size
    merge_batch_size: int = 256
    # output partition count hint
    output_partitions: int = 0  # 0 = let Ray decide


DEFAULT_RUNTIME = RuntimeConfig()
