"""Skew handling: mega-doc shard splitting (role of the reference's
page-range task fan-out, api/db/services/task_service.py:292-388).

``split_shards`` is THE sharding function: both the fused single-pass path
and the distributed explode use it, so the distributed result is equal to
the local one by construction (the golden-equality contract).

Split points per template:
- pdfish: every ``task_page_size`` pages (reference default 12,
  task_service.py:321-327); cuts are always page boundaries, and phase A's
  text-flow merge never crosses a page, so shard concatenation is exact.
- table: every ``table_shard_rows`` data rows (reference 3000,
  task_service.py:338-344); the header row span is copied into every shard
  (each shard re-votes column types exactly like the reference's per-task
  parse).
- text/book: every ``shard_span_threshold`` spans (phase A is per-span for
  these, so any cut is exact; the hierarchy merge runs in phase B over the
  reassembled doc).
- html/md: never sharded (single-span / table-continuation hazards; these
  archetypes are bounded in size).
"""

from __future__ import annotations

import re

from ..config import ExtractConfig

_PAGE_RE = re.compile(r'"page": (\d+)')


def _span_page(span: dict, current: int) -> int:
    """Page of a span: boxes carry it in their JSON payload; caption/image
    spans inherit the page of the preceding box."""
    if span["kind"] != "box":
        return current
    m = _PAGE_RE.search(span["text"])
    return int(m.group(1)) if m else current


def split_shards(spans: list[dict], template: str,
                 cfg: ExtractConfig) -> list[list[dict]]:
    n = len(spans)
    if n <= cfg.shard_span_threshold or template in ("html", "md"):
        return [spans]
    if template == "pdfish":
        shards: list[list[dict]] = []
        cur: list[dict] = []
        page = 0
        bucket = 0
        for s in spans:
            page = _span_page(s, page)
            b = page // cfg.task_page_size
            if cur and b != bucket:
                shards.append(cur)
                cur = []
            bucket = b
            cur.append(s)
        if cur:
            shards.append(cur)
        return shards
    if template == "table":
        step = cfg.table_shard_rows
        if cfg.template_override in ("qa", "tag"):
            # qa/tag excel modes have NO header convention (qa.py:36-77,
            # tag.py:55-60 "without header"): every row is a pair, so
            # sharding is a plain row partition — copying the header would
            # emit its pair once per shard
            return [spans[i:i + step] for i in range(0, n, step)]
        header, data = spans[0], spans[1:]
        return [[header] + data[i:i + step] for i in range(0, len(data), step)] \
            or [spans]
    step = cfg.shard_span_threshold
    return [spans[i:i + step] for i in range(0, n, step)]
