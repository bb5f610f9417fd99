"""`ray job submit`-able WARC-ingestion job driver: crawl shards in,
extracted main content out.

The web-scale front door: point it at a directory of .warc.gz shards
(the Common Crawl layout — per-record gzip members of HTTP responses)
and it streams record parsing → HTML main-content extraction →
partitioned parquet, one output partition per input shard, each written
atomically with a manifest — so a re-submitted job skips completed
shards (the same resume contract as state/lineage.py). Runs unchanged
locally and under `ray job submit` (`ray.init(address="auto")`).

Examples:
    # synthesize a WARC corpus from a documents table, then ingest it
    python tools/warc_job.py --synth /root/testdata/sf0.001 \
        --input /tmp/warc --output /tmp/warc_out
    ray job submit -- python tools/warc_job.py --input s3://crawl \
        --output s3://extracted
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="dir of .warc[.gz] shards")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--synth", default="",
                   metavar="SF_DIR", help="first write --input as warc.gz "
                   "shards of boilerplate-wrapped HTML from SF_DIR's "
                   "documents table")
    p.add_argument("--num-cpus", type=int, default=0,
                   help="local-mode CPU cap (0 = attach/auto)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():  # the job entry point owns the session
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     include_dashboard=False)

    import pandas as pd
    import ray.data as rd

    from ragflow_core16_ray.functions.codec import decode_http_body
    from ragflow_core16_ray.functions.hashing import hash64
    from ragflow_core16_ray.functions.html_extract import extract_html
    from ragflow_core16_ray.functions.url import canonical_url
    from ragflow_core16_ray.sources.warc import (read_warc,
                                                 write_documents_warc)

    t0 = time.perf_counter()
    if args.synth:
        marker = os.path.join(args.input, "_GRAFT_DONE")
        if not os.path.exists(marker):
            src = os.path.join(args.synth, "documents.parquet")
            write_documents_warc(rd.read_parquet(src), args.input,
                                 as_html=True)
            open(marker, "w").close()

    shards = sorted(glob.glob(os.path.join(args.input, "*.warc"))
                    + glob.glob(os.path.join(args.input, "*.warc.gz")))
    if not shards:
        raise FileNotFoundError(f"no *.warc[.gz] shards in {args.input}")
    os.makedirs(args.output, exist_ok=True)

    # resume: one output partition per input shard, atomic rename +
    # manifest; a re-run only processes shards with no manifest
    todo = [s for s in shards if not os.path.exists(
        os.path.join(args.output,
                     "_" + os.path.basename(s) + ".json"))]
    mask = (1 << 63) - 1

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        # shard-local CDX-style URL dedup: the crawler re-fetches pages
        # under URI variants; keep the FIRST record per canonical URL
        # within this shard (cross-shard dedup is the warc_url_dedup
        # bucket shuffle — here the shard is the resume unit, so the
        # dedup must stay shard-local)
        seen: set = set()
        rows = []
        for _, r in batch.iterrows():
            if r["warc_type"] != "response" or r["http_status"] != 200 \
                    or not str(r["mime"]).startswith("text/html"):
                continue
            canon = canonical_url(r["target_uri"])
            if canon in seen:
                continue
            seen.add(canon)
            doc = extract_html(decode_http_body(r["body"], r["mime"]))
            text = "\n\n".join(doc.sections)
            rows.append({
                "warc_file": os.path.basename(r["warc_file"]),
                "rec_idx": int(r["rec_idx"]),
                "target_uri": r["target_uri"],
                "canon_url": canon,
                "title": doc.title,
                "text": text,
                "n_sections": len(doc.sections),
                "content_hash": hash64(text) & mask,
            })
        return pd.DataFrame(rows, columns=[
            "warc_file", "rec_idx", "target_uri", "canon_url", "title",
            "text", "n_sections", "content_hash"])

    n_docs = 0
    for shard in todo:
        name = os.path.basename(shard)
        part_tmp = os.path.join(args.output, "_tmp_" + name)
        part = os.path.join(args.output, "part_" + name)
        import shutil

        shutil.rmtree(part_tmp, ignore_errors=True)
        ds = read_warc(shard).map_batches(extract, batch_format="pandas",
                                          batch_size=None)  # 1 block = 1 shard: dedup stays shard-exact
        ds.write_parquet(part_tmp)
        if not os.path.isdir(part_tmp) or not os.listdir(part_tmp):
            os.makedirs(part_tmp, exist_ok=True)
        shutil.rmtree(part, ignore_errors=True)
        os.replace(part_tmp, part)
        n = sum(1 for _ in glob.glob(os.path.join(part, "*.parquet")))
        rows = rd.read_parquet(part).count() if n else 0
        n_docs += rows
        man = {"shard": name, "n_docs": rows, "path": part}
        mpath = os.path.join(args.output, "_" + name + ".json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(man, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(mpath + ".tmp", mpath)

    print(json.dumps({
        "n_shards": len(shards), "n_processed": len(todo),
        "n_skipped": len(shards) - len(todo), "n_docs_extracted": n_docs,
        "job_wall_sec": round(time.perf_counter() - t0, 3),
        "output": args.output}))
    ray.shutdown()


if __name__ == "__main__":
    main()
