"""The composed corpus-CLEANING pipeline: the end-to-end pass a
web-scale training corpus takes before tokenization, built from the same
semantics as the individual query operators but REWRITING text at each
stage (the query ops report counters/fingerprints; this emits the
cleaned corpus):

    stage 1  PII redaction             (embarrassingly parallel rewrite)
    stage 1b hard screens              (C4 token blocklist + encoding damage)
    stage 2  boilerplate line removal  (corpus line-df + broadcast hot set)
    stage 3  duplicated-passage removal(canonical-occurrence, co-partition)
    stage 4  Gopher lexical filter + exact dedup (keep min doc_id)

Each stage WRITES partitioned parquet and records a manifest before the
next stage reads it — so a re-run resumes from the last completed stage
(same digest contract as state/lineage.py), intermediate data streams
through the object store but never lives on the driver, and every stage
boundary is also the natural audit point (counters in the manifest).
At 100 TB the stage directories are the recovery points a 256-node run
needs; at test scale they make the composition byte-inspectable.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import re
import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64, md5_hex
from .text_analysis import _PII_EMAIL_RE, _PII_IPV4_RE, _PII_PHONE_RE

_TRIM = " \t\r"


def _np(col) -> np.ndarray:
    """Numeric column of an Arrow batch → numpy (zero-copy when the
    chunk layout allows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _read(path: str) -> rd.Dataset:
    from ..state import fsio

    fs, p = fsio.resolve(path)
    return rd.read_parquet(p, filesystem=fs, columns=["doc_id", "text"])


def _stage_done(out_dir: str, stage: str) -> bool:
    from ..state import fsio

    return fsio.exists(fsio.join(out_dir, f"_{stage}.json"))


def _publish(ds: rd.Dataset, out_dir: str, stage: str, stats: dict,
             empty_schema=None) -> dict:
    """Write a stage atomically, then its manifest LAST (the commit
    point a resume checks — a crash between data and manifest reruns
    the stage). On a local filesystem the data dir additionally goes
    through tmp → rename; object stores have no directory rename, so
    there the manifest-last ordering carries the whole contract.
    ``out_dir`` may be a ``pyarrow.fs`` URI. ``empty_schema``: pyarrow
    schema used to land a typed empty parquet when the stage filtered
    everything out (write_parquet of an empty dataset creates nothing,
    but downstream stages must still read)."""
    import pyarrow as pa

    from ..state import fsio

    fs, opath = fsio.resolve(out_dir)
    local = fsio.is_local((fs, opath))
    final_uri = fsio.join(out_dir, f"stage_{stage}")
    schema = empty_schema or pa.schema([("doc_id", pa.int64()),
                                        ("text", pa.string())])
    if local:
        tmp = os.path.join(opath, f"_tmp_{stage}")
        final = os.path.join(opath, f"stage_{stage}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        ds.write_parquet(tmp)
        if not os.path.isdir(tmp) or not os.listdir(tmp):
            fsio.write_table((fs, f"{tmp}/empty.parquet"),
                             schema.empty_table())
        os.replace(tmp, final)
    else:
        final = f"{opath}/stage_{stage}"
        fsio.rmtree((fs, final))
        ds.write_parquet(final, filesystem=fs)
        if not fsio.list_files((fs, final), ".parquet"):
            fsio.write_table((fs, f"{final}/empty.parquet"),
                             schema.empty_table())
    stats = dict(stats, stage=stage, path=final_uri)
    # manifest LAST, atomically: a crash mid-dump must not leave a
    # truncated manifest that _stage_done would treat as complete
    fsio.write_json(fsio.join(out_dir, f"_{stage}.json"), stats)
    return stats


def _counter_sum(path: str, col: str) -> int:
    from ..state import fsio

    fs, p = fsio.resolve(path)
    ds = rd.read_parquet(p, filesystem=fs, columns=[col])
    return int(ds.sum(col) or 0)


def run_clean(input_dir: str, out_dir: str, *, boiler_max_df: int = 3,
              boiler_min_len: int = 5, passage_words: int = 10,
              n_buckets: int = 64) -> dict:
    """Run (or resume) the four-stage cleaning pipeline. Returns rollup
    metrics; the cleaned corpus lands in ``out_dir/stage_final``.
    ``out_dir`` may be a ``pyarrow.fs`` URI (shared storage)."""
    from ..state import fsio

    fsio.makedirs(out_dir)
    t0 = time.perf_counter()

    # ---- stage 1: PII redaction (same sequential order as pii_scrub)
    if not _stage_done(out_dir, "pii"):
        def redact(batch: pa.Table) -> pa.Table:
            out_t, n_hits = [], []
            for t in batch["text"].to_pylist():
                n = len(_PII_EMAIL_RE.findall(t))
                t = _PII_EMAIL_RE.sub("<EMAIL>", t)
                n += len(_PII_IPV4_RE.findall(t))
                t = _PII_IPV4_RE.sub("<IP>", t)
                n += len(_PII_PHONE_RE.findall(t))
                t = _PII_PHONE_RE.sub("<PHONE>", t)
                out_t.append(t)
                n_hits.append(n)
            return pa.table({"doc_id": batch["doc_id"],
                             "text": pa.array(out_t, type=pa.string()),
                             "n_pii": pa.array(n_hits, type=pa.int64())})

        docs = rd.read_parquet(
            os.path.join(input_dir, "documents.parquet"),
            columns=["doc_id", "text"])
        _publish(docs.map_batches(redact, batch_format="pyarrow"),
                 out_dir, "pii", {"n_in": docs.count()})

    pii_path = fsio.join(out_dir, "stage_pii")

    # ---- stage 1b: hard screens — C4 token blocklist + encoding
    # damage (U+FFFD / C0 controls / mojibake markers). A drop is a
    # whole-doc decision, so the stage is a pure streaming filter; the
    # per-cause counters come from a separate tiny combiner pass over
    # the same stage input (counters can't ride rows that are gone).
    if not _stage_done(out_dir, "screen"):
        from .text_analysis import BADWORDS

        bad = frozenset(BADWORDS)
        ctl_re = re.compile("[\x00-\x08\x0B\x0C\x0E-\x1F]")
        moji = ("Ã", "Â", "â€")

        def _screen_cause(t: str) -> int:
            """0 = clean, 1 = blocklist, 2 = encoding damage."""
            if any(w in bad for w in t.split()):
                return 1
            if (t.count("�") or ctl_re.search(t)
                    or any(m in t for m in moji)):
                return 2
            return 0

        def cause_partial(batch: pa.Table) -> pa.Table:
            cs = [_screen_cause(t) for t in batch["text"].to_pylist()]
            return pa.table({
                "k": pa.array([0], type=pa.int64()),
                "n_badwords": pa.array([sum(c == 1 for c in cs)],
                                       type=pa.int64()),
                "n_encoding": pa.array([sum(c == 2 for c in cs)],
                                       type=pa.int64())})

        from ..stages.agg import combine_partials as _cp

        causes = _cp(_read(pii_path).map_batches(cause_partial,
                                                 batch_format="pyarrow"),
                     ["k"], {"n_badwords": "sum", "n_encoding": "sum"}
                     ).to_pandas().iloc[0]

        def keep_clean(batch: pa.Table) -> pa.Table:
            m = pa.array([_screen_cause(t) == 0
                          for t in batch["text"].to_pylist()],
                         type=pa.bool_())  # empty list → null type,
            # and filter(null_mask) raises — the typed empty parquet
            # path makes 0-row batches a supported input here
            return batch.filter(m).select(["doc_id", "text"])

        _publish(_read(pii_path).map_batches(keep_clean,
                                             batch_format="pyarrow"),
                 out_dir, "screen",
                 {"n_badwords_dropped": int(causes["n_badwords"]),
                  "n_encoding_dropped": int(causes["n_encoding"])},
                 empty_schema=pa.schema([("doc_id", pa.int64()),
                                         ("text", pa.string())]))

    screen_path = fsio.join(out_dir, "stage_screen")

    # ---- stage 2: boilerplate line removal over the redacted text
    if not _stage_done(out_dir, "boiler"):
        from ..stages.agg import combine_partials

        def line_partials(batch: pa.Table) -> pa.Table:
            counts: dict[str, int] = {}
            for t in batch["text"].to_pylist():
                for ln in {l for l in t.split("\n")
                           if len(l.strip(_TRIM)) >= boiler_min_len}:
                    k = md5_hex(ln)
                    counts[k] = counts.get(k, 0) + 1
            return pa.table({
                "lkey": pa.array(list(counts.keys()), type=pa.string()),
                "df": pa.array(list(counts.values()), type=pa.int64())})

        dfs = combine_partials(
            _read(screen_path).map_batches(line_partials,
                                        batch_format="pyarrow"),
            ["lkey"], {"df": "sum"}, mode="bucket")
        hot = dfs.filter(expr=f"df >= {boiler_max_df}").to_pandas()
        hot_ref = ray.put(frozenset(hot["lkey"])
                          if "lkey" in hot.columns else frozenset())

        def scrub(batch: pa.Table) -> pa.Table:
            hotset = ray.get(hot_ref)
            texts, removed = [], []
            for t in batch["text"].to_pylist():
                lines = t.split("\n")
                kept = lines if not hotset else [
                    ln for ln in lines
                    if len(ln.strip(_TRIM)) < boiler_min_len
                    or md5_hex(ln) not in hotset]
                texts.append("\n".join(kept))
                removed.append(len(lines) - len(kept))
            return pa.table({
                "doc_id": batch["doc_id"],
                "text": pa.array(texts, type=pa.string()),
                "n_lines_removed": pa.array(removed, type=pa.int64())})

        _publish(_read(screen_path).map_batches(scrub,
                                                batch_format="pyarrow"),
                 out_dir, "boiler", {"n_hot_lines": len(hot)})

    boiler_path = fsio.join(out_dir, "stage_boiler")

    # ---- stage 3: duplicated-passage removal (canonical-occurrence rule,
    # drop rows co-partitioned with the docs — same shape as
    # dedup_passages, but emitting the REWRITTEN text)
    if not _stage_done(out_dir, "passage"):
        P = passage_words
        n_doc_buckets = max(1, n_buckets // 2)

        def explode(batch: pa.Table) -> pa.Table:
            rows = {"bucket": [], "h": [], "doc_id": [], "idx": []}
            for did, text in zip(batch["doc_id"].to_pylist(),
                                 batch["text"].to_pylist()):
                ws = text.split()
                for j in range(len(ws) // P):
                    h = md5_hex(" ".join(ws[j * P:(j + 1) * P]))
                    rows["bucket"].append(hash64(h) % n_buckets)
                    rows["h"].append(h)
                    rows["doc_id"].append(did)
                    rows["idx"].append(j)
            return pa.table({
                "bucket": pa.array(np.asarray(rows["bucket"],
                                              dtype=np.int32)),
                "h": pa.array(rows["h"], type=pa.string()),
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "idx": pa.array(rows["idx"], type=pa.int64())})

        def decide(g: pd.DataFrame) -> pa.Table:
            # Arrow out: unions with tag_docs' Arrow stream (Ray's sort
            # refuses mixed pandas/Arrow block streams)
            g = g.sort_values(["h", "doc_id", "idx"])
            out = g[g.duplicated("h", keep="first")]
            dids = out["doc_id"].to_numpy(np.int64)
            return pa.table({
                "dbucket": pa.array((dids % n_doc_buckets)
                                    .astype(np.int32)),
                "doc_id": pa.array(dids),
                "idx": pa.array(out["idx"].to_numpy(np.int64)),
                "text": pa.array([""] * len(dids), type=pa.string()),
                "is_doc": pa.array(np.zeros(len(dids), dtype=bool))})

        drops = (_read(boiler_path)
                 .map_batches(explode, batch_format="pyarrow")
                 .repartition(max(1, n_buckets // 4))
                 .groupby("bucket").map_groups(decide,
                                               batch_format="pandas"))

        def tag_docs(batch: pa.Table) -> pa.Table:
            dids = _np(batch["doc_id"]).astype(np.int64, copy=False)
            return pa.table({
                "dbucket": pa.array((dids % n_doc_buckets)
                                    .astype(np.int32)),
                "doc_id": pa.array(dids),
                "idx": pa.array(np.full(len(dids), -1, dtype=np.int64)),
                "text": batch["text"],
                "is_doc": pa.array(np.ones(len(dids), dtype=bool))})

        def rebuild(g: pd.DataFrame) -> pd.DataFrame:
            drop_by_doc: dict[int, set] = {}
            for did, j in zip(g.loc[~g["is_doc"], "doc_id"],
                              g.loc[~g["is_doc"], "idx"]):
                drop_by_doc.setdefault(did, set()).add(j)
            docs = g[g["is_doc"]]
            doc_ids, texts, removed = [], [], []
            for did, text in zip(docs["doc_id"], docs["text"]):
                ws = text.split()
                n = len(ws) // P
                dropped = drop_by_doc.get(did, set())
                words: list[str] = []
                for j in range(n):
                    if j not in dropped:
                        words.extend(ws[j * P:(j + 1) * P])
                words.extend(ws[n * P:])
                doc_ids.append(did)
                texts.append(" ".join(words))
                removed.append(len(dropped))
            return pd.DataFrame({
                "doc_id": pd.array(doc_ids, dtype="int64"),
                "text": texts,
                "n_passages_removed": pd.array(removed, dtype="int64")})

        tagged = _read(boiler_path).map_batches(tag_docs,
                                                batch_format="pyarrow")
        _publish(tagged.union(drops)
                 .repartition(max(1, n_doc_buckets // 4))
                 .groupby("dbucket").map_groups(rebuild,
                                                batch_format="pandas"),
                 out_dir, "passage", {})

    passage_path = fsio.join(out_dir, "stage_passage")

    # ---- stage 4: Gopher lexical filter, then exact dedup (keep the
    # minimum doc_id per surviving text — hash-bucketed, text as payload)
    # the Gopher rules live in ONE vectorized kernel
    # (functions/textstats.gopher_flag_arrays) shared by this screen,
    # the rollup below and text_analysis.gopher_filter, so they can't
    # drift
    from ..functions.textstats import gopher_flag_arrays

    if not _stage_done(out_dir, "final"):

        def gopher_keep(batch: pa.Table) -> pa.Table:
            flags, *_ = gopher_flag_arrays(batch["text"])
            return batch.filter(pa.array(flags.all(axis=1))) \
                .select(["doc_id", "text"])

        def dedup_partial(batch: pa.Table) -> pa.Table:
            mins: dict[str, int] = {}
            for t, d in zip(batch["text"].to_pylist(),
                            _np(batch["doc_id"]).tolist()):
                p = mins.get(t)
                if p is None or d < p:
                    mins[t] = d
            uniq = list(mins)
            h = [md5_hex(t) for t in uniq]
            return pa.table({
                "bucket": pa.array(np.fromiter(
                    (int(x[:8], 16) % n_buckets for x in h),
                    dtype=np.int32, count=len(h))),
                "h": pa.array(h, type=pa.string()),
                "text": pa.array(uniq, type=pa.string()),
                "doc_id": pa.array([mins[t] for t in uniq],
                                   type=pa.int64())})

        def dedup_merge(g: pd.DataFrame) -> pd.DataFrame:
            m = (g.groupby("h", sort=False)
                 .agg(text=("text", "first"), doc_id=("doc_id", "min")))
            return m.reset_index(drop=True)[["doc_id", "text"]]

        cleaned = (_read(passage_path)
                   .map_batches(gopher_keep, batch_format="pyarrow")
                   .map_batches(dedup_partial, batch_format="pyarrow")
                   .repartition(max(1, n_buckets // 4))
                   .groupby("bucket").map_groups(dedup_merge,
                                                 batch_format="pandas"))
        _publish(cleaned, out_dir, "final", {})

    final_path = fsio.join(out_dir, "stage_final")

    # per-rule Gopher attribution over the stage-3 text, so an
    # unexpected n_out (e.g. 0 on a stopword-free synthetic corpus,
    # where the published ns>=2 rule legitimately drops every doc) is
    # self-explanatory from the rollup alone
    from ..stages.agg import combine_partials

    def flag_partials(batch: pa.Table) -> pa.Table:
        flags, *_ = gopher_flag_arrays(batch["text"])
        s = flags.sum(axis=0)
        return pa.table({
            "k": pa.array([0], type=pa.int64()),
            "pass_len": pa.array([int(s[0])], type=pa.int64()),
            "pass_meanlen": pa.array([int(s[1])], type=pa.int64()),
            "pass_alpha": pa.array([int(s[2])], type=pa.int64()),
            "pass_stop": pa.array([int(s[3])], type=pa.int64())})

    flags = combine_partials(
        _read(passage_path).map_batches(flag_partials,
                                        batch_format="pyarrow"),
        ["k"], {c: "sum" for c in ("pass_len", "pass_meanlen",
                                   "pass_alpha", "pass_stop")}
    ).to_pandas().iloc[0]

    metrics = {
        "n_in": fsio.read_json(fsio.join(out_dir, "_pii.json"))["n_in"],
        "n_pii_redactions": _counter_sum(pii_path, "n_pii"),
        "n_badwords_dropped": fsio.read_json(
            fsio.join(out_dir, "_screen.json"))["n_badwords_dropped"],
        "n_encoding_dropped": fsio.read_json(
            fsio.join(out_dir, "_screen.json"))["n_encoding_dropped"],
        "n_lines_removed": _counter_sum(boiler_path, "n_lines_removed"),
        "n_passages_removed": _counter_sum(passage_path,
                                           "n_passages_removed"),
        "gopher_pass_len": int(flags["pass_len"]),
        "gopher_pass_meanlen": int(flags["pass_meanlen"]),
        "gopher_pass_alpha": int(flags["pass_alpha"]),
        "gopher_pass_stop": int(flags["pass_stop"]),
        "n_out": _read(final_path).count(),
        "output": final_path,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    fsio.write_json(fsio.join(out_dir, "_rollup.json"), metrics)
    return metrics
