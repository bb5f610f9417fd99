"""WARC (ISO 28500) source/sink: lossless round-trip through the Common
Crawl per-record-gzip-member layout, record parsing (HTTP response
unwrap, request skip, extension headers), poison safety (one corrupt
record = one sentinel row, the shard survives), writer determinism, and
main-content recovery through the boilerplate wrap. The driver-level
proof (warc_token_counts hash-matching the parquet oracle) lives in
tools/check_oracle.py."""

import gzip
import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ragflow_core16_ray.sources.warc import (_parse_records, build_warc_gz,
                                             read_warc, warc_to_documents,
                                             wrap_boilerplate,
                                             write_documents_warc)

TRICKY_TEXTS = [
    "plain ascii words",
    "中文文本 with mixed スクリプト",
    'quotes "inside" and \\backslashes\\',
    "tab\tand newline\nand return\rinside",
    "emoji 🙂 and combining é",
    "",
    "trailing spaces   ",
]


def _docs_df():
    return pd.DataFrame({
        "doc_id": pd.array(range(len(TRICKY_TEXTS)), dtype="int64"),
        "text": TRICKY_TEXTS,
        "lang": ["en"] * len(TRICKY_TEXTS),
        "source": [f"s{i % 2}" for i in range(len(TRICKY_TEXTS))],
        "n_chars": pd.array([len(t) for t in TRICKY_TEXTS], dtype="int64"),
    })


def _write(tmp_path, name="warc", **kw):
    import ray.data as rd

    src = str(tmp_path / "documents.parquet")
    if not os.path.exists(src):
        pq.write_table(pa.Table.from_pandas(_docs_df(),
                                            preserve_index=False), src)
    out = str(tmp_path / name)
    man = write_documents_warc(rd.read_parquet(src), out, n_files=3, **kw)
    return out, man


def test_warc_roundtrip_lossless(ray_session, tmp_path):
    out, man = _write(tmp_path)
    back = (warc_to_documents(read_warc(out)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want = _docs_df()
    # n_chars is recomputed from the round-tripped text — must agree
    pd.testing.assert_frame_equal(back, want)
    assert int(man["n_rows"].sum()) == len(TRICKY_TEXTS)
    assert all(p.endswith(".warc.gz") for p in man["path"])


def test_warc_writer_deterministic(ray_session, tmp_path):
    out1, man1 = _write(tmp_path, "w1")
    out2, man2 = _write(tmp_path, "w2")
    for p1, p2 in zip(sorted(man1["path"]), sorted(man2["path"])):
        d1 = hashlib.md5(open(p1, "rb").read()).hexdigest()
        d2 = hashlib.md5(open(p2, "rb").read()).hexdigest()
        assert d1 == d2


def test_warc_record_fields_and_request_skip(ray_session, tmp_path):
    path = str(tmp_path / "mix.warc.gz")
    build_warc_gz([
        {"uri": "https://a.example/x", "payload": b"<p>hello</p>",
         "mime": "text/html; charset=utf-8"},
        {"uri": "https://a.example/x", "payload": b"GET /x HTTP/1.1",
         "warc_type": "request", "mime": "text/plain"},
        {"uri": "https://a.example/404", "payload": b"gone",
         "status": 404, "mime": "text/plain"},
    ], path)
    df = read_warc(path).to_pandas().sort_values("rec_idx")
    assert list(df["warc_type"]) == ["response", "request", "response"]
    assert df.iloc[0]["http_status"] == 200
    assert df.iloc[0]["mime"].startswith("text/html")
    assert df.iloc[0]["body"] == b"<p>hello</p>"
    assert df.iloc[0]["target_uri"] == "https://a.example/x"
    assert df.iloc[2]["http_status"] == 404


def test_warc_extension_headers_survive(ray_session, tmp_path):
    path = str(tmp_path / "ext.warc.gz")
    build_warc_gz([{"uri": "https://g/1", "payload": b"t",
                    "mime": "text/plain",
                    "extra": [("WARC-Graft-Doc-Id", "7"),
                              ("WARC-Graft-Lang", "ko")]}], path)
    df = read_warc(path).to_pandas()
    assert df.iloc[0]["doc_id"] == "7"
    assert df.iloc[0]["lang"] == "ko"


def test_warc_poison_one_sentinel_per_corrupt_record():
    good = ("WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://g/ok\r\n"
            "Content-Type: text/plain\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
    garbage = "NOT A RECORD AT ALL\r\n\r\n"
    data = (good + garbage + good.replace("/ok", "/o2")).encode()
    rows = _parse_records(data, "p")
    types = [r["warc_type"] for r in rows]
    assert types == ["response", "corrupt", "response"]
    assert rows[2]["target_uri"] == "https://g/o2"
    # truncated header at EOF → sentinel, no crash
    rows2 = _parse_records(b"WARC/1.0\r\nWARC-Type: resp", "p")
    assert [r["warc_type"] for r in rows2] == ["corrupt"]
    # bad content-length → sentinel
    bad = good.replace("Content-Length: 2", "Content-Length: x")
    rows3 = _parse_records(bad.encode(), "p")
    assert rows3[0]["warc_type"] == "corrupt"


def test_warc_multimember_gzip_stream(tmp_path):
    # two records as separate gzip members in one file — the Common
    # Crawl layout; gzip.decompress must yield both
    path = str(tmp_path / "mm.warc.gz")
    build_warc_gz([{"uri": "https://g/1", "payload": b"a",
                    "mime": "text/plain"},
                   {"uri": "https://g/2", "payload": b"b",
                    "mime": "text/plain"}], path)
    raw = open(path, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 2       # two members
    rows = _parse_records(gzip.decompress(raw), path)
    assert [r["body"] for r in rows] == [b"a", b"b"]


def test_boilerplate_wrap_roundtrips_main_content():
    from ragflow_core16_ray.functions.html_extract import extract_html

    paras = ["First paragraph with several plain words here.",
             "Second paragraph also has enough words to keep density up."]
    html = wrap_boilerplate("\n\n".join(paras), 5)
    doc = extract_html(html)
    assert doc.sections == paras          # chrome fully stripped
    assert "nav" not in " ".join(doc.sections)
    assert doc.title == "doc 5"


def test_warc_html_mode_bodies_are_wrapped(ray_session, tmp_path):
    out, _ = _write(tmp_path, "html", as_html=True)
    df = read_warc(out).to_pandas()
    body = df.iloc[0]["body"].decode("utf-8")
    assert body.startswith("<html>") and "footer" in body
    assert df.iloc[0]["mime"].startswith("text/html")


def test_warc_job_driver_end_to_end_and_resume(tmp_path):
    import json as _json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src = str(tmp_path / "sf")
    os.makedirs(src, exist_ok=True)
    import pyarrow as pa_
    pq.write_table(pa_.Table.from_pandas(_docs_df(),
                                         preserve_index=False),
                   os.path.join(src, "documents.parquet"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "tools", "warc_job.py"),
           "--synth", src, "--input", str(tmp_path / "warc"),
           "--output", str(tmp_path / "out"), "--num-cpus", "4"]
    env = dict(os.environ, RAY_ADDRESS="")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    m1 = _json.loads(r1.stdout.strip().splitlines()[-1])
    assert m1["n_processed"] > 0 and m1["n_skipped"] == 0
    # the html-wrapped docs extract back to their paragraph text
    import glob as _glob
    parts = _glob.glob(str(tmp_path / "out" / "part_*" / "*.parquet"))
    df = pq.read_table(parts[0]).to_pandas()
    assert {"target_uri", "text", "n_sections",
            "content_hash"} <= set(df.columns)
    # resume: second run skips every shard
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    m2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert m2["n_processed"] == 0
    assert m2["n_skipped"] == m1["n_processed"]


def test_warc_euckr_body_decodes_via_charset(ray_session, tmp_path):
    # a real-crawl charset: EUC-KR declared in Content-Type; the reader
    # must honor it instead of mojibaking as utf-8/latin-1
    import ray.data as rd

    from ragflow_core16_ray.sources.warc import (build_warc_gz, read_warc,
                                                 warc_to_documents)

    text = "한국어 본문입니다. 두 번째 문장."
    path = str(tmp_path / "kr.warc.gz")
    build_warc_gz([{
        "uri": "https://graft.example/web/77",
        "payload": text.encode("euc-kr"),
        "mime": "text/plain; charset=euc-kr",
        "extra": [("WARC-Graft-Doc-Id", "77"),
                  ("WARC-Graft-Lang", "zh"),
                  ("WARC-Graft-Source", "web")],
    }], path)
    docs = warc_to_documents(read_warc(path)).to_pandas()
    assert docs.loc[0, "text"] == text


def test_decode_http_body_priority_and_fallback():
    from ragflow_core16_ray.functions.codec import decode_http_body

    kr = "가나다".encode("euc-kr")
    # header charset wins
    assert decode_http_body(kr, "text/html; charset=euc-kr") == "가나다"
    # meta prescan when the header is silent
    html = b'<meta charset="euc-kr">' + kr
    assert decode_http_body(html, "text/html").endswith("가나다")
    # a declared-but-wrong charset falls through to the trial cascade
    assert decode_http_body("ü".encode(), "text/plain; charset=nope") == "ü"
