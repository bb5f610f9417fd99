"""Perceptual-hash (dHash) image dedup: cross-format exact pairs, lossy
re-encode within the hamming bound, poison containment."""

import base64

import numpy as np
import pyarrow as pa

from ragflow_core16_ray.functions.gif import encode_gif
from ragflow_core16_ray.functions.jpeg import encode_jpeg
from ragflow_core16_ray.functions.png import encode_png
from ragflow_core16_ray.pipelines.multimodal import dhash64
from ragflow_core16_ray.schemas import DOCUMENTS_SCHEMA, make_span


def _gradient(h=64, w=96):
    r = np.linspace(0, 255, h)[:, None]
    c = np.linspace(0, 255, w)[None, :]
    return np.clip(0.6 * r + 0.4 * c, 0, 255).astype(np.uint8)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def test_dhash64_deterministic_and_structure_sensitive():
    img = _gradient()
    h1 = dhash64(img)
    assert h1 == dhash64(img.copy())
    # left-to-right brightening gradient: every right neighbor is
    # brighter, so all 64 difference bits are 0 … flipping the image
    # flips every bit
    assert dhash64(img[:, ::-1]) == h1 ^ 0xFFFFFFFFFFFFFFFF
    # RGB of the same grayscale content hashes identically
    assert dhash64(np.stack([img] * 3, axis=2)) == h1


def test_dhash64_survives_lossy_jpeg():
    from ragflow_core16_ray.functions.image_ops import decode_image

    # structured but non-trivial image: gradient + blocks
    img = _gradient()
    img[16:32, 24:48] = 30
    img[40:56, 60:90] = 220
    jj = decode_image(encode_jpeg(img, quality=88))
    d = bin(dhash64(img) ^ dhash64(jj)).count("1")
    assert d <= 6


def test_image_dhash_dups_pipeline(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import image_dhash_dups

    img = _gradient()
    img[16:32, 24:48] = 30
    img[40:56, 60:90] = 220
    other = img[::-1, ::-1].copy()  # flipped: far in hamming

    rows = [
        {"doc_id": "d1", "spans": [
            make_span("image", _b64(encode_png(img)), "media://d1/p0")]},
        {"doc_id": "d2", "spans": [
            make_span("image", _b64(encode_gif(img)), "media://d2/p0")]},
        {"doc_id": "d3", "spans": [
            make_span("image", _b64(encode_jpeg(img, quality=88)),
                      "media://d3/p0")]},
        {"doc_id": "d4", "spans": [
            make_span("image", _b64(encode_png(other)), "media://d4/p0")]},
        {"doc_id": "d5", "spans": [
            make_span("image", _b64(b"not an image"), "media://d5/p0")]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    pairs = image_dhash_dups(ds, max_hamming=6)
    got = {(a, b): h for a, b, h in
           zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"])}
    # PNG and its GIF re-palette are pixel-identical -> hamming 0
    assert got[("d1", "d2")] == 0
    # the JPEG re-encode pairs with both lossless twins within the bound
    assert got[("d1", "d3")] <= 6 and got[("d2", "d3")] <= 6
    # the flipped image pairs with nothing; the poison row pairs with
    # nothing and kills nothing
    assert not any("d4" in p or "d5" in p for p in got)


def test_image_dhash_dups_empty_and_no_images(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import image_dhash_dups

    rows = [{"doc_id": "t1", "spans": [make_span("text", "no media here")]}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    pairs = image_dhash_dups(ds)
    assert len(pairs) == 0
    assert list(pairs.columns) == ["doc_a", "ref_a", "doc_b", "ref_b",
                                   "hamming"]


def test_frame_motion_stats_hand_built(ray_session):
    """Exact motion on hand-built animations: a constant-step fade has
    motion == the step; a static 2-frame clip has motion 0; a single
    frame reports 0; poison reports the sentinel."""
    import ray.data as rd

    from ragflow_core16_ray.functions.png import encode_apng, encode_png
    from ragflow_core16_ray.pipelines.multimodal import frame_motion_stats

    base = np.full((8, 8), 100, dtype=np.uint8)
    fade = [base, base + 10, base + 20]           # |Δ| = 10 per transition
    static = [base, base]
    rows = [
        {"doc_id": "m1", "spans": [make_span(
            "image", _b64(encode_apng(fade, delay_ms=40)),
            "media://m1/v")]},
        {"doc_id": "m2", "spans": [make_span(
            "image", _b64(encode_apng(static, delay_ms=50)),
            "media://m2/v")]},
        {"doc_id": "m3", "spans": [make_span(
            "image", _b64(encode_png(base)), "media://m3/p")]},
        {"doc_id": "m4", "spans": [make_span(
            "image", _b64(b"garbage"), "media://m4/x")]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    got = (frame_motion_stats(ds).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc["m1"].tolist() == ["media://m1/v", 3, 120, 10_000_000]
    assert got.loc["m2"].tolist() == ["media://m2/v", 2, 100, 0]
    assert got.loc["m3", "n_frames"] == 1 and got.loc["m3", "motion_q"] == 0
    assert got.loc["m4", "n_frames"] == -1


def test_extract_links_and_link_graph(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.functions.html_extract import extract_links
    from ragflow_core16_ray.pipelines.multimodal import link_graph

    html = ('<nav><a href="/home">Home</a> <a href=\'/about\'>About '
            '<b>Us</b></a></nav><p>body text with '
            '<a href=/rel>a bare-attr link</a></p>')
    assert extract_links(html) == [
        ("/home", "Home"), ("/about", "About Us"),
        ("/rel", "a bare-attr link")]
    assert extract_links("no links here") == []

    rows = [
        {"doc_id": "h1", "spans": [make_span("html", html)]},
        {"doc_id": "h2", "spans": [make_span(
            "html", '<a href="/home">Home</a><a href="/home">Home</a>')]},
        {"doc_id": "t1", "spans": [make_span("text", "plain doc")]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    got = link_graph(ds).set_index("href")
    # totals row: 2 html docs, 5 anchor hits in all
    assert got.loc["", "n_docs"] == 2 and got.loc["", "n_hits"] == 5
    # /home linked from both docs, 3 total occurrences
    assert got.loc["/home", "n_docs"] == 2
    assert got.loc["/home", "n_hits"] == 3
    assert got.loc["/about", "n_docs"] == 1


def test_link_hits_replica(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import link_hits

    # d1 links to a,b ; d2 links to a ; d3 links to c
    rows = [
        {"doc_id": "d1", "spans": [make_span(
            "html", '<a href="/a">A</a><a href="/b">B</a>')]},
        {"doc_id": "d2", "spans": [make_span("html", '<a href="/a">A</a>')]},
        {"doc_id": "d3", "spans": [make_span("html", '<a href="/c">C</a>')]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    got = link_hits(ds)
    # replica: indeg a=2 b=1 c=1; hub d1=3 d2=2 d3=1;
    # auth2 a=5 b=3 c=1
    assert list(zip(got["href"], got["auth2"], got["indeg"])) == [
        ("/a", 5, 2), ("/b", 3, 1), ("/c", 1, 1)]


def test_image_dup_verified_pairs(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.functions.gif import encode_gif
    from ragflow_core16_ray.functions.jpeg import encode_jpeg
    from ragflow_core16_ray.functions.png import encode_png
    from ragflow_core16_ray.pipelines.multimodal import (
        image_dup_verified_pairs)

    img = _gradient()
    img[16:32, 24:48] = 30
    img[40:56, 60:90] = 220
    rows = [
        {"doc_id": "d1", "spans": [
            make_span("image", _b64(encode_png(img)), "media://d1/p")]},
        {"doc_id": "d2", "spans": [
            make_span("image", _b64(encode_gif(img)), "media://d2/p")]},
        {"doc_id": "d3", "spans": [
            make_span("image", _b64(encode_jpeg(img, quality=88)),
                      "media://d3/p")]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    got = image_dup_verified_pairs(ds)
    by = {(a, b): (e, m) for a, b, e, m in
          zip(got["doc_a"], got["doc_b"], got["exact"], got["mae_q"])}
    # PNG↔GIF decode to identical pixels: exact dup, MAE 0
    assert by[("d1", "d2")] == (1, 0)
    # the JPEG re-encode is a verified NEAR dup: not exact, small MAE
    e13, m13 = by[("d1", "d3")]
    assert e13 == 0 and 0 < m13 <= 8_000_000


def test_anchor_text_index_hand(ray_session):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.multimodal import anchor_text_index

    rows = [
        {"doc_id": "h1", "spans": [make_span(
            "html", '<a href="/a">ray data engine</a>'
                    '<a href="/b">home</a>')]},
        {"doc_id": "h2", "spans": [make_span(
            "html", '<a href="/a">ray engine docs</a>'
                    '<a href="/b">home</a>')]},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA))
    got = anchor_text_index(ds, k=5, top_words=2)
    by = {(r.href, r.word): r.n for r in got.itertuples()}
    # /a anchors: ray x2, engine x2, data 1, docs 1 -> top-2 = engine,
    # ray (tie 2-2 broken lexically)
    a_rows = [(r.word, r.n) for r in got.itertuples() if r.href == "/a"]
    assert a_rows == [("engine", 2), ("ray", 2)]
    assert by[("/b", "home")] == 2
