"""URL canonicalization (functions/url.py) — the key-normalization in
front of web-crawl dedup — and the messy-URL WARC writer that feeds
the warc_url_dedup proof."""

import hashlib

import pytest

from ragflow_core16_ray.functions.url import canonical_url


@pytest.mark.parametrize("raw,want", [
    # RFC 3986 §6: case + default port
    ("HTTPS://GRAFT.EXAMPLE:443/web/123", "https://graft.example/web/123"),
    ("http://Host.com:80/a", "http://host.com/a"),
    ("http://host.com:8080/a", "http://host.com:8080/a"),
    # dot segments, incl. trailing-directory forms
    ("https://x.com/a/b/../c/./d", "https://x.com/a/c/d"),
    ("https://x.com/a/..", "https://x.com/"),
    ("https://x.com/a/b/.", "https://x.com/a/b/"),
    # fragment dropped; empty path → /
    ("https://x.com#top", "https://x.com/"),
    # tracking params dropped (exact + utm_*), remainder sorted
    ("https://x.com/p?b=2&utm_source=rss&a=1&fbclid=z&gclid=1",
     "https://x.com/p?a=1&b=2"),
    # blank values survive; value order inside one key is stable
    ("https://x.com/p?k=&k=2", "https://x.com/p?k=&k=2"),
    # percent-encoding: unreserved decodes, reserved stays uppercase-hex
    ("https://x.com/%7Euser/%41%2f", "https://x.com/~user/A%2F"),
    # userinfo and non-default port preserved
    ("https://u:p@X.com:8080/q?gclid=1&z=9", "https://u:p@x.com:8080/q?z=9"),
    # non-URL input passes through, never raises
    ("not a url", "not a url"),
    ("", ""),
])
def test_canonical_url(raw, want):
    assert canonical_url(raw) == want


def test_canonical_url_idempotent():
    urls = ["HTTPS://A.B:443/x/../y?utm_a=1&q=2#f",
            "http://h/%7e%41", "ftp://H.COM:21/f"]
    for u in urls:
        c = canonical_url(u)
        assert canonical_url(c) == c


def test_messy_variants_all_canonicalize_to_one(tmp_path):
    from ragflow_core16_ray.sources.warc import _messy_uri

    want = "https://graft.example/web/1234"
    got = {canonical_url(_messy_uri("web", 1234, v)) for v in range(4)}
    assert got == {want}


def test_messy_warc_roundtrip_counts(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from ragflow_core16_ray.sources.warc import (read_warc,
                                                 write_documents_warc)

    docs = pd.DataFrame({
        "doc_id": pd.array(range(40), dtype="int64"),
        "text": [f"doc {i} body text" for i in range(40)],
        "lang": ["en"] * 40,
        "source": ["web"] * 40,
    })
    out = str(tmp_path / "warc")
    write_documents_warc(rd.from_pandas(docs), out, n_files=3,
                         messy_urls=True)
    rows = read_warc(out).to_pandas()
    rows = rows[(rows.warc_type == "response") & (rows.http_status == 200)]
    per_doc = (pd.DataFrame({
        "doc_id": rows["doc_id"].astype("int64"),
        "canon": [canonical_url(u) for u in rows["target_uri"]]})
        .groupby(["doc_id", "canon"]).size())
    # one canonical URL per doc; fetch count replays the md5 rule
    assert per_doc.index.get_level_values("canon").nunique() == 40
    for (did, canon), n in per_doc.items():
        assert canon == f"https://graft.example/web/{did}"
        h = hashlib.md5(str(did).encode()).hexdigest()
        assert n == (2 if h[0] < "4" else 1)


def test_titleless_page_keeps_full_sentence_paragraph():
    # regression: a titleless page whose only block is a full sentence
    # must not lose it to title promotion
    from ragflow_core16_ray.functions.html_extract import extract_html

    d = extract_html("<html><body><p>A full sentence paragraph that "
                     "should stay in the content body.</p></body></html>")
    assert d.sections == ["A full sentence paragraph that should stay "
                          "in the content body."]
    d2 = extract_html("<html><body><p>Short Heading</p>"
                      "<p>body text follows here.</p></body></html>")
    assert d2.title == "Short Heading"
    assert d2.sections == ["body text follows here."]


def test_html_tables_assemble_rowwise():
    from ragflow_core16_ray.functions.html_extract import extract_html

    h = ("<html><title>T</title><body>"
         "<p>Intro paragraph with enough words to score.</p>"
         "<table><tr><th>Year</th><th>Revenue</th></tr>"
         "<tr><td>2024</td><td>1,000</td></tr></table>"
         "<p>Closing paragraph also with plenty of words.</p>"
         "</body></html>")
    assert extract_html(h).sections == [
        "Intro paragraph with enough words to score.",
        "Year | Revenue", "2024 | 1,000",
        "Closing paragraph also with plenty of words."]
    # real-world rows often omit </tr>
    h2 = ("<html><title>T</title><body><table>"
          "<tr><td>a</td><td>b</td><tr><td>c</td><td>d</td>"
          "</table></body></html>")
    assert extract_html(h2).sections == ["a | b", "c | d"]


def test_warc_crawl_delta_statuses(ray_session):
    # integration over sf0.001: statuses replay the crawl-2 writer's md5
    # rules exactly and cover all three classes
    import hashlib

    import __ray_entry__ as e

    df = e.queries()["warc_crawl_delta"]("/root/testdata/sf0.001") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(df["status"].unique()) == {"changed", "unchanged",
                                          "removed"}
    for did, status in zip(df["doc_id"], df["status"]):
        h = hashlib.md5(str(int(did)).encode()).hexdigest()
        want = ("removed" if h[3] < "2"
                else "changed" if h[2] < "8" else "unchanged")
        assert status == want


def test_canonical_url_reviewer_regressions():
    # malformed ports never raise; ordinary dot-ending segments stay
    # file-like; %2E-encoded dot segments resolve (all reviewer-found)
    assert canonical_url("https://example.com:notaport/a") \
        == "https://example.com:notaport/a"
    assert canonical_url("https://h:99999/x") == "https://h:99999/x"
    assert canonical_url("https://x.com/wiki/Inc.") \
        == "https://x.com/wiki/Inc."
    assert canonical_url("https://x.com/a/%2e%2e/b") == "https://x.com/b"


def test_unclosed_table_does_not_swallow_document():
    # reviewer-found: missing </table> previously routed ALL later
    # content into row_cells forever
    from ragflow_core16_ray.functions.html_extract import extract_html

    h = ("<html><title>T</title><body><p>Intro paragraph here.</p>"
         "<table><tr><td>a</td><td>b</td>"
         "<p>Closing paragraph with words.</p></body></html>")
    joined = " ".join(extract_html(h).sections)
    assert "Intro paragraph here." in joined
    assert "Closing paragraph with words." in joined
    assert "a | b" in joined
    # a div opened INSIDE a cell closing must NOT end the table
    h2 = ("<html><title>T</title><body><table>"
          "<tr><td><div>x</div></td><td>y</td></tr>"
          "<tr><td>z</td><td>w</td></tr></table>"
          "<p>after paragraph words.</p></body></html>")
    assert extract_html(h2).sections == ["x | y", "z | w",
                                         "after paragraph words."]
