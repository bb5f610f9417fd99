"""URL canonicalization — the key-normalization step in front of any
web-crawl dedup (a page fetched as ``HTTPS://Site.com:443/a/../b?utm_
source=rss#top`` and as ``https://site.com/b`` is ONE document; crawl
frontiers, URL-keyed dedup and per-host quotas all need the canonical
form). RFC 3986 §6 normalizations (case, default port, dot-segments,
percent-encoding) plus the de-facto tracking-parameter strip every
production crawl pipeline applies.

Pure functions — used inside ``map_batches`` by the WARC-path queries.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# de-facto tracking params dropped by crawl canonicalizers: exact names
# plus any utm_* (Google Analytics / Urchin)
_TRACKING = frozenset({
    "fbclid", "gclid", "gclsrc", "dclid", "msclkid", "mc_eid", "mc_cid",
    "igshid", "yclid", "twclid", "_hsenc", "_hsmi", "mkt_tok",
    "oly_anon_id", "oly_enc_id", "s_kwcid", "spm", "ref_src", "ref_url",
})

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


def _norm_pct(s: str) -> str:
    """RFC 3986 §6.2.2.1-2: decode %-escapes of unreserved chars,
    uppercase the hex of the rest; a dangling/malformed escape passes
    through literally."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and i + 3 <= n:
            hx = s[i + 1:i + 3]
            try:
                ch = chr(int(hx, 16))
            except ValueError:
                out.append(c)
                i += 1
                continue
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 via the segment stack; preserves a trailing
    slash implied by a final ``.``/``..`` segment."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # re-anchor: absolute paths keep their leading ""
    if path.startswith("/") and (not out or out[0] != ""):
        out.insert(0, "")
    # a trailing "." / ".." SEGMENT means the path ends in a directory
    # (an ordinary segment that merely ends with a dot — "/wiki/Inc." —
    # must stay file-like)
    last = path.rstrip("/").rsplit("/", 1)[-1]
    if last in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def canonical_url(url: str) -> str:
    """Canonical form of an http(s)/ftp URL: lowercase scheme+host,
    default port stripped, dot-segments resolved, percent-encoding
    normalized, tracking params dropped, remaining query sorted by
    (key, value), fragment removed, empty path → ``/``. Non-URL input
    (no scheme/netloc) is returned percent-normalized but otherwise
    untouched — never raises."""
    try:
        sp = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    if not sp.scheme or not sp.netloc:
        return _norm_pct(url.strip())
    scheme = sp.scheme.lower()
    try:
        host = sp.hostname.lower() if sp.hostname else ""
        port = sp.port          # raises ValueError on ':notaport' etc.
    except ValueError:
        return _norm_pct(url.strip())
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if sp.username:
        cred = sp.username + (f":{sp.password}" if sp.password else "")
        netloc = f"{cred}@{netloc}"
    # %-normalize BEFORE dot-removal so %2E-encoded dot segments resolve
    path = _remove_dot_segments(_norm_pct(sp.path)) or "/"
    pairs = [(k, v) for k, v in parse_qsl(sp.query,
                                          keep_blank_values=True)
             if k not in _TRACKING and not k.startswith("utm_")]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))
