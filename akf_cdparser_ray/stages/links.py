"""URL canonicalization, hashing, link extraction (crawl-loop stages).

All scalar kernels here run vectorized-per-batch inside ``map_batches``;
``url_hash64`` is the single partitioning key reused across dedupe, frontier
sharding and checkpoint layout (one key, no re-partitioning between stages).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit, unquote

import numpy as np
import pyarrow as pa

_HREF_RE = re.compile(r"""<a\s[^>]*href=["']([^"'#]+)""", re.IGNORECASE)
_IMG_RE = re.compile(r"""<img\s[^>]*src=["']([^"']+)""", re.IGNORECASE)


def canonicalize_url(url: str) -> str:
    """Lowercase scheme/host, drop default port & fragment, decode %7E,
    sort query params, strip trailing slash (non-root)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = (parts.scheme or "http").lower()
    netloc = parts.netloc.lower()
    if netloc.endswith(":80") and scheme == "http":
        netloc = netloc[:-3]
    if netloc.endswith(":443") and scheme == "https":
        netloc = netloc[:-4]
    path = unquote(parts.path or "/", errors="strict") if "%7E" in parts.path or "%7e" in parts.path else (parts.path or "/")
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/")
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


_SIMPLE_URL_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#%\s]+(/[^?#%\s]*)?$")


def canonicalize_urls(urls) -> list[str]:
    """Vectorized batch canonicalization, byte-equivalent to
    ``canonicalize_url`` row-for-row (tests assert it on mixed corpora).

    Fast path: URLs with no query/fragment/percent-escape/whitespace —
    the overwhelming majority of crawl links — run entirely through
    pyarrow compute kernels (lowercase scheme+host, default-port drop,
    trailing-slash strip). Anything else falls back to the exact per-row
    function. ~20x faster than the row loop on link-shaped input."""
    import pyarrow.compute as pc

    arr = pc.utf8_trim_whitespace(pa.array(list(urls), pa.string()))
    simple = pc.match_substring_regex(arr, _SIMPLE_URL_RE.pattern)
    ex = pc.extract_regex(arr, r"^(?P<s>[^:]+)://(?P<n>[^/]+)(?P<p>/.*)?$")
    scheme = pc.utf8_lower(pc.struct_field(ex, "s"))
    netloc = pc.utf8_lower(pc.struct_field(ex, "n"))
    path = pc.fill_null(pc.struct_field(ex, "p"), "/")
    path = pc.if_else(pc.equal(path, ""), "/", path)  # RE2 empty optional group
    netloc = pc.if_else(
        pc.and_(pc.equal(scheme, "http"), pc.ends_with(netloc, ":80")),
        pc.replace_substring_regex(netloc, r":80$", ""), netloc)
    netloc = pc.if_else(
        pc.and_(pc.equal(scheme, "https"), pc.ends_with(netloc, ":443")),
        pc.replace_substring_regex(netloc, r":443$", ""), netloc)
    # "/" stays; any other path drops ALL trailing slashes (may become "")
    path = pc.if_else(pc.equal(path, "/"), path,
                      pc.replace_substring_regex(path, r"/+$", ""))
    fast = pc.binary_join_element_wise(scheme, "://", netloc, path, "")
    simple_np = simple.to_numpy(zero_copy_only=False)
    if bool(simple_np.all()):
        return fast.to_pylist()
    out = fast.to_pylist()
    raw = arr.to_pylist()
    for i in np.flatnonzero(~simple_np):
        out[i] = canonicalize_url(raw[i])
    return out


def url_hash64(url: str) -> int:
    """Stable unsigned-64 hash (blake2b/8) of the canonical URL."""
    return int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "little")


def host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def hosts_of(urls) -> list[str]:
    """Vectorized ``host_of`` (pyarrow kernels, per-row fallback for URLs
    without a ``scheme://`` prefix — tests assert row-for-row equality)."""
    import pyarrow.compute as pc

    arr = pa.array(list(urls), pa.string())
    ex = pc.extract_regex(arr, r"^[^:/?#]+://(?P<n>[^/?#]*)")
    netloc = pc.struct_field(ex, "n")
    out = pc.utf8_lower(pc.fill_null(netloc, "")).to_pylist()
    missing = pc.is_null(netloc).to_numpy(zero_copy_only=False)
    if missing.any():
        raw = arr.to_pylist()
        for i in np.flatnonzero(missing):
            out[i] = host_of(raw[i])
    return out


def extract_links(html: str, base_url: str) -> list[str]:
    """href links resolved against the base (scheme+host of the page)."""
    try:
        base = urlsplit(base_url)
    except ValueError:
        return []
    out = []
    for href in _HREF_RE.findall(html):
        if href.startswith("http://") or href.startswith("https://"):
            out.append(href)
        elif href.startswith("/"):
            out.append(f"{base.scheme}://{base.netloc}{href}")
        else:
            parent = base.path.rsplit("/", 1)[0]
            out.append(f"{base.scheme}://{base.netloc}{parent}/{href}")
    return out


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """Batch stage (stateless task): html rows → candidate link rows
    (flat_map semantics via per-batch explode)."""
    return ExtractLinks()(batch)


class ExtractLinks:
    """Batch stage: html rows → (url_canon, url_hash, host, depth)
    candidate rows (flat_map semantics via per-batch explode)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        urls = batch.column("url").to_pylist()
        depths = (
            batch.column("depth").to_pylist()
            if "depth" in batch.schema.names
            else [0] * len(urls)
        )
        raw_links: list[str] = []
        out_depth: list[int] = []
        for html, url, depth in zip(htmls, urls, depths):
            if not html:
                continue
            links = extract_links(html, url)
            raw_links.extend(links)
            out_depth.extend([depth + 1] * len(links))
        out_canon = canonicalize_urls(raw_links) if raw_links else []
        out_host = hosts_of(out_canon) if raw_links else []
        out_hash = [url_hash64(c) for c in out_canon]
        return pa.table(
            {
                "url_canon": pa.array(out_canon, pa.string()),
                "url_hash": pa.array(np.array(out_hash, dtype=np.uint64)),
                "host": pa.array(out_host, pa.string()),
                "depth": pa.array(out_depth, pa.int32()),
            }
        )
