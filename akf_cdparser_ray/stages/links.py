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


def url_hash64(url: str) -> int:
    """Stable unsigned-64 hash (blake2b/8) of the canonical URL."""
    return int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "little")


def host_of(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


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
        out_canon: list[str] = []
        out_hash: list[int] = []
        out_host: list[str] = []
        out_depth: list[int] = []
        for html, url, depth in zip(htmls, urls, depths):
            if not html:
                continue
            for link in extract_links(html, url):
                canon = canonicalize_url(link)
                out_canon.append(canon)
                out_hash.append(url_hash64(canon))
                out_host.append(host_of(canon))
                out_depth.append(depth + 1)
        return pa.table(
            {
                "url_canon": pa.array(out_canon, pa.string()),
                "url_hash": pa.array(np.array(out_hash, dtype=np.uint64)),
                "host": pa.array(out_host, pa.string()),
                "depth": pa.array(out_depth, pa.int32()),
            }
        )
