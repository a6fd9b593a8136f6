"""Fetch stage (synthetic — no network in this sandbox).

``SyntheticFetcher`` regenerates the deterministic page (and its scan image)
from the URL alone, so fetch is a pure function of the URL and the crawl is
replayable. The stage signature, batch shapes and resource hints
(``num_cpus<1``, high fan-out) are exactly what a real HTTP fetcher would
use; swap ``_fetch_one`` for an HTTP client outside the sandbox.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..sources import images as im
from ..sources import synth

_PATH_RE = re.compile(r"/(\d{4})/(\d+)\.html$")


class SyntheticFetcher:
    """url batch → page batch (html + image payload columns).

    Actor pool: the per-actor state is just the corpus config; a real
    fetcher would hold connection pools / TLS sessions here.
    """

    def __init__(self, corpus_size: int, seed: int = synth.SEED):
        self.n = corpus_size
        self.seed = seed

    def _fetch_one(self, url: str):
        m = _PATH_RE.search(url)
        if not m:
            return None
        idx = int(m.group(2))
        if not (0 <= idx < self.n):
            return None
        p = synth.gen_profile(idx, self.seed)
        # URL-only neighbor derivation (page_url_for_idx avoids building the
        # 3 full neighbor profiles; identical URLs by construction)
        neighbors = [
            synth.page_url_for_idx((idx * 7 + k + 1) % self.n) for k in range(3)
        ]
        data, pix = synth.make_image(p)
        return p, synth.render_page(p, neighbors), data, im.phash64(pix)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url_canon").to_pylist()
        depths = batch.column("depth").to_pylist() if "depth" in batch.schema.names else [0] * len(urls)
        cols = {
            "url": [], "depth": [], "image_id": [], "html": [],
            "bytes": [], "w": [], "h": [], "fmt": [], "phash": [], "fetch_status": [],
        }
        for url, depth in zip(urls, depths):
            got = self._fetch_one(url)
            if got is None:
                cols["url"].append(url)
                cols["depth"].append(depth)
                cols["image_id"].append("")
                cols["html"].append("")
                cols["bytes"].append(b"")
                cols["w"].append(0)
                cols["h"].append(0)
                cols["fmt"].append("")
                cols["phash"].append(0)
                cols["fetch_status"].append("404")
                continue
            p, html, data, ph = got
            cols["url"].append(url)
            cols["depth"].append(depth)
            cols["image_id"].append(p["image_id"])
            cols["html"].append(html)
            cols["bytes"].append(data)
            cols["w"].append(p["img_w"])
            cols["h"].append(p["img_h"])
            cols["fmt"].append(p["fmt"])
            cols["phash"].append(ph)
            cols["fetch_status"].append("200")
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "depth": pa.array(cols["depth"], pa.int32()),
                "image_id": pa.array(cols["image_id"], pa.string()),
                "html": pa.array(cols["html"], pa.large_string()),
                "bytes": pa.array(cols["bytes"], pa.binary()),
                "w": pa.array(cols["w"], pa.int32()),
                "h": pa.array(cols["h"], pa.int32()),
                "fmt": pa.array(cols["fmt"], pa.string()),
                "phash": pa.array(cols["phash"], pa.int64()),
                "fetch_status": pa.array(cols["fetch_status"], pa.string()),
            }
        )
