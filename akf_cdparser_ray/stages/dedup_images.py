"""Near-duplicate image detection over the pairs table (SURVEY.md §2.7 D3).

Banding a 64-bit perceptual hash into 4×16-bit bands guarantees any pair
within Hamming distance 3 shares a band (pigeonhole); sharing any band makes
a candidate, verified by exact Hamming distance. The bucket groupby shuffles
only (band, key, image_id) — never image bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.images import hamming64


def phash_bands(phash: int, bands: int = 4) -> list[int]:
    u = np.uint64(phash).item() & 0xFFFFFFFFFFFFFFFF
    width = 64 // bands
    mask = (1 << width) - 1
    return [(u >> (i * width)) & mask for i in range(bands)]


def phash_neardup_pairs(df: pd.DataFrame, max_hamming: int = 8, bands: int = 4) -> pd.DataFrame:
    """pairs table slice (image_id, phash) → near-dup pairs.

    Distributed form: explode to (band_id, band_key, image_id) rows →
    ``groupby(band_id, band_key).map_groups(pairs)`` → verify; the pandas
    body here is the per-group kernel.
    """
    exploded = []
    for image_id, ph in zip(df["image_id"], df["phash"]):
        for band_id, key in enumerate(phash_bands(int(ph), bands)):
            exploded.append((band_id, key, image_id, int(ph)))
    e = pd.DataFrame(exploded, columns=["band_id", "band_key", "image_id", "phash"])
    seen = set()
    rows = []
    for (_b, _k), group in e.groupby(["band_id", "band_key"]):
        items = sorted(set(zip(group["image_id"], group["phash"])))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a, pa_ = items[i]
                b, pb_ = items[j]
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                d = hamming64(pa_, pb_)
                if d <= max_hamming:
                    rows.append((a, b, d))
    return (
        pd.DataFrame(rows, columns=["image_a", "image_b", "hamming"])
        .sort_values(["image_a", "image_b"])
        .reset_index(drop=True)
    )
