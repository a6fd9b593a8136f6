"""Content-defined chunking (CDC) + chunk-level dedup.

Sub-document deduplication for training corpora: split each document at
content-defined boundaries (a gear rolling hash, FastCDC-style — Xia et
al., USENIX ATC'16), hash each chunk, and measure duplicated bytes across
the corpus. Because boundaries depend only on local content, inserting or
deleting bytes early in a document only perturbs nearby chunks — the rest
keep their identity, which is what makes chunk-level dedup catch
boilerplate that whole-document hashing misses.

Everything is deterministic: the gear table is seeded from a fixed
constant, chunk hashes are blake2b-64, and the corpus rollup is an
order-independent groupby. Dataset shape: per-batch chunking emits one
row per chunk ((chunk_hash, length) only — chunk BYTES never leave the
worker), then a chunk-hash groupby computes duplication; per-doc stats
ride along from the same pass.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# deterministic gear table: 256 pseudo-random uint64s from blake2b(counter)
_GEAR = np.frombuffer(
    b"".join(hashlib.blake2b(bytes([i]), digest_size=8).digest() for i in range(256)),
    dtype="<u8",
).copy()

_MASK_BITS = 11          # ~2 KiB average chunk
_MIN_CHUNK = 256
_MAX_CHUNK = 8192


def _gear_hashes(data: bytes) -> np.ndarray:
    """Vectorized 64-byte sliding gear hash: H[i] = Σ_{k=0}^{63}
    gear[data[i-k]] << k (mod 2^64). Because only the last 64 bytes feed
    H[i], boundary positions are purely content-local — an edit perturbs
    at most 64+max_chunk bytes of segmentation downstream."""
    arr = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[arr]
    h = g.copy()
    for k in range(1, 64):
        if k >= len(g):
            break
        h[k:] += g[:-k] << np.uint64(k)  # uint64 wraparound is the hash
    return h


def chunk_boundaries(data: bytes, mask_bits: int = _MASK_BITS,
                     min_chunk: int = _MIN_CHUNK,
                     max_chunk: int = _MAX_CHUNK) -> list[int]:
    """End offsets of content-defined chunks: candidate cut after byte i
    whenever the top ``mask_bits`` bits of H[i] are zero; greedy
    segmentation takes the first candidate in [start+min_chunk,
    start+max_chunk], else cuts at max_chunk (two searchsorted lookups
    per chunk — no per-byte Python loop)."""
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64(((1 << mask_bits) - 1) << (64 - mask_bits))
    cand = np.flatnonzero((_gear_hashes(data) & mask) == 0)
    bounds: list[int] = []
    start = 0
    while start < n:
        j = int(np.searchsorted(cand, start + min_chunk - 1))
        if j < len(cand) and cand[j] <= start + max_chunk - 1:
            cut = int(cand[j]) + 1
        else:
            cut = min(start + max_chunk, n)
        bounds.append(cut)
        start = cut
    return bounds


def chunk_doc(data: bytes, **kw) -> list[tuple[bytes, int]]:
    """(chunk_hash8, length) per chunk — bytes are hashed worker-side and
    never returned."""
    out = []
    start = 0
    for end in chunk_boundaries(data, **kw):
        out.append((hashlib.blake2b(data[start:end], digest_size=8).digest(), end - start))
        start = end
    return out


def cdc_chunk_batch(batch: pd.DataFrame, **kw) -> pd.DataFrame:
    """documents batch → one row per chunk: (doc_id, chunk_hash, length)."""
    doc_ids: list = []
    hashes: list[int] = []
    lengths: list[int] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        for digest, length in chunk_doc(str(text).encode("utf-8"), **kw):
            doc_ids.append(doc_id)
            hashes.append(int.from_bytes(digest, "little"))
            lengths.append(length)
    return pd.DataFrame({
        "doc_id": pd.Series(doc_ids, dtype="int64"),
        "chunk_hash": pd.Series([np.int64(np.uint64(h)) for h in hashes],
                                dtype="int64"),
        "length": pd.Series(lengths, dtype="int64"),
    })


def chunk_dedup_stats(ds, top_k: int = 50, **chunk_kw):
    """Corpus-level chunk duplication: for each duplicated chunk (seen in
    >1 (doc, position) instance), how many copies and how many redundant
    bytes. Returns the top_k by redundant bytes (count-1)×length, ties by
    chunk_hash — a deterministic, fully aggregated result."""
    from ray.data.aggregate import Count, Min

    import functools

    chunks = ds.map_batches(
        functools.partial(cdc_chunk_batch, **chunk_kw), batch_format="pandas"
    )
    agg = (
        chunks.groupby("chunk_hash")
        .aggregate(Count(alias_name="copies"), Min("length", alias_name="length"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["copies"] > 1].copy()
        batch["redundant_bytes"] = (batch["copies"] - 1) * batch["length"]
        return batch[["chunk_hash", "copies", "length", "redundant_bytes"]]

    out = agg.map_batches(finalize, batch_format="pandas")
    return out.sort(["redundant_bytes", "chunk_hash"],
                    descending=[True, False]).limit(top_k)
