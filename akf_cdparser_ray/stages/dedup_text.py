"""Near-duplicate detection operators (training-data pipeline core).

* MinHash + LSH: shingle → minhash signature → banded bucket keys →
  ``groupby(band, bucket)`` colocates candidates → exact-Jaccard verify.
* SimHash: 64-bit weighted hyperplane hash over word hashes.
* Embedding cosine near-dup: seeded random-hyperplane LSH buckets →
  within-bucket exact cosine.

All shuffles move only (doc_id, key) projections — never the text/embedding
payloads, which are re-joined (broadcast at this scale, fragment-local join
at 100 TB) only for the final verify of the *candidate* set.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _word_shingles(text: str, k: int = 3) -> set[int]:
    words = text.split()
    if len(words) < k:
        return {hash_u64(" ".join(words))} if words else set()
    return {hash_u64(" ".join(words[i: i + k])) for i in range(len(words) - k + 1)}


def hash_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*h + b) mod p, vectorized over perms × shingles
    vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class MinHashStage:
    """documents batch → (doc_id, band_id, band_key) rows (exploded)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_keys = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = minhash_signature(_word_shingles(text, self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band: (band + 1) * self.rows_per_band]
                key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_keys.append(key)
        return pd.DataFrame({"doc_id": doc_ids, "band_id": band_ids, "band_key": band_keys})


def minhash_lsh_pairs(docs_ds, *, num_perm=64, bands=16, shingle_k=3,
                      threshold=0.7, concurrency=2):
    """Full near-dup pipeline over a documents Dataset → pandas DataFrame of
    verified pairs (doc_a < doc_b, jaccard >= threshold).

    The candidate-verify step broadcasts the text of candidate docs only —
    at 100 TB that set is a re-read keyed by doc_id, not a full broadcast.
    """
    import ray

    sigs = docs_ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pandas", concurrency=concurrency,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"]))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = (
        sigs.groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
        .reset_index(drop=True)
    )
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})

    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    texts = {}
    for b in docs_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for d, t in zip(b["doc_id"], b["text"]):
            if d in needed:
                texts[d] = t
    texts_ref = ray.put(texts)

    @ray.remote
    def verify(chunk: pd.DataFrame, ref):
        tx = ref
        sh = {d: _word_shingles(tx.get(d, ""), shingle_k) for d in set(chunk["doc_a"]) | set(chunk["doc_b"])}
        jac = [jaccard(sh[a], sh[b]) for a, b in zip(chunk["doc_a"], chunk["doc_b"])]
        chunk = chunk.copy()
        chunk["jaccard"] = jac
        return chunk[chunk["jaccard"] >= threshold]

    chunks = np.array_split(cand, max(1, len(cand) // 2000))
    parts = ray.get([verify.remote(c, texts_ref) for c in chunks if len(c)])
    out = pd.concat(parts, ignore_index=True) if parts else cand.head(0).assign(jaccard=[])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = hash_u64(w)
        bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    val = 0
    for bit in (acc > 0).astype(int):
        val = (val << 1) | int(bit)
    return int(np.int64(np.uint64(val)))


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    out = batch[["doc_id"]].copy()
    out["simhash"] = [simhash64(str(t)) for t in batch["text"].fillna("")]
    return out


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random-hyperplane LSH)
# ---------------------------------------------------------------------------


class HyperplaneLSH:
    """embeddings batch → (vec_id, bucket) rows using seeded hyperplanes."""

    def __init__(self, dim: int = 64, nbits: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim)).astype(np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy())
        signs = (mat @ self.planes.T) > 0
        buckets = np.packbits(signs, axis=1)[:, :2]
        keys = [int.from_bytes(row.tobytes(), "little") for row in buckets]
        return pd.DataFrame({"vec_id": batch["vec_id"], "bucket": keys})


def embedding_neardup_pairs(emb_ds, *, threshold=0.95, nbits=12, concurrency=2):
    """LSH-bucketed candidates → exact cosine verify (pairs vec_a < vec_b)."""
    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    buckets = emb_ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={"dim": dim, "nbits": nbits},
        batch_format="pandas", concurrency=concurrency,
    ).to_pandas()
    vecs = {}
    for b in emb_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for vid, e in zip(b["vec_id"], b["embedding"]):
            vecs[vid] = np.asarray(e, dtype=np.float64)
    rows = []
    for _bucket, group in buckets.groupby("bucket"):
        ids = sorted(group["vec_id"])
        for i in range(len(ids)):
            vi = vecs[ids[i]]
            ni = np.linalg.norm(vi)
            for j in range(i + 1, len(ids)):
                vj = vecs[ids[j]]
                sim = float(vi @ vj / (ni * np.linalg.norm(vj) + 1e-12))
                if sim >= threshold:
                    rows.append((ids[i], ids[j], round(sim, 6)))
    return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"]).sort_values(
        ["vec_a", "vec_b"]
    ).reset_index(drop=True)
