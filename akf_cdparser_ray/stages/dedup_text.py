"""Near-duplicate detection operators (training-data pipeline core).

* MinHash + LSH: shingle → minhash signature → banded bucket keys →
  ``groupby(band, bucket)`` colocates candidates → exact-Jaccard verify.
* SimHash: 64-bit weighted hyperplane hash over word hashes.
* Embedding cosine near-dup: seeded random-hyperplane LSH buckets →
  within-bucket exact cosine.

Every stage is a Dataset transform: shuffles move only (doc_id, key)
projections or candidate-sized payloads — never the full corpus. The verify
halves are distributed too: candidate texts are selected by a broadcast
candidate-id *set* (bounded by the candidate count, not the corpus), their
shingle arrays shuffled to the pairs by doc_id via ``groupby.map_groups``
joins; embeddings travel once to their LSH bucket and are verified with a
vectorized within-bucket cosine. The driver only ever sees the final
(pair, score) rows.
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


def _jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 arrays (== set semantics)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


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

    Fully distributed: candidates come out of the banded ``groupby`` and are
    deduped by a second ``groupby``; only the candidate-*id* set (bounded by
    the number of candidate pairs, a tiny fraction of the corpus) is pulled
    to the driver and re-broadcast so workers can filter the corpus down to
    candidate texts. Shingle arrays are then routed to their pairs through
    two ``groupby(doc_id).map_groups`` joins and the exact-Jaccard verify
    runs inside the groups. No corpus-sized driver materialization anywhere.
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
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    cand = (
        sigs.groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])          # cross-band pair dedup, distributed
        .map_groups(first_row, batch_format="pandas")
        .materialize()
    )
    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    if cand.count() == 0:
        return empty

    # candidate-id set: |ids| <= 2 * |candidate pairs| — broadcast once
    ids: set[int] = set()
    for b in cand.iter_batches(batch_size=65536, batch_format="pandas"):
        ids.update(int(x) for x in b["doc_a"])
        ids.update(int(x) for x in b["doc_b"])
    ids_ref = ray.put(frozenset(ids))

    def shingle_rows(batch: pd.DataFrame, *, ids_ref, k) -> pd.DataFrame:
        wanted = ray.get(ids_ref) if not isinstance(ids_ref, frozenset) else ids_ref
        keys, shs = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            if int(doc_id) in wanted:
                arr = np.fromiter(_word_shingles(text, k), dtype=np.uint64)
                arr.sort()
                keys.append(int(doc_id))
                shs.append(arr.tobytes().hex())
        return pd.DataFrame({
            "key": pd.Series(keys, dtype="int64"),
            "doc_a": pd.Series([-1] * len(keys), dtype="int64"),
            "doc_b": pd.Series([-1] * len(keys), dtype="int64"),
            "sh": pd.Series(shs, dtype="object"),
            "kind": pd.Series([0] * len(keys), dtype="int64"),
        })

    sh_ds = docs_ds.map_batches(
        shingle_rows, fn_kwargs={"ids_ref": ids_ref, "k": shingle_k},
        batch_format="pandas",
    ).materialize()  # consumed by BOTH join hops; lazy re-execution would rescan the corpus

    def pair_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": batch["doc_a"].astype("int64"),
            "doc_a": batch["doc_a"].astype("int64"),
            "doc_b": batch["doc_b"].astype("int64"),
            "sh": pd.Series([""] * len(batch), dtype="object"),
            "kind": pd.Series([1] * len(batch), dtype="int64"),
        })

    def attach_a(group: pd.DataFrame) -> pd.DataFrame:
        sh_row = group[group["kind"] == 0]
        prs = group[group["kind"] == 1]
        if prs.empty:
            return group.head(0)
        sh = sh_row["sh"].iloc[0] if len(sh_row) else ""
        out = prs.copy()
        out["sh"] = [sh] * len(prs)
        out["key"] = out["doc_b"]          # re-key for the second hop
        return out

    hop1 = (
        sh_ds.union(cand.map_batches(pair_rows, batch_format="pandas"))
        .groupby("key")
        .map_groups(attach_a, batch_format="pandas")
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        sh_row = group[group["kind"] == 0]
        prs = group[group["kind"] == 1]
        if prs.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "jaccard": pd.Series(dtype="float64")})
        sh_b = (np.frombuffer(bytes.fromhex(sh_row["sh"].iloc[0]), dtype=np.uint64)
                if len(sh_row) else np.empty(0, dtype=np.uint64))
        jac = [
            _jaccard_sorted(np.frombuffer(bytes.fromhex(sa), dtype=np.uint64), sh_b)
            for sa in prs["sh"]
        ]
        out = pd.DataFrame({
            "doc_a": prs["doc_a"].astype("int64").to_numpy(),
            "doc_b": prs["doc_b"].astype("int64").to_numpy(),
            "jaccard": np.asarray(jac, dtype="float64"),
        })
        return out[out["jaccard"] >= threshold]

    verified = (
        sh_ds.union(hop1)
        .groupby("key")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()          # final verified pairs only — output-sized
    )
    if verified.empty:
        return empty
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# bit order matching np.unpackbits over the little-endian uint64 bytes:
# position i reads bit (byte i//8, in-byte bit 7 - i%8) of the hash
_SIMHASH_SHIFTS = np.array(
    [(i // 8) * 8 + (7 - i % 8) for i in range(64)], dtype=np.uint64
)


def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    hs = np.fromiter((hash_u64(w) for w in words), dtype=np.uint64, count=len(words))
    # (n_words, 64) bit matrix in one vectorized shift — no per-word Python loop
    bits = ((hs[:, None] >> _SIMHASH_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = bits.sum(axis=0) * 2 - len(words)
    packed = np.packbits((acc > 0))
    val = int.from_bytes(packed.tobytes(), "big")
    return int(np.int64(np.uint64(val)))


def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    out = batch[["doc_id"]].copy()
    out["simhash"] = [simhash64(str(t)) for t in batch["text"].fillna("")]
    return out


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random-hyperplane LSH)
# ---------------------------------------------------------------------------


class HyperplaneLSH:
    """embeddings batch → (vec_id, bucket, embedding) rows using seeded
    hyperplanes; the embedding travels with the row to its single bucket so
    the verify can run inside the bucket group (one shuffle, no re-join)."""

    def __init__(self, dim: int = 64, nbits: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim)).astype(np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy())
        signs = (mat @ self.planes.T) > 0
        buckets = np.packbits(signs, axis=1)[:, :2]
        keys = [int.from_bytes(row.tobytes(), "little") for row in buckets]
        return pd.DataFrame({
            "vec_id": batch["vec_id"], "bucket": keys,
            "embedding": batch["embedding"],
        })


def embedding_neardup_pairs(emb_ds, *, threshold=0.95, nbits=12, concurrency=2):
    """LSH-bucketed candidates → exact cosine verify (pairs vec_a < vec_b).

    Distributed end-to-end: each embedding is shuffled once to its bucket
    (``groupby("bucket")``) and the within-bucket verify is a vectorized
    Gram-matrix cosine inside ``map_groups`` — no driver-side embedding
    dict, no per-pair Python loop. The driver receives only the verified
    pairs.
    """
    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    with_bucket = emb_ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={"dim": dim, "nbits": nbits},
        batch_format="pandas", concurrency=concurrency,
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.asarray([int(v) for v in group["vec_id"]], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.stack(group["embedding"].to_numpy())[order].astype(np.float64)
        n = np.linalg.norm(M, axis=1)
        sims = (M @ M.T) / (np.outer(n, n) + 1e-12)
        ia, ib = np.triu_indices(len(ids), k=1)
        vals = sims[ia, ib]
        mask = vals >= threshold
        return pd.DataFrame({
            "vec_a": ids[ia[mask]],
            "vec_b": ids[ib[mask]],
            "cosine": np.round(vals[mask], 6),
        })

    pairs = with_bucket.groupby("bucket").map_groups(verify, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
