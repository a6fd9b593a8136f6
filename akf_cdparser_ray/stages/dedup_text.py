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
    """documents batch → (doc_id, band_id, band_key, sub_key) rows
    (exploded). ``sub_key`` is a hash of the COMPLEMENT signature (every
    band except this one): oversized band buckets are sub-chunked in
    ``bucket_pairs`` along the sub_key order, so documents that also agree
    elsewhere in the signature sort adjacently and stay comparable."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_keys, sub_keys = [], [], [], []
        r = self.rows_per_band
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = minhash_signature(_word_shingles(text, self.k), self.a, self.b)
            sig_bytes = sig.tobytes()
            for band in range(self.bands):
                lo, hi = band * r * 8, (band + 1) * r * 8
                key = hashlib.blake2b(sig_bytes[lo:hi], digest_size=8).hexdigest()
                complement = sig_bytes[:lo] + sig_bytes[hi:]
                sub = int.from_bytes(
                    hashlib.blake2b(complement, digest_size=8).digest(), "little"
                )
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_keys.append(key)
                sub_keys.append(np.int64(np.uint64(sub)))
        return pd.DataFrame({
            "doc_id": doc_ids, "band_id": band_ids, "band_key": band_keys,
            "sub_key": pd.Series(sub_keys, dtype="int64"),
        })


def minhash_lsh_pairs(docs_ds, *, num_perm=64, bands=16, shingle_k=3,
                      threshold=0.7, concurrency=2, bucket_cap=1024,
                      return_dataset=False):
    """Full near-dup pipeline over a documents Dataset → verified pairs
    (doc_a < doc_b, jaccard >= threshold).

    Fully distributed: candidates come out of the banded ``groupby`` and are
    deduped by a second ``groupby``; only the candidate-*id* set (bounded by
    the number of candidate pairs, a tiny fraction of the corpus) is pulled
    to the driver and re-broadcast so workers can filter the corpus down to
    candidate texts. Shingle arrays are then routed to their pairs through
    two ``groupby(doc_id).map_groups`` joins and the exact-Jaccard verify
    runs inside the groups. No corpus-sized driver materialization anywhere.

    ``return_dataset=True`` keeps the verified pairs a DATASET (schema
    (doc_a, doc_b, jaccard), unsorted — the verify already runs
    distributed; there is simply no driver collect). On a web corpus the
    verified pair list scales with the duplicate population — feed this
    straight to ``connected_components_ds`` (the curate funnel path).
    The default pandas return (sorted) is for output-sized callers and
    the golden-pinned queries."""
    import ray

    # task-based with a per-process cached stage (the read-only perm
    # params are seeded-deterministic, so every process builds the same
    # instance): tasks use every core where the actor pool capped the
    # most expensive stage (shingle+minhash) at `concurrency` actors
    from .cached import _CACHE

    def sig_batch(batch: pd.DataFrame) -> pd.DataFrame:
        key = ("minhash", num_perm, bands, shingle_k)
        st = _CACHE.get(key)
        if st is None:
            st = _CACHE[key] = MinHashStage(
                num_perm=num_perm, bands=bands, shingle_k=shingle_k)
        return st(batch)

    sigs = docs_ds.map_batches(sig_batch, batch_format="pandas",
                               num_cpus=1)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one band bucket, with a SIZE CAP: a
        degenerate bucket (boilerplate-heavy corpora put thousands of
        near-identical docs behind one band key) would otherwise emit
        m(m-1)/2 rows. Buckets over ``bucket_cap`` are chunked along the
        (sub_key, doc_id) order — docs agreeing on the rest of the
        signature sort adjacently — and pairs are emitted within chunks
        only, bounding emission at m*cap/2 (linear in m). Chunk boundaries
        are ROTATED per band (offset band_id*cap/bands), so two docs within
        sorted distance < cap*(1-1/bands) share a chunk in at least one
        band: near-dup chains still connect across chunk edges via the
        other bands. Splits are logged — never silent."""
        uniq = group.drop_duplicates("doc_id")
        m = len(uniq)
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64")})
        if m < 2:
            return empty
        if m <= bucket_cap:
            ids = np.sort(uniq["doc_id"].to_numpy(dtype=np.int64))
            ia, ib = np.triu_indices(m, k=1)
            return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})
        band = int(group["band_id"].iloc[0])
        import logging

        logging.getLogger(__name__).warning(
            "minhash band bucket of %d docs exceeds cap=%d "
            "(band=%d key=%s): chunking with per-band rotation",
            m, bucket_cap, band, group["band_key"].iloc[0],
        )
        order = np.lexsort((
            uniq["doc_id"].to_numpy(dtype=np.int64),
            uniq["sub_key"].to_numpy(dtype=np.int64),
        ))
        ids = uniq["doc_id"].to_numpy(dtype=np.int64)[order]
        offset = (band * bucket_cap) // bands
        chunk_of = (np.arange(m) + offset) // bucket_cap
        outs = []
        for c in np.unique(chunk_of):
            members = np.sort(ids[chunk_of == c])
            if len(members) < 2:
                continue
            ia, ib = np.triu_indices(len(members), k=1)
            outs.append(pd.DataFrame({"doc_a": members[ia], "doc_b": members[ib]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

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
        if return_dataset:
            import ray.data as rd
            return rd.from_pandas(empty)
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

    verified_ds = (
        sh_ds.union(hop1)
        .groupby("key")
        .map_groups(verify, batch_format="pandas")
    )
    if return_dataset:
        # normalize: the groupby shuffle can emit column-less empty pandas
        # blocks — downstream consumers get a stable 3-column schema
        def norm(b: pd.DataFrame) -> pd.DataFrame:
            if "doc_a" not in b.columns or not len(b):
                return empty
            return b[["doc_a", "doc_b", "jaccard"]]

        return verified_ds.map_batches(norm, batch_format="pandas")
    verified = verified_ds.to_pandas()  # final verified pairs — output-sized
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
    """embeddings batch → (vec_id, code, embedding) rows using seeded
    hyperplanes. ``code`` is a FULL-DEPTH sign code (``full_bits`` planes,
    plane 0 = most-significant bit): the bucket key used downstream is a
    PREFIX of it, so oversized buckets can be split by deepening their
    prefix without re-reading the embeddings. The first ``nbits`` planes of
    any ``full_bits >= nbits`` matrix are identical draws (numpy fills
    row-major from one seeded stream), so the depth-``nbits`` partition is
    independent of ``full_bits``."""

    def __init__(self, dim: int = 64, full_bits: int = 18, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((full_bits, dim)).astype(np.float32)
        self.full_bits = full_bits

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy())
        signs = (mat @ self.planes.T) > 0
        weights = (np.uint64(1) << np.arange(
            self.full_bits - 1, -1, -1, dtype=np.uint64
        ))
        code = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.DataFrame({
            "vec_id": batch["vec_id"],
            "code": code.astype(np.int64),
            "embedding": batch["embedding"],
        })


def _split_depths(code_counts: pd.DataFrame, nbits: int, full_bits: int,
                  step: int, cap: int) -> dict[int, set[int]]:
    """Given (code, n) counts at full depth, decide which bucket prefixes
    must deepen: returns {depth: set(prefix values at that depth that split
    further)}. Pure driver-side arithmetic over the counts table (size ≤
    distinct full codes, bounded by 2^full_bits)."""
    codes = code_counts["code"].to_numpy(dtype=np.int64).astype(np.uint64)
    counts = code_counts["n"].to_numpy(dtype=np.int64)
    splits: dict[int, set[int]] = {}
    depth = nbits
    while depth < full_bits:
        pref = codes >> np.uint64(full_bits - depth)
        # aggregate counts by prefix at this depth
        order = np.argsort(pref, kind="stable")
        p_sorted, c_sorted = pref[order], counts[order]
        uniq, starts = np.unique(p_sorted, return_index=True)
        sums = np.add.reduceat(c_sorted, starts)
        over = uniq[sums > cap]
        if depth > nbits:
            # only prefixes whose parent actually split are live buckets
            parent_depth = depth - step
            live = splits.get(parent_depth, set())
            over = np.array(
                [p for p in over if int(p) >> (depth - parent_depth) in live],
                dtype=np.uint64,
            )
        if len(over) == 0:
            break
        splits[depth] = {int(p) for p in over}
        depth += step
    return splits


def embedding_neardup_pairs(emb_ds, *, threshold=0.95, nbits=12, concurrency=2,
                            bucket_cap=4096, full_bits=18, split_step=3):
    """LSH-bucketed candidates → exact cosine verify (pairs vec_a < vec_b).

    Distributed end-to-end: each embedding is shuffled once to its bucket
    (``groupby("bucket")``) and the within-bucket verify is a vectorized
    Gram-matrix cosine inside ``map_groups`` — no driver-side embedding
    dict, no per-pair Python loop. The driver receives only the verified
    pairs.

    ADAPTIVE BUCKETING: with a fixed 2^nbits bucket count the per-bucket
    population grows linearly with the corpus and the O(m²) within-bucket
    Gram matrix blows one worker's memory. Buckets over ``bucket_cap``
    rows deepen their hyperplane prefix in ``split_step``-bit increments
    (up to ``full_bits``), decided from a cheap distributed count of the
    full-depth codes — no extra pass over the embeddings, the deeper key
    is a longer prefix of the code each row already carries. Splits are
    logged. Vectors identical out to ``full_bits`` planes can still exceed
    the cap; the verify then runs a row-blocked Gram product (peak memory
    O(block × m), never O(m²)) and warns.
    """
    import logging

    from .cached import _CACHE

    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    assert nbits <= full_bits

    def code_batch(batch: pd.DataFrame) -> pd.DataFrame:
        key = ("hyperlsh", dim, full_bits)
        st = _CACHE.get(key)
        if st is None:
            st = _CACHE[key] = HyperplaneLSH(dim=dim, full_bits=full_bits)
        return st(batch)

    with_code = emb_ds.map_batches(
        code_batch, batch_format="pandas", num_cpus=1,
    ).materialize()  # consumed twice: code counts + bucket shuffle

    # distributed count of full-depth codes → small driver table
    def code_counts_batch(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("code", sort=False).size()
        return pd.DataFrame({"code": g.index.to_numpy(), "n": g.to_numpy()})

    from ray.data.aggregate import Sum

    counts = (
        with_code.select_columns(["code"])
        .map_batches(code_counts_batch, batch_format="pandas")
        .groupby("code").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    splits = _split_depths(counts, nbits, full_bits, split_step, bucket_cap)
    if splits:
        logging.getLogger(__name__).warning(
            "embedding LSH: %s oversized bucket prefixes deepened (cap=%d): %s",
            sum(len(v) for v in splits.values()), bucket_cap,
            {d: len(v) for d, v in sorted(splits.items())},
        )

    def assign_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        code = batch["code"].to_numpy(dtype=np.int64).astype(np.uint64)
        depth = np.full(len(code), nbits, dtype=np.int64)
        d = nbits
        while d in splits:  # split depths are contiguous from nbits
            pref = code >> np.uint64(full_bits - d)
            targets = np.fromiter(splits[d], dtype=np.uint64,
                                  count=len(splits[d]))
            mask = (depth == d) & np.isin(pref, targets)
            depth[mask] = min(d + split_step, full_bits)
            d += split_step
        # bucket key = (depth, prefix) packed: depth in the top byte keeps
        # different-depth prefixes collision-free
        pref = code >> (np.uint64(full_bits) - depth.astype(np.uint64))
        bucket = (depth.astype(np.uint64) << np.uint64(56)) | pref
        return pd.DataFrame({
            "vec_id": batch["vec_id"],
            "bucket": bucket.astype(np.int64),
            "embedding": batch["embedding"],
        })

    with_bucket = with_code.map_batches(assign_bucket, batch_format="pandas")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.asarray([int(v) for v in group["vec_id"]], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.stack(group["embedding"].to_numpy())[order].astype(np.float64)
        m = len(ids)
        n = np.linalg.norm(M, axis=1)
        Mn = M / (n[:, None] + 1e-12)
        if m <= bucket_cap:
            sims = Mn @ Mn.T
            ia, ib = np.triu_indices(m, k=1)
            vals = sims[ia, ib]
            mask = vals >= threshold
            return pd.DataFrame({
                "vec_a": ids[ia[mask]],
                "vec_b": ids[ib[mask]],
                "cosine": np.round(vals[mask], 6),
            })
        # identical-code overflow bucket: row-blocked Gram, memory O(block*m)
        logging.getLogger(__name__).warning(
            "embedding LSH bucket of %d rows exceeds cap=%d even at full "
            "depth: running row-blocked exact verify", m, bucket_cap,
        )
        block = max(1, bucket_cap // 4)
        outs = []
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            sims = Mn[lo:hi] @ Mn.T
            ia, ib = np.nonzero(sims >= threshold)
            keep = (ia + lo) < ib  # upper triangle only
            if keep.any():
                outs.append(pd.DataFrame({
                    "vec_a": ids[ia[keep] + lo],
                    "vec_b": ids[ib[keep]],
                    "cosine": np.round(sims[ia[keep], ib[keep]], 6),
                }))
        if not outs:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    pairs = with_bucket.groupby("bucket").map_groups(verify, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
