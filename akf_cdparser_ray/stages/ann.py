"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch does one numpy matmul and emits its local top-k,
and the driver merges the tiny per-batch partials (distributed top-k, no
shuffle of the embedding payload). Scale path: the ``HyperplaneLSH`` buckets
from ``dedup_text`` restrict the scan to matching buckets (IVF-style).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray


class BruteForceScorer:
    """batch → local top-k rows per query (query_id, vec_id, sim)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = list(q.keys())
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in q.values()])
        self.qmat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
        sims = emb @ self.qmat.T  # (batch, nq)
        vec_ids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(vec_ids))
        for qi, qid in enumerate(self.qids):
            col = sims[:, qi]
            # local top-k with deterministic (sim desc, vec_id asc) order
            idx = np.lexsort((vec_ids, -col))[:k]
            out_q.extend([qid] * len(idx))
            out_v.extend(vec_ids[idx])
            out_s.extend(col[idx])
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "sim": out_s})


def bruteforce_topk(emb_ds, query_vectors: dict, k: int = 10,
                    concurrency: int | None = None) -> pd.DataFrame:
    """Exact cosine top-k for each query vector → (query_id, vec_id, rank).

    Task-based with a per-process cached scorer (round 5): the query
    matrix ships once via ``ray.put`` and each worker process builds its
    scorer on first batch — tasks fuse with upstream stages and use
    every core, where the old actor pool capped the scan at
    ``concurrency`` actors (kept for API compatibility, now unused).
    The result is batching-independent: a globally-top-k row is top-k
    within any batch containing it, so per-batch local top-k + the
    driver's deterministic (sim desc, vec_id asc) merge is exact."""
    from .cached import _CACHE

    ref = ray.put(query_vectors)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        key = ("bftopk", ref.hex(), k)
        s = _CACHE.get(key)
        if s is None:
            s = _CACHE[key] = BruteForceScorer(ref, k)
        return s(batch)

    partials = emb_ds.map_batches(
        score,
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    ).to_pandas()
    rows = []
    for qid, group in partials.groupby("query_id"):
        top = heapq.nsmallest(k, group.itertuples(index=False), key=lambda r: (-r.sim, r.vec_id))
        for rank, r in enumerate(top, 1):
            rows.append((qid, int(r.vec_id), rank))
    return (
        pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def lsh_topk(emb_ds, query_vectors: dict, k: int = 10, nbits: int = 8, concurrency: int = 2):
    """Approximate top-k: scan only vectors whose LSH bucket matches a query
    bucket (IVF-ish). Falls back to exact ranking within the candidate set."""
    from .dedup_text import HyperplaneLSH

    first = emb_ds.take(1)[0]
    dim = len(first["embedding"])
    lsh = HyperplaneLSH(dim=dim, full_bits=nbits)
    qids = list(query_vectors.keys())
    qmat = np.stack([np.asarray(v, dtype=np.float32) for v in query_vectors.values()])
    signs = (qmat @ lsh.planes.T) > 0
    weights = np.uint64(1) << np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    qcodes = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
    qbuckets = {qid: int(c) for qid, c in zip(qids, qcodes)}
    wanted = set(qbuckets.values())

    def filter_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        sub = lsh(batch)
        keep = sub["code"].isin(wanted).to_numpy()
        return batch[keep]

    cand = emb_ds.map_batches(filter_bucket, batch_format="pandas")
    return bruteforce_topk(cand, query_vectors, k, concurrency)


def knn_join(emb_ds, *, k: int = 5, num_blocks: int = 8) -> pd.DataFrame:
    """Batch similarity search: for EVERY vector, its top-k cosine
    neighbors (self excluded) — the kNN self-join. Distributed as a blocked
    matmul: the normalized projection's blocks stay in the object store
    (``to_arrow_refs``); B·(B+1)/2 triangle tiles each compute one
    (rows_i × rows_j) similarity tile and emit local top-k candidates for
    BOTH directions (the transpose serves the mirrored pair); ``groupby(vec_id).map_groups`` merges candidates into the
    global top-k. Only (vec_id, neighbor, sim) candidate rows shuffle —
    k·N rows per block column, never the embeddings."""
    import ray.data as rd

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "unit": pd.Series(dtype="object"),
                                 "dim": pd.Series(dtype="int64")})
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
        return pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64"),
            "unit": [row.tobytes() for row in mat],
            "dim": mat.shape[1],
        })

    proj = emb_ds.map_batches(project, batch_format="pandas").repartition(
        num_blocks
    ).materialize()
    refs = proj.to_arrow_refs()
    nb = len(refs)

    def tile(batch: pd.DataFrame) -> pd.DataFrame:
        out_v, out_n, out_s = [], [], []

        def emit(lids, rids, sims):
            for row in range(len(lids)):
                col = sims[row]
                mask = rids != lids[row]  # exclude self
                cids, csims = rids[mask], col[mask]
                kk = min(k, len(cids))
                idx = np.lexsort((cids, -csims))[:kk]
                out_v.extend([int(lids[row])] * kk)
                out_n.extend(int(c) for c in cids[idx])
                out_s.extend(float(x) for x in csims[idx])

        for i, j in zip(batch["i"], batch["j"]):
            lt = ray.get(refs[int(i)]).to_pandas()
            rt = lt if i == j else ray.get(refs[int(j)]).to_pandas()
            if not len(lt) or not len(rt):
                continue  # repartition can leave empty blocks
            dim = int(lt["dim"].iloc[0])
            L = np.frombuffer(b"".join(lt["unit"]), dtype=np.float64).reshape(-1, dim)
            R = (L if i == j else
                 np.frombuffer(b"".join(rt["unit"]), dtype=np.float64).reshape(-1, dim))
            lids = lt["vec_id"].to_numpy()
            rids = rt["vec_id"].to_numpy()
            sims = L @ R.T
            emit(lids, rids, sims)
            if i != j:  # one triangle tile serves both directions
                emit(rids, lids, sims.T)
        return pd.DataFrame({
            "vec_id": pd.Series(out_v, dtype="int64"),
            "neighbor": pd.Series(out_n, dtype="int64"),
            "sim": pd.Series(out_s, dtype="float64"),
        })

    pairs = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = range(1, len(g) + 1)
        return g[["vec_id", "neighbor", "rank"]]

    out = (
        rd.from_items(pairs)
        .map_batches(tile, batch_format="pandas", batch_size=1, num_cpus=1)
        .groupby("vec_id")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "vec_id" not in out.columns:  # fully-empty input
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "neighbor": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    return out.sort_values(["vec_id", "rank"]).reset_index(drop=True)


def _project_embeddings(emb_ds):
    """One-time (vec_id, embedding) projection, MATERIALIZED: k-means'
    seed sample, every Lloyd iteration and the IVF probe filter all
    consume the same input — on a lazy Dataset each consumption would
    re-execute the upstream read (iters+2 full corpus scans for the
    default config). Materializing the projection pins it once in the
    object store (spillable) and every later pass is a plasma read."""
    def proj(batch: pd.DataFrame) -> pd.DataFrame:
        if "vec_id" not in batch.columns or not len(batch):
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "embedding": pd.Series(dtype="object")})
        return batch[["vec_id", "embedding"]]

    # batch_size=None: one batch per block → the materialized projection
    # reproduces the input block layout exactly (the per-iteration partial
    # fold order is block order — golden stability)
    return emb_ds.map_batches(proj, batch_format="pandas",
                              batch_size=None).materialize()


def kmeans_ds(emb_ds, k: int = 16, iters: int = 6, salt: str = "ivf",
              _pre_projected: bool = False):
    """Distributed Lloyd's k-means over the (unit-normalized) embedding
    column — the trained coarse quantizer for :func:`ivf_topk`.

    Init is deterministic and layout-independent: the k vectors whose
    vec_id md5-hash is smallest (the bottom-k trick from
    ``stages/sampling``). The input is projected to (vec_id, embedding)
    and materialized ONCE (``_pre_projected=True`` skips it when the
    caller — ivf_topk — already did); each iteration is then ONE
    ``map_batches`` pass over plasma blocks emitting per-centroid partial
    (count, vector-sum) rows — at most k tiny rows per block cross the
    wire, never the embeddings; the driver folds partials in block order
    and updates. Empty clusters keep their previous centroid.

    Float note: the partial-sum fold order is the block order, so
    centroids are bit-deterministic for a FIXED partitioning (pin
    ``repartition(...)`` upstream where golden stability matters — the
    ``approx_quantiles`` convention)."""
    from .sampling import bottom_k_sample

    def _unit(mat: np.ndarray) -> np.ndarray:
        return mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)

    if not _pre_projected:
        emb_ds = _project_embeddings(emb_ds)
    seed_rows = bottom_k_sample(emb_ds, "vec_id", k, salt=salt)
    cent = _unit(np.stack(seed_rows["embedding"].to_numpy())
                 .astype(np.float64))
    dim = cent.shape[1]

    for _ in range(iters):
        C = cent.copy()

        def partial(batch: pd.DataFrame, C=C) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"cid": pd.Series(dtype="int64"),
                                     "n": pd.Series(dtype="int64"),
                                     "vsum": pd.Series(dtype="object")})
            X = _unit(np.stack(batch["embedding"].to_numpy())
                      .astype(np.float64))
            a = (X @ C.T).argmax(axis=1)  # unit vectors: max cos == min L2
            cids = np.unique(a)
            return pd.DataFrame({
                "cid": pd.Series(cids, dtype="int64"),
                "n": pd.Series([int((a == c).sum()) for c in cids],
                               dtype="int64"),
                "vsum": [X[a == c].sum(axis=0).tobytes() for c in cids],
            })

        parts = emb_ds.map_batches(partial, batch_format="pandas").to_pandas()
        new = cent.copy()
        for c in range(k):
            sub = parts[parts["cid"] == c]
            if len(sub):
                tot = np.zeros(dim)
                for v in sub["vsum"]:  # fold in block order (see above)
                    tot = tot + np.frombuffer(v, dtype=np.float64)
                new[c] = tot / int(sub["n"].sum())
        cent = _unit(new)
    return cent


def ivf_topk(emb_ds, query_vectors: dict, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, iters: int = 6, concurrency: int = 2):
    """IVF approximate top-k with a TRAINED coarse quantizer (vs
    :func:`lsh_topk`'s data-independent hyperplanes): k-means centroids
    from :func:`kmeans_ds`; each query probes its ``nprobe`` nearest
    centroids; one filter pass keeps only rows assigned to a probed
    centroid; exact cosine ranking runs on the candidate set (same
    union-candidate shape as lsh_topk). ``nprobe == n_centroids``
    degenerates to the exact brute force (test-pinned). The embedding
    projection is materialized ONCE up front — training iterations and
    the probe filter all read plasma blocks, never re-executing the
    upstream read (round-5 single-scan fix)."""
    emb_ds = _project_embeddings(emb_ds)
    cent = kmeans_ds(emb_ds, k=n_centroids, iters=iters,
                     _pre_projected=True)
    qids = list(query_vectors.keys())
    qmat = np.stack([np.asarray(v, dtype=np.float64)
                     for v in query_vectors.values()])
    qmat = qmat / (np.linalg.norm(qmat, axis=1, keepdims=True) + 1e-12)
    sims = qmat @ cent.T
    wanted = set()
    for qi in range(len(qids)):
        order = np.lexsort((np.arange(cent.shape[0]), -sims[qi]))[:nprobe]
        wanted.update(int(c) for c in order)

    def filter_probed(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        X = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        X = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        a = (X @ cent.T).argmax(axis=1)
        return batch[np.isin(a, list(wanted))]

    cand = emb_ds.map_batches(filter_probed, batch_format="pandas")
    return bruteforce_topk(cand, query_vectors, k, concurrency)


def semdedup(emb_ds, k: int = 16, iters: int = 4, tau: float = 0.95,
             salt: str = "semdedup"):
    """SemDeDup (Abbas et al., 2023): semantic deduplication in
    embedding space — k-means the unit-normalized embeddings with the
    trained quantizer (:func:`kmeans_ds`), then within each cluster
    greedily keep the lowest ``vec_id`` of every cosine>=tau duplicate
    group and mark the rest for dropping. Returns a Dataset with columns
    ``(vec_id, cluster, keep)``.

    Scale shape: centroids broadcast once (``ray.put``); assignment is a
    per-batch matmul; the ONLY embedding shuffle is the cluster-keyed
    groupby (the paper's trick — choose k ≈ N/target_cluster_size so the
    per-cluster Gram matrix fits a worker; pairwise work is
    O(Σ cluster²), never O(N²)). The greedy keep scan is deterministic:
    rows sort vec_id-ascending inside each cluster, so a duplicate group
    always keeps its smallest id regardless of layout. Centroids (and
    therefore assignments near cluster boundaries) inherit k-means'
    fixed-partitioning float caveat — pin ``repartition(...)`` upstream
    where golden stability matters."""
    proj = _project_embeddings(emb_ds)
    cent = kmeans_ds(proj, k=k, iters=iters, salt=salt,
                     _pre_projected=True)
    cent_ref = ray.put(cent)

    def _unit(mat: np.ndarray) -> np.ndarray:
        return mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch) or "vec_id" not in batch.columns:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "embedding": pd.Series(dtype="object")})
        C = ray.get(cent_ref)
        X = _unit(np.stack(batch["embedding"].to_numpy())
                  .astype(np.float64))
        a = (X @ C.T).argmax(axis=1)
        return pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64").to_numpy(),
            "cluster": a.astype("int64"),
            "embedding": batch["embedding"].to_numpy(),
        })

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                              "cluster": pd.Series(dtype="int64"),
                              "keep": pd.Series(dtype="bool")})
        if not len(g) or "vec_id" not in g.columns:
            return empty
        g = g.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        X = _unit(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        m = len(g)
        keep = np.ones(m, dtype=bool)
        G = X @ X.T
        for i in range(1, m):
            # kept rows before i — a duplicate of a DROPPED row may
            # itself survive iff it is not tau-close to any kept one
            # (the paper's greedy semantics)
            if (G[i, :i][keep[:i]] >= tau).any():
                keep[i] = False
        return pd.DataFrame({
            "vec_id": g["vec_id"].astype("int64"),
            "cluster": g["cluster"].astype("int64"),
            "keep": pd.Series(keep, dtype="bool"),
        })

    return (proj.map_batches(assign, batch_format="pandas",
                             batch_size=None)
                .groupby("cluster")
                .map_groups(dedup_group, batch_format="pandas"))
