"""Mergeable streaming sketches: HyperLogLog + t-digest (100-TB operators).

At web scale, exact distinct counts and exact quantiles are all-to-all
shuffles of the full key/value set (``stages/windows.grouped_median`` is
the exact kernel). The production path is a SKETCH: constant-size partial
state per block, an associative+commutative merge, one tiny final reduce.
Both sketches here are deterministic (fixed hash keys, order-independent
merges) so query goldens can pin their outputs.

- HyperLogLog (Flajolet et al. 2007, HLL++ bias regime): 2^p uint8
  registers; per-batch partials via vectorized numpy (pandas' stable
  64-bit siphash → register index + exact leading-zero rank via binary
  masking, no float log2); merge = elementwise max (commutative,
  idempotent); estimate with the standard alpha_m correction and
  linear-counting small-range fallback.
- t-digest (Dunning & Ertl 2019, merging variant): per-batch digests are
  built and re-clustered from the SORTED centroid list with the k1-style
  size bound, so a merge of digests is independent of arrival order —
  digest(A ∪ B) == digest(B ∪ A) byte-for-byte.

Dataset shape: ``map_batches`` partials (one sketch row per batch per
group) → ``groupby(key).map_groups`` merge → scalar per group. The
driver only ever sees finished sketches (p=14 HLL = 16 KiB; delta=200
digest ≈ 3 KiB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# shared hashing
# ---------------------------------------------------------------------------


def _hash64(values) -> np.ndarray:
    """Stable (fixed-key siphash) uint64 hash of an array-like of values."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        arr = pd.Index(arr).astype(str).to_numpy(dtype=object)
        return pd.util.hash_array(arr, categorize=False)
    return pd.util.hash_array(arr)


def _clz64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized count-of-leading-zeros for uint64 (w == 0 → 64)."""
    n = np.zeros(w.shape, dtype=np.int64)
    x = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (x >> np.uint64(64 - shift)) == 0  # top `shift` bits all zero
        n[mask] += shift
        x[mask] <<= np.uint64(shift)
    n[w == 0] = 64
    return n


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_partial(values, p: int = 14) -> np.ndarray:
    """One batch of values → 2^p uint8 registers."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    rho = np.minimum(_clz64(w), 64 - p) + 1  # rank in [1, 65-p]
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range regime
    return float(est)


def approx_distinct(ds, col: str, p: int = 14) -> int:
    """Global approximate distinct count: per-block registers stream to
    the driver (one 2^p-byte row per block), folded with elementwise max."""
    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch.column(col).to_pylist(), p)
        return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})

    regs = np.zeros(1 << p, dtype=np.uint8)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b.column("registers").to_pylist():
            regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
    return int(round(hll_estimate(regs)))


def grouped_approx_distinct(ds, key: str, col: str, p: int = 12):
    """Per-group approximate distinct: batch partials keyed by group, one
    shuffle of 2^p-byte sketches (not values), max-merge in map_groups."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in batch.groupby(key, sort=True):
            rows.append((k, hll_partial(g[col].to_numpy(), p).tobytes()))
        return pd.DataFrame(rows, columns=[key, "registers"])

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for blob in group["registers"]:
            regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
        return pd.DataFrame({
            key: [group[key].iloc[0]],
            "approx_distinct": [int(round(hll_estimate(regs)))],
        })

    out = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort(key)


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest with a deterministic, order-independent compress:
    centroids are always rebuilt from the globally sorted centroid list,
    greedily packing while the k1 scale bound allows — so any merge order
    over the same multiset yields identical centroids."""

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)

    @classmethod
    def of(cls, values, delta: int = 200) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)] + 0.0  # canonicalize -0.0 → +0.0 (see merge_all)
        d = cls(delta)
        if len(v):
            v.sort(kind="stable")
            d.means, d.weights = _compress(v, np.ones(len(v)), delta)
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        return TDigest.merge_all([self, other], self.delta)

    @classmethod
    def merge_all(cls, digests: list["TDigest"], delta: int = 200) -> "TDigest":
        """Order-independent merge: concatenate EVERY input centroid, sort
        once, compress once — a pure function of the multiset of partial
        centroids (sequential pairwise merging would be order-dependent
        because each intermediate compress is lossy).

        Means are canonicalized (-0.0 → +0.0) before the sort: lexsort
        treats -0.0 and 0.0 as equal keys, so without canonicalization the
        tie would resolve by input POSITION and digest(A∪B) vs digest(B∪A)
        could differ at the byte level (mean -0.0 vs 0.0)."""
        ms = [d.means for d in digests if len(d.means)]
        if not ms:
            return cls(delta)
        m = np.concatenate(ms) + 0.0
        w = np.concatenate([d.weights for d in digests if len(d.means)])
        order = np.lexsort((w, m))  # mean asc, weight tiebreak → canonical
        means, weights = _compress(m[order], w[order], delta)
        return cls(delta, means, weights)

    def quantile(self, q: float) -> float:
        """Standard centroid interpolation at cumulative rank q·W."""
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        W = self.weights.sum()
        target = q * W
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        span = cum[i + 1] - cum[i]
        frac = (target - cum[i]) / span if span > 0 else 0.0
        lo, hi = self.means[i], self.means[i + 1]
        # clamp into the segment: lo + frac*(hi-lo) can overshoot past hi
        # by one ulp near frac=1 (catastrophic cancellation when |lo|≫|hi|),
        # which breaks cross-segment quantile monotonicity. The fused form
        # is monotone in frac under rounding, and clip preserves that, so
        # clamped quantiles are monotone in q.
        return float(min(max(lo + frac * (hi - lo), lo), hi))

    # -- serialization (sketch rows shuffle as bytes) -------------------
    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, delta: int = 200) -> "TDigest":
        arr = np.frombuffer(blob, dtype="<f8")
        n = len(arr) // 2
        return cls(delta, arr[:n] + 0.0, arr[n:].copy())


def _k1(q: float, delta: int) -> float:
    return delta / (2 * np.pi) * np.arcsin(2 * q - 1)


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Greedy left-to-right packing of sorted centroids under the k1
    scale-function bound (pure function of the sorted input)."""
    W = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    q0 = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q2 = q0 + (cur_w + w) / W
        if _k1(min(q2, 1.0), delta) - _k1(q0, delta) <= 1.0:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / W
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def grouped_approx_quantiles(ds, key: str, col: str, qs: list[float],
                             delta: int = 200):
    """Per-group t-digest quantiles: batch digests → one sketch shuffle →
    order-independent merge → interpolated quantiles. Columns are
    ``q_<percent>`` (e.g. q_50 for the median)."""
    qcols = [f"q_{int(round(q * 100))}" for q in qs]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in batch.groupby(key, sort=True):
            rows.append((k, TDigest.of(g[col].to_numpy(), delta).to_bytes()))
        return pd.DataFrame(rows, columns=[key, "digest"])

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        d = TDigest.merge_all(
            [TDigest.from_bytes(blob, delta) for blob in group["digest"]], delta
        )
        row = {key: [group[key].iloc[0]]}
        for q, qc in zip(qs, qcols):
            row[qc] = [d.quantile(q)]
        return pd.DataFrame(row)

    out = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort(key)


# ---------------------------------------------------------------------------
# heavy hitters: Misra-Gries candidates + exact verification (two-pass)
# ---------------------------------------------------------------------------


def misra_gries_partial(values, k: int) -> dict:
    """One batch → a Misra-Gries summary of at most k counters. Guarantee:
    any value with frequency > n/(k+1) in the batch survives."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def merge_summaries(summaries: list[dict], k: int) -> dict:
    """Mergeable MG: sum counters, then decrement-prune back to k entries
    (Agarwal et al. — the merged summary keeps the same n/(k+1) bound)."""
    total: dict = {}
    for s in summaries:
        for key, c in s.items():
            total[key] = total.get(key, 0) + c
    if len(total) <= k:
        return total
    # prune: subtract the (len-k)-th largest residual so k survive
    cut = sorted(total.values(), reverse=True)[k]
    out = {key: c - cut for key, c in total.items() if c > cut}
    return out


def exact_heavy_hitters(ds, col: str, top_k: int, sketch_k: int | None = None):
    """EXACT top-k most frequent values with bounded shuffle.

    Pass 1: each batch emits a pruned count summary (vectorized
    ``value_counts`` — an exact per-batch count is a Misra-Gries summary
    with zero error — decrement-pruned to ``sketch_k`` entries, so each
    block ships at most sketch_k (value, c) rows plus one unconditional
    n_rows accounting row). The driver merges by SUMMING per-value counts
    across all partial rows (groupby-sum — duplicate values across frames
    must add, never collapse) and prunes ONCE, which preserves the MG
    guarantee: every value with frequency > n/(sketch_k+1) survives.

    Pass 2 counts ONLY candidate rows (broadcast membership filter →
    partial counts → one small driver groupby bounded by
    |candidates| × num_blocks rows).

    The result equals a full GROUP BY ... ORDER BY count LIMIT top_k
    whenever the top_k-th frequency clears the sketch bound — the bound is
    CHECKED, and if it doesn't hold the fallback is a fully DISTRIBUTED
    Ray ``groupby(col).count()`` + sort + limit (the driver only ever sees
    top_k rows, never the distinct-value set — no silently approximate
    output either way).

    Merge shape (round 5): partials merge through a Ray
    ``groupby(value).sum(c)`` + sort + ``limit(sketch_k + 1)`` — the
    decrement-prune only needs the (sketch_k+1)-th largest merged count
    (the cut) and the entries above it, so the driver receives at most
    sketch_k + 1 rows, never a per-block partial concat. NULL values are
    counted exactly via unconditional per-block accounting rows (flagged
    ``is_total``, never a group key — a genuine null top-k value is
    reported, not silently dropped).

    Returns a pandas DataFrame (value, n) ordered by (n desc, value asc,
    nulls last — DuckDB's default)."""
    import pandas as pd

    sketch_k = sketch_k or max(64, 8 * top_k)

    def _value_series(vals: list, like: pd.Series) -> pd.Series:
        """Schema-stable value column: the input column's dtype with a
        nullable slot for the accounting row (int64 → Int64 etc.), so
        every block's Arrow schema is identical."""
        dt = like.dtype
        if dt.kind in "iu":
            return pd.Series(vals, dtype="Int64")
        if dt.kind == "b":
            return pd.Series(vals, dtype="boolean")
        if dt.kind == "f":
            return pd.Series(vals, dtype="Float64")
        return pd.Series(vals, dtype="object")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[col]
        nn = int(s.isna().sum())
        vc = s.value_counts(sort=False)  # non-null exact per-batch counts
        mg = merge_summaries([dict(zip(vc.index, vc.to_numpy()))], sketch_k)
        k_ = len(mg)
        # the accounting row (is_total) is emitted even for an all-null or
        # pruned-empty batch — no undercount of n_total / null_total
        return pd.DataFrame({
            "value": _value_series(list(mg.keys()) + [None], s),
            "c": pd.Series([int(c) for c in mg.values()] + [0],
                           dtype="int64"),
            "n_rows": pd.Series([0] * k_ + [len(batch)], dtype="int64"),
            "null_c": pd.Series([0] * k_ + [nn], dtype="int64"),
            "is_total": pd.Series([False] * k_ + [True], dtype="bool"),
        })

    # partials are tiny (≤ sketch_k+1 rows per block) — materialize once,
    # consume for accounting sums and the distributed candidate merge
    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    acct = parts.sum(["n_rows", "null_c"])
    n_total = int(acct["sum(n_rows)"]) if acct else 0
    null_total = int(acct["sum(null_c)"]) if acct else 0
    n_nonnull = n_total - null_total

    def count_rows_only(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[~batch["is_total"], ["value", "c"]]

    # distributed merge: SUM per value (duplicates across blocks must add),
    # then only the top sketch_k+1 merged rows reach the driver — exactly
    # what the decrement-prune needs (cut = the (sketch_k+1)-th largest;
    # candidates = merged counts strictly above it)
    summed = (
        parts.map_batches(count_rows_only, batch_format="pandas")
        .groupby("value").sum("c")
        .sort(["sum(c)", "value"], descending=[True, False])
        .limit(sketch_k + 1)
        .to_pandas()
    )
    if "value" not in summed.columns:  # fully-empty input: no partial rows
        summed = pd.DataFrame({"value": pd.Series(dtype="object"),
                               "sum(c)": pd.Series(dtype="int64")})
    if len(summed) > sketch_k:
        cut = int(summed["sum(c)"].iloc[sketch_k])
        cand_rows = summed[summed["sum(c)"] > cut]
    else:
        cand_rows = summed
    cand = set(cand_rows["value"].tolist())

    def count_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[batch[col].isin(cand)]
        g = sel.groupby(col, sort=True).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g.rename(columns={col: "value"})

    # pass 2: exact candidate counts, merged distributedly — the driver
    # sees ≤ |candidates| ≤ sketch_k rows
    counted = (
        ds.map_batches(count_candidates, batch_format="pandas")
        .groupby("value").sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    if "n" not in counted.columns:  # no candidate hit anywhere
        counted = pd.DataFrame({"value": pd.Series(dtype="object"),
                                "n": pd.Series(dtype="int64")})
    counted["n"] = counted["n"].astype("int64")
    if null_total > 0:  # exact from the accounting sums — always complete
        counted = pd.concat(
            [counted, pd.DataFrame({"value": [None],
                                    "n": pd.Series([null_total],
                                                   dtype="int64")})],
            ignore_index=True)
    exact = counted.sort_values(["n", "value"], ascending=[False, True],
                                kind="mergesort", na_position="last")
    top = exact.head(top_k).reset_index(drop=True)
    # soundness check: the sketch only guarantees recall of NON-NULL values
    # above the bound (null counts are exact regardless)
    bound = n_nonnull / (sketch_k + 1)
    nn_top = top[top["value"].notna()]
    if len(top) < top_k or (len(nn_top) and nn_top["n"].iloc[-1] <= bound):
        # cannot prove completeness — run the exact full count as a
        # DISTRIBUTED hash aggregate; only top_k rows reach the driver.
        full = ds.groupby(col).count()
        full = full.sort(["count()", col], descending=[True, False]).limit(
            top_k + 1)  # +1: make room in case the engine emitted a null row
        fdf = full.to_pandas().rename(columns={col: "value", "count()": "n"})
        fdf = fdf[fdf["value"].notna()]  # null handled exactly below
        fdf["n"] = fdf["n"].astype("int64")
        if null_total > 0:
            fdf = pd.concat(
                [fdf, pd.DataFrame({"value": [None],
                                    "n": pd.Series([null_total],
                                                   dtype="int64")})],
                ignore_index=True)
        top = (
            fdf.sort_values(["n", "value"], ascending=[False, True],
                            kind="mergesort", na_position="last")
            .head(top_k).reset_index(drop=True)
        )
    return top.reset_index(drop=True)
