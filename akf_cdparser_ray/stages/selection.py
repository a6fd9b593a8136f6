"""Global EXACT quantiles by distributed histogram selection — the exact
complement to the t-digest sketch (stages/sketches): no single worker
ever holds the column, yet the answer is the true order statistic
(DuckDB ``quantile_disc`` rule: 0-based index floor(q*(n-1)) over the
sorted non-null values).

The classic multi-round selection shape (the same idea DBs use for
exact percentile pushdown): each round is ONE stateless ``map_batches``
histogram pass; every batch reduces to a DENSE bucket-count array (one
bytes row), a bounded combiner stage sums them 64-at-a-time (so the
driver sees num_blocks/64 rows, never a per-bucket keyed shuffle — a
groupby over ~4k bucket keys walks groups in Python, measured 20x
slower), and the driver walks the cumulative histogram to find each
rank's bucket. All requested quantiles SHARE the first round (same
global bracket), their target buckets are collected in ONE union
filter pass, and only a bucket that exceeds ``collect_cap`` recurses
into its own refinement rounds. Rounds are O(log_B(range/precision));
with B=4096 a single refine handles 10^9 uniformly-spread rows.

The input Dataset is consumed once per round + once to collect — pass a
stable source (a parquet read or a spilled/materialized projection),
the same contract as kmeans_ds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from akf_cdparser_ray.logquiet import silence_empty_block_schema_warnings


def _hist_pass(ds, col: str, lo: float, hi: float, num_buckets: int):
    """One distributed histogram round: counts of values in [lo, hi]
    against uniform bucket edges (right-closed last bucket). Per-batch
    partials are dense int64 arrays (bytes rows); a bounded tree stage
    combines them so driver traffic is num_blocks/64 rows."""
    edges = np.linspace(lo, hi, num_buckets + 1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if col not in batch.columns or not len(batch):
            return pd.DataFrame({"h": pd.Series(dtype="object")})
        v = batch[col].dropna().to_numpy(dtype=np.float64)
        v = v[(v >= lo) & (v <= hi)]
        b = np.minimum(np.searchsorted(edges, v, side="right") - 1,
                       num_buckets - 1)
        counts = np.bincount(b, minlength=num_buckets).astype(np.int64)
        return pd.DataFrame({"h": pd.Series([counts.tobytes()],
                                            dtype="object")})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if "h" not in batch.columns or not len(batch):
            return pd.DataFrame({"h": pd.Series(dtype="object")})
        acc = np.zeros(num_buckets, dtype=np.int64)
        for blob in batch["h"]:
            acc += np.frombuffer(blob, dtype=np.int64)
        return pd.DataFrame({"h": pd.Series([acc.tobytes()],
                                            dtype="object")})

    rows = (ds.map_batches(partial, batch_format="pandas")
            .map_batches(combine, batch_format="pandas", batch_size=64))
    counts = np.zeros(num_buckets, dtype=np.int64)
    for b in rows.iter_batches(batch_format="pandas"):
        if len(b.columns):
            for blob in b["h"]:
                counts += np.frombuffer(blob, dtype=np.int64)
    return counts, edges


def _collect_ranges(ds, col: str, ranges) -> np.ndarray:
    """Pull only the values inside the union of [lo, hi) / [lo, hi]
    ranges to the driver — by construction at most collect_cap per
    range. ``ranges``: list of (lo, hi, last_inclusive)."""
    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if col not in batch.columns or not len(batch):
            return pd.DataFrame({col: pd.Series(dtype="float64")})
        v = batch[col].dropna().to_numpy(dtype=np.float64)
        sel = np.zeros(len(v), dtype=bool)
        for lo, hi, inc in ranges:
            sel |= (v >= lo) & ((v <= hi) if inc else (v < hi))
        return pd.DataFrame({col: v[sel]})

    parts = [b[col].to_numpy() for b in
             ds.map_batches(filt, batch_format="pandas")
             .iter_batches(batch_format="pandas") if len(b.columns)]
    return (np.sort(np.concatenate(parts)) if parts
            else np.empty(0, np.float64))


def _refine(ds, col, k, lo, hi, base, num_buckets, collect_cap,
            max_rounds):
    """Per-quantile recursion (rare path): narrow [lo, hi] until the
    rank-holding bucket fits collect_cap, then select locally."""
    for _ in range(max_rounds):
        if lo == hi:
            return lo
        counts, edges = _hist_pass(ds, col, lo, hi, num_buckets)
        cum = np.cumsum(counts)
        r = k - base
        b = int(np.searchsorted(cum, r + 1, side="left"))
        before = int(cum[b - 1]) if b else 0
        blo, bhi = float(edges[b]), float(edges[b + 1])
        last = b == num_buckets - 1
        if int(counts[b]) <= collect_cap:
            vals = _collect_ranges(ds, col, [(blo, bhi, last)])
            return float(vals[r - before])
        if blo == bhi or np.nextafter(blo, bhi) == bhi:
            return blo  # bucket cannot split further: all equal
        lo, hi, base = blo, bhi, base + before
    # rounds exhausted: honest fallback — collect the remaining bracket
    vals = _collect_ranges(ds, col, [(lo, hi, True)])
    return float(vals[k - base])


def global_exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                           num_buckets: int = 4096,
                           collect_cap: int = 2_000_000,
                           max_rounds: int = 8) -> pd.DataFrame:
    """Exact global order statistics for each q in ``qs``. Returns a
    DataFrame (q, value, n) where value is a true data element — DuckDB
    ``quantile_disc(col, q)`` bit-for-bit. All quantiles share the
    first histogram round and one union collect pass; common case =
    three passes total regardless of len(qs)."""
    stats = (ds.map_batches(
        lambda b: pd.DataFrame({
            "n": [int(b[col].notna().sum())
                  if col in b.columns else 0],
            "mn": [float(b[col].min()) if col in b.columns
                   and b[col].notna().any() else np.inf],
            "mx": [float(b[col].max()) if col in b.columns
                   and b[col].notna().any() else -np.inf]}),
        batch_format="pandas").to_pandas())
    n = int(stats["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="float64"),
                             "n": pd.Series(dtype="int64")})
    gmin, gmax = float(stats["mn"].min()), float(stats["mx"].max())

    out = {}
    if gmin == gmax:
        for q in qs:
            out[q] = gmin
    else:
        counts, edges = _hist_pass(ds, col, gmin, gmax, num_buckets)
        cum = np.cumsum(counts)
        easy, hard = {}, {}
        for q in qs:
            k = int(np.floor(q * (n - 1)))  # 0-based target rank
            b = int(np.searchsorted(cum, k + 1, side="left"))
            before = int(cum[b - 1]) if b else 0
            blo, bhi = float(edges[b]), float(edges[b + 1])
            last = b == num_buckets - 1
            if int(counts[b]) <= collect_cap:
                easy[q] = (k, b, before, blo, bhi, last)
            else:
                hard[q] = (k, before, blo, bhi)
        if easy:
            ranges = sorted({(blo, bhi, last)
                             for (_, _, _, blo, bhi, last) in easy.values()})
            vals = _collect_ranges(ds, col, ranges)
            for q, (k, b, before, blo, bhi, last) in easy.items():
                # rank within the UNION collect: values below this
                # bucket's lo that were collected for other quantiles
                # shift the index
                below = int(np.searchsorted(vals, blo, side="left"))
                out[q] = float(vals[below + (k - before)])
        for q, (k, before, blo, bhi) in hard.items():
            out[q] = _refine(ds, col, k, blo, bhi, before,
                             num_buckets, collect_cap, max_rounds)
    return pd.DataFrame({
        "q": [float(q) for q in qs],
        "value": [out[q] for q in qs],
        "n": pd.Series([n] * len(qs), dtype="int64")})
