"""Global EXACT quantiles by distributed histogram selection — the exact
complement to the t-digest sketch (stages/sketches): no single worker
ever holds the column, yet the answer is the true order statistic
(DuckDB ``quantile_disc`` rule: 0-based index floor(q*(n-1)) over the
sorted non-null values).

The classic multi-round selection shape (Blum et al. selection networks
adapted to batch engines; the same idea DBs use for exact percentile
pushdown): each round is ONE stateless ``map_batches`` histogram pass
whose partials are (bucket, count) rows — a few thousand per batch —
merged by a tiny keyed sum; the driver walks the cumulative histogram to
find the bucket holding rank k, then either COLLECTS that bucket (when
its population fits ``collect_cap``) and selects locally, or recurses
into the bucket's value range. Rounds are O(log_B(range/precision));
with B=4096 a single refine handles 10^9 uniformly-spread rows.

The input Dataset is consumed once per round + once to collect — pass a
stable source (a parquet read or a spilled/materialized projection), the
same contract as kmeans_ds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from akf_cdparser_ray.logquiet import silence_empty_block_schema_warnings


def _hist_pass(ds, col: str, lo: float, hi: float, num_buckets: int):
    """One distributed histogram round: counts of values in [lo, hi]
    against uniform bucket edges (right-closed last bucket). Returns the
    dense per-bucket int64 counts (driver-side, num_buckets entries)."""
    from ray.data.aggregate import Sum

    edges = np.linspace(lo, hi, num_buckets + 1)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if col not in batch.columns or not len(batch):
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "cnt": pd.Series(dtype="int64")})
        v = batch[col].dropna().to_numpy(dtype=np.float64)
        v = v[(v >= lo) & (v <= hi)]
        b = np.minimum(np.searchsorted(edges, v, side="right") - 1,
                       num_buckets - 1)
        ids, cnts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": ids.astype(np.int64),
                             "cnt": cnts.astype(np.int64)})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
           .to_pandas())
    counts = np.zeros(num_buckets, dtype=np.int64)
    if len(agg):
        counts[agg["bucket"].to_numpy()] = agg["cnt"].to_numpy()
    return counts, edges


def _collect_range(ds, col: str, lo: float, hi: float,
                   last_inclusive: bool) -> np.ndarray:
    """Pull only the values inside [lo, hi) (or [lo, hi]) to the driver —
    by construction at most collect_cap of them."""
    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if col not in batch.columns or not len(batch):
            return pd.DataFrame({col: pd.Series(dtype="float64")})
        v = batch[col].dropna().to_numpy(dtype=np.float64)
        sel = (v >= lo) & ((v <= hi) if last_inclusive else (v < hi))
        return pd.DataFrame({col: v[sel]})

    parts = [b[col].to_numpy() for b in
             ds.map_batches(filt, batch_format="pandas")
             .iter_batches(batch_format="pandas") if len(b.columns)]
    return (np.sort(np.concatenate(parts)) if parts
            else np.empty(0, np.float64))


def global_exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                           num_buckets: int = 4096,
                           collect_cap: int = 2_000_000,
                           max_rounds: int = 8) -> pd.DataFrame:
    """Exact global order statistics for each q in ``qs``. Returns a
    DataFrame (q, value, n) where value is a true data element — DuckDB
    ``quantile_disc(col, q)`` bit-for-bit."""
    from ray.data.aggregate import Count, Max, Min

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

    out = []
    for q in qs:
        k = int(np.floor(q * (n - 1)))  # 0-based target rank
        lo, hi, base = gmin, gmax, 0
        value = None
        for _ in range(max_rounds):
            if lo == hi:
                value = lo
                break
            counts, edges = _hist_pass(ds, col, lo, hi, num_buckets)
            cum = np.cumsum(counts)
            r = k - base  # rank within [lo, hi]
            b = int(np.searchsorted(cum, r + 1, side="left"))
            before = int(cum[b - 1]) if b else 0
            blo, bhi = float(edges[b]), float(edges[b + 1])
            last = b == num_buckets - 1
            if int(counts[b]) <= collect_cap:
                vals = _collect_range(ds, col, blo, bhi, last)
                value = float(vals[r - before])
                break
            if blo == bhi or np.nextafter(blo, bhi) == bhi:
                value = blo  # bucket cannot split further: all equal
                break
            lo, hi, base = blo, bhi, base + before
        else:
            # rounds exhausted: fall back to collecting the remaining
            # bracket (honest failure beats a wrong answer if it's huge)
            vals = _collect_range(ds, col, lo, hi, True)
            value = float(vals[k - base])
        out.append((float(q), value))
    return pd.DataFrame({"q": [a for a, _ in out],
                         "value": [b for _, b in out],
                         "n": pd.Series([n] * len(out), dtype="int64")})
