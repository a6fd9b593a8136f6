"""Global EXACT quantiles by distributed histogram selection — the exact
complement to the t-digest sketch (stages/sketches): no single worker
ever holds the column, yet the answer is the true order statistic
(DuckDB ``quantile_disc`` rule: 0-based index max(0, ceil(q*n) - 1)
over the sorted non-null values — probed empirically against DuckDB on
integer-and-fractional q*n edge cases; the multiply happens in the same
double arithmetic both sides).

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

import math

import numpy as np
import pandas as pd

from akf_cdparser_ray.logquiet import silence_empty_block_schema_warnings


def _disc_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc's 0-based target rank (see module note)."""
    return max(0, math.ceil(q * n) - 1)


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
            k = _disc_rank(q, n)  # 0-based target rank
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


def grouped_exact_quantile(ds, key: str, col: str, q: float = 0.5,
                           alias: str = "value",
                           num_buckets: int = 4096,
                           collect_cap: int = 2_000_000,
                           max_rounds: int = 8) -> pd.DataFrame:
    """Exact per-group order statistic WITHOUT the whole-group-on-one-
    worker contract that ``windows.grouped_median`` (and every SQL
    engine's hash aggregate) carries: the histogram-selection rounds of
    :func:`global_exact_quantiles`, run for ALL groups simultaneously —
    each batch emits one dense bucket-count bytes row PER ACTIVE GROUP,
    the driver walks each group's cumulative histogram, groups whose
    rank-holding bucket fits ``collect_cap`` resolve in one shared
    collect pass, and only oversized buckets recurse. Driver traffic
    per round is O(groups x blocks) histogram rows + O(collect_cap)
    values per resolving group — a group with 10^10 rows costs the same
    rounds as one with 10^3. Group CARDINALITY must be driver-bounded
    (same contract as every per-key broadcast here).

    DuckDB mirror: ``quantile_disc(col, q) .. GROUP BY key``. Returns
    (key, alias, n) sorted by key."""
    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if key not in batch.columns or not len(batch):
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "mn": pd.Series(dtype="float64"),
                                 "mx": pd.Series(dtype="float64")})
        rows = {key: [], "n": [], "mn": [], "mx": []}
        for kval, g in batch.groupby(key, sort=False):
            v = g[col].dropna()
            rows[key].append(kval)
            rows["n"].append(int(len(v)))
            rows["mn"].append(float(v.min()) if len(v) else np.inf)
            rows["mx"].append(float(v.max()) if len(v) else -np.inf)
        return pd.DataFrame(rows)

    st = [b for b in ds.map_batches(stats_partial, batch_format="pandas")
          .iter_batches(batch_format="pandas") if len(b.columns)]
    stats = (pd.concat(st, ignore_index=True) if st
             else stats_partial(pd.DataFrame()))
    agg = stats.groupby(key).agg(n=("n", "sum"), mn=("mn", "min"),
                                 mx=("mx", "max"))
    # active bracket per group: (target rank k, lo, hi, base)
    active, resolved, ns = {}, {}, {}
    for kval, row in agg.iterrows():
        n = int(row["n"])
        ns[kval] = n
        if n == 0:
            resolved[kval] = float("nan")
        elif row["mn"] == row["mx"]:
            resolved[kval] = float(row["mn"])
        else:
            active[kval] = (_disc_rank(q, n),
                            float(row["mn"]), float(row["mx"]), 0)

    for _round in range(max_rounds + 1):
        if not active:
            break
        brackets = {k2: (lo, hi) for k2, (_, lo, hi, _) in active.items()}
        final = _round == max_rounds  # fallback: collect whole brackets

        def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
            silence_empty_block_schema_warnings()
            if key not in batch.columns or not len(batch):
                return pd.DataFrame({key: pd.Series(dtype="object"),
                                     "h": pd.Series(dtype="object")})
            rows = {key: [], "h": []}
            for kval, g in batch.groupby(key, sort=False):
                br = brackets.get(kval)
                if br is None:
                    continue
                lo, hi = br
                edges = np.linspace(lo, hi, num_buckets + 1)
                v = g[col].dropna().to_numpy(dtype=np.float64)
                v = v[(v >= lo) & (v <= hi)]
                b = np.minimum(
                    np.searchsorted(edges, v, side="right") - 1,
                    num_buckets - 1)
                rows[key].append(kval)
                rows["h"].append(np.bincount(
                    b, minlength=num_buckets).astype(np.int64).tobytes())
            return pd.DataFrame(rows)

        def hist_combine(batch: pd.DataFrame) -> pd.DataFrame:
            silence_empty_block_schema_warnings()
            if key not in batch.columns or not len(batch):
                return pd.DataFrame({key: pd.Series(dtype="object"),
                                     "h": pd.Series(dtype="object")})
            rows = {key: [], "h": []}
            for kval, g in batch.groupby(key, sort=False):
                acc = np.zeros(num_buckets, dtype=np.int64)
                for blob in g["h"]:
                    acc += np.frombuffer(blob, dtype=np.int64)
                rows[key].append(kval)
                rows["h"].append(acc.tobytes())
            return pd.DataFrame(rows)

        hrows = [b for b in
                 ds.map_batches(hist_partial, batch_format="pandas")
                 .map_batches(hist_combine, batch_format="pandas",
                              batch_size=64)
                 .iter_batches(batch_format="pandas") if len(b.columns)]
        hall = (pd.concat(hrows, ignore_index=True) if hrows
                else hist_partial(pd.DataFrame()))
        counts_by = {}
        for kval, g in hall.groupby(key, sort=False):
            acc = np.zeros(num_buckets, dtype=np.int64)
            for blob in g["h"]:
                acc += np.frombuffer(blob, dtype=np.int64)
            counts_by[kval] = acc

        collect_plan = {}  # key -> (lo, hi, inc, idx_within)
        next_active = {}
        for kval, (k, lo, hi, base) in active.items():
            counts = counts_by.get(kval, np.zeros(num_buckets, np.int64))
            edges = np.linspace(lo, hi, num_buckets + 1)
            cum = np.cumsum(counts)
            r = k - base
            b = int(np.searchsorted(cum, r + 1, side="left"))
            before = int(cum[b - 1]) if b else 0
            blo, bhi = float(edges[b]), float(edges[b + 1])
            last = b == num_buckets - 1
            if final or int(counts[b]) <= collect_cap:
                if final:
                    collect_plan[kval] = (lo, hi, True, r)
                else:
                    collect_plan[kval] = (blo, bhi, last, r - before)
            elif blo == bhi or np.nextafter(blo, bhi) == bhi:
                resolved[kval] = blo  # unsplittable: all equal
            else:
                next_active[kval] = (k, blo, bhi, base + before)

        if collect_plan:
            plan = dict(collect_plan)

            def coll(batch: pd.DataFrame) -> pd.DataFrame:
                silence_empty_block_schema_warnings()
                if key not in batch.columns or not len(batch):
                    return pd.DataFrame({key: pd.Series(dtype="object"),
                                         col: pd.Series(dtype="float64")})
                rows = {key: [], col: []}
                for kval, g in batch.groupby(key, sort=False):
                    pl = plan.get(kval)
                    if pl is None:
                        continue
                    lo, hi, inc, _ = pl
                    v = g[col].dropna().to_numpy(dtype=np.float64)
                    sel = (v >= lo) & ((v <= hi) if inc else (v < hi))
                    rows[key].extend([kval] * int(sel.sum()))
                    rows[col].extend(v[sel].tolist())
                return pd.DataFrame(rows)

            crows = [b for b in ds.map_batches(coll, batch_format="pandas")
                     .iter_batches(batch_format="pandas")
                     if len(b.columns)]
            call = (pd.concat(crows, ignore_index=True) if crows
                    else coll(pd.DataFrame()))
            for kval, (_, _, _, idx) in collect_plan.items():
                vals = np.sort(call[call[key] == kval][col].to_numpy())
                resolved[kval] = float(vals[idx])
        active = next_active

    out = pd.DataFrame({key: sorted(resolved),
                        alias: [resolved[k2] for k2 in sorted(resolved)]})
    out["n"] = pd.Series([ns[k2] for k2 in sorted(resolved)],
                         dtype="int64")
    return out
