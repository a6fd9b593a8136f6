"""Sequence packing: fill fixed-length training windows with documents.

LLM pre-training wants context windows of exactly ``max_len`` tokens;
concatenating documents naively wastes the tail of every window. This
operator packs each batch's documents into bins with first-fit-decreasing
(FFD — sort by length desc, place each doc into the first bin it fits,
else open a new bin), the standard 11/9·OPT+1 heuristic.

Distribution model: packing is BATCH-LOCAL — bins never span batches, so
the stage is an embarrassingly parallel ``map_batches`` with no shuffle.
That costs a little packing efficiency at batch boundaries (bounded by
one partially-filled bin per batch) and buys linear scaling; callers who
need reproducible bin ids across runs must pin the partitioning (same
rule as every batch-sensitive golden in this repo). Bin keys are the
minimum doc id in the bin — deterministic given the batch's row set.

Documents longer than ``max_len`` are truncated to exactly one full bin
(count of truncated docs is reported; never silently dropped).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_batch(batch: pd.DataFrame, max_len: int,
               id_col: str = "doc_id", len_col: str = "n_tokens") -> pd.DataFrame:
    """FFD-pack one batch: rows (bin_key, n_docs, used, padding,
    truncated) — one row per produced bin."""
    ids = batch[id_col].to_numpy()
    lens = np.minimum(batch[len_col].to_numpy(dtype=np.int64), max_len)
    truncated = (batch[len_col].to_numpy(dtype=np.int64) > max_len)
    # deterministic FFD: length desc, id asc tiebreak
    order = np.lexsort((ids, -lens))
    bin_used: list[int] = []
    bin_ids: list[list] = []
    bin_trunc: list[int] = []
    for i in order:
        size = int(lens[i])
        placed = False
        for b in range(len(bin_used)):
            if bin_used[b] + size <= max_len:
                bin_used[b] += size
                bin_ids[b].append(ids[i])
                bin_trunc[b] += int(truncated[i])
                placed = True
                break
        if not placed:
            bin_used.append(size)
            bin_ids.append([ids[i]])
            bin_trunc.append(int(truncated[i]))
    return pd.DataFrame({
        "bin_key": pd.Series([min(m) for m in bin_ids], dtype="int64"),
        "n_docs": pd.Series([len(m) for m in bin_ids], dtype="int64"),
        "used": pd.Series(bin_used, dtype="int64"),
        "padding": pd.Series([max_len - u for u in bin_used], dtype="int64"),
        "truncated": pd.Series(bin_trunc, dtype="int64"),
    })


def pack_sequences(ds, max_len: int, id_col: str = "doc_id",
                   len_col: str = "n_tokens"):
    """Distributed batch-local FFD packing → one row per bin."""
    import functools

    return ds.map_batches(
        functools.partial(pack_batch, max_len=max_len, id_col=id_col,
                          len_col=len_col),
        batch_format="pandas",
    )


def packing_stats(ds, max_len: int, **kw) -> pd.DataFrame:
    """Corpus packing summary: (n_bins, n_docs, used, padding, truncated,
    efficiency_pct) — a tiny one-row aggregate of the bin stream."""
    bins = pack_sequences(ds, max_len, **kw)
    totals = {"n_bins": 0, "n_docs": 0, "used": 0, "padding": 0, "truncated": 0}
    for b in bins.iter_batches(batch_size=4096, batch_format="pandas"):
        totals["n_bins"] += len(b)
        totals["n_docs"] += int(b["n_docs"].sum())
        totals["used"] += int(b["used"].sum())
        totals["padding"] += int(b["padding"].sum())
        totals["truncated"] += int(b["truncated"].sum())
    total_slots = totals["used"] + totals["padding"]
    eff = (100 * totals["used"] // total_slots) if total_slots else 0
    return pd.DataFrame([{**totals, "efficiency_pct": int(eff)}])
