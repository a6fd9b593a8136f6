"""End-to-end training-data curation: the operators composed.

The canonical LLM-corpus pipeline, built entirely from this engine's
stages — each step is the distributed operator tested on its own, chained
as one lazy Dataset flow with only the tiny intermediates materialized:

    documents
      → quality gate        (vectorized word-count filter)
      → exact dedup         (content groupby, keep min doc_id)
      → near-dup clusters   (MinHash/LSH pairs → connected components →
                             drop every non-minimum cluster member)
      → PII scrub           (RE2 redaction)
      → sequence packing    (FFD into fixed windows)

Only doc-id SETS (the drop lists) and final stats reach the driver; text
never does. Deterministic: every constituent is, so the funnel counts
and packing stats golden-pin."""

from __future__ import annotations

import pandas as pd


def curate(ds, min_words: int = 20, neardup_threshold: float = 0.5,
           max_len: int = 512) -> pd.DataFrame:
    """Run the curation funnel over a (doc_id, text) Dataset; returns a
    one-row summary: per-stage survivor counts + packing stats."""
    import functools

    from ..stages.components import dedup_keep_set
    from ..stages.dedup_text import minhash_lsh_pairs
    from ..stages.packing import packing_stats
    from ..stages.text_analysis import (
        scrub_pii_batch, token_count_batch,
    )

    n_input = ds.count()

    # 1. quality gate — stateless vectorized filter
    def quality(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.split().str.len()
        return batch[words >= min_words]

    good = ds.map_batches(quality, batch_format="pandas")
    good = good.materialize()  # consumed by 3 branches below
    n_quality = good.count()

    # 2. exact dedup — hash-partitioned content groupby; the broadcast
    # side is the DUPLICATE id set (small — only actual dups), never the
    # keep set (which is the whole corpus)
    def non_min(group: pd.DataFrame) -> pd.DataFrame:
        if "doc_id" not in group.columns:  # column-less empty shuffle block
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        m = group["doc_id"].min()
        return group[group["doc_id"] != m][["doc_id"]]

    dups_ds = good.groupby("text").map_groups(non_min, batch_format="pandas")
    drop_exact: set = set()
    for b in dups_ds.iter_batches(batch_size=None, batch_format="pandas"):
        if "doc_id" in b.columns:
            drop_exact.update(b["doc_id"])

    # 3. near-dup clusters over the exact-dedup survivors
    survivors = good.map_batches(
        lambda b: b[~b["doc_id"].isin(drop_exact)], batch_format="pandas"
    ).materialize()
    n_exact = survivors.count()
    pairs = minhash_lsh_pairs(survivors, threshold=neardup_threshold)
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    drop: set = set()
    if len(pairs):
        cols = list(pairs.columns)[:2]
        edges = pairs.rename(columns={cols[0]: "a", cols[1]: "b"})[["a", "b"]]
        ks = dedup_keep_set(edges)
        drop = set(ks[~ks["keep"]]["node"])
    deduped = survivors.map_batches(
        lambda b: b[~b["doc_id"].isin(drop)], batch_format="pandas"
    ).materialize()
    n_neardup = deduped.count()

    # 4. PII scrub + 5. packing — one fused streaming pass
    clean = deduped.map_batches(
        functools.partial(scrub_pii_batch, col="text"), batch_format="pyarrow"
    )
    toks = clean.map_batches(token_count_batch, batch_format="pandas")
    pack = packing_stats(toks, max_len=max_len)

    out = pack.copy()
    out.insert(0, "n_input", n_input)
    out.insert(1, "n_quality", n_quality)
    out.insert(2, "n_exact", n_exact)
    out.insert(3, "n_neardup", n_neardup)
    return out
