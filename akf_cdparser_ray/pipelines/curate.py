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

Scale shape (round 4): the driver never holds a doc-id set — drop lists
are hash-partitioned into sorted object-store arrays and applied as
layout-preserving anti-joins (``stages/windows.anti_join_ids``); only
the verified near-dup PAIR list (output-sized) and final stats reach the
driver; text never does. Multi-consumer stages spill to disk as
block-preserving parquet (``sources/io.spill_dataset``) instead of
pinning the full filtered corpus in the object store per extra consumer.
Deterministic: spills and probes reproduce row order and block
boundaries exactly, so the funnel counts and FFD packing stats
golden-pin across all of it."""

from __future__ import annotations

import pandas as pd


def curate(ds, min_words: int = 20, neardup_threshold: float = 0.5,
           max_len: int = 512, num_shards: int = 16,
           spill_dir: str | None = None) -> pd.DataFrame:
    """Run the curation funnel over a (doc_id, text) Dataset; returns a
    one-row summary: per-stage survivor counts + packing stats.

    ``spill_dir`` hosts the inter-phase parquet spills (a scratch tempdir
    is created and removed when omitted); pass a durable path to keep the
    intermediate partitions for resume/inspection."""
    import functools
    import os
    import shutil
    import tempfile

    from ..sources.io import spill_dataset
    from ..stages.components import connected_components_ds
    from ..stages.dedup_text import minhash_lsh_pairs
    from ..stages.packing import packing_stats
    from ..stages.text_analysis import (
        scrub_pii_batch, token_count_batch,
    )
    from ..stages.windows import anti_join_ids

    own_spill = spill_dir is None
    if own_spill:
        spill_dir = tempfile.mkdtemp(prefix="curate_spill_")
    try:
        n_input = ds.count()

        # 1. quality gate — stateless vectorized filter; spilled because
        # three consumers read it (dup groupby, anti-join probe, count)
        def quality(batch: pd.DataFrame) -> pd.DataFrame:
            words = batch["text"].fillna("").str.split().str.len()
            return batch[words >= min_words]

        good, n_quality = spill_dataset(
            ds.map_batches(quality, batch_format="pandas"),
            os.path.join(spill_dir, "quality"))

        # 2. exact dedup — hash-partitioned content groupby emits the
        # non-min ids as a DATASET; the corpus streams through a
        # layout-preserving searchsorted probe against its object-store
        # shards (on a web corpus the duplicate set is 30-50% of all
        # docs — it must never become a driver set or a per-task copy)
        def non_min(group: pd.DataFrame) -> pd.DataFrame:
            if "doc_id" not in group.columns:  # column-less empty block
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
            m = group["doc_id"].min()
            return group[group["doc_id"] != m][["doc_id"]]

        dups_ds = good.groupby("text").map_groups(
            non_min, batch_format="pandas")
        survivors, n_exact = spill_dataset(
            anti_join_ids(good, dups_ds, key="doc_id",
                          num_shards=num_shards),
            os.path.join(spill_dir, "exact"))

        # 3. near-dup clusters over the exact-dedup survivors: verified
        # pairs stay a DATASET end-to-end (on a web corpus the pair list
        # scales with the duplicate population — 30-50% of docs — so it
        # must never be pulled to driver pandas) → distributed connected
        # components → the non-minimum cluster members as a Dataset →
        # anti-join probe. materialize() pins the output-sized pairs in
        # the object store so count + the components pass don't re-run
        # the minhash pipeline.
        pairs_ds = minhash_lsh_pairs(
            survivors, threshold=neardup_threshold,
            return_dataset=True).materialize()
        if pairs_ds.count():
            def to_edges(b: pd.DataFrame) -> pd.DataFrame:
                if "doc_a" not in b.columns or not len(b):
                    return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                         "b": pd.Series(dtype="int64")})
                return pd.DataFrame({"a": b["doc_a"].astype("int64"),
                                     "b": b["doc_b"].astype("int64")})

            edges_ds = pairs_ds.map_batches(to_edges, batch_format="pandas")
            comp = connected_components_ds(edges_ds, num_shards=num_shards)

            def cluster_drops(b: pd.DataFrame) -> pd.DataFrame:
                if "node" not in b.columns or not len(b):
                    return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
                sub = b[b["node"] != b["component"]]
                return pd.DataFrame({"doc_id": sub["node"].to_numpy()})

            drops = comp.map_batches(cluster_drops, batch_format="pandas")
            deduped = anti_join_ids(survivors, drops, key="doc_id",
                                    num_shards=num_shards)
        else:
            deduped = survivors

        # 4. PII scrub + 5. packing — one fused streaming pass (single
        # consumer: no spill; n_neardup falls out of the packing rollup,
        # which places every surviving doc exactly once)
        clean = deduped.map_batches(
            functools.partial(scrub_pii_batch, col="text"),
            batch_format="pyarrow")
        toks = clean.map_batches(token_count_batch, batch_format="pandas")
        pack = packing_stats(toks, max_len=max_len)

        out = pack.copy()
        out.insert(0, "n_input", n_input)
        out.insert(1, "n_quality", n_quality)
        out.insert(2, "n_exact", n_exact)
        out.insert(3, "n_neardup", int(pack["n_docs"].iloc[0]))
        return out
    finally:
        if own_spill:
            shutil.rmtree(spill_dir, ignore_errors=True)
