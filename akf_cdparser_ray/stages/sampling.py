"""Deterministic sampling / split operators for training-data pipelines.

Every operator here is a pure function of the row KEY (never of RNG
state, row order, or partitioning), so samples are reproducible across
runs, cluster sizes and resumes — the property a 100-TB pipeline needs
so re-running a failed shard yields the same split. The shared hash is
``md5_lower64(key)`` = the little-endian low 8 bytes of md5, chosen
because DuckDB's ``md5_number_lower`` computes the identical value —
each operator has a hash-exact SQL oracle.

- ``split_assign``: train/val/test (arbitrary named ratios) by hash
  bucket — a stateless vectorized ``map_batches`` column add.
- ``hash_sample``: Bernoulli sample at ``rate`` by hash threshold
  (optionally per-stratum) — a stateless filter, no shuffle.
- ``bottom_k_sample``: uniform-without-replacement k-sample as a
  deterministic "bottom-k by hash" — per-block top-k partials then one
  tiny merge, the mergeable form of reservoir sampling.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_BUCKETS = 10_000


def md5_lower64(value) -> int:
    """DuckDB ``md5_number_lower``-compatible 64-bit key hash."""
    digest = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(digest[8:], "little")


def _hash_col(values, salt: str = "") -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    enc = salt.encode("utf-8")
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode("utf-8") + enc).digest()
        out[i] = int.from_bytes(d[8:], "little")
    return out


def split_assign(ds, key: str, ratios: dict[str, float] | None = None,
                 salt: str = ""):
    """Add a ``split`` column: named splits by cumulative hash-bucket
    ranges over md5_lower64(key) % 10000 (row order / partitioning never
    matter; same key + salt → same split, forever)."""
    ratios = ratios or {"train": 0.8, "val": 0.1, "test": 0.1}
    assert abs(sum(ratios.values()) - 1.0) < 1e-9, "ratios must sum to 1"
    names = list(ratios)
    bounds = np.cumsum([ratios[n] for n in names]) * _BUCKETS

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        buckets = _hash_col(batch[key].tolist(), salt) % np.uint64(_BUCKETS)
        idx = np.searchsorted(bounds, buckets, side="right")
        batch["split"] = [names[i] for i in np.minimum(idx, len(names) - 1)]
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def hash_sample(ds, key: str, rate: float, salt: str = ""):
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    under ``rate`` — a stateless filter (no shuffle, no RNG)."""
    threshold = np.uint64(int(rate * _BUCKETS))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        buckets = _hash_col(batch[key].tolist(), salt) % np.uint64(_BUCKETS)
        return batch[buckets < threshold]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample_k(ds, group: str, key: str, k: int, salt: str = ""):
    """Exactly ``k`` rows per group (fewer if the group is smaller),
    chosen as the group's bottom-k by key hash — a deterministic
    stratified sample without replacement (per-class eval sets). One
    group-keyed shuffle; within each group the selection is the same
    mergeable bottom-k as :func:`bottom_k_sample`. SQL mirror:
    ``row_number() OVER (PARTITION BY group ORDER BY
    md5_number_lower(key), key) <= k``."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        h = _hash_col(g[key].tolist(), salt)
        return (
            g.assign(_h=h)
            .nsmallest(k, ["_h", key], keep="first")
            .drop(columns=["_h"])
        )

    out = ds.groupby(group).map_groups(per_group, batch_format="pandas")
    return out.sort([group, key])


def bottom_k_sample(ds, key: str, k: int, salt: str = ""):
    """Uniform k-sample without replacement: the k rows with the smallest
    key hash (ties impossible modulo md5 collisions; key ascending as the
    formal tiebreak). Mergeable reservoir shape: each block reduces to its
    own bottom-k, the driver merges k·num_blocks candidate rows — the
    payload never concentrates anywhere."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_col(batch[key].tolist(), salt)
        batch = batch.assign(_h=h)
        return batch.nsmallest(k, ["_h", key], keep="first")

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(["_h", key], ascending=[True, True])
        .head(k)
        .drop(columns=["_h"])
        .reset_index(drop=True)
    )
    return out
