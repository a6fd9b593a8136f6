"""Process-cached task-based stage functions (the throughput path).

Ray Data fuses consecutive task-based ``map_batches`` into one operator
(no object-store hop between fetch and parse) and reuses worker processes,
so a lazily-built module-level singleton gives the same
"load dictionaries once per worker" amortization as an actor pool while
being ~3x faster end-to-end on this workload (measured: actor-pool chain
~730 pages/s vs fused task chain ~2200 pages/s at 32 CPUs).

The actor-pool classes in ``parse_stage.py`` / ``fetch.py`` remain the right
tool when the state is *mutable* (politeness buckets, seen-filters) or must
be pinned (shard ownership); for read-only state, prefer these functions.
"""

from __future__ import annotations

import pyarrow as pa

_CACHE: dict = {}


def cached_fetch_batch(corpus_size: int, seed: int = 42):
    """Returns a task-ready batch fn with a per-process SyntheticFetcher."""
    from .fetch import SyntheticFetcher

    key = ("fetch", corpus_size, seed)

    def fn(batch: pa.Table) -> pa.Table:
        f = _CACHE.get(key)
        if f is None:
            f = _CACHE[key] = SyntheticFetcher(corpus_size, seed)
        return f(batch)

    return fn


def cached_parse_batch(dictfiles_dir: str | None = None, with_residue: bool = False,
                       with_audit: bool = False, with_lse: bool = False):
    """Returns a task-ready batch fn with a per-process ParseProfiles."""
    from .parse_stage import ParseProfiles

    key = ("parse", dictfiles_dir, with_residue, with_audit, with_lse)

    def fn(batch: pa.Table) -> pa.Table:
        p = _CACHE.get(key)
        if p is None:
            p = _CACHE[key] = ParseProfiles(dictfiles_dir, with_residue,
                                            with_audit=with_audit,
                                            with_lse=with_lse)
        return p(batch)

    return fn

