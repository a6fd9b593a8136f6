"""Sharded URL-seen dedupe (SURVEY.md §2.4 J3, §2.7 D2).

The URL-seen set is the one piece of state the Dataset API genuinely cannot
express (a shared mutable membership index mutated mid-pipeline), so it drops
to raw Ray actors: one ``FilterShard`` per ``url_hash % S`` key range, each
holding a cuckoo filter page. Candidates are routed by hash — an explicit
hash-partitioned semi/anti-join — and each shard answers "which of these are
new" in one message per wave (not per URL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.filters import CuckooFilter, deserialize_filter


@ray.remote(num_cpus=0.25)
class FilterShard:
    """Owns the URL-seen page for one hash shard."""

    def __init__(self, capacity: int = 1 << 16):
        self.filter = CuckooFilter(capacity)

    def check_and_add(self, hashes: list[int]) -> list[bool]:
        """For each hash (in order): True if new (now recorded).
        Vectorized numpy probe (filters.check_and_add_many) under the hood."""
        return self.filter.check_and_add_many(
            np.asarray(hashes, dtype=np.uint64)
        ).tolist()

    def contains(self, hashes: list[int]) -> list[bool]:
        return self.filter.contains_many(np.asarray(hashes, dtype=np.uint64)).tolist()

    def size(self) -> int:
        return self.filter.count

    def serialize(self) -> bytes:
        return self.filter.serialize()

    def restore(self, page: bytes) -> int:
        self.filter = deserialize_filter(page)
        return self.filter.count


class ShardedSeenSet:
    """Driver-side handle over the S filter shards."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [
            FilterShard.options(name=None).remote(capacity_per_shard)
            for _ in range(num_shards)
        ]

    def _route(self, hashes: np.ndarray) -> list[np.ndarray]:
        shard_ids = hashes % np.uint64(self.num_shards)
        return [np.flatnonzero(shard_ids == s) for s in range(self.num_shards)]

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Vector in, boolean 'is new' vector out; one RPC per shard."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=bool)
        index_groups = self._route(hashes)
        futures = []
        for s, idxs in enumerate(index_groups):
            if idxs.size:
                futures.append((idxs, self.shards[s].check_and_add.remote(hashes[idxs].tolist())))
        for idxs, fut in futures:
            out[idxs] = ray.get(fut)
        return out

    def serialize_pages(self) -> list[bytes]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def restore_pages(self, pages: list[bytes]) -> None:
        assert len(pages) == self.num_shards
        ray.get([s.restore.remote(p) for s, p in zip(self.shards, pages)])

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def exact_dedupe_first(ds, key: str = "url_hash"):
    """Exact within-wave dedupe as a Dataset op: hash-partition by key, keep
    the first row per group (deterministic tie-break on url_canon)."""
    import pandas as pd

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("url_canon").head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")
