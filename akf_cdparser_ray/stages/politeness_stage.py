"""Politeness gate shards (SURVEY.md §2.3 ST6, §2.4 J4).

Per-host robots caches + wave-refilled token buckets pinned to actors by
``hash(host) % P``. Hot hosts are salted over several shards
(``hash(host) ⊕ salt``), each salted slice holding ``budget / n_salts`` —
the explicit skew-splitting the north rule demands. One RPC per shard per
wave; decisions are deterministic given (bucket state, wave, sorted input).
"""

from __future__ import annotations

import hashlib
import json

import ray

from ..state.politeness import PolitenessState, TokenBucket, synth_robots_txt


def host_shard(host: str, salt: int, num_shards: int) -> int:
    digest = hashlib.blake2b(f"{host}|{salt}".encode(), digest_size=4).digest()
    return int.from_bytes(digest, "little") % num_shards


@ray.remote(num_cpus=0.05)
class PolitenessShard:
    """Gate actor for one host-hash shard."""

    def __init__(self, budgets: dict | None = None):
        self.state = PolitenessState(budgets, robots_fetch=synth_robots_txt)

    def gate(self, hosts: list[str], urls: list[str], wave: int,
             salts: dict) -> list[str]:
        """Columnar candidate fetches, sorted by (-priority, url_canon) by
        the caller. Returns one decision per row: 'allow' | 'defer' |
        'robots'. (Columnar args: one pickled list per column instead of a
        dict per row — the RPC payload is the wave's hot path.)"""
        decisions = []
        rules_for = self.state.rules_for
        bucket_for = self.state.bucket_for
        for host, url in zip(hosts, urls):
            n_salts = salts.get(host, 1)
            rules = rules_for(host)
            path = url.split(host, 1)[-1] or "/"
            if not rules.allowed(path):
                decisions.append("robots")
                continue
            bucket = bucket_for(host, n_salts)
            bucket.refill(wave)
            decisions.append("allow" if bucket.try_take() else "defer")
        return decisions

    def serialize(self) -> str:
        return json.dumps(
            {
                h: {"tokens": b.tokens, "wave": b.wave, "per_wave": b.per_wave, "burst": b.burst}
                for h, b in self.state.buckets.items()
            },
            sort_keys=True,
        )

    def restore(self, payload: str) -> int:
        data = json.loads(payload)
        for host, cfg in data.items():
            b = TokenBucket(cfg["per_wave"], cfg["burst"])
            b.tokens = cfg["tokens"]
            b.wave = cfg["wave"]
            self.state.buckets[host] = b
        return len(data)
