"""The crawl loop (SURVEY.md §3.1 engine shape; BASELINE.json north rule).

One crawl step (wave) is a streaming ray.data pipeline:

    frontier dequeue (per-shard priority top-k, tie-broken on url)
      → politeness/robots gate (host-hash-pinned shard actors, hot-host salting)
      → fetch (synthetic, actor pool, num_cpus<1)
      → parse (dictionary actor pool) → image+caption pairs partition
      → link extraction → cuckoo-dedupe (url_hash-sharded filter actors)
      → frontier re-enqueue

Checkpointed per wave (frontier + filter pages + politeness buckets +
counters + lineage) so a killed job resumes exactly; dequeue order is a pure
function of (priority, url, wave) so the same seeds + budget replay to the
identical trace (replay invariant).

Scale notes: the frontier and per-wave candidate tables here are driver-side
pandas because the test corpus is tiny; every operation on them is written
as sort/groupby/merge so the 10^10-URL version swaps pandas for the
equivalent Dataset ops (per-shard ``groupby(shard).map_groups(topk)`` etc.)
without changing semantics. Content-bearing stages (fetch/parse/links) are
Ray Data pipelines already, and image bytes never enter a shuffle.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..sources import io as aio
from ..stages.cached import cached_fetch_batch, cached_parse_batch
from ..stages.dedupe import ShardedSeenSet
from ..stages.links import canonicalize_url, extract_links_batch, host_of, url_hash64
from ..stages.politeness_stage import PolitenessShard, host_shard

FRONTIER_COLS = ["url_canon", "url_hash", "host", "priority", "depth", "discovered_at"]


@dataclass
class CrawlConfig:
    seeds: list[str]
    corpus_size: int
    out_dir: str
    num_shards: int = 8
    num_politeness_shards: int = 4
    dequeue_k: int = 16            # per frontier shard per wave
    max_waves: int = 5
    hot_host_threshold: float = 0.25  # share of a wave's candidates
    n_salts: int = 4
    budgets: dict = field(default_factory=dict)
    filter_capacity: int = 1 << 16
    parse_concurrency: int | tuple = 2
    fetch_concurrency: int | tuple = 2
    batch_size: int = 32
    seed: int = 42


def _seed_frontier(cfg: CrawlConfig) -> pd.DataFrame:
    rows = []
    for url in cfg.seeds:
        canon = canonicalize_url(url)
        rows.append(
            {
                "url_canon": canon,
                "url_hash": np.uint64(url_hash64(canon)),
                "host": host_of(canon),
                "priority": 100,
                "depth": 0,
                "discovered_at": 0,
            }
        )
    df = pd.DataFrame(rows, columns=FRONTIER_COLS)
    return df.drop_duplicates("url_hash").reset_index(drop=True)


class CrawlJob:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.seen = ShardedSeenSet(cfg.num_shards, cfg.filter_capacity)
        self.gates = [PolitenessShard.remote(cfg.budgets) for _ in range(cfg.num_politeness_shards)]
        self.frontier = pd.DataFrame(columns=FRONTIER_COLS)
        self.wave = 0
        self.counters: list[dict] = []
        self.trace: list[tuple[int, int, str]] = []  # (wave, seq, url)

    # ------------------------------------------------------------------
    def _checkpoint_dir(self, wave: int) -> str:
        return os.path.join(self.cfg.out_dir, "checkpoint", f"wave{wave:03d}")

    def checkpoint(self) -> None:
        d = self._checkpoint_dir(self.wave)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(self.frontier, preserve_index=False),
                       os.path.join(d, "frontier.parquet"))
        fdir = os.path.join(d, "filters")
        os.makedirs(fdir, exist_ok=True)
        for i, page in enumerate(self.seen.serialize_pages()):
            with open(os.path.join(fdir, f"shard{i}.page"), "wb") as f:
                f.write(page)
        gate_states = ray.get([g.serialize.remote() for g in self.gates])
        meta = {
            "wave": self.wave,
            "counters": self.counters,
            "trace": self.trace,
            "gates": gate_states,
            "lineage": {
                "num_shards": self.cfg.num_shards,
                "seeds": self.cfg.seeds,
                "corpus_size": self.cfg.corpus_size,
            },
        }
        tmp = os.path.join(d, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(d, "meta.json"))
        # completion marker LAST: a checkpoint without it is ignored on resume
        with open(os.path.join(d, "_COMPLETE"), "w") as f:
            f.write("ok")

    def resume(self) -> bool:
        root = os.path.join(self.cfg.out_dir, "checkpoint")
        if not os.path.isdir(root):
            return False
        waves = sorted(
            w for w in os.listdir(root)
            if os.path.exists(os.path.join(root, w, "_COMPLETE"))
        )
        if not waves:
            return False
        d = os.path.join(root, waves[-1])
        self.frontier = pq.read_table(os.path.join(d, "frontier.parquet")).to_pandas()
        self.frontier["url_hash"] = self.frontier["url_hash"].astype(np.uint64)
        pages = []
        fdir = os.path.join(d, "filters")
        for i in range(self.cfg.num_shards):
            with open(os.path.join(fdir, f"shard{i}.page"), "rb") as f:
                pages.append(f.read())
        self.seen.restore_pages(pages)
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)
        self.wave = meta["wave"]
        self.counters = meta["counters"]
        self.trace = [tuple(t) for t in meta["trace"]]
        for g, state in zip(self.gates, meta["gates"]):
            ray.get(g.restore.remote(state))
        return True

    # ------------------------------------------------------------------
    def _enqueue_new(self, cand: pd.DataFrame, wave: int) -> int:
        """Cross-wave dedupe through the sharded cuckoo filters, then append
        the survivors to the frontier. Within-batch dedupe first (exact)."""
        if cand.empty:
            return 0
        cand = (
            cand.sort_values(["url_hash", "url_canon"])
            .drop_duplicates("url_hash")
            .reset_index(drop=True)
        )
        is_new = self.seen.check_and_add(cand["url_hash"].to_numpy(dtype=np.uint64))
        new = cand[is_new].copy()
        if new.empty:
            return 0
        new["priority"] = np.maximum(1, 100 - 10 * new["depth"].to_numpy()).astype("int64")
        new["discovered_at"] = wave
        self.frontier = pd.concat(
            [self.frontier, new[FRONTIER_COLS]], ignore_index=True
        )
        return len(new)

    # frontiers above this size dequeue through the distributed path
    DATASET_DEQUEUE_THRESHOLD = 50_000

    def _dequeue(self, k: int) -> pd.DataFrame:
        """Per-shard priority top-k with deterministic tie-breaks.

        Small frontiers use pandas driver-side; large ones the equivalent
        ``ds.groupby(shard).map_groups(topk)`` — never a global sort. Both
        paths produce identical results (tested)."""
        if self.frontier.empty:
            return self.frontier
        if len(self.frontier) > self.DATASET_DEQUEUE_THRESHOLD:
            return self._dequeue_dataset(k)
        return self._dequeue_pandas(k)

    def _dequeue_pandas(self, k: int) -> pd.DataFrame:
        f = self.frontier.copy()
        f["shard"] = (f["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(self.cfg.num_shards)).astype("int64")
        f = f.sort_values(["shard", "priority", "url_canon"], ascending=[True, False, True])
        dequeued = f.groupby("shard", sort=True).head(k)
        self.frontier = (
            f.drop(dequeued.index).drop(columns=["shard"]).reset_index(drop=True)
        )
        return dequeued.drop(columns=["shard"]).reset_index(drop=True)

    def _dequeue_dataset(self, k: int) -> pd.DataFrame:
        """Distributed per-shard top-k dequeue (the 10^10-URL path)."""
        num_shards = self.cfg.num_shards
        f = self.frontier.copy()
        f["shard"] = (
            f["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(num_shards)
        ).astype("int64")
        ds = rd.from_pandas(f)

        def topk(group: pd.DataFrame) -> pd.DataFrame:
            g = group.sort_values(["priority", "url_canon"], ascending=[False, True])
            g = g.copy()
            g["dequeued"] = [i < k for i in range(len(g))]
            return g

        marked = (
            ds.groupby("shard").map_groups(topk, batch_format="pandas").to_pandas()
        )
        marked["url_hash"] = marked["url_hash"].astype(np.uint64)
        dequeued = marked[marked["dequeued"]]
        remaining = marked[~marked["dequeued"]]
        self.frontier = (
            remaining.drop(columns=["shard", "dequeued"]).reset_index(drop=True)
        )
        # deterministic order for the trace regardless of group arrival order
        return (
            dequeued.drop(columns=["dequeued"])
            .sort_values(["shard", "priority", "url_canon"], ascending=[True, False, True])
            .drop(columns=["shard"])
            .reset_index(drop=True)
        )

    def _gate(self, cand: pd.DataFrame, wave: int) -> pd.DataFrame:
        """Politeness + robots via the host-hash-pinned shard actors."""
        if cand.empty:
            cand["decision"] = pd.Series(dtype=str)
            return cand
        share = cand["host"].value_counts(normalize=True)
        hot = set(share[share > self.cfg.hot_host_threshold].index)
        salts = {h: self.cfg.n_salts for h in hot}
        cand = cand.copy()
        salt_vec = [
            int(uh % np.uint64(self.cfg.n_salts)) if h in hot else 0
            for uh, h in zip(cand["url_hash"].to_numpy(dtype=np.uint64), cand["host"])
        ]
        cand["gate_shard"] = [
            host_shard(h, s, self.cfg.num_politeness_shards)
            for h, s in zip(cand["host"], salt_vec)
        ]
        # deterministic order inside each shard: priority desc, url asc
        cand = cand.sort_values(
            ["gate_shard", "priority", "url_canon"], ascending=[True, False, True]
        ).reset_index(drop=True)
        decisions = np.empty(len(cand), dtype=object)
        futures = []
        for shard_id, group in cand.groupby("gate_shard", sort=True):
            rows = group[["host", "url_canon"]].to_dict("records")
            futures.append(
                (group.index, self.gates[shard_id].gate.remote(rows, wave, salts))
            )
        for idxs, fut in futures:
            decisions[idxs] = ray.get(fut)
        cand["decision"] = decisions
        return cand.drop(columns=["gate_shard"])

    # ------------------------------------------------------------------
    def run_wave(self) -> dict:
        cfg = self.cfg
        self.wave += 1
        wave = self.wave
        ctr = {
            "wave": wave, "dequeued": 0, "allowed": 0, "deferred": 0,
            "robots_denied": 0, "fetched": 0, "http_404": 0, "parsed_ok": 0,
            "parse_err": 0, "links": 0, "links_new": 0, "pairs_rows": 0,
        }

        dequeued = self._dequeue(cfg.dequeue_k)
        ctr["dequeued"] = len(dequeued)
        if dequeued.empty:
            self.counters.append(ctr)
            self.checkpoint()
            return ctr

        gated = self._gate(dequeued, wave)
        allowed = gated[gated["decision"] == "allow"]
        deferred = gated[gated["decision"] == "defer"]
        ctr["allowed"] = len(allowed)
        ctr["deferred"] = len(deferred)
        ctr["robots_denied"] = int((gated["decision"] == "robots").sum())

        # deferred URLs go back to the frontier untouched
        if not deferred.empty:
            self.frontier = pd.concat(
                [self.frontier, deferred[FRONTIER_COLS]], ignore_index=True
            )

        # deterministic fetch order trace (replay check)
        allowed = allowed.sort_values(
            ["priority", "url_canon"], ascending=[False, True]
        ).reset_index(drop=True)
        base_seq = len(self.trace)
        for seq, url in enumerate(allowed["url_canon"]):
            self.trace.append((wave, base_seq + seq, url))

        if not allowed.empty:
            # fetch → parse → pairs + links: one streaming Dataset pass.
            # Task-based stages with per-process cached state fuse into one
            # operator and persist caches across waves (actor pools would be
            # torn down and rebuilt every wave).
            # ONE fused pipeline pass per wave: fetch → parse → link-extract
            # in the same task, with each task WRITING its pairs fragment
            # directly (image payloads never travel to the driver); only
            # links + counters come back. Fragment names are content-derived
            # so reruns are idempotent; the driver atomically promotes the
            # fragment dir at checkpoint (finalize_partition).
            fetch_fn = cached_fetch_batch(cfg.corpus_size, cfg.seed)
            parse_fn = cached_parse_batch()
            pairs_root = os.path.join(cfg.out_dir, "pairs")
            tmpdir = os.path.join(pairs_root, f".wave{wave:03d}.building")
            os.makedirs(tmpdir, exist_ok=True)

            def fetch_parse_links(batch: pa.Table) -> pa.Table:
                import hashlib as _hashlib
                import json as _json

                import pyarrow.parquet as _pq

                fetched_b = fetch_fn(batch)
                mask = [s == "200" for s in fetched_b.column("fetch_status").to_pylist()]
                ok_b = fetched_b.filter(pa.array(mask))
                parsed_b = parse_fn(ok_b)
                pairs_b = parsed_b.select(
                    ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "status"]
                )
                if pairs_b.num_rows:
                    name = _hashlib.blake2b(
                        "|".join(batch.column("url_canon").to_pylist()).encode(),
                        digest_size=8,
                    ).hexdigest()
                    _pq.write_table(pairs_b, os.path.join(tmpdir, f"part-{name}.parquet"))
                links_b = extract_links_batch(ok_b)
                statuses = parsed_b.column("status").to_pylist()
                summary = _json.dumps(
                    {
                        "fetched": int(sum(mask)),
                        "http_404": int(len(mask) - sum(mask)),
                        "pairs_rows": pairs_b.num_rows,
                        "parsed_ok": statuses.count("ok"),
                        "parse_err": statuses.count("error"),
                        "links": {
                            "url_canon": links_b.column("url_canon").to_pylist(),
                            "url_hash": [int(h) for h in links_b.column("url_hash").to_pylist()],
                            "host": links_b.column("host").to_pylist(),
                            "depth": links_b.column("depth").to_pylist(),
                        },
                    }
                )
                return pa.table({"summary": pa.array([summary], pa.string())})

            # from_pandas(df) yields ONE block = one task; split the wave
            # into batch-sized chunks so it fans out across the cluster
            work = allowed[["url_canon", "depth"]].reset_index(drop=True)
            chunks = [
                work.iloc[i: i + cfg.batch_size]
                for i in range(0, len(work), cfg.batch_size)
            ]
            ds = rd.from_pandas(chunks)
            result = ds.map_batches(
                fetch_parse_links,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                num_cpus=1,
            ).to_pandas()

            import json as _json

            link_frames = []
            for blob in result["summary"]:
                meta = _json.loads(blob)
                ctr["fetched"] += meta["fetched"]
                ctr["http_404"] += meta["http_404"]
                ctr["pairs_rows"] += meta["pairs_rows"]
                ctr["parsed_ok"] += meta["parsed_ok"]
                ctr["parse_err"] += meta["parse_err"]
                if meta["links"]["url_canon"]:
                    link_frames.append(pd.DataFrame(meta["links"]))

            aio.finalize_partition(
                pairs_root,
                f"wave{wave:03d}",
                tmpdir,
                rows=ctr["pairs_rows"],
                lineage={
                    "wave": wave,
                    "urls": len(allowed),
                    "num_shards": cfg.num_shards,
                },
            )

            links = (
                pd.concat(link_frames, ignore_index=True)
                if link_frames
                else pd.DataFrame(columns=["url_canon", "url_hash", "host", "depth"])
            )
            ctr["links"] = len(links)
            if not links.empty:
                links["url_hash"] = links["url_hash"].astype(np.uint64)
                ctr["links_new"] = self._enqueue_new(links, wave)

        self.counters.append(ctr)
        self.checkpoint()
        return ctr

    def run(self, resume: bool = False) -> dict:
        if resume and self.resume():
            pass
        else:
            seeds = _seed_frontier(self.cfg)
            # seeds enter the seen-set immediately (enqueue-once semantics)
            is_new = self.seen.check_and_add(seeds["url_hash"].to_numpy(dtype=np.uint64))
            self.frontier = seeds[is_new].reset_index(drop=True)
            self.wave = 0
            self.checkpoint()
        while self.wave < self.cfg.max_waves:
            ctr = self.run_wave()
            if ctr["dequeued"] == 0:
                break
        return self.summary()

    def summary(self) -> dict:
        return {
            "waves": self.wave,
            "counters": self.counters,
            "frontier_size": len(self.frontier),
            "seen_total": self.seen.total(),
            "trace_len": len(self.trace),
            "trace": list(self.trace),
        }

    def shutdown(self) -> None:
        self.seen.shutdown()
        for g in self.gates:
            ray.kill(g)
        self.gates = []
