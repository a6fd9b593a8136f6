"""Crawl-loop tests: state units, replay determinism, kill-and-resume
(BASELINE.json replay + resume invariants)."""

import numpy as np
import pytest

from akf_cdparser_ray.sources import io as aio
from akf_cdparser_ray.sources import synth
from akf_cdparser_ray.state.filters import BloomFilter, CuckooFilter, deserialize_filter
from akf_cdparser_ray.state.politeness import PolitenessState, RobotsRules, TokenBucket
from akf_cdparser_ray.stages.links import canonicalize_url, extract_links, url_hash64


# ---------------------------------------------------------------------------
# pure-state units (no Ray)
# ---------------------------------------------------------------------------


def test_cuckoo_filter_roundtrip():
    f = CuckooFilter(capacity=4096)
    hs = [url_hash64(f"http://h{i}.example/p/{i}") for i in range(1000)]
    assert all(f.check_and_add(h) for h in hs)
    assert not any(f.check_and_add(h) for h in hs)  # all seen now
    page = f.serialize()
    g = deserialize_filter(page)
    assert all(g.contains(h) for h in hs)
    assert g.count == f.count


def test_bloom_filter():
    f = BloomFilter(capacity=4096)
    hs = [url_hash64(f"u{i}") for i in range(500)]
    for h in hs:
        assert f.check_and_add(h)
    assert all(f.contains(h) for h in hs)
    g = deserialize_filter(f.serialize())
    assert all(g.contains(h) for h in hs)


def test_token_bucket():
    b = TokenBucket(per_wave=2, burst=4)
    assert all(b.try_take() for _ in range(4))
    assert not b.try_take()
    b.refill(1)
    assert b.try_take() and b.try_take() and not b.try_take()


def test_robots_rules():
    r = RobotsRules("User-agent: *\nDisallow: /2001/\nDisallow: /private/\n")
    assert r.allowed("/2000/1.html")
    assert not r.allowed("/2001/1.html")
    assert not r.allowed("/private/x")


def test_politeness_hot_host_split():
    st = PolitenessState({"h": {"per_wave": 8, "burst": 8}})
    b = st.bucket_for("h", n_salts=4)
    assert b.per_wave == 2 and b.burst == 2


def test_canonicalize():
    assert canonicalize_url("HTTP://Host0.EXAMPLE:80/a/b/") == "http://host0.example/a/b"
    assert canonicalize_url("http://h/x?b=2&a=1") == "http://h/x?a=1&b=2"
    assert canonicalize_url("http://h/%7Euser/") == "http://h/~user"
    # same canonical form ⇒ same hash
    assert url_hash64(canonicalize_url("http://H/x?b=2&a=1")) == url_hash64(
        canonicalize_url("http://h/x?a=1&b=2")
    )


def test_canonicalize_urls_vectorized_matches_scalar():
    """The pyarrow fast path must be byte-equivalent to canonicalize_url
    row-for-row, including every fallback-triggering shape."""
    import random

    from akf_cdparser_ray.stages.links import canonicalize_urls, host_of, hosts_of

    rng = random.Random(3)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["a.example", "B.Example:80", "c.example:443", "D.EX:8080", "e.ex"]
    paths = ["", "/", "/x", "/x/", "/x//", "/a/b/c", "/a b", "/%7Ex", "/%7e",
             "/x?q=1", "/x?b=2&a=1", "/x#f", "///"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(paths)
        for _ in range(500)
    ] + ["  http://pad.example/x/ ", "not a url", "", "http://", "//rel/x"]
    got = canonicalize_urls(urls)
    assert list(got) == [canonicalize_url(u.strip()) for u in urls]
    assert hosts_of(got) == [host_of(u) for u in got]


def test_extract_links():
    html = '<a href="http://a/x.html">x</a> <a href="/y.html">y</a> <a href="z.html">z</a>'
    got = extract_links(html, "http://base.example/d/page.html")
    assert got == ["http://a/x.html", "http://base.example/y.html", "http://base.example/d/z.html"]


def test_partition_writer_resume(tmp_path):
    import pyarrow as pa

    root = str(tmp_path / "out")
    t = pa.table({"a": [1, 2]})
    aio.write_partition(t, root, "wave001", {"wave": 1})
    assert aio.partition_done(root, "wave001")
    assert not aio.partition_done(root, "wave002")
    back = aio.read_partitions(root)
    assert back.num_rows == 2


# ---------------------------------------------------------------------------
# end-to-end crawl (Ray)
# ---------------------------------------------------------------------------


def _mk_cfg(tmp_path, name, **overrides):
    from akf_cdparser_ray.pipelines.crawl import CrawlConfig

    n = 60
    seeds = [synth.page_url(synth.gen_profile(i)) for i in (0, 1, 2)]
    base = dict(
        seeds=seeds,
        corpus_size=n,
        out_dir=str(tmp_path / name),
        num_shards=4,
        num_politeness_shards=2,
        dequeue_k=8,
        max_waves=3,
        budgets={"host0.example": {"per_wave": 6, "burst": 6}},
        parse_concurrency=1,
        fetch_concurrency=1,
    )
    base.update(overrides)
    return CrawlConfig(**base)


@pytest.mark.usefixtures("ray_session")
def test_crawl_runs_and_replays(tmp_path):
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    job1 = CrawlJob(_mk_cfg(tmp_path, "run1"))
    s1 = job1.run()
    job1.shutdown()
    assert s1["waves"] >= 1
    total = {k: sum(c[k] for c in s1["counters"]) for k in s1["counters"][0] if k != "wave"}
    assert total["fetched"] > 0
    assert total["parsed_ok"] == total["fetched"]
    assert total["links"] > 0
    assert total["robots_denied"] >= 0
    assert s1["seen_total"] > len(job1.cfg.seeds)

    # replay: identical trace + seen membership
    job2 = CrawlJob(_mk_cfg(tmp_path, "run2"))
    s2 = job2.run()
    job2.shutdown()
    assert s1["trace"] == s2["trace"]
    assert s1["seen_total"] == s2["seen_total"]
    assert s1["counters"] == s2["counters"]

    # pairs output exists and carries captions
    pairs = aio.read_partitions(str(tmp_path / "run1" / "pairs"))
    assert pairs.num_rows == total["pairs_rows"]
    caps = [c for c in pairs.column("caption").to_pylist() if c]
    assert caps and caps[0].startswith("{")


@pytest.mark.usefixtures("ray_session")
def test_crawl_kill_and_resume(tmp_path):
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    # uninterrupted 3-wave run
    ref = CrawlJob(_mk_cfg(tmp_path, "ref", max_waves=3))
    sref = ref.run()
    ref.shutdown()

    # killed after wave 2, resumed in a fresh job
    killed = CrawlJob(_mk_cfg(tmp_path, "kr", max_waves=2))
    killed.run()
    killed.shutdown()
    resumed = CrawlJob(_mk_cfg(tmp_path, "kr", max_waves=3))
    sres = resumed.run(resume=True)
    resumed.shutdown()

    assert sres["trace"] == sref["trace"]
    assert sres["seen_total"] == sref["seen_total"]
    assert sres["counters"] == sref["counters"]
    # byte-level: pairs partitions of the resumed run match the reference run
    pref = aio.read_partitions(str(tmp_path / "ref" / "pairs"))
    pres = aio.read_partitions(str(tmp_path / "kr" / "pairs"))
    assert pref.equals(pres)


@pytest.mark.usefixtures("ray_session")
def test_crawl_resume_rejects_reshard(tmp_path):
    """Resuming with a different shard count would probe url hashes
    against the wrong filter pages — must raise, not silently corrupt."""
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    job = CrawlJob(_mk_cfg(tmp_path, "rs", max_waves=2))
    job.run()
    job.shutdown()
    bad = CrawlJob(_mk_cfg(tmp_path, "rs", max_waves=3, num_shards=8))
    with pytest.raises(ValueError, match="config mismatch"):
        bad.run(resume=True)
    bad.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_politeness_caps_hot_host(tmp_path):
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    cfg = _mk_cfg(
        tmp_path, "hot", max_waves=1, dequeue_k=30,
        budgets={"host0.example": {"per_wave": 2, "burst": 2}},
    )
    job = CrawlJob(cfg)
    s = job.run()
    job.shutdown()
    c = s["counters"][0]
    # the hot host must have been budget-limited: deferred URLs exist OR the
    # allowed count for host0 is at most its (salt-split) budget
    host0_allowed = sum(1 for (_w, _s, u) in s["trace"] if "host0.example" in u)
    assert host0_allowed <= 8  # per-wave budget x salt rounding ceiling
    assert c["deferred"] >= 0


def test_cuckoo_membership_insertion_order_independent():
    """The replay invariant relies on this: a query probes both of its
    candidate buckets, and an entry's two possible homes form the same
    closed set, so WHICH bucket an entry landed in (insertion order,
    eviction history) cannot change any membership answer — including
    false positives."""
    import random

    hs = [url_hash64(f"http://h{i}.example/{i}") for i in range(3000)]
    probes = [url_hash64(f"http://probe{i}.example/x{i}") for i in range(20000)]
    f1 = CuckooFilter(capacity=8192)
    f2 = CuckooFilter(capacity=8192)
    for h in hs:
        f1.add(h)
    shuffled = hs[:]
    random.Random(99).shuffle(shuffled)
    for h in shuffled:
        f2.add(h)
    # different table bytes (layout differs), identical membership answers
    assert f1.contains_many(np.array(hs, dtype=np.uint64)).all()
    assert f2.contains_many(np.array(hs, dtype=np.uint64)).all()
    p = np.array(probes, dtype=np.uint64)
    assert (f1.contains_many(p) == f2.contains_many(p)).all()


@pytest.mark.usefixtures("ray_session")
def test_frontier_spill_equivalent():
    """A FrontierShard with a tiny in-memory cap (tail spilled to parquet)
    must produce exactly the dequeue sequence of an unbounded shard."""
    import ray

    from akf_cdparser_ray.stages.dedupe import FrontierShard

    def frontier(n, start=0, prio_mod=13):
        import pandas as pd

        rows = []
        for i in range(start, start + n):
            url = f"http://h{i % 9}.example/{i}.html"
            rows.append({"url_canon": url, "url_hash": np.uint64(url_hash64(url)),
                         "host": f"h{i % 9}.example", "priority": 100 - (i % prio_mod),
                         "depth": i % 4, "discovered_at": 0})
        return __import__("pandas").DataFrame(rows)

    import tempfile
    d = tempfile.mkdtemp(prefix="spill_")
    plain = FrontierShard.remote(1 << 14)
    spilly = FrontierShard.remote(1 << 14, 40, f"{d}/sp.parquet")
    seq_a, seq_b = [], []
    for shard, seq in ((plain, seq_a), (spilly, seq_b)):
        ray.get(shard.seed.remote(frontier(150)))
        seq.append(ray.get(shard.dequeue.remote(20)).to_pydict()["url_canon"])
        ray.get(shard.defer.remote(frontier(30, start=300, prio_mod=7)))
        seq.append(ray.get(shard.dequeue.remote(25)).to_pydict()["url_canon"])
        ray.get(shard.seed.remote(frontier(60, start=500)))
        for _ in range(8):
            seq.append(ray.get(shard.dequeue.remote(30)).to_pydict()["url_canon"])
        seq.append(ray.get(shard.frontier_size.remote()))
    assert seq_a == seq_b
    # checkpoint bytes identical too (spill reloads into the full write)
    pa_, pb_ = f"{d}/a.parquet", f"{d}/b.parquet"
    fa_, fb_ = f"{d}/a.page", f"{d}/b.page"
    ray.get(plain.checkpoint.remote(pa_, fa_))
    ray.get(spilly.checkpoint.remote(pb_, fb_))
    assert open(pa_, "rb").read() == open(pb_, "rb").read()
    for s in (plain, spilly):
        ray.kill(s)


@pytest.mark.usefixtures("ray_session")
def test_crawl_with_spill_replays_identically(tmp_path):
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    ref = CrawlJob(_mk_cfg(tmp_path, "nospill"))
    sref = ref.run()
    ref.shutdown()
    spill = CrawlJob(_mk_cfg(tmp_path, "spill", frontier_spill_rows=8))
    sspill = spill.run()
    spill.shutdown()
    assert sref["trace"] == sspill["trace"]
    assert sref["counters"] == sspill["counters"]
    assert sref["seen_total"] == sspill["seen_total"]
    pref = aio.read_partitions(str(tmp_path / "nospill" / "pairs"))
    pspl = aio.read_partitions(str(tmp_path / "spill" / "pairs"))
    assert pref.equals(pspl)


@pytest.mark.usefixtures("ray_session")
def test_crawl_kill_and_resume_with_spill(tmp_path):
    """Kill-and-resume with the frontier spilling to parquet runs: the
    resumed run must still be byte-identical to an uninterrupted one."""
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    ref = CrawlJob(_mk_cfg(tmp_path, "sref", max_waves=3, frontier_spill_rows=8))
    sref = ref.run()
    ref.shutdown()

    killed = CrawlJob(_mk_cfg(tmp_path, "skr", max_waves=2, frontier_spill_rows=8))
    killed.run()
    killed.shutdown()
    resumed = CrawlJob(_mk_cfg(tmp_path, "skr", max_waves=3, frontier_spill_rows=8))
    sres = resumed.run(resume=True)
    resumed.shutdown()

    assert sres["trace"] == sref["trace"]
    assert sres["counters"] == sref["counters"]
    assert sres["seen_total"] == sref["seen_total"]
    pref = aio.read_partitions(str(tmp_path / "sref" / "pairs"))
    pres = aio.read_partitions(str(tmp_path / "skr" / "pairs"))
    assert pref.equals(pres)


@pytest.mark.usefixtures("ray_session")
def test_pipeline_depth_equivalent(tmp_path):
    """Overlapping is a pure performance knob: a serial (depth=1) run and a
    depth-2 overlapped run produce byte-identical trace/counters/pairs,
    because link visibility is state-encoded in the shards (flush(k) →
    wave k+2, defers(k) → wave k+1), never a function of schedule timing."""
    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    serial = CrawlJob(_mk_cfg(tmp_path, "d1", max_waves=4, pipeline_depth=1,
                              visibility_lag=2))
    s1 = serial.run()
    serial.shutdown()
    overlapped = CrawlJob(_mk_cfg(tmp_path, "d2", max_waves=4, pipeline_depth=2))
    s2 = overlapped.run()
    overlapped.shutdown()
    assert s1["trace"] == s2["trace"]
    assert s1["counters"] == s2["counters"]
    assert s1["seen_total"] == s2["seen_total"]
    p1 = aio.read_partitions(str(tmp_path / "d1" / "pairs"))
    p2 = aio.read_partitions(str(tmp_path / "d2" / "pairs"))
    assert p1.equals(p2)

    # classic lag-1 serial BFS is its own deterministic semantics: links
    # flushed by wave k are dequeuable at k+1 (more per wave than lag 2)
    lag1a = CrawlJob(_mk_cfg(tmp_path, "l1a", max_waves=4, pipeline_depth=1,
                             visibility_lag=1))
    sa = lag1a.run()
    lag1a.shutdown()
    lag1b = CrawlJob(_mk_cfg(tmp_path, "l1b", max_waves=4, pipeline_depth=1,
                             visibility_lag=1))
    sb = lag1b.run()
    lag1b.shutdown()
    assert sa["trace"] == sb["trace"] and sa["counters"] == sb["counters"]
    assert sum(c["fetched"] for c in sa["counters"]) >= sum(
        c["fetched"] for c in s1["counters"]
    )


@pytest.mark.usefixtures("ray_session")
def test_resume_with_inflight_wave(tmp_path):
    """Resume from a checkpoint whose meta carries an in-flight wave (the
    overlapped pipeline's normal cut: shard state is post-dequeue(k+1) /
    post-flush(k)): the stored gated table re-launches wave k+1 without
    re-gating and the finished crawl is byte-identical."""
    import os
    import shutil

    from akf_cdparser_ray.pipelines.crawl import CrawlJob

    ref = CrawlJob(_mk_cfg(tmp_path, "iref", max_waves=4))
    sref = ref.run()
    ref.shutdown()

    victim = CrawlJob(_mk_cfg(tmp_path, "ikr", max_waves=4))
    victim.run()
    victim.shutdown()
    # simulate a kill after ckpt(1) durable but nothing later: drop every
    # checkpoint past wave001 (wave001's meta holds in-flight wave 2) and
    # the pairs partitions those waves produced
    root = tmp_path / "ikr" / "checkpoint"
    kept = sorted(os.listdir(root))[:2]          # wave000, wave001
    for w in sorted(os.listdir(root)):
        if w not in kept:
            shutil.rmtree(root / w)
    with open(root / "wave001" / "meta.json") as f:
        import json

        assert json.load(f)["inflight"], "cut must carry an in-flight wave"
    pairs_root = tmp_path / "ikr" / "pairs"
    for part in os.listdir(pairs_root):
        p = pairs_root / part
        if p.is_dir() and part != "wave001":
            shutil.rmtree(p)
    manifest = aio.load_manifest(str(pairs_root))
    manifest["partitions"] = {
        k: v for k, v in manifest["partitions"].items() if k == "wave001"
    }
    aio._store_manifest(str(pairs_root), manifest)

    resumed = CrawlJob(_mk_cfg(tmp_path, "ikr", max_waves=4))
    sres = resumed.run(resume=True)
    resumed.shutdown()
    assert sres["trace"] == sref["trace"]
    assert sres["counters"] == sref["counters"]
    assert sres["seen_total"] == sref["seen_total"]
    pref = aio.read_partitions(str(tmp_path / "iref" / "pairs"))
    pres = aio.read_partitions(str(tmp_path / "ikr" / "pairs"))
    assert pref.equals(pres)
