"""Streaming (non-wave) crawl mode: drain soundness + the documented
determinism contract (fetched SET / pairs CONTENT / robots-denied set are
schedule-independent; order and per-epoch counters are not).

Reference semantics: the wave pipeline (pipelines/crawl.py) is the
replay-deterministic mode; stream mode must agree with it on WHAT gets
crawled (the robots-allowed reachable set), not on when or in what order.
"""

from __future__ import annotations

import pytest

from akf_cdparser_ray.sources import io as aio
from akf_cdparser_ray.sources import synth


def _stream_cfg(tmp_path, name, **overrides):
    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlConfig

    base = dict(
        seeds=[synth.page_url_for_idx(i) for i in range(6)],
        corpus_size=300,
        out_dir=str(tmp_path / name),
        num_shards=4,
        num_politeness_shards=2,
        num_workers=2,
        lease_urls=32,
        leases_per_epoch=8,
        budgets={f"host{k}.example": {"per_wave": 10_000, "burst": 10_000}
                 for k in range(20)},
        filter_capacity=1 << 14,
    )
    base.update(overrides)
    return StreamCrawlConfig(**base)


def _run_stream(cfg):
    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    job = StreamCrawlJob(cfg)
    try:
        return job.run()
    finally:
        job.shutdown()


def _pairs_ids(out_dir) -> set[str]:
    t = aio.read_partitions(str(out_dir) + "/pairs")
    return set(t.column("image_id").to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_stream_drains_and_accounts_every_url(tmp_path):
    cfg = _stream_cfg(tmp_path, "s1")
    res = _run_stream(cfg)
    c = res["counters"]
    # drained: every URL ever admitted to the frontier was resolved
    assert c["fetched"] + c["http_404"] + c["robots_denied"] == res["seen_total"]
    assert c["fetched"] > 0
    assert c["parsed_ok"] == c["fetched"]
    assert res["seen_total"] == res["seeds"] + c["links_new"]
    # pairs partition promoted, row count matches counters
    t = aio.read_partitions(str(tmp_path / "s1" / "pairs"))
    assert t.num_rows == c["pairs_rows"] == c["parsed_ok"]
    assert len(_pairs_ids(tmp_path / "s1")) == t.num_rows  # ids unique


@pytest.mark.usefixtures("ray_session")
def test_stream_fetched_set_is_schedule_independent(tmp_path):
    """Different worker counts + lease sizes ⇒ different schedules, same
    fetched set / robots-denied count / seen set size (the stream mode's
    determinism contract)."""
    r1 = _run_stream(_stream_cfg(tmp_path, "a", num_workers=1, lease_urls=64))
    r2 = _run_stream(_stream_cfg(tmp_path, "b", num_workers=3, lease_urls=8))
    assert _pairs_ids(tmp_path / "a") == _pairs_ids(tmp_path / "b")
    assert r1["seen_total"] == r2["seen_total"]
    c1, c2 = r1["counters"], r2["counters"]
    for k in ("fetched", "http_404", "robots_denied", "parsed_ok",
              "pairs_rows", "links_new"):
        assert c1[k] == c2[k], k


@pytest.mark.usefixtures("ray_session")
def test_stream_matches_wave_mode_reachable_set(tmp_path):
    """Stream and wave modes crawl the SAME robots-allowed reachable set
    when budgets never deny (budgets only defer; both modes drain)."""
    from akf_cdparser_ray.pipelines.crawl import CrawlConfig, CrawlJob

    scfg = _stream_cfg(tmp_path, "stream")
    sres = _run_stream(scfg)

    wjob = CrawlJob(CrawlConfig(
        seeds=scfg.seeds,
        corpus_size=scfg.corpus_size,
        out_dir=str(tmp_path / "wave"),
        num_shards=4,
        num_politeness_shards=2,
        dequeue_k=64,
        max_waves=60,
        budgets=scfg.budgets,
    ))
    wres = wjob.run()
    wjob.shutdown()

    assert _pairs_ids(tmp_path / "stream") == _pairs_ids(tmp_path / "wave")
    wtot = {k: sum(c[k] for c in wres["counters"])
            for k in wres["counters"][0] if k != "wave"}
    assert sres["counters"]["fetched"] == wtot["fetched"]
    assert sres["counters"]["robots_denied"] == wtot["robots_denied"]
    assert sres["seen_total"] == wres["seen_total"]


@pytest.mark.usefixtures("ray_session")
def test_stream_politeness_limited_still_drains(tmp_path):
    """Tight default budgets (8/epoch/host): progress rides on epoch-clock
    refills; the run must still drain with everything accounted."""
    cfg = _stream_cfg(tmp_path, "tight", corpus_size=120, budgets={},
                      leases_per_epoch=4)
    res = _run_stream(cfg)
    c = res["counters"]
    assert c["fetched"] + c["http_404"] + c["robots_denied"] == res["seen_total"]
    assert c["deferred"] > 0  # budgets actually bit
    assert c["fetched"] > 0
    # budgets only DEFER, never deny: the drained fetched SET is still
    # schedule-independent even when every epoch rations tokens
    res2 = _run_stream(_stream_cfg(tmp_path, "tight2", corpus_size=120,
                                   budgets={}, leases_per_epoch=4,
                                   num_workers=3, lease_urls=8))
    assert _pairs_ids(tmp_path / "tight") == _pairs_ids(tmp_path / "tight2")
    assert res2["counters"]["fetched"] == c["fetched"]


@pytest.mark.usefixtures("ray_session")
def test_stream_checkpointed_run_same_result(tmp_path):
    """Periodic quiesce-checkpoints must not change WHAT a completed run
    produces: same fetched set, rows split across stream-part*/final
    partitions with no duplicates."""
    ref = _run_stream(_stream_cfg(tmp_path, "ref"))
    res = _run_stream(_stream_cfg(tmp_path, "ck", checkpoint_every_fetches=80))
    assert _pairs_ids(tmp_path / "ck") == _pairs_ids(tmp_path / "ref")
    t = aio.read_partitions(str(tmp_path / "ck" / "pairs"))
    assert t.num_rows == res["counters"]["pairs_rows"]  # no dup, no loss
    # at least one mid-run promotion happened + a marker exists
    parts = aio.load_manifest(str(tmp_path / "ck" / "pairs"))["partitions"]
    assert any(k.startswith("stream-part") for k in parts)
    assert (tmp_path / "ck" / "stream_ckpt.json").exists()


@pytest.mark.usefixtures("ray_session")
def test_stream_kill_and_resume(tmp_path):
    """Kill after the fetch cap (simulated: no final promotion), resume
    from the checkpoint marker: the union of pairs partitions equals an
    uninterrupted run's set, with zero duplicate image ids."""
    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "full"))

    cfg1 = _stream_cfg(tmp_path, "kr", checkpoint_every_fetches=60,
                       max_fetches=120)
    job1 = StreamCrawlJob(cfg1)
    r1 = job1.run(finalize=False)  # die before promoting the tail
    job1.shutdown()
    assert r1["counters"]["fetched"] >= 120
    assert (tmp_path / "kr" / "stream_ckpt.json").exists()

    cfg2 = _stream_cfg(tmp_path, "kr", checkpoint_every_fetches=60)
    job2 = StreamCrawlJob(cfg2)
    r2 = job2.run(resume=True)
    job2.shutdown()

    ids = aio.read_partitions(str(tmp_path / "kr" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))  # post-marker rows refetched once
    assert set(ids) == _pairs_ids(tmp_path / "full")
    c = r2["counters"]  # restored snapshot + post-resume work, no double count
    assert c["fetched"] + c["http_404"] + c["robots_denied"] == \
        ref["counters"]["fetched"] + ref["counters"]["http_404"] + \
        ref["counters"]["robots_denied"]
    assert c["pairs_rows"] == len(ids)


@pytest.mark.usefixtures("ray_session")
def test_stream_resume_without_marker_rolls_back_partitions(tmp_path):
    """Crash window: a first checkpoint promoted its pairs partition but
    died before writing the marker. Resume finds no marker ⇒ fresh
    recrawl — it must drop the orphaned partitions or the refetched rows
    duplicate them. The resume run deliberately has checkpointing OFF
    (the natural `crawl --stream --resume` CLI shape), so nothing would
    overwrite the stale partition."""
    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "full2"))

    job = StreamCrawlJob(_stream_cfg(tmp_path, "nm",
                                     checkpoint_every_fetches=80))
    job.run(finalize=False)
    job.shutdown()
    parts = aio.load_manifest(str(tmp_path / "nm" / "pairs"))["partitions"]
    assert any(k.startswith("stream-part") for k in parts)  # promoted
    (tmp_path / "nm" / "stream_ckpt.json").unlink()  # marker never landed

    job2 = StreamCrawlJob(_stream_cfg(tmp_path, "nm"))
    job2.run(resume=True)
    job2.shutdown()
    ids = aio.read_partitions(str(tmp_path / "nm" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))
    assert set(ids) == _pairs_ids(tmp_path / "full2")


@pytest.mark.usefixtures("ray_session")
def test_stream_resume_rejects_reshard(tmp_path):
    """Resuming with a different shard count would probe url hashes
    against the wrong filter pages (silent duplicates) — must raise."""
    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    cfg = _stream_cfg(tmp_path, "rs", checkpoint_every_fetches=60,
                      max_fetches=100)
    job = StreamCrawlJob(cfg)
    job.run(finalize=False)
    job.shutdown()
    bad = _stream_cfg(tmp_path, "rs", num_shards=8,
                      checkpoint_every_fetches=60)
    job2 = StreamCrawlJob(bad)
    with pytest.raises(ValueError, match="config mismatch"):
        job2.run(resume=True)
    job2.shutdown()


def test_stream_real_sigkill_resume():
    """Shells out to the hard-kill harness: a checkpointed crawl in its
    own process group, SIGKILLed mid-run, resumed in a fresh process —
    the assertions (unique ids, set == uninterrupted reference) live in
    the harness. Runs outside the session Ray cluster by design."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "stream_kill_resume.py"),
         "2000", "3"],
        capture_output=True, text=True, timeout=500,
    )
    assert out.returncode == 0, out.stdout[-500:] + out.stderr[-500:]
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["multiset_matches_reference"]


@pytest.mark.usefixtures("ray_session")
def test_stream_spilled_frontier_same_result(tmp_path):
    """A tiny per-shard in-memory cap (tail spilled to parquet runs) plus
    mid-run checkpoints must not change the fetched set — the 10^10-URL
    memory path exercised end to end."""
    ref = _run_stream(_stream_cfg(tmp_path, "mem"))
    res = _run_stream(_stream_cfg(tmp_path, "sp", frontier_spill_rows=16,
                                  checkpoint_every_fetches=90))
    assert _pairs_ids(tmp_path / "sp") == _pairs_ids(tmp_path / "mem")
    assert res["counters"]["fetched"] == ref["counters"]["fetched"]
    assert res["seen_total"] == ref["seen_total"]


@pytest.mark.usefixtures("ray_session")
def test_offer_stream_enqueued_set_is_arrival_order_independent():
    """The streaming offer's enqueued URL SET must not depend on how the
    link stream is split across RPCs or their arrival order (the
    determinism contract's shard-local half). Metadata (depth/priority)
    may differ across arrival orders — only the set is pinned."""
    import numpy as np
    import ray

    from akf_cdparser_ray.stages.dedupe import FrontierShard
    from akf_cdparser_ray.stages.links import url_hash64

    urls = [f"http://h{i % 5}.example/p{i % 37}.html" for i in range(120)]
    rows = [(u, url_hash64(u), f"h{i % 5}.example", i % 4)
            for i, u in enumerate(urls)]  # dup hashes at differing depths

    def drain(shard) -> set:
        out = set()
        while True:
            t = ray.get(shard.dequeue.remote(1000))
            if not t.num_rows:
                return out
            out |= set(t.column("url_canon").to_pylist())

    def offer_in_splits(splits) -> set:
        shard = FrontierShard.remote(1 << 14)
        for part in splits:
            ray.get(shard.offer_stream.remote(
                [r[0] for r in part], [r[1] for r in part],
                [r[2] for r in part], [r[3] for r in part], 0))
        got = drain(shard)
        ray.kill(shard)
        return got

    one_call = offer_in_splits([rows])
    rng = np.random.default_rng(7)
    perm = [rows[i] for i in rng.permutation(len(rows))]
    many_calls = offer_in_splits([perm[i::7] for i in range(7)])
    assert one_call == many_calls
    assert len(one_call) == len({u for u in urls})


@pytest.mark.usefixtures("ray_session")
def test_stream_max_fetches_cap_stops_early(tmp_path):
    cfg = _stream_cfg(tmp_path, "cap", max_fetches=20, num_workers=1,
                      lease_urls=8)
    res = _run_stream(cfg)
    c = res["counters"]
    assert 20 <= c["fetched"] < 300  # cap is a lease-granularity floor
    # partition still finalized consistently with what WAS fetched
    t = aio.read_partitions(str(tmp_path / "cap" / "pairs"))
    assert t.num_rows == c["pairs_rows"]


@pytest.mark.usefixtures("ray_session")
def test_stream_max_fetches_cap_sharded_coordinators(tmp_path):
    """max_fetches at num_coordinators>1 (round-5 gap closed): the
    secondaries forward fetched deltas to coordinator 0, which latches
    and broadcasts the stop at the cap. The cap stays a lease-granularity
    safety stop — total fetched is >= the cap and well below a full
    drain, and the finalized partition matches the counters."""
    cfg = _stream_cfg(tmp_path, "cap2", max_fetches=30, num_workers=3,
                      lease_urls=8, num_coordinators=2)
    res = _run_stream(cfg)
    c = res["counters"]
    # >= cap: the stop latches only once the GLOBAL count crosses it;
    # < 280: far under the ~300-page drain, so the cap (not exhaustion)
    # stopped the crawl even though each clock shard saw only its share
    assert 30 <= c["fetched"] < 280
    t = aio.read_partitions(str(tmp_path / "cap2" / "pairs"))
    assert t.num_rows == c["pairs_rows"]


@pytest.mark.usefixtures("ray_session")
def test_stream_worker_death_mid_drain_recovers(tmp_path):
    """Round-5 VERDICT #4: SIGKILL-equivalent worker-actor deaths
    (ray.kill, no restart) mid-drain must not hang the drain barrier,
    duplicate a pairs row, or change the fetched set. Two of three
    workers are killed at different crawl phases; the supervision loop
    reclaims their outstanding leases, deletes their reclaimed-lease
    fragments and spawns replacements."""
    import threading
    import time

    import ray

    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "wd_ref", corpus_size=400,
                                  num_workers=3))

    cfg = _stream_cfg(tmp_path, "wd", corpus_size=400, num_workers=3)
    job = StreamCrawlJob(cfg)
    box = {}

    def _go():
        box["res"] = job.run()

    t = threading.Thread(target=_go)
    t.start()
    killed = 0
    deadline = time.time() + 60
    thresholds = [30, 120]
    while killed < 2 and time.time() < deadline:
        c = ray.get(job.coord.counters.remote())
        if c["fetched"] >= thresholds[killed]:
            ray.kill(job.workers[killed], no_restart=True)
            killed += 1
        time.sleep(0.005)
    t.join(timeout=180)
    assert not t.is_alive(), "drain barrier hung after worker death"
    job.shutdown()
    assert killed == 2, f"crawl drained before both kills landed ({killed})"
    res = box["res"]

    ids = aio.read_partitions(str(tmp_path / "wd" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))                   # zero duplicate pairs
    assert set(ids) == _pairs_ids(tmp_path / "wd_ref")  # exact fetched set
    assert res["seen_total"] == ref["seen_total"]


@pytest.mark.usefixtures("ray_session")
def test_stream_worker_death_during_checkpointing_run(tmp_path):
    """Worker death interleaved with quiesce-checkpoints: the dead worker
    may hold checkpoint ownership (released by worker_died) or die around
    a promote (orphan partitions adopted). Same exactness bar."""
    import threading
    import time

    import ray

    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "wdc_ref", corpus_size=400,
                                  num_workers=3))
    cfg = _stream_cfg(tmp_path, "wdc", corpus_size=400, num_workers=3,
                      checkpoint_every_fetches=60)
    job = StreamCrawlJob(cfg)
    box = {}

    def _go():
        box["res"] = job.run()

    t = threading.Thread(target=_go)
    t.start()
    deadline = time.time() + 60
    killed = False
    while not killed and time.time() < deadline:
        c = ray.get(job.coord.counters.remote())
        if c["fetched"] >= 55:  # right at the first checkpoint boundary
            ray.kill(job.workers[1], no_restart=True)
            killed = True
        time.sleep(0.002)
    t.join(timeout=180)
    assert not t.is_alive(), "drain barrier hung after worker death"
    job.shutdown()
    assert killed, "crawl drained before the kill landed"

    ids = aio.read_partitions(str(tmp_path / "wdc" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))
    assert set(ids) == _pairs_ids(tmp_path / "wdc_ref")


@pytest.mark.usefixtures("ray_session")
def test_stream_sharded_coordinators_same_fetched_set(tmp_path):
    """Round-5 VERDICT #5: with the epoch clock sharded across >=2
    coordinators (workers hash by wid), the fetched set / robots-denied
    count / seen set stay schedule-independent — including under tight
    politeness budgets, where per-coordinator epoch skew stresses the
    monotone refill guard."""
    r1 = _run_stream(_stream_cfg(tmp_path, "c1", num_workers=3))
    r2 = _run_stream(_stream_cfg(tmp_path, "c2", num_workers=3,
                                 num_coordinators=2))
    r3 = _run_stream(_stream_cfg(tmp_path, "c3", num_workers=3,
                                 num_coordinators=3))
    assert _pairs_ids(tmp_path / "c2") == _pairs_ids(tmp_path / "c1")
    assert _pairs_ids(tmp_path / "c3") == _pairs_ids(tmp_path / "c1")
    for r in (r2, r3):
        assert r["seen_total"] == r1["seen_total"]
        for k in ("fetched", "http_404", "robots_denied", "pairs_rows"):
            assert r["counters"][k] == r1["counters"][k], k
    # politeness-limited (default budgets ration every epoch)
    t1 = _run_stream(_stream_cfg(tmp_path, "ct1", corpus_size=120,
                                 budgets={}, leases_per_epoch=4))
    t2 = _run_stream(_stream_cfg(tmp_path, "ct2", corpus_size=120,
                                 budgets={}, leases_per_epoch=4,
                                 num_workers=3, num_coordinators=2))
    assert _pairs_ids(tmp_path / "ct2") == _pairs_ids(tmp_path / "ct1")
    assert t2["counters"]["fetched"] == t1["counters"]["fetched"]


@pytest.mark.usefixtures("ray_session")
def test_stream_sharded_coordinators_worker_death(tmp_path):
    """Worker death under sharded coordinators: the recovery must talk to
    the dead worker's OWN coordinator shard."""
    import threading
    import time

    import ray

    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "cd_ref", corpus_size=400,
                                  num_workers=3))
    cfg = _stream_cfg(tmp_path, "cd", corpus_size=400, num_workers=3,
                      num_coordinators=2)
    job = StreamCrawlJob(cfg)
    box = {}

    def _go():
        box["res"] = job.run()

    t = threading.Thread(target=_go)
    t.start()
    deadline = time.time() + 60
    killed = False
    while not killed and time.time() < deadline:
        ctrs = ray.get([c.counters.remote() for c in job.coords])
        if sum(c["fetched"] for c in ctrs) >= 60:
            ray.kill(job.workers[1], no_restart=True)  # wid 1 → coord 1
            killed = True
        time.sleep(0.005)
    t.join(timeout=180)
    assert not t.is_alive()
    job.shutdown()
    assert killed
    ids = aio.read_partitions(str(tmp_path / "cd" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))
    assert set(ids) == _pairs_ids(tmp_path / "cd_ref")


@pytest.mark.usefixtures("ray_session")
def test_stream_sharded_coordinators_checkpoint_and_resume(tmp_path):
    """Round-5: global quiesce-checkpoints under a SHARDED clock — any
    shard's trigger forwards the pause to coordinator 0, the owner
    pauses/quiesces every clock, and kill-resume (simulated: no final
    promotion) restores every coordinator's state. Same exactness bar
    as the single-clock path."""
    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "cc_ref", num_workers=3))
    # checkpointed full run at C=2: same fetched set, marker written
    res = _run_stream(_stream_cfg(tmp_path, "cc", num_workers=3,
                                  num_coordinators=2,
                                  checkpoint_every_fetches=80))
    assert _pairs_ids(tmp_path / "cc") == _pairs_ids(tmp_path / "cc_ref")
    t = aio.read_partitions(str(tmp_path / "cc" / "pairs"))
    assert t.num_rows == res["counters"]["pairs_rows"]
    assert (tmp_path / "cc" / "stream_ckpt.json").exists()

    # kill-and-resume at C=2
    cfg1 = _stream_cfg(tmp_path, "ckr", num_workers=3, num_coordinators=2,
                       checkpoint_every_fetches=60)
    job1 = StreamCrawlJob(cfg1)
    job1.run(finalize=False)
    job1.shutdown()
    assert (tmp_path / "ckr" / "stream_ckpt.json").exists()
    job2 = StreamCrawlJob(_stream_cfg(tmp_path, "ckr", num_workers=3,
                                      num_coordinators=2,
                                      checkpoint_every_fetches=60))
    job2.run(resume=True)
    job2.shutdown()
    ids = aio.read_partitions(str(tmp_path / "ckr" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))
    assert set(ids) == _pairs_ids(tmp_path / "cc_ref")

    # resuming a C=2 checkpoint with C=3 must be rejected (state list
    # is per clock shard)
    bad = StreamCrawlJob(_stream_cfg(tmp_path, "ckr", num_workers=3,
                                     num_coordinators=3,
                                     checkpoint_every_fetches=60))
    with pytest.raises(ValueError, match="config mismatch"):
        bad.run(resume=True)
    bad.shutdown()


@pytest.mark.usefixtures("ray_session")
def test_stream_worker_death_with_spilled_frontier(tmp_path):
    """Worker death while the frontier tail lives in parquet spill runs
    (the 10^10-URL memory shape): reclaim re-adds rows through the same
    _add_run/_maybe_spill path — exactness must hold."""
    import threading
    import time

    import ray

    from akf_cdparser_ray.pipelines.stream_crawl import StreamCrawlJob

    ref = _run_stream(_stream_cfg(tmp_path, "sp_ref", corpus_size=400,
                                  num_workers=3))
    cfg = _stream_cfg(tmp_path, "sp_wd", corpus_size=400, num_workers=3,
                      frontier_spill_rows=16)
    job = StreamCrawlJob(cfg)
    box = {}

    def _go():
        box["res"] = job.run()

    t = threading.Thread(target=_go)
    t.start()
    deadline = time.time() + 60
    killed = False
    while not killed and time.time() < deadline:
        c = ray.get(job.coord.counters.remote())
        if c["fetched"] >= 60:
            ray.kill(job.workers[2], no_restart=True)
            killed = True
        time.sleep(0.005)
    t.join(timeout=180)
    assert not t.is_alive()
    job.shutdown()
    assert killed
    ids = aio.read_partitions(str(tmp_path / "sp_wd" / "pairs")) \
        .column("image_id").to_pylist()
    assert len(ids) == len(set(ids))
    assert set(ids) == _pairs_ids(tmp_path / "sp_ref")
