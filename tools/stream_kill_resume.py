"""Hard-kill robustness harness for the streaming crawl.

tests/test_stream_crawl.py pins kill-and-resume with a SIMULATED kill
(run(finalize=False)); this harness kills the real thing: it launches a
checkpointed stream crawl in its own process group, SIGKILLs the whole
tree at a wall-clock offset (sampling arbitrary crash windows — mid-
lease, mid-checkpoint, mid-promotion), resumes in a fresh process, and
verifies the final pairs union equals an uninterrupted reference run's
set with zero duplicate image ids.

Usage:
    python tools/stream_kill_resume.py [corpus] [kill_after_s ...]
    # default: corpus=6000, kills at 4, 6, 8 seconds

Wall-clock here drives only WHEN the kill lands (robustness sampling),
never any crawl state — the determinism rules apply to the engine, not
the harness.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys, json
sys.path.insert(0, {repo!r}); os.chdir({repo!r})
os.environ["PYTHONPATH"] = {repo!r}
os.environ.setdefault("AKF_PICKLE_BY_VALUE", "0")
import ray
ray.data.DataContext.get_current().execution_options.preserve_order = True
ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
from akf_cdparser_ray.pipelines.stream_crawl import (
    StreamCrawlConfig, StreamCrawlJob)
from akf_cdparser_ray.sources.synth import page_url_for_idx
cfg = StreamCrawlConfig(
    seeds=[page_url_for_idx(i) for i in range(200)],
    corpus_size={corpus}, out_dir={out!r},
    num_shards=8, num_politeness_shards=4, lease_urls=64,
    budgets={{f"host{{k}}.example": {{"per_wave": 100000, "burst": 100000}}
             for k in range(20)}},
    filter_capacity=1 << 16,
    checkpoint_every_fetches={ckpt_every},
)
job = StreamCrawlJob(cfg)
if {worker_kills}:
    # compose fault models: random worker-actor deaths (in-job recovery)
    # while the harness may also SIGKILL the whole job (resume path)
    import random, threading, time as _t

    def _killer():
        rng = random.Random(1234)
        for _i in range({worker_kills}):
            _t.sleep(0.8 + rng.random() * 1.2)
            ws = list(job.workers)
            if ws:
                try:
                    ray.kill(ws[rng.randrange(len(ws))], no_restart=True)
                except Exception:
                    pass

    threading.Thread(target=_killer, daemon=True).start()
res = job.run(resume={resume})
print("CHILD_DONE " + json.dumps(res["counters"]))
job.shutdown(); ray.shutdown()
"""


def _spawn(out: str, corpus: int, ckpt_every: int, resume: bool,
           worker_kills: int = 0):
    code = _CHILD.format(repo=REPO, corpus=corpus, out=out,
                         ckpt_every=ckpt_every, resume=resume,
                         worker_kills=worker_kills)
    return subprocess.Popen(
        [sys.executable, "-c", code], start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def _pairs_multiset(out: str):
    """Per-(image_id, phash, caption) row counts. Multiset comparison —
    not set+uniqueness — because the synthetic corpus reuses image ids
    beyond ~160k pages (id = year/idx%10^4), so at 200k two DIFFERENT
    pages legitimately share an id; the invariant at any size is that
    the killed+resumed run's row multiset equals the uninterrupted
    run's (catches both duplication and loss)."""
    sys.path.insert(0, REPO)
    from akf_cdparser_ray.sources import io as aio

    t = aio.read_partitions(os.path.join(out, "pairs"))
    df = t.select(["image_id", "phash", "caption"]).to_pandas()
    return df.groupby(["image_id", "phash", "caption"]).size().sort_index()


def run_case(corpus: int, ckpt_every: int, kill_after: float,
             ref_multiset, worker_kills: int = 0) -> dict:
    out = tempfile.mkdtemp(prefix="kill_resume_")
    p = _spawn(out, corpus, ckpt_every, resume=False,
               worker_kills=worker_kills)
    time.sleep(kill_after)
    killed = p.poll() is None
    if killed:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
    # marker state at kill time (BEFORE resume, which checkpoints anew):
    # False exercises the fresh-restart branch of _restore
    had_marker = os.path.exists(os.path.join(out, "stream_ckpt.json"))
    # resume in a fresh process (fresh Ray cluster)
    p2 = _spawn(out, corpus, ckpt_every, resume=True)
    stdout, _ = p2.communicate(timeout=600)
    assert "CHILD_DONE" in stdout, f"resume child failed: {stdout[-400:]}"
    ms = _pairs_multiset(out)
    result = {
        "kill_after_s": kill_after,
        "killed_mid_run": killed,
        "had_checkpoint": had_marker,
        "worker_kills": worker_kills,
        "multiset_matches_reference": ms.equals(ref_multiset),
        "rows": int(ms.sum()),
    }
    assert result["multiset_matches_reference"], \
        "pairs row multiset diverged after resume (duplication or loss)"
    return result


def main() -> None:
    args = sys.argv[1:]
    worker_kills = 0
    if "--worker-kills" in args:  # compose actor deaths with the SIGKILL
        i = args.index("--worker-kills")
        worker_kills = int(args[i + 1])
        del args[i:i + 2]
    corpus = int(args[0]) if args else 6000
    kills = [float(a) for a in args[1:]] or [4.0, 6.0, 8.0]
    # uninterrupted reference
    ref_out = tempfile.mkdtemp(prefix="kill_resume_ref_")
    p = _spawn(ref_out, corpus, ckpt_every=1 << 30, resume=False)
    stdout, _ = p.communicate(timeout=600)
    assert "CHILD_DONE" in stdout, f"reference run failed: {stdout[-400:]}"
    ref_multiset = _pairs_multiset(ref_out)
    print(json.dumps({"reference_rows": int(ref_multiset.sum()),
                      "corpus": corpus}))
    for k in kills:
        print(json.dumps(run_case(corpus, ckpt_every=800, kill_after=k,
                                  ref_multiset=ref_multiset,
                                  worker_kills=worker_kills)))


if __name__ == "__main__":
    main()
