"""The sharded actor dequeue (LSM-run head merge) must match a driver-side
pandas reference computation exactly (per-shard priority top-k, url
tie-breaks), including across multiple enqueued runs."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.frontier import FRONTIER_COLS
from akf_cdparser_ray.stages.links import url_hash64


def _frontier(n: int, start: int = 0) -> pd.DataFrame:
    rows = []
    for i in range(start, start + n):
        url = f"http://h{i % 9}.example/{i}.html"
        rows.append(
            {
                "url_canon": url,
                "url_hash": np.uint64(url_hash64(url)),
                "host": f"h{i % 9}.example",
                "priority": 100 - (i % 13),
                "depth": i % 4,
                "discovered_at": 0,
            }
        )
    return pd.DataFrame(rows, columns=FRONTIER_COLS)


@pytest.mark.usefixtures("ray_session")
def test_actor_dequeue_matches_pandas_reference():
    import ray

    from akf_cdparser_ray.stages.dedupe import FrontierShard

    num_shards, k = 4, 5
    f1, f2 = _frontier(200), _frontier(100, start=200)
    shards = [FrontierShard.remote(1 << 14) for _ in range(num_shards)]
    for df in (f1, f2):  # two runs per shard (exercises the head merge)
        sid = (df["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(num_shards)).astype("int64")
        ray.get([
            shards[s].seed.remote(df[sid == s].reset_index(drop=True))
            for s in range(num_shards)
        ])

    parts = [ray.get(shards[s].dequeue.remote(k)).to_pandas() for s in range(num_shards)]
    got = pd.concat(parts, ignore_index=True)

    # pandas reference: per-shard sort by (priority desc, url asc), head(k)
    ref = pd.concat([f1, f2], ignore_index=True)
    ref["shard"] = (ref["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(num_shards)).astype("int64")
    ref = ref.sort_values(["shard", "priority", "url_canon"], ascending=[True, False, True])
    want = ref.groupby("shard", sort=True).head(k).drop(columns=["shard"]).reset_index(drop=True)

    key = ["url_canon", "priority", "depth"]
    pd.testing.assert_frame_equal(
        got[key].reset_index(drop=True),
        want[key].astype({"priority": "int64", "depth": "int64"}).reset_index(drop=True),
    )

    # remaining rows in the actors = everything not dequeued
    remaining = sum(ray.get([s.frontier_size.remote() for s in shards]))
    assert remaining == 300 - len(want)

    # second dequeue must not repeat any row
    parts2 = [ray.get(shards[s].dequeue.remote(k)).to_pandas() for s in range(num_shards)]
    got2 = pd.concat(parts2, ignore_index=True)
    assert not (set(got2["url_canon"]) & set(got["url_canon"]))
    for s in shards:
        ray.kill(s)
