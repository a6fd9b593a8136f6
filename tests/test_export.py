"""Range-sharded export tests (stages/export.py)."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.sources import io as aio
from akf_cdparser_ray.stages.export import key_boundaries, write_range_shards


@pytest.mark.usefixtures("ray_session")
def test_boundaries_balance():
    import ray.data as rd

    rng = np.random.RandomState(0)
    df = pd.DataFrame({"v": rng.lognormal(0, 1, 20_000)})
    ds = rd.from_pandas([df.iloc[i::4].reset_index(drop=True) for i in range(4)])
    bounds = key_boundaries(ds, "v", 8)
    assert len(bounds) == 7 and (np.diff(bounds) > 0).all()
    counts = np.bincount(np.searchsorted(bounds, df["v"]), minlength=8)
    assert counts.max() / counts.min() < 1.3  # skewed input, balanced cuts


@pytest.mark.usefixtures("ray_session")
def test_write_range_shards_roundtrip(tmp_path):
    import ray.data as rd

    rng = np.random.RandomState(1)
    df = pd.DataFrame({
        "v": rng.exponential(5.0, 10_000),
        "payload": np.arange(10_000, dtype=np.int64),
    })
    ds = rd.from_pandas([df.iloc[i::5].reset_index(drop=True) for i in range(5)])
    root = str(tmp_path / "out")
    stats = write_range_shards(ds, root, "v", 4)
    assert sum(s["rows"] for s in stats) == 10_000
    sizes = [s["rows"] for s in stats]
    assert max(sizes) / max(1, min(sizes)) < 1.4
    back = aio.read_partitions(root).to_pandas()
    assert len(back) == 10_000
    assert set(back["payload"]) == set(df["payload"])  # nothing lost
    man = aio.load_manifest(root)["partitions"]
    # disjoint, ordered key ranges recorded in lineage; rows inside range
    for s in stats:
        entry = man[f"shard{s['shard']:04d}"]
        assert entry["rows"] == s["rows"]
        part = back  # per-partition check via re-read of just that dir
    for s in range(4):
        import os

        import pyarrow.parquet as pq

        pdir = os.path.join(root, f"shard{s:04d}")
        frags = [pq.read_table(os.path.join(pdir, f)).to_pandas()
                 for f in os.listdir(pdir) if f.endswith(".parquet")]
        if not frags:
            continue
        vals = pd.concat(frags)["v"]
        assert vals.min() >= stats[s]["lo"] and vals.max() <= stats[s]["hi"]


@pytest.mark.usefixtures("ray_session")
def test_range_shards_duplicate_heavy_no_fragment_loss(tmp_path):
    """Round-4 ADVICE regression: byte-identical key slices across
    different batches (constant keys, duplicate-heavy data) must not
    collide on fragment names — every routed row reaches its shard and
    the manifest count matches what is actually on disk."""
    import ray.data as rd

    from akf_cdparser_ray.sources.io import read_partitions
    from akf_cdparser_ray.stages.export import write_range_shards

    # 12 blocks with IDENTICAL content: constant key, constant payload —
    # the old content-digest naming collapsed them all into one fragment
    frames = [pd.DataFrame({"k": [1.0] * 50, "payload": ["x"] * 50})
              for _ in range(12)]
    ds = rd.from_pandas(frames)
    root = str(tmp_path / "shards")
    out = write_range_shards(ds, root, "k", n_shards=2)
    assert sum(o["rows"] for o in out) == 600
    assert read_partitions(root).num_rows == 600
