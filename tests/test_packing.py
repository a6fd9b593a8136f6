"""Sequence-packing tests (stages/packing.py)."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.packing import pack_batch, packing_stats


def test_pack_batch_correctness():
    batch = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                          "n_tokens": [300, 300, 200, 100, 900]})
    out = pack_batch(batch, max_len=512)
    assert (out["used"] + out["padding"] == 512).all()
    assert out["n_docs"].sum() == 5
    assert out["used"].sum() == 300 + 300 + 200 + 100 + 512  # 900 truncated
    assert out["truncated"].sum() == 1
    # no bin overflows; FFD on this input: [512t], [300+200], [300+100]
    assert sorted(out["used"]) == [400, 500, 512]


def test_pack_batch_deterministic_and_tight():
    rng = np.random.RandomState(9)
    batch = pd.DataFrame({"doc_id": np.arange(500),
                          "n_tokens": rng.randint(1, 400, 500)})
    a = pack_batch(batch, max_len=512)
    b = pack_batch(batch.sample(frac=1.0, random_state=1), max_len=512)
    # row order in the batch must not matter (FFD sorts internally)
    assert a.sort_values("bin_key").values.tolist() == \
        b.sort_values("bin_key").values.tolist()
    total = batch["n_tokens"].sum()
    lower_bound = -(-int(total) // 512)
    assert len(a) <= lower_bound * 11 // 9 + 1  # FFD guarantee
    assert (a["used"] <= 512).all()


@pytest.mark.usefixtures("ray_session")
def test_packing_stats_summary():
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(1000),
                       "n_tokens": np.full(1000, 100, dtype=np.int64)})
    stats = packing_stats(rd.from_pandas([df]), max_len=512)
    row = stats.iloc[0]
    assert row["n_docs"] == 1000
    assert row["used"] == 100_000
    assert row["n_bins"] == 200  # 5 docs of 100 per 512-window
    assert row["efficiency_pct"] == 97  # 100000/(200*512)
