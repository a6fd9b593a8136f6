"""Curation-funnel composition test (pipelines/curate.py)."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_curate_funnel_with_planted_issues():
    import ray.data as rd

    from akf_cdparser_ray.pipelines.curate import curate

    rng = np.random.RandomState(8)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    def mk_doc(n=40):
        return " ".join(rng.choice(words, n))
    docs = []
    base = mk_doc()
    for i in range(40):
        docs.append((i, mk_doc()))
    docs.append((100, "too short"))                     # quality drop
    docs.append((101, docs[0][1]))                      # exact dup of doc 0
    docs.append((102, docs[1][1] + " zeta"))            # near-dup of doc 1
    docs.append((103, base)); docs.append((104, base))  # exact dup pair
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    ds = rd.from_pandas([df.iloc[i::4].reset_index(drop=True) for i in range(4)])
    out = curate(ds, min_words=5, neardup_threshold=0.5, max_len=128)
    row = out.iloc[0]
    assert row["n_input"] == 45
    assert row["n_quality"] == 44                # the short doc dropped
    assert row["n_exact"] == 42                  # ids 101 and 104 dropped
    assert row["n_neardup"] <= 41                # 102 clusters with 1
    assert row["n_docs"] == row["n_neardup"]     # every survivor packed
    assert row["used"] + row["padding"] == row["n_bins"] * 128
