"""Distributed PageRank (stages/graph.py): dense-reference agreement,
bit-exact layout independence, rank-mass conservation, dangling
self-loop semantics."""
import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.graph import pagerank_ds, pagerank_reference


def _random_graph(n=60, m=240, seed=4):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    # a few guaranteed-dangling nodes: ids >= n never appear as src
    extra = pd.DataFrame({"src": rng.integers(0, n, 10).astype(np.int64),
                          "dst": np.arange(n, n + 10, dtype=np.int64)})
    return pd.concat([pd.DataFrame({"src": src, "dst": dst}), extra],
                     ignore_index=True)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_reference_and_conserves_mass():
    import ray.data as rd

    edges = _random_graph()
    got = (pagerank_ds(rd.from_pandas(edges).repartition(5),
                       iters=12, num_shards=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = (pagerank_reference(edges, iters=12)
           .sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == exp["node"].tolist()
    np.testing.assert_allclose(got["rank"].to_numpy(),
                               exp["rank"].to_numpy(), rtol=0, atol=1e-12)
    # total rank mass = 1 (self-loop dangling treatment conserves it)
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # a hub with many in-links outranks an average node
    indeg = edges.groupby("dst").size()
    hub = int(indeg.idxmax())
    hub_rank = float(got.set_index("node")["rank"][hub])
    assert hub_rank > got["rank"].median()


@pytest.mark.usefixtures("ray_session")
def test_pagerank_bit_identical_across_layouts():
    import ray.data as rd

    edges = _random_graph(n=40, m=150, seed=9)
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_pandas(edges).repartition(nblocks)
        outs.append(pagerank_ds(ds, iters=8, num_shards=4)
                    .to_pandas().sort_values("node")
                    .reset_index(drop=True))
    # bit-exact, not approximately equal: hop-2 sums run in (node, src)
    # order regardless of layout
    assert outs[0]["node"].tolist() == outs[1]["node"].tolist()
    assert outs[0]["rank"].to_numpy().tobytes() == \
        outs[1]["rank"].to_numpy().tobytes()


@pytest.mark.usefixtures("ray_session")
def test_pagerank_pure_dangling_and_empty():
    import ray.data as rd

    # two isolated nodes linked one way: 1 is dangling (self-loops)
    edges = pd.DataFrame({"src": pd.Series([0], dtype="int64"),
                          "dst": pd.Series([1], dtype="int64")})
    got = (pagerank_ds(rd.from_pandas(edges), iters=20, num_shards=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = pagerank_reference(edges, iters=20)
    np.testing.assert_allclose(got["rank"].to_numpy(),
                               exp.sort_values("node")["rank"].to_numpy(),
                               atol=1e-12)
    assert got["rank"][1] > got["rank"][0]  # 1 receives + keeps mass
    empty = pagerank_ds(rd.from_pandas(pd.DataFrame(
        {"src": pd.Series(dtype="int64"),
         "dst": pd.Series(dtype="int64")})), iters=3).to_pandas()
    assert len(empty) == 0
