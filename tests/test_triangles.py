"""Distributed triangle counting (stages/graph.triangle_count) vs a
brute-force reference, including duplicate/reversed/self-loop inputs and
layout independence."""

from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.graph import triangle_count


def brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    nbr = {n: set() for n in nodes}
    for u, v in und:
        nbr[u].add(v)
        nbr[v].add(u)
    tri = sum(1 for a, b, c in combinations(nodes, 3)
              if b in nbr[a] and c in nbr[a] and c in nbr[b])
    return tri, len(und), len(nodes)


@pytest.mark.usefixtures("ray_session")
def test_triangles_match_bruteforce_with_dirty_input():
    import ray.data as rd

    rng = np.random.default_rng(29)
    n_nodes = 40
    edges = [(int(rng.integers(0, n_nodes)), int(rng.integers(0, n_nodes)))
             for _ in range(400)]  # includes self loops + dups
    edges += [(v, u) for u, v in edges[:100]]  # reversed duplicates
    df = pd.DataFrame(edges, columns=["src", "dst"])
    expect = brute(edges)
    for n in (1, 5):
        ds = rd.from_pandas([df.iloc[i::n].reset_index(drop=True)
                             for i in range(n)])
        out = triangle_count(ds, num_shards=4)
        got = (int(out["n_triangles"][0]), int(out["n_edges"][0]),
               int(out["n_nodes"][0]))
        assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_triangles_known_small_graphs():
    import ray.data as rd

    # K4 has 4 triangles; adding an isolated edge changes nothing
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = pd.DataFrame(k4 + [(10, 11)], columns=["src", "dst"])
    out = triangle_count(rd.from_pandas([df]), num_shards=3)
    assert int(out["n_triangles"][0]) == 4
    assert int(out["n_edges"][0]) == 7
    assert int(out["n_nodes"][0]) == 6
    # triangle-free: a star
    star = pd.DataFrame([(0, i) for i in range(1, 8)],
                        columns=["src", "dst"])
    out2 = triangle_count(rd.from_pandas([star]), num_shards=3)
    assert int(out2["n_triangles"][0]) == 0
