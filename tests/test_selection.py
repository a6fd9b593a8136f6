"""Distributed exact-quantile selection (stages/selection.py) and exact
grouped count-distinct (stages/relational.grouped_count_distinct)."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.relational import grouped_count_distinct
from akf_cdparser_ray.stages.selection import global_exact_quantiles


def _chunks(df, n):
    return [df.iloc[i::n].reset_index(drop=True) for i in range(n)]


def _disc(vals, q):
    import math

    v = np.sort(np.asarray(vals, dtype=np.float64))
    return float(v[max(0, math.ceil(q * len(v)) - 1)])


@pytest.mark.usefixtures("ray_session")
def test_quantiles_exact_and_layout_independent():
    import ray.data as rd

    rng = np.random.default_rng(31)
    vals = np.concatenate([rng.normal(0, 1, 4000),
                           rng.normal(50, 5, 1000),
                           np.full(500, 7.25)])  # heavy duplicate spike
    df = pd.DataFrame({"value": vals})
    qs = (0.0, 0.25, 0.5, 0.9, 1.0)
    outs = []
    for n in (1, 6):
        out = global_exact_quantiles(
            rd.from_pandas(_chunks(df, n)), "value", qs=qs,
            num_buckets=64)
        outs.append(out)
        for q, v in zip(out["q"], out["value"]):
            assert v == _disc(vals, q)
        assert (out["n"] == len(vals)).all()
    assert outs[0].equals(outs[1])


@pytest.mark.usefixtures("ray_session")
def test_quantiles_forced_recursion_and_all_equal():
    import ray.data as rd

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 1, 3000)
    ds = rd.from_pandas(_chunks(pd.DataFrame({"value": vals}), 3))
    # collect_cap far below bucket populations -> must recurse, stay exact
    out = global_exact_quantiles(ds, "value", qs=(0.5,),
                                 num_buckets=4, collect_cap=20)
    assert out["value"].iloc[0] == _disc(vals, 0.5)
    # an all-equal column cannot split buckets: lo==hi short-circuit
    same = rd.from_pandas([pd.DataFrame({"value": np.full(100, 3.5)})])
    out2 = global_exact_quantiles(same, "value", qs=(0.5, 0.99),
                                  num_buckets=4, collect_cap=10)
    assert out2["value"].tolist() == [3.5, 3.5]


@pytest.mark.usefixtures("ray_session")
def test_quantiles_nulls_and_empty():
    import ray.data as rd

    df = pd.DataFrame({"value": [1.0, None, 3.0, None, 2.0]})
    out = global_exact_quantiles(rd.from_pandas([df]), "value", qs=(0.5,))
    assert out["value"].iloc[0] == 2.0 and out["n"].iloc[0] == 3
    empty = rd.from_pandas([pd.DataFrame({"value": pd.Series(
        [None], dtype="float64")})])
    assert len(global_exact_quantiles(empty, "value")) == 0


@pytest.mark.usefixtures("ray_session")
def test_grouped_count_distinct():
    import ray.data as rd

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"k": rng.choice(["x", "y"], 500),
                       "v": rng.integers(0, 40, 500)})
    out = (grouped_count_distinct(rd.from_pandas(_chunks(df, 5)),
                                  "k", "v", alias="nd")
           .to_pandas().sort_values("k").reset_index(drop=True))
    expect = df.groupby("k")["v"].nunique()
    assert out["nd"].tolist() == [int(expect["x"]), int(expect["y"])]


@pytest.mark.usefixtures("ray_session")
def test_global_rank_exact_with_ties_and_layout():
    import ray.data as rd

    from akf_cdparser_ray.stages.export import global_rank

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"doc_id": np.arange(600, dtype=np.int64),
                       "v": rng.integers(0, 40, 600)})  # heavy ties
    expect = (df.sort_values(["v", "doc_id"], kind="mergesort")
              .reset_index(drop=True))
    expect["rank"] = np.arange(len(expect), dtype=np.int64)
    expect = expect.set_index("doc_id")["rank"]
    outs = []
    for n in (1, 6):
        ds = rd.from_pandas(_chunks(df, n))
        out = (global_rank(ds, col="v", key="doc_id", num_shards=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(out)
        got = out.set_index("doc_id")["rank"].sort_index()
        assert (got == expect.sort_index()).all()
    assert outs[0].equals(outs[1])


@pytest.mark.usefixtures("ray_session")
def test_grouped_exact_quantile_vs_local():
    import ray.data as rd

    from akf_cdparser_ray.stages.selection import grouped_exact_quantile

    rng = np.random.default_rng(47)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 3000),
        "v": rng.normal(0, 10, 3000)})
    df.loc[df["k"] == "c", "v"] = 7.0   # constant group (mn==mx path)
    df.loc[rng.integers(0, 3000, 50), "v"] = np.nan
    for q in (0.1, 0.5, 0.9):
        for cap in (2_000_000, 20):  # big cap = 1 round; tiny = recursion
            out = grouped_exact_quantile(
                rd.from_pandas([df.iloc[i::4].reset_index(drop=True)
                                for i in range(4)]),
                "k", "v", q=q, num_buckets=8, collect_cap=cap)
            for kval, g in df.groupby("k"):
                vals = np.sort(g["v"].dropna().to_numpy())
                expect = _disc(vals, q)
                got = float(out[out["k"] == kval]["value"].iloc[0])
                assert got == expect, (q, cap, kval)
                assert int(out[out["k"] == kval]["n"].iloc[0]) == len(vals)


@pytest.mark.usefixtures("ray_session")
def test_grouped_exact_quantile_empty_group_and_all_null():
    import ray.data as rd

    from akf_cdparser_ray.stages.selection import grouped_exact_quantile

    df = pd.DataFrame({"k": ["a", "a", "b"],
                       "v": [1.0, 3.0, None]})
    out = grouped_exact_quantile(rd.from_pandas([df]), "k", "v", q=0.5)
    a = out[out["k"] == "a"]
    b = out[out["k"] == "b"]
    assert float(a["value"].iloc[0]) == 1.0 and int(a["n"].iloc[0]) == 2
    assert np.isnan(b["value"].iloc[0]) and int(b["n"].iloc[0]) == 0
