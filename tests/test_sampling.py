"""Deterministic sampling/split operator tests (stages/sampling.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.sampling import (
    bottom_k_sample, hash_sample, md5_lower64, split_assign,
)

SF_DIR = "/root/testdata/sf0.01"


def test_md5_lower64_matches_duckdb():
    import duckdb

    vals = ["42", "0", "hello", "doc-123", "ä"]
    exp = duckdb.connect().execute(
        "SELECT " + ", ".join(f"md5_number_lower('{v}')" for v in vals)
    ).fetchone()
    assert [md5_lower64(v) for v in vals] == list(exp)


def _mk_ds(n=2000):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))


@pytest.mark.usefixtures("ray_session")
def test_split_assign_ratios_and_determinism():
    out = split_assign(_mk_ds(), "doc_id").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # pure function of (key, salt): repartitioning can't move a row
    again = split_assign(_mk_ds().repartition(7), "doc_id").to_pandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # a different salt reshuffles membership
    salted = split_assign(_mk_ds(), "doc_id", salt="v2").to_pandas()
    m2 = out.merge(salted, on="doc_id", suffixes=("_a", "_b"))
    assert (m2["split_a"] != m2["split_b"]).any()


@pytest.mark.usefixtures("ray_session")
def test_hash_sample_rate_and_stability():
    got = hash_sample(_mk_ds(), "doc_id", 0.25).to_pandas()
    assert abs(len(got) / 2000 - 0.25) < 0.04
    # sample at a higher rate is a SUPERSET (hash thresholding property)
    bigger = hash_sample(_mk_ds(), "doc_id", 0.5).to_pandas()
    assert set(got["doc_id"]) <= set(bigger["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_bottom_k_partition_invariant():
    a = bottom_k_sample(_mk_ds(), "doc_id", 25)
    b = bottom_k_sample(_mk_ds().repartition(13), "doc_id", 25)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert len(a) == 25
    # hand-verified: these ARE the 25 smallest hashes over the key space
    h = sorted((md5_lower64(i), i) for i in range(2000))[:25]
    assert a["doc_id"].tolist() == [i for _hh, i in h]


@pytest.mark.usefixtures("ray_session")
def test_temperature_sample_rebalances_skewed_sources():
    import math

    import ray.data as rd

    from akf_cdparser_ray.stages.sampling import temperature_sample

    sizes = {"big": 6400, "mid": 800, "small": 100}
    rows = [(f"{src}-{i}", src) for src, n in sizes.items()
            for i in range(n)]
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    ds = rd.from_pandas(df)

    out = temperature_sample(ds, "source", "doc_id", alpha=0.5,
                             salt="t").to_pandas()
    kept = out.groupby("source").size().to_dict()
    # smallest source intact; others kept at (n_min/n)^0.5 in expectation
    assert kept["small"] == 100
    for src in ("big", "mid"):
        rate = (100 / sizes[src]) ** 0.5
        assert abs(kept[src] / sizes[src] - rate) < 0.05
    # brute-force: per-row decision is exactly bucket < floor(rate*1e4)
    thr = {s: int(math.floor(((100 / n) ** 0.5) * 10000))
           for s, n in sizes.items()}
    exp = {s: 0 for s in sizes}
    for doc_id, src in rows:
        if md5_lower64(doc_id + "t") % 10000 < thr[src]:
            exp[src] += 1
    assert kept == exp
    # alpha=1 is the identity mix
    full = temperature_sample(ds, "source", "doc_id", alpha=1.0,
                              salt="t").to_pandas()
    assert len(full) == len(df)


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_k():
    import ray.data as rd

    from akf_cdparser_ray.stages.sampling import weighted_sample_k

    n = 1500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "w": (np.arange(n) % 97 + 1).astype(np.int64),
    })
    df.loc[5, "w"] = 0  # must be excluded
    ds = rd.from_pandas(df)

    out = weighted_sample_k(ds, "doc_id", "w", k=40, salt="s")
    # brute-force A-ES reference over the whole frame
    u = (np.array([md5_lower64(str(i) + "s") for i in df.doc_id],
                  dtype=np.float64) + 1.0) / 2.0 ** 64
    score = np.where(df.w > 0, u ** (1.0 / np.maximum(df.w, 1)), -1.0)
    ref = df.assign(_s=score).sort_values(
        ["_s", "doc_id"], ascending=[False, True]).head(40)
    assert out["doc_id"].tolist() == ref["doc_id"].tolist()
    assert 5 not in out["doc_id"].tolist()

    # partitioning-independent selection
    out2 = weighted_sample_k(ds.repartition(11), "doc_id", "w", k=40,
                             salt="s")
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()

    # weights bias inclusion: heavy rows should dominate the sample
    heavy_share = (out["w"] > 48).mean()
    assert heavy_share > 0.6


@pytest.mark.usefixtures("ray_session")
def test_interval_join_matches_bruteforce():
    import ray.data as rd

    from akf_cdparser_ray.stages.windows import interval_join_partitioned

    rng = np.random.RandomState(5)
    n = 400
    pts = pd.DataFrame({
        "key": rng.randint(0, 10, n).astype("int64"),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
    })
    anchors = pts.iloc[::5].reset_index(drop=True).copy()
    anchors["anchor_id"] = np.arange(len(anchors), dtype="int64")
    got = interval_join_partitioned(
        rd.from_pandas([pts]), rd.from_pandas([anchors]), minutes=10,
        num_shards=4,
    )
    delta = pd.Timedelta(minutes=10)
    exp = {}
    for _i, a in anchors.iterrows():
        m = pts[(pts["key"] == a["key"]) & (pts["ts"] >= a["ts"])
                & (pts["ts"] < a["ts"] + delta)]
        if len(m):
            exp[a["anchor_id"]] = len(m)
    assert dict(zip(got["anchor_id"], got["n_points"])) == exp


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_k():
    import ray.data as rd

    from akf_cdparser_ray.stages.sampling import stratified_sample_k

    df = pd.DataFrame({
        "g": ["a"] * 100 + ["b"] * 100 + ["c"] * 2,
        "id": np.arange(202, dtype=np.int64),
    })
    out = stratified_sample_k(rd.from_pandas([df]), "g", "id", k=5).to_pandas()
    counts = out["g"].value_counts()
    assert counts["a"] == 5 and counts["b"] == 5 and counts["c"] == 2
    # deterministic + partition invariant
    out2 = stratified_sample_k(
        rd.from_pandas([df.iloc[i::7].reset_index(drop=True) for i in range(7)]),
        "g", "id", k=5,
    ).to_pandas()
    assert out["id"].tolist() == out2["id"].tolist()
    # matches explicit bottom-k per group
    for g in ("a", "b"):
        ids = df[df["g"] == g]["id"]
        exp = sorted(ids, key=lambda i: (md5_lower64(i), i))[:5]
        assert sorted(out[out["g"] == g]["id"]) == sorted(exp)


@pytest.mark.usefixtures("ray_session")
def test_fast_hash_mode_semantics():
    """Round-4: hash_mode="fast" (vectorized pd.util.hash_array) keeps
    the split SEMANTICS of md5 mode — deterministic, layout-independent,
    resume-stable, ratio-respecting — without the per-row md5 loop.
    Oracled queries pin md5 mode; fast mode is the 1e9+-row hot path."""
    import ray.data as rd

    from akf_cdparser_ray.stages.sampling import hash_sample, split_assign

    df = pd.DataFrame({"doc_id": np.arange(20_000, dtype=np.int64)})

    def run(blocks):
        ds = rd.from_pandas(blocks)
        out = split_assign(ds, "doc_id", hash_mode="fast").to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    a = run([df.iloc[i::4].reset_index(drop=True) for i in range(4)])
    b = run([df.iloc[i::7].reset_index(drop=True) for i in range(7)])
    # determinism + partitioning-independence: identical assignment
    assert a.equals(b)
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # salt changes the assignment; same salt reproduces it
    s1 = split_assign(rd.from_pandas(df), "doc_id", salt="x",
                      hash_mode="fast").to_pandas()
    s2 = split_assign(rd.from_pandas(df), "doc_id", salt="x",
                      hash_mode="fast").to_pandas()
    assert s1.equals(s2) and not s1["split"].equals(a["split"])
    # Bernoulli rate holds and is a subset-stable filter
    kept = hash_sample(rd.from_pandas(df), "doc_id", 0.25,
                       hash_mode="fast").to_pandas()
    assert abs(len(kept) / len(df) - 0.25) < 0.02
    kept_half = hash_sample(rd.from_pandas(df.iloc[:10_000]), "doc_id",
                            0.25, hash_mode="fast").to_pandas()
    assert set(kept_half["doc_id"]) == {
        d for d in kept["doc_id"] if d < 10_000}


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_k_all_filtered_blocks():
    # regression (round-5 ADVICE): blocks whose rows all filter out
    # (weight <= 0) must emit the _s column too — mixed block schemas /
    # a KeyError on the driver sort otherwise.
    import ray.data as rd

    from akf_cdparser_ray.stages.sampling import weighted_sample_k

    df = pd.DataFrame({"doc_id": range(20), "w": [0.0] * 10 + [1.0] * 10})
    blocks = [df.iloc[:10].reset_index(drop=True),
              df.iloc[10:].reset_index(drop=True)]
    out = weighted_sample_k(rd.from_pandas(blocks), "doc_id", "w", k=5,
                            salt="s")
    assert len(out) == 5 and (out["w"] > 0).all()
    # fully-filtered input: empty result, no KeyError
    zero = [b.assign(w=0.0) for b in blocks]
    out0 = weighted_sample_k(rd.from_pandas(zero), "doc_id", "w", k=5,
                             salt="s")
    assert len(out0) == 0


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_positions():
    """Deterministic epoch reshuffle: positions form an exact permutation
    matching a brute-force (hash, key) rank; partitioning-independent;
    different epochs give different permutations."""
    import ray.data as rd

    from akf_cdparser_ray.stages.sampling import _hash_col, epoch_shuffle

    ids = np.arange(300, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    ds = rd.from_pandas([df.iloc[i::5].reset_index(drop=True)
                         for i in range(5)])
    out = epoch_shuffle(ds, key="doc_id", epoch=2, num_shards=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # brute force: rank by (md5(key||'|ep2'), key)
    h = _hash_col(ids.tolist(), "|ep2", "md5")
    order = np.lexsort((ids, h))
    exp = np.empty(len(ids), dtype=np.int64)
    exp[order] = np.arange(len(ids))
    assert out["pos"].to_numpy().tolist() == exp.tolist()
    assert sorted(out["pos"]) == list(range(len(ids)))  # a permutation
    # partitioning-independent
    out2 = epoch_shuffle(rd.from_pandas([df]), key="doc_id", epoch=2,
                         num_shards=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2["pos"].tolist() == out["pos"].tolist()
    # epochs decorrelate
    out3 = epoch_shuffle(ds, key="doc_id", epoch=3, num_shards=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out3["pos"].tolist() != out["pos"].tolist()
