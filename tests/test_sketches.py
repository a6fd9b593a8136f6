"""HyperLogLog + t-digest sketch tests (stages/sketches.py)."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.sketches import (
    TDigest, _clz64, approx_distinct, grouped_approx_distinct,
    grouped_approx_quantiles, hll_estimate, hll_merge, hll_partial,
)

SF_DIR = "/root/testdata/sf0.01"


def test_clz64_exact():
    vals = np.array([0, 1, 2, 3, (1 << 63), (1 << 63) - 1, (1 << 40) + 5,
                     0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    got = _clz64(vals)
    exp = [64 - int(v).bit_length() if v else 64 for v in vals]
    assert got.tolist() == exp


@pytest.mark.parametrize("n", [100, 5_000, 100_000])
def test_hll_accuracy(n):
    regs = hll_partial(np.arange(n, dtype=np.int64), p=14)
    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.03  # p=14 std error ~0.81%


def test_hll_merge_equals_whole_and_is_commutative():
    a = np.arange(0, 60_000, dtype=np.int64)
    b = np.arange(40_000, 90_000, dtype=np.int64)  # overlapping
    ra, rb = hll_partial(a, p=12), hll_partial(b, p=12)
    whole = hll_partial(np.concatenate([a, b]), p=12)
    assert np.array_equal(hll_merge(ra, rb), whole)
    assert np.array_equal(hll_merge(ra, rb), hll_merge(rb, ra))


def test_hll_strings_and_small_range():
    regs = hll_partial([f"user-{i}" for i in range(50)], p=12)
    assert abs(hll_estimate(regs) - 50) < 3  # linear-counting regime


def test_tdigest_quantiles_accuracy():
    rng = np.random.RandomState(7)
    vals = rng.lognormal(0.0, 1.0, 200_000)
    d = TDigest.of(vals, delta=200)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(vals, q)
        assert abs(d.quantile(q) - exact) / exact < 0.02, q


def test_tdigest_merge_order_independent():
    rng = np.random.RandomState(11)
    chunks = [TDigest.of(rng.normal(i, 1.0, 5_000)) for i in range(6)]
    fwd = TDigest.merge_all(chunks)
    rev = TDigest.merge_all(chunks[::-1])
    shuffled = TDigest.merge_all([chunks[i] for i in (3, 0, 5, 1, 4, 2)])
    assert fwd.to_bytes() == rev.to_bytes() == shuffled.to_bytes()


def test_tdigest_edges():
    assert np.isnan(TDigest.of([]).quantile(0.5))
    assert TDigest.of([42.0]).quantile(0.9) == 42.0
    d = TDigest.of([1.0, 2.0, 3.0, 4.0])
    assert d.quantile(0.0) == 1.0 and d.quantile(1.0) == 4.0
    rt = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(rt.means, d.means)


@pytest.mark.usefixtures("ray_session")
def test_grouped_approx_distinct_vs_exact():
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "user_id"])
    got = grouped_approx_distinct(ds, "event_type", "user_id", p=12).to_pandas()
    exact = (
        pd.read_parquet(f"{SF_DIR}/events.parquet",
                        columns=["event_type", "user_id"])
        .groupby("event_type")["user_id"].nunique()
    )
    assert set(got["event_type"]) == set(exact.index)
    for _i, row in got.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx_distinct"] - e) / e < 0.05, row["event_type"]


@pytest.mark.usefixtures("ray_session")
def test_global_approx_distinct_vs_exact():
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
    got = approx_distinct(ds, "user_id", p=14)
    exact = pd.read_parquet(f"{SF_DIR}/events.parquet",
                            columns=["user_id"])["user_id"].nunique()
    assert abs(got - exact) / exact < 0.03


@pytest.mark.usefixtures("ray_session")
def test_grouped_approx_quantiles_vs_exact():
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "value"])
    got = grouped_approx_quantiles(
        ds, "event_type", "value", [0.5, 0.95], delta=200
    ).to_pandas()
    raw = pd.read_parquet(f"{SF_DIR}/events.parquet",
                          columns=["event_type", "value"])
    for _i, row in got.iterrows():
        vals = raw[raw["event_type"] == row["event_type"]]["value"].to_numpy()
        for q, col in ((0.5, "q_50"), (0.95, "q_95")):
            exact = np.quantile(vals, q)
            denom = max(abs(exact), 1e-9)
            assert abs(row[col] - exact) / denom < 0.05, (row["event_type"], q)


def test_vocabulary_partials_combiner():
    """In-batch combiner semantics: df counts docs, tf counts occurrences."""
    from akf_cdparser_ray.stages.text_analysis import vocabulary_partials

    batch = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Foo bar foo", "bar bar", None],
    })
    out = vocabulary_partials(batch).set_index("term")
    assert out.loc["foo", "df"] == 1 and out.loc["foo", "tf"] == 2
    assert out.loc["bar", "df"] == 2 and out.loc["bar", "tf"] == 3
    assert list(out.index) == sorted(out.index)


def test_misra_gries_guarantee():
    from akf_cdparser_ray.stages.sketches import (
        merge_summaries, misra_gries_partial,
    )

    rng = np.random.RandomState(13)
    # skewed stream: 3 heavy values + noise tail
    stream = (["A"] * 5000 + ["B"] * 3000 + ["C"] * 2000
              + [f"x{i}" for i in rng.randint(0, 5000, 10_000)])
    rng.shuffle(stream)
    k = 32
    chunks = [stream[i::7] for i in range(7)]
    merged = merge_summaries([misra_gries_partial(c, k) for c in chunks], k)
    assert len(merged) <= k
    bound = len(stream) / (k + 1)
    for heavy in ("A", "B", "C"):  # all exceed the bound → must survive
        assert heavy in merged


@pytest.mark.usefixtures("ray_session")
def test_exact_heavy_hitters_both_regimes():
    import ray.data as rd

    from akf_cdparser_ray.stages.sketches import exact_heavy_hitters

    rng = np.random.RandomState(21)
    # skewed: sketch path proves completeness
    skew = pd.DataFrame({"v": (["hot1"] * 4000 + ["hot2"] * 3000
                               + ["hot3"] * 2000
                               + [f"t{i}" for i in rng.randint(0, 3000, 6000)])})
    ds = rd.from_pandas([skew.iloc[i::5].reset_index(drop=True) for i in range(5)])
    got = exact_heavy_hitters(ds, "v", top_k=3)
    exact = skew["v"].value_counts()
    assert got["value"].tolist() == ["hot1", "hot2", "hot3"]
    assert got["n"].tolist() == [int(exact["hot1"]), int(exact["hot2"]),
                                 int(exact["hot3"])]
    # near-uniform: bound unprovable → fallback still returns the exact answer
    uni = pd.DataFrame({"v": [f"u{i % 500}" for i in range(10_000)]})
    ds2 = rd.from_pandas([uni.iloc[i::4].reset_index(drop=True) for i in range(4)])
    got2 = exact_heavy_hitters(ds2, "v", top_k=5, sketch_k=64)
    exp2 = (uni["v"].value_counts().rename_axis("value").reset_index(name="n")
            .sort_values(["n", "value"], ascending=[False, True]).head(5))
    assert got2["value"].tolist() == exp2["value"].tolist()
    assert got2["n"].tolist() == exp2["n"].tolist()


def test_tdigest_signed_zero_order_independent():
    # regression (round-4): lexsort treats -0.0 == 0.0, so without mean
    # canonicalization the tie resolved by input position and
    # digest(A∪B) != digest(B∪A) at the byte level.
    from akf_cdparser_ray.stages.sketches import TDigest

    a, b = TDigest.of([0.0], 100), TDigest.of([-0.0], 100)
    assert TDigest.merge_all([a, b], 100).to_bytes() == \
        TDigest.merge_all([b, a], 100).to_bytes()
    # serialized digests can never carry a -0.0 mean
    d = TDigest.from_bytes(TDigest.of([-0.0, -0.0, 1.0], 100).to_bytes(), 100)
    assert not any(np.signbit(m) and m == 0.0 for m in d.means)


@pytest.mark.usefixtures("ray_session")
def test_exact_heavy_hitters_value_spread_across_blocks():
    # regression (round-4 ADVICE): a value heavy only in AGGREGATE — 60
    # occurrences in each of 40 blocks — must have its per-block partial
    # counts SUMMED at the driver merge, not dict-collapsed to the last
    # frame's count (which voided the MG bound and could prune true
    # heavy hitters while still "certifying" the result).
    import ray.data as rd

    from akf_cdparser_ray.stages.sketches import exact_heavy_hitters

    rng = np.random.RandomState(7)
    blocks = []
    for i in range(40):
        tail = [f"t{i}_{j}" for j in rng.randint(0, 400, 340)]
        blocks.append(pd.DataFrame({"v": ["HOT"] * 60 + tail}))
    ds = rd.from_pandas(blocks)
    got = exact_heavy_hitters(ds, "v", top_k=1, sketch_k=64)
    assert got["value"].tolist() == ["HOT"]
    assert got["n"].tolist() == [2400]


@pytest.mark.usefixtures("ray_session")
def test_exact_heavy_hitters_high_cardinality_fallback():
    # high-cardinality column: bound unprovable → DISTRIBUTED fallback
    # (Ray groupby + sort + limit); driver only ever sees top_k rows.
    import ray.data as rd

    from akf_cdparser_ray.stages.sketches import exact_heavy_hitters

    df = pd.DataFrame({"v": [f"k{i}" for i in range(20_000)] * 2
                       + ["dominant"] * 3})
    ds = rd.from_pandas([df.iloc[i::8].reset_index(drop=True) for i in range(8)])
    got = exact_heavy_hitters(ds, "v", top_k=2, sketch_k=32)
    assert got["value"].iloc[0] == "dominant" and got["n"].iloc[0] == 3
    assert got["n"].iloc[1] == 2 and got["value"].iloc[1] == "k0"


@pytest.mark.usefixtures("ray_session")
def test_exact_heavy_hitters_null_values_counted():
    # regression (round-5 ADVICE): genuine nulls must be countable top-k
    # values, not dropped by the accounting sentinel. Nulls are tallied
    # exactly through the per-block accounting rows; an all-null block
    # must not poison the partials schema either.
    import ray.data as rd

    from akf_cdparser_ray.stages.sketches import exact_heavy_hitters

    blocks = [
        pd.DataFrame({"v": pd.Series([None] * 50, dtype="object")}),  # all-null
        pd.DataFrame({"v": ["a"] * 40 + [None] * 10 + ["b"] * 5}),
        pd.DataFrame({"v": ["a"] * 5 + ["c"] * 30 + [None] * 20}),
    ]
    got = exact_heavy_hitters(rd.from_pandas(blocks), "v", top_k=3,
                              sketch_k=64)
    # exact counts: null=80, a=45, c=30 (b=5 misses top-3)
    assert got["n"].tolist() == [80, 45, 30]
    assert pd.isna(got["value"].iloc[0])
    assert got["value"].tolist()[1:] == ["a", "c"]
    # int64 column with nulls: values above 2^53 must survive exactly
    big = 2**60 + 12345
    iblk = [pd.DataFrame({"v": pd.Series([big] * 30 + [None] * 40,
                                         dtype="Int64")}),
            pd.DataFrame({"v": pd.Series([big] * 30 + [7] * 10,
                                         dtype="Int64")})]
    got2 = exact_heavy_hitters(rd.from_pandas(iblk), "v", top_k=2,
                               sketch_k=64)
    assert got2["n"].tolist() == [60, 40]
    assert int(got2["value"].iloc[0]) == big
    assert pd.isna(got2["value"].iloc[1])
