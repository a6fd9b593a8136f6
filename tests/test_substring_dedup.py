"""Exact substring-level dedup (stages/substring_dedup.py): rolling-hash
kernel laws, planted-duplicate spans, batch-layout independence, and the
scrub operator's byte-exact cuts + layout preservation."""
import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.substring_dedup import (
    _DEFAULT_BASE,
    _batch_grams,
    _gram_hashes,
    duplicated_spans,
    dup_gram_shards,
    scrub_duplicated_spans,
)


def brute_spans(texts, L):
    """Reference implementation: exact string grams, count >= 2 across
    all docs/positions, merge starts <= L apart."""
    from collections import Counter

    cnt = Counter()
    for t in texts:
        b = t.encode()
        for i in range(len(b) - L + 1):
            cnt[b[i:i + L]] += 1
    spans = []
    for d, t in enumerate(texts):
        b = t.encode()
        marked = [i for i in range(len(b) - L + 1) if cnt[b[i:i + L]] >= 2]
        if not marked:
            continue
        s, prev = marked[0], marked[0]
        for p in marked[1:]:
            if p - prev > L:
                spans.append((d, s, prev + L))
                s = p
            prev = p
        spans.append((d, s, prev + L))
    return spans


def test_gram_hash_is_position_independent_and_collision_free_here():
    rng = np.random.default_rng(3)
    buf = rng.integers(97, 101, size=4000).astype(np.uint8)  # 4 letters
    L = 6
    h = _gram_hashes(buf, L, _DEFAULT_BASE)
    assert len(h) == len(buf) - L + 1
    gram_to_hash = {}
    hash_to_gram = {}
    for i, hh in enumerate(h.tolist()):
        g = bytes(buf[i:i + L])
        assert gram_to_hash.setdefault(g, hh) == hh   # equal grams agree
        assert hash_to_gram.setdefault(hh, g) == g    # no collisions here
    assert len(_gram_hashes(buf[:3], L, _DEFAULT_BASE)) == 0


def test_batch_grams_match_per_doc_computation():
    texts = ["hello world hello", "xyz", "", "world hello world", "ab"]
    L = 5
    h, doc, rel = _batch_grams(texts, L, _DEFAULT_BASE)
    exp = []
    for d, t in enumerate(texts):
        hh = _gram_hashes(np.frombuffer(t.encode(), np.uint8), L,
                          _DEFAULT_BASE)
        exp += [(d, i, v) for i, v in enumerate(hh.tolist())]
    assert list(zip(doc.tolist(), rel.tolist(), h.tolist())) == exp


@pytest.mark.usefixtures("ray_session")
def test_planted_duplicates_found_exactly():
    import ray

    boiler = "COPY THIS LICENSE BLOCK VERBATIM INTO EVERY FILE PLEASE"
    texts = [
        "unique prefix one %s unique suffix alpha" % boiler,
        "different head here %s and a different tail" % boiler,
        "entirely novel text with no repeats at all whatsoever here",
        "self repeat INTERNALDUPINTERNALDUPINTERNALDUP self repeat",
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    L = 12
    got = (duplicated_spans(ds, L=L).to_pandas()
           .sort_values(["doc_id", "span_start"])
           .itertuples(index=False, name=None))
    assert sorted(got) == sorted(brute_spans(texts, L))
    # the planted block is inside a span for both docs that carry it
    spans0 = [(s, e) for d, s, e in brute_spans(texts, L) if d == 0]
    a = texts[0].index(boiler)
    assert any(s <= a and a + len(boiler) <= e for s, e in spans0)
    # doc 2 (novel text) has no spans
    assert not any(d == 2 for d, _, _ in brute_spans(texts, L))
    # doc 3's INTERNAL repetition is duplicated (same-doc counts)
    assert any(d == 3 for d, _, _ in brute_spans(texts, L))


@pytest.mark.usefixtures("ray_session")
def test_spans_are_batch_layout_independent():
    import ray

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        outs.append(duplicated_spans(ds, L=15)
                    .to_pandas()
                    .sort_values(["doc_id", "span_start"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exp = pd.DataFrame(brute_spans(texts, 15),
                       columns=["doc_id", "span_start", "span_end"]
                       ).astype("int64")
    pd.testing.assert_frame_equal(outs[0], exp)


@pytest.mark.usefixtures("ray_session")
def test_scrub_cuts_exactly_the_spans_and_preserves_layout():
    import ray

    boiler = "REPEATED BOILERPLATE SEGMENT X"
    texts = [f"doc{i:02d} head {boiler} doc{i:02d} tail" for i in range(20)]
    texts.append("completely original untouched document body here")
    df = pd.DataFrame({"doc_id": np.arange(21, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas([df.iloc[:8], df.iloc[8:15], df.iloc[15:]])
    L = 10
    out = scrub_duplicated_spans(ds, L=L)
    # layout preserved: same block count, same row order
    blocks = [b for b in out.iter_batches(batch_format="pandas",
                                          batch_size=None)
              if len(b.columns)]
    assert [len(b) for b in blocks] == [8, 7, 6]
    res = pd.concat(blocks, ignore_index=True)
    assert res["doc_id"].tolist() == list(range(21))
    # byte-exact: residue == text minus brute spans
    spans = {}
    for d, s, e in brute_spans(texts, L):
        spans.setdefault(d, []).append((s, e))
    for i, t in enumerate(texts):
        raw = t.encode()
        kept, prev = [], 0
        for s, e in spans.get(i, []):
            kept.append(raw[prev:s])
            prev = e
        kept.append(raw[prev:])
        assert res["text"][i] == b"".join(kept).decode()
        assert res["dup_bytes"][i] == sum(e - s for s, e in spans.get(i, []))
    assert res["dup_bytes"][20] == 0
    assert res["text"][20] == texts[20]


@pytest.mark.usefixtures("ray_session")
def test_scrub_min_keep_and_short_docs():
    import ray

    texts = ["tiny", "shorty", "DUPDUPDUPDUPDUPDUPDUPDUP pad",
             "DUPDUPDUPDUPDUPDUPDUPDUP pod"]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    res = (scrub_duplicated_spans(ds, L=8, min_keep=10)
           .to_pandas())
    # docs shorter than L are untouched (no grams, no spans)
    assert res["text"][0] == "tiny" and res["dup_bytes"][0] == 0
    # scrubbed docs whose residue < min_keep become empty, count exact
    for i in (2, 3):
        assert res["dup_bytes"][i] > 0
        assert res["text"][i] == ""


@pytest.mark.usefixtures("ray_session")
def test_shards_reusable_across_consumers():
    import ray

    texts = ["shared shared shared block one", "shared shared shared two",
             "nothing in common at all q"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df)
    shards = dup_gram_shards(ds, L=8, num_shards=4)
    a = duplicated_spans(ds, L=8, num_shards=4, shards=shards).to_pandas()
    b = duplicated_spans(ds, L=8, num_shards=4).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["doc_id", "span_start"]).reset_index(drop=True),
        b.sort_values(["doc_id", "span_start"]).reset_index(drop=True))
