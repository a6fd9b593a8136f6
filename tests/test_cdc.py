"""Content-defined chunking tests (stages/cdc.py)."""

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.cdc import (
    cdc_chunk_batch, chunk_boundaries, chunk_dedup_stats, chunk_doc,
)


def test_boundaries_cover_and_respect_limits():
    rng = np.random.RandomState(1)
    data = rng.bytes(100_000)
    b = chunk_boundaries(data)
    assert b[-1] == len(data)
    sizes = np.diff([0] + b)
    assert (sizes[:-1] >= 256).all() and (sizes <= 8192).all()
    assert chunk_boundaries(data) == b  # deterministic
    assert chunk_boundaries(b"") == []


def test_edit_stability():
    """Inserting bytes early must leave almost every chunk's identity
    intact — the property that makes CDC dedup catch shifted boilerplate."""
    rng = np.random.RandomState(2)
    data = rng.bytes(150_000)
    edited = data[:500] + b"INSERTED" + data[500:]
    h1 = {h for h, _l in chunk_doc(data)}
    h2 = {h for h, _l in chunk_doc(edited)}
    assert len(h1 & h2) / len(h1) > 0.9


def test_chunk_batch_rows():
    batch = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x" * 50, None],
    })
    out = cdc_chunk_batch(batch, mask_bits=4, min_chunk=8, max_chunk=16)
    assert (out["doc_id"] == 1).all()  # empty doc yields no chunks
    assert out["length"].sum() == 50
    # identical docs produce identical chunk hash sequences
    out2 = cdc_chunk_batch(pd.DataFrame({"doc_id": [9], "text": ["x" * 50]}),
                           mask_bits=4, min_chunk=8, max_chunk=16)
    assert out["chunk_hash"].tolist() == out2["chunk_hash"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_chunk_dedup_finds_planted_boilerplate():
    import ray.data as rd

    rng = np.random.RandomState(3)
    boiler = "".join(chr(97 + b % 26) for b in rng.bytes(400))
    docs = []
    for i in range(30):
        body = "".join(chr(97 + b % 26) for b in rng.bytes(600))
        # 20 docs share the boilerplate at VARYING offsets
        text = body[: 30 * i] + boiler + body[30 * i:] if i < 20 else body
        docs.append((i, text))
    ds = rd.from_pandas([pd.DataFrame(docs, columns=["doc_id", "text"])])
    out = chunk_dedup_stats(ds, top_k=10, mask_bits=5, min_chunk=16,
                            max_chunk=128).to_pandas()
    assert len(out) > 0
    # the hottest chunk must be shared by (nearly) all 20 planted docs
    assert out.iloc[0]["copies"] >= 15
