"""Bigram LM perplexity (stages/lm.py): exact model fit vs a local
reference, the smoothed scoring formula, layout independence, and the
quality-filter signal direction (in-distribution < gibberish)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from akf_cdparser_ray.stages.lm import (
    BOS, UNK, _toks, fit_bigram_lm, lm_perplexity)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "the dog sat on the rug",
    "a dog and a cat and a fish",
    "fish and chips on the pier",
    "",
]


def _chunks(df, n):
    return [df.iloc[i::n].reset_index(drop=True) for i in range(n)]


def ref_model(texts, vocab_k, bigram_k):
    uni = Counter()
    for t in texts:
        uni.update(_toks(t))
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    vocab = dict(top)
    unk_count = sum(uni.values()) - sum(vocab.values())
    bi, ctx = Counter(), Counter()
    for t in texts:
        stream = [BOS] + [w if w in vocab else UNK for w in _toks(t)]
        for a, b in zip(stream, stream[1:]):
            bi[(a, b)] += 1
            ctx[a] += 1
    top_bi = sorted(bi.items(),
                    key=lambda kv: (-kv[1], f"{kv[0][0]}\x00{kv[0][1]}"))
    return {"vocab": vocab, "unk_count": unk_count,
            "bigrams": dict(top_bi[:bigram_k]), "contexts": dict(ctx),
            "v": len(vocab) + 2}


def ref_ppl(text, m):
    toks = _toks(text)
    if not toks:
        return float("nan")
    stream = [BOS] + [w if w in m["vocab"] else UNK for w in toks]
    h = 0.0
    for a, b in zip(stream, stream[1:]):
        h += math.log((m["bigrams"].get((a, b), 0) + 1)
                      / (m["contexts"].get(a, 0) + m["v"]))
    return math.exp(-h / len(toks))


@pytest.mark.usefixtures("ray_session")
def test_fit_matches_reference_and_layout():
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
    expect = ref_model(CORPUS, vocab_k=6, bigram_k=10)
    for n in (1, 4):
        got = fit_bigram_lm(rd.from_pandas(_chunks(df, n)),
                            vocab_k=6, bigram_k=10)
        assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_scores_match_reference_and_signal_direction():
    import ray.data as rd

    df = pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
    m = ref_model(CORPUS, vocab_k=50, bigram_k=500)
    probe = pd.DataFrame({
        "doc_id": [100, 101, 102],
        "text": ["the cat sat on the mat",        # in-distribution
                 "zzq qqz vvx xxw wvv qzz",        # gibberish (all OOV)
                 ""]})
    out = (lm_perplexity(rd.from_pandas([probe]), model=m)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i in range(2):
        assert out["ppl"].iloc[i] == pytest.approx(
            ref_ppl(probe["text"].iloc[i], m), rel=1e-12)
    assert out["ppl"].iloc[0] < out["ppl"].iloc[1]
    assert out["n_tokens"].iloc[2] == 0 and math.isnan(out["ppl"].iloc[2])
    # full-path layout independence (fit + score, bit-equal)
    outs = []
    for n in (1, 3):
        ds = rd.from_pandas(_chunks(df, n))
        outs.append(lm_perplexity(ds, vocab_k=6, bigram_k=10)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])


@pytest.mark.usefixtures("ray_session")
def test_fit_on_reference_corpus_scores_other_corpus():
    import ray.data as rd

    clean = pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
    noisy = pd.DataFrame({"doc_id": [7, 8],
                          "text": ["the cat sat on the mat",
                                   "buy now click here casino"]})
    out = (lm_perplexity(rd.from_pandas([noisy]),
                         fit_ds=rd.from_pandas([clean]),
                         vocab_k=50, bigram_k=500)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["ppl"].iloc[0] < out["ppl"].iloc[1]
