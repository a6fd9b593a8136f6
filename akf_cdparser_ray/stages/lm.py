"""Count-based bigram language model: distributed fit + per-document
perplexity scoring — the CCNet-style LM quality filter (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", 2020 use a KenLM n-gram model; this is the same filter family
built from exact distributed counts instead of a pretrained binary,
since no ML libraries ship in this environment).

Three corpus passes, each the standard partial-then-final shape:

1. unigram counts  -> top-V vocabulary (count DESC, term ASC ties) and
   the exact out-of-vocabulary mass (total - top-V);
2. bigram + context counts over the <unk>-mapped, <s>-prefixed token
   streams -> per-batch Counters, one gram-keyed groupby sum; the model
   keeps the top-B bigrams (deterministic ties) and ALL context counts
   (at most V+2 rows);
3. scoring: the model broadcasts ONCE via ``ray.put`` (plasma,
   node-shared); every batch computes each doc's add-one-smoothed
   cross-entropy locally. No shuffle in pass 3.

The model is exact integers + a deterministic truncation rule, so
perplexities are bit-stable across partitionings and cluster sizes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from akf_cdparser_ray.logquiet import silence_empty_block_schema_warnings
from akf_cdparser_ray.stages.text_analysis import _VOCAB_TOKEN_RE

BOS = "<s>"
UNK = "<unk>"


def _toks(text) -> list[str]:
    return _VOCAB_TOKEN_RE.findall(str(text).lower())


def fit_bigram_lm(ds, text_col: str = "text", vocab_k: int = 512,
                  bigram_k: int = 8192) -> dict:
    """Fit the model (two distributed passes); returns a plain dict
    {"vocab": {term: count}, "unk_count": int, "bigrams": {(a,b): int},
    "contexts": {term: int}, "v": int} small enough to broadcast."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ctr: Counter = Counter()
        if text_col in batch.columns:
            for text in batch[text_col].fillna(""):
                ctr.update(_toks(text))
        terms = sorted(ctr)
        return pd.DataFrame({
            "term": pd.Series(terms, dtype="object"),
            "tf": pd.Series([ctr[t] for t in terms], dtype="int64")})

    # consumed twice (total + top-V) — materialize the |vocab|-row aggregate
    agg = (ds.map_batches(uni_partial, batch_format="pandas")
           .groupby("term").aggregate(Sum("tf", alias_name="tf"))
           .materialize())
    total = int(agg.sum("tf") or 0)
    top = (agg.sort(["tf", "term"], descending=[True, False])
           .limit(vocab_k).to_pandas())
    top = top.sort_values(["tf", "term"], ascending=[False, True],
                          kind="mergesort").head(vocab_k)
    vocab = dict(zip(top["term"], (int(v) for v in top["tf"])))
    unk_count = total - sum(vocab.values())

    def map_tok(t: str) -> str:
        return t if t in vocab else UNK

    def bi_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bi: Counter = Counter()
        ctx: Counter = Counter()
        if text_col in batch.columns:
            for text in batch[text_col].fillna(""):
                stream = [BOS] + [map_tok(t) for t in _toks(text)]
                for a, b in zip(stream, stream[1:]):
                    bi[(a, b)] += 1
                    ctx[a] += 1
        keys = sorted(bi)
        ctx_keys = sorted(ctx)
        return pd.DataFrame({
            "gk": pd.Series([f"b\x1e{a}\x1f{b}" for a, b in keys]
                            + [f"c\x1e{t}" for t in ctx_keys],
                            dtype="object"),
            "n": pd.Series([bi[k] for k in keys]
                           + [ctx[t] for t in ctx_keys], dtype="int64")})

    def keep_kind(prefix: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            silence_empty_block_schema_warnings()  # empty slices are routine
            if "gk" not in batch.columns or not len(batch):
                return pd.DataFrame({"gk": pd.Series(dtype="object"),
                                     "n": pd.Series(dtype="int64")})
            return batch[batch["gk"].str.startswith(prefix)]
        return f

    # consumed twice below (contexts + bigrams) — materialize, don't
    # re-execute both corpus passes (CLAUDE.md lazy-Dataset lesson)
    bagg = (ds.map_batches(bi_partial, batch_format="pandas")
            .groupby("gk").aggregate(Sum("n", alias_name="n"))
            .materialize())
    # contexts: at most V+2 rows — filter distributedly, pull the slice
    ctx_rows = (bagg.map_batches(keep_kind("c\x1e"),
                                 batch_format="pandas").to_pandas())
    contexts = {g.split("\x1e", 1)[1]: int(n)
                for g, n in zip(ctx_rows["gk"], ctx_rows["n"])}
    # bigrams: keep top-B by (count DESC, gram ASC) — distributed
    # sort+limit, same rule as vocabulary()
    bi_rows = (bagg.map_batches(keep_kind("b\x1e"), batch_format="pandas")
               .sort(["n", "gk"], descending=[True, False])
               .limit(bigram_k).to_pandas())
    bi_rows = bi_rows.sort_values(["n", "gk"], ascending=[False, True],
                                  kind="mergesort").head(bigram_k)
    bigrams = {}
    for g, n in zip(bi_rows["gk"], bi_rows["n"]):
        a, b = g.split("\x1e", 1)[1].split("\x1f", 1)
        bigrams[(a, b)] = int(n)
    return {"vocab": vocab, "unk_count": unk_count, "bigrams": bigrams,
            "contexts": contexts, "v": len(vocab) + 2}


def lm_perplexity(ds, key: str = "doc_id", text_col: str = "text",
                  vocab_k: int = 512, bigram_k: int = 8192,
                  model: dict | None = None, fit_ds=None):
    """Per-document bigram perplexity under the corpus LM (or a model fit
    on ``fit_ds`` — e.g. a clean reference corpus, the CCNet setup).
    Returns a Dataset of (key, n_tokens, ppl): add-one-smoothed
    cross-entropy over the <s>-prefixed stream, ppl = exp(H). Docs with
    zero tokens score NaN. The broadcast model is read from plasma per
    task; scoring is pass-local (no shuffle)."""
    import ray

    if model is None:
        model = fit_bigram_lm(fit_ds if fit_ds is not None else ds,
                              text_col=text_col, vocab_k=vocab_k,
                              bigram_k=bigram_k)
    ref = ray.put(model)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        vocab, bigrams, contexts = m["vocab"], m["bigrams"], m["contexts"]
        v = m["v"]
        ids, ns, ppls = [], [], []
        if key in batch.columns:
            for did, text in zip(batch[key], batch[text_col].fillna("")):
                toks = _toks(text)
                ids.append(did)
                ns.append(len(toks))
                if not toks:
                    ppls.append(float("nan"))
                    continue
                stream = [BOS] + [t if t in vocab else UNK for t in toks]
                # accumulate in deterministic stream order (bit-stable)
                h = 0.0
                for a, b in zip(stream, stream[1:]):
                    num = bigrams.get((a, b), 0) + 1
                    den = contexts.get(a, 0) + v
                    h += math.log(num / den)
                ppls.append(math.exp(-h / len(toks)))
        return pd.DataFrame({
            key: pd.Series(ids, dtype="int64"),
            "n_tokens": pd.Series(ns, dtype="int64"),
            "ppl": pd.Series(np.asarray(ppls, dtype=np.float64)),
        })

    return ds.map_batches(score, batch_format="pandas")
