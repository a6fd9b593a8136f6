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


def _sharded_sum(parts_ds, key_col: str, val_col: str,
                 num_shards: int = 64):
    """Exact per-key sum of partial-count rows WITHOUT a per-key group
    walk: keys hash to a bounded shard count, and each shard merges all
    its keys in one vectorized pandas groupby — Ray's own
    groupby(key).aggregate walks the (here: vocabulary-sized) group space
    in Python (the substring_dedup lesson: 57s -> 2s)."""

    def shard(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if key_col not in batch.columns or not len(batch):
            return pd.DataFrame({key_col: pd.Series(dtype="object"),
                                 val_col: pd.Series(dtype="int64"),
                                 "_sh": pd.Series(dtype="int64")})
        return batch.assign(_sh=(pd.util.hash_array(
            batch[key_col].to_numpy(dtype=object)) % num_shards)
            .astype("int64"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if key_col not in g.columns or not len(g):
            return pd.DataFrame({key_col: pd.Series(dtype="object"),
                                 val_col: pd.Series(dtype="int64")})
        return g.groupby(key_col, as_index=False)[val_col].sum()

    return (parts_ds.map_batches(shard, batch_format="pandas")
            .groupby("_sh").map_groups(merge, batch_format="pandas"))


def fit_bigram_lm(ds, text_col: str = "text", vocab_k: int = 512,
                  bigram_k: int = 8192) -> dict:
    """Fit the model (two distributed passes); returns a plain dict
    {"vocab": {term: count}, "unk_count": int, "bigrams": {(a,b): int},
    "contexts": {term: int}, "v": int} small enough to broadcast."""
    from collections import Counter

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ctr: Counter = Counter()
        if text_col in batch.columns:
            for text in batch[text_col].fillna(""):
                ctr.update(_toks(text))
        terms = sorted(ctr)
        return pd.DataFrame({
            "term": pd.Series(terms, dtype="object"),
            "tf": pd.Series([ctr[t] for t in terms], dtype="int64")})

    # ONE consuming pass over the sharded aggregate: each block emits its
    # own top-V (any global top-V key is in its block's top-V — exact
    # mergeable top-k under the (tf DESC, term ASC) total order) plus one
    # block-total row; the driver merges V x num_blocks rows. A global
    # sort+limit plus a separate sum would be two more full pipeline
    # executions for the same answer (fixed ~1s each on Ray 2.49).
    agg = _sharded_sum(ds.map_batches(uni_partial, batch_format="pandas"),
                       "term", "tf")

    def uni_extract(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if "term" not in batch.columns or not len(batch):
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64"),
                                 "is_total": pd.Series(dtype="bool")})
        top = (batch.sort_values(["tf", "term"], ascending=[False, True],
                                 kind="mergesort").head(vocab_k)
               .assign(is_total=False))
        tot = pd.DataFrame({"term": [""],
                            "tf": [int(batch["tf"].sum())],
                            "is_total": [True]})
        return pd.concat([top, tot], ignore_index=True)

    rows = [b for b in agg.map_batches(uni_extract, batch_format="pandas")
            .iter_batches(batch_format="pandas") if len(b.columns)]
    urows = (pd.concat(rows, ignore_index=True) if rows
             else uni_extract(pd.DataFrame()))
    total = int(urows.loc[urows["is_total"], "tf"].sum())
    top = (urows[~urows["is_total"]]
           .sort_values(["tf", "term"], ascending=[False, True],
                        kind="mergesort").head(vocab_k))
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

    # same one-pass extract: contexts (<= V+2 rows, kind 'c') plus each
    # block's top-B bigrams (kind 'b'), merged driver-side
    bagg = _sharded_sum(ds.map_batches(bi_partial, batch_format="pandas"),
                        "gk", "n")

    def bi_extract(batch: pd.DataFrame) -> pd.DataFrame:
        silence_empty_block_schema_warnings()
        if "gk" not in batch.columns or not len(batch):
            return pd.DataFrame({"gk": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        ctx = batch[batch["gk"].str.startswith("c\x1e")]
        big = (batch[batch["gk"].str.startswith("b\x1e")]
               .sort_values(["n", "gk"], ascending=[False, True],
                            kind="mergesort").head(bigram_k))
        return pd.concat([ctx, big], ignore_index=True)

    brows = [b for b in bagg.map_batches(bi_extract, batch_format="pandas")
             .iter_batches(batch_format="pandas") if len(b.columns)]
    ball = (pd.concat(brows, ignore_index=True) if brows
            else bi_extract(pd.DataFrame()))
    ctx_rows = ball[ball["gk"].str.startswith("c\x1e")]
    contexts = {g.split("\x1e", 1)[1]: int(n)
                for g, n in zip(ctx_rows["gk"], ctx_rows["n"])}
    bi_rows = (ball[ball["gk"].str.startswith("b\x1e")]
               .sort_values(["n", "gk"], ascending=[False, True],
                            kind="mergesort").head(bigram_k))
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
