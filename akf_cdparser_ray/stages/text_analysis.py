"""Text-analysis operators for training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
document fingerprinting — each a vectorized ``map_batches`` stage over the
``documents`` table. Oracle-checkable ones mirror exact SQL expressions
(see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WS_RE = re.compile(r"\s+")
_BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_ALPHA_RE = re.compile(r"[^a-zA-Z]")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "on", "for", "with", "fast", "slow"},
    "de": {"der", "die", "das", "und", "ist", "ein", "mit", "für", "auf", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "avec"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en", "con"},
    "zh": set(),  # fallback: CJK codepoint ratio decides
}


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    texts = batch["text"].fillna("")
    batch = batch[["doc_id"]].copy()
    batch["n_tokens"] = [len(_WS_RE.split(t.strip())) if t.strip() else 0 for t in texts]
    batch["n_bpe_tokens"] = [len(_BPE_RE.findall(t)) for t in texts]
    return batch


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / word-count / alphabetic-ratio quality signals."""
    texts = batch["text"].fillna("")
    out = batch[["doc_id"]].copy()
    out["n_chars_m"] = [len(t) for t in texts]
    out["n_words"] = [len(_WS_RE.split(t.strip())) if t.strip() else 0 for t in texts]
    # integer count instead of a ratio: float rounding rules differ between
    # engines (banker's vs half-away), integers hash identically everywhere
    out["n_alpha"] = [len(_ALPHA_RE.sub("", t)) for t in texts]
    return out


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Canonical content fingerprint: md5 of lower(trim(text)) — the exact
    expression DuckDB computes, so the oracle is bit-identical."""
    out = batch[["doc_id"]].copy()
    out["fp"] = [
        hashlib.md5(str(t).strip().lower().encode("utf-8")).hexdigest()
        for t in batch["text"].fillna("")
    ]
    return out


def _cjk_ratio(t: str) -> float:
    if not t:
        return 0.0
    cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
    return cjk / len(t)


def langid_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stopword-profile language ID (heuristic, rows-only check)."""
    out = batch[["doc_id"]].copy()
    preds = []
    for t in batch["text"].fillna(""):
        if _cjk_ratio(t) > 0.05:
            preds.append("zh")
            continue
        words = set(w.lower() for w in _WS_RE.split(t) if w)
        scores = {
            lang: len(words & prof) for lang, prof in _LANG_PROFILES.items() if prof
        }
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        preds.append(best[0] if best[1] > 0 else "unk")
    out["lang_pred"] = preds
    return out


# ---------------------------------------------------------------------------
# rolling-hash (winnowing) fingerprints — shift-robust content signatures
# ---------------------------------------------------------------------------

_RH_BASE = np.uint64(1000003)
_RH_K = 8       # character k-gram width
_RH_WINDOW = 6  # winnowing window (min-hash per window)


def rolling_fingerprints(text: str, k: int = _RH_K, window: int = _RH_WINDOW) -> np.ndarray:
    """Winnowing fingerprints: Rabin-Karp rolling hash over character
    k-grams, then the minimum hash of each sliding window of ``window``
    consecutive k-gram hashes (each min kept once) — the classic
    shift-robust document signature (Schleimer et al., winnowing). Pure
    numpy: the rolling hash is a vectorized polynomial via cumulative
    powers, no per-character Python loop."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        return np.array([], dtype=np.uint64)
    # hash of gram i = sum_{j<k} data[i+j] * BASE^(k-1-j)  (mod 2^64);
    # wraparound is intentional — silence numpy's overflow warning so a
    # caller's np.seterr(all='raise') can't turn it into a crash
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[-1] = 1
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _RH_BASE
        # sliding dot product via stride trick
        windows = np.lib.stride_tricks.sliding_window_view(data, k)
        hashes = (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)
    if len(hashes) < window:
        return np.unique(hashes.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    return np.unique(mins)


def rolling_fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """documents batch → per-doc winnowing signature summary:
    (doc_id, n_fps, fp_xor, fp_min) — a deterministic compact digest; the
    full fingerprint sets feed near-dup joins the same way shingles do."""
    ids, n_fps, fp_xor, fp_min = [], [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        fps = rolling_fingerprints(str(text))
        ids.append(doc_id)
        n_fps.append(len(fps))
        fp_xor.append(int(np.bitwise_xor.reduce(fps)) if len(fps) else 0)
        fp_min.append(int(fps.min()) if len(fps) else 0)
    return pd.DataFrame({
        "doc_id": ids,
        "n_fps": pd.Series(n_fps, dtype="int64"),
        "fp_xor": pd.Series([np.int64(np.uint64(x)) for x in fp_xor], dtype="int64"),
        "fp_min": pd.Series([np.int64(np.uint64(x)) for x in fp_min], dtype="int64"),
    })


# ---------------------------------------------------------------------------
# corpus vocabulary (document-frequency dictionary)
# ---------------------------------------------------------------------------

_VOCAB_TOKEN_RE = re.compile(r"[a-zäöüß0-9_]+")


def vocabulary_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """One batch of documents → per-term partial (df, tf) rows. The
    combiner runs IN the batch (term set per doc + Counter across docs) so
    only |vocab-of-batch| rows enter the term-keyed shuffle, never one row
    per token occurrence. Tokenizer: lowercase ``[a-zäöüß0-9_]+`` runs —
    chosen to match the DuckDB mirror's RE2 class character-for-character."""
    from collections import Counter

    df_ctr: Counter = Counter()
    tf_ctr: Counter = Counter()
    for text in batch["text"].fillna(""):
        toks = _VOCAB_TOKEN_RE.findall(str(text).lower())
        tf_ctr.update(toks)
        df_ctr.update(set(toks))
    terms = sorted(df_ctr)
    return pd.DataFrame({
        "term": terms,
        "df": pd.Series([df_ctr[t] for t in terms], dtype="int64"),
        "tf": pd.Series([tf_ctr[t] for t in terms], dtype="int64"),
    })


def vocabulary(ds, top_k: int = 100):
    """Corpus dictionary: the ``top_k`` terms by document frequency
    (ties broken term-ascending), with total term frequency. Shape:
    in-batch partial aggregation → one small term-keyed groupby sum →
    driver-side sort/limit of the tiny aggregate (the full vocabulary
    table itself stays distributed; only top_k rows materialize)."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(vocabulary_partials, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("tf", alias_name="tf"))
    )
    # rank distributedly: the aggregate is |vocabulary| rows — a web-scale
    # corpus can have 10^8 distinct terms, so the driver must only ever
    # see the top_k slice, not the dictionary (round-5 fix of the last
    # vocab-sized driver pull)
    df = agg.sort(["df", "term"], descending=[True, False]) \
        .limit(top_k).to_pandas()
    return (
        df.sort_values(["df", "term"], ascending=[False, True], kind="mergesort")
        .head(top_k)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# BM25 lexical top-k (the text half of the similarity-search family;
# embeddings are covered by stages/ann)
# ---------------------------------------------------------------------------


def bm25_topk(ds, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Okapi BM25 document retrieval for a fixed term list: the top-k
    docs by score, with ties broken doc_id-ascending. Two passes, both
    distributed and tiny on the wire:

    1. global stats — per-batch partial (n_docs, Σdl, per-term df) rows,
       summed driver-side (one row per batch);
    2. scoring — stats broadcast into a stateless ``map_batches`` that
       emits each batch's own top-k candidates; the driver merges
       k·num_blocks candidate rows.

    Float discipline (the DuckDB mirror is hash-exact): the per-term
    contributions are accumulated SEQUENTIALLY in term order, matching
    SQL's left-to-right ``+``; every expression is parenthesized the
    same way on both sides, and idf/ln hit the same libm. Returns
    (doc_id, tf_total) sorted by doc_id — integer columns only."""
    import math

    terms = list(terms)

    def _tok(batch: pd.DataFrame) -> list[list[str]]:
        return [_VOCAB_TOKEN_RE.findall(str(t).lower())
                for t in batch["text"].fillna("")]

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tok(batch)
        row = {
            "n": pd.Series([len(toks)], dtype="int64"),
            "sum_dl": pd.Series([sum(len(ts) for ts in toks)],
                                dtype="int64"),
        }
        for i, term in enumerate(terms):
            row[f"df{i}"] = pd.Series(
                [sum(1 for ts in toks if term in ts)], dtype="int64")
        return pd.DataFrame(row)

    stats = ds.map_batches(stats_partial, batch_format="pandas") \
        .to_pandas().sum()
    n = int(stats.get("n", 0) or 0)
    if n == 0:  # empty corpus: no avgdl/idf to divide by
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tf_total": pd.Series(dtype="int64")})
    avgdl = int(stats["sum_dl"]) / n
    idf = [math.log((n - int(stats[f"df{i}"]) + 0.5)
                    / (int(stats[f"df{i}"]) + 0.5) + 1.0)
           for i in range(len(terms))]

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tok(batch)
        dl = np.array([len(ts) for ts in toks], dtype=np.float64)
        norm = k1 * ((1.0 - b) + b * (dl / avgdl))
        score = np.zeros(len(toks))
        tf_total = np.zeros(len(toks), dtype=np.int64)
        for i, term in enumerate(terms):
            tf = np.array([ts.count(term) for ts in toks],
                          dtype=np.float64)
            score = score + (idf[i] * (tf * (k1 + 1.0))) / (tf + norm)
            tf_total += tf.astype(np.int64)
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "tf_total": tf_total,
            "_s": score,
        })
        out = out[out["tf_total"] > 0]
        return out.sort_values(["_s", "doc_id"],
                               ascending=[False, True]).head(k)

    cand = ds.map_batches(score_partial, batch_format="pandas").to_pandas()
    top = (
        cand.sort_values(["_s", "doc_id"], ascending=[False, True])
        .head(k)
        .drop(columns=["_s"])
    )
    return top.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# PII scrubbing (redaction)
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backrefs): applied IN ORDER — the SQL
# oracle nests regexp_replace the same way, and pyarrow's RE2 is the same
# regex engine DuckDB uses, so redaction is byte-identical by construction
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def scrub_pii_array(texts):
    """Vectorized redaction of emails / IPv4s / phone numbers over an
    Arrow (or array-like) string column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        list(texts), pa.string()
    )
    for pattern, token in PII_PATTERNS:
        arr = pc.replace_substring_regex(arr, pattern, token)
    return arr


def scrub_pii_batch(batch, col: str = "text"):
    """pyarrow map_batches stage: redact PII in ``col`` in place."""
    import pyarrow as pa

    idx = batch.schema.get_field_index(col)
    return batch.set_column(idx, col, scrub_pii_array(batch.column(col)))


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------


def contamination(ds, *, n: int = 3, bench_mod: int = 97):
    """Benchmark decontamination signal (the GPT-3/Pile n-gram-overlap
    check): for every TRAINING document, how many of its token n-gram
    positions also occur in the BENCHMARK set (here: documents whose
    ``doc_id % bench_mod == 0`` stand in for the held-out eval suite).

    Scale shape — broadcast small side: the benchmark n-gram set is
    extracted distributedly (per-batch partial sets), unioned on the
    driver (eval suites are tiny relative to a training corpus), and
    broadcast once via ``ray.put``; the corpus then streams through one
    ``map_batches`` membership pass. Tokenizer and gram join are
    character-identical to the DuckDB mirror (the ``vocabulary`` RE2
    class + single-space joins), so the oracle comparison is exact.

    Returns (doc_id, n_grams, n_hit) for every non-benchmark document,
    sorted by doc_id; drop policy (e.g. n_hit > 0) is the caller's."""
    import ray

    def bench_grams(batch: pd.DataFrame) -> pd.DataFrame:
        out: set[str] = set()
        for did, text in zip(batch["doc_id"], batch["text"].fillna("")):
            if int(did) % bench_mod == 0:
                toks = _VOCAB_TOKEN_RE.findall(str(text).lower())
                out.update(" ".join(toks[i:i + n])
                           for i in range(len(toks) - n + 1))
        return pd.DataFrame({"g": pd.Series(sorted(out), dtype="object")})

    gset: set[str] = set()
    for b in ds.map_batches(bench_grams, batch_format="pandas") \
            .iter_batches(batch_size=None, batch_format="pandas"):
        if len(b.columns):
            gset.update(b["g"])
    ref = ray.put(frozenset(gset))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref) if not isinstance(ref, frozenset) else ref
        ids, ngs, hits = [], [], []
        for did, text in zip(batch["doc_id"], batch["text"].fillna("")):
            if int(did) % bench_mod == 0:
                continue
            toks = _VOCAB_TOKEN_RE.findall(str(text).lower())
            m = max(len(toks) - n + 1, 0)
            ids.append(int(did))
            ngs.append(m)
            hits.append(sum(1 for i in range(m)
                            if " ".join(toks[i:i + n]) in bench))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_grams": pd.Series(ngs, dtype="int64"),
            "n_hit": pd.Series(hits, dtype="int64"),
        })

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def posting_lists(ds, top_k: int = 50) -> pd.DataFrame:
    """Inverted-index posting lists for the corpus's ``top_k``
    document-frequency terms (the search-index build step of a training
    corpus): for each selected term, the comma-joined ascending list of
    doc_ids containing it. Term selection reuses :func:`vocabulary`
    (df DESC, term ASC — the oracled rank); the selected term set is
    broadcast once via ``ray.put`` and each batch emits only its
    DISTINCT (term, doc_id) pairs for those terms, so the term-keyed
    shuffle carries at most top_k × n_docs id pairs — never token
    occurrences. Posting lists themselves are per-term map_groups
    outputs; with bounded top_k the result is driver-small by
    construction (cap top_k, not the lists, to bound memory)."""
    import ray

    terms = vocabulary(ds, top_k=top_k)["term"].tolist()
    terms_ref = ray.put(frozenset(terms))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        tset = ray.get(terms_ref)
        t_out, d_out = [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            for tok in set(_VOCAB_TOKEN_RE.findall(str(text).lower())):
                if tok in tset:
                    t_out.append(tok)
                    d_out.append(doc_id)
        return pd.DataFrame({"term": pd.Series(t_out, dtype="object"),
                             "doc_id": pd.Series(d_out, dtype="int64")})

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "doc_id" not in g.columns:  # empty shuffle block
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype="object")})
        ids = np.unique(g["doc_id"].to_numpy())
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "df": pd.Series([len(ids)], dtype="int64"),
            "postings": [",".join(str(i) for i in ids)],
        })

    out = (ds.map_batches(pairs, batch_format="pandas")
             .groupby("term").map_groups(join_group,
                                         batch_format="pandas"))
    frames = [b for b in out.iter_batches(batch_format="pandas")
              if len(b.columns)]
    res = (pd.concat(frames, ignore_index=True) if frames
           else join_group(pd.DataFrame()))
    return (res.sort_values("term").reset_index(drop=True)
            [["term", "df", "postings"]])
