"""Property-based tests (hypothesis) for the round-3 kernels."""

import numpy as np
import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from akf_cdparser_ray.stages.links import canonicalize_url, canonicalize_urls
from akf_cdparser_ray.stages.packing import pack_batch
from akf_cdparser_ray.stages.sketches import (
    TDigest, _clz64, merge_summaries, misra_gries_partial,
)
from akf_cdparser_ray.state.robots import RobotsTxt

# --------------------------------------------------------------------------
# URL canonicalization: vectorized == scalar on arbitrary printable input
# --------------------------------------------------------------------------

url_st = st.one_of(
    st.from_regex(r"[A-Za-z]{2,6}://[A-Za-z0-9.:-]{1,20}(/[A-Za-z0-9./ %?#=&~_-]{0,30})?",
                  fullmatch=True),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(url_st, min_size=1, max_size=20))
def test_canonicalize_urls_property(urls):
    got = canonicalize_urls(urls)
    assert list(got) == [canonicalize_url(u) for u in urls]


# --------------------------------------------------------------------------
# clz64 exactness
# --------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=50))
def test_clz64_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    exp = [64 - int(v).bit_length() if v else 64 for v in vals]
    assert _clz64(arr).tolist() == exp


# --------------------------------------------------------------------------
# t-digest: quantiles bounded and monotone; merge order-independent
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=500))
# regression: lerp overshot past means[i+1] by one ulp near frac=1 when
# |means[i]| ≫ |means[i+1]| → non-monotone quantiles (now clamped)
@example(vals=[-16777218.0, -1.000000001320839, -1.000000001320839])
def test_tdigest_properties(vals):
    d = TDigest.of(vals, delta=100)
    qs = [d.quantile(q) for q in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert min(vals) <= qs[0] and qs[-1] <= max(vals)
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))  # monotone
    # order-independent merge
    half = len(vals) // 2
    a, b = TDigest.of(vals[:half], 100), TDigest.of(vals[half:], 100)
    assert TDigest.merge_all([a, b], 100).to_bytes() == \
        TDigest.merge_all([b, a], 100).to_bytes()


# --------------------------------------------------------------------------
# Misra-Gries: summary never exceeds k; every >n/(k+1) item survives merge
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=400),
       st.integers(min_value=2, max_value=16))
def test_misra_gries_property(stream, k):
    parts = [stream[i::3] for i in range(3)]
    merged = merge_summaries(
        [misra_gries_partial(p, k) for p in parts], k
    )
    assert len(merged) <= k
    n = len(stream)
    from collections import Counter

    freq = Counter(stream)
    for v, c in freq.items():
        if c > n / (k + 1):
            assert v in merged, (v, c, n, k)


# --------------------------------------------------------------------------
# packing: every doc placed exactly once, no bin overflows, order-free
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=700), min_size=1,
                max_size=80))
def test_pack_batch_property(lens):
    batch = pd.DataFrame({"doc_id": np.arange(len(lens)),
                          "n_tokens": np.array(lens, dtype=np.int64)})
    out = pack_batch(batch, max_len=512)
    assert out["n_docs"].sum() == len(lens)
    assert (out["used"] <= 512).all() and (out["padding"] >= 0).all()
    shuffled = pack_batch(batch.sample(frac=1.0, random_state=0), max_len=512)
    assert out.sort_values("bin_key").values.tolist() == \
        shuffled.sort_values("bin_key").values.tolist()


# --------------------------------------------------------------------------
# robots: never crashes, always boolean; prefix-only files match the
# naive evaluator
# --------------------------------------------------------------------------

robots_line = st.one_of(
    st.just("User-agent: *"),
    st.builds(lambda p: f"Disallow: /{p}/", st.text(
        alphabet="abcdef0123456789", min_size=0, max_size=6)),
    st.builds(lambda p: f"Allow: /{p}", st.text(
        alphabet="abcdef", min_size=0, max_size=6)),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=30),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(robots_line, max_size=12),
       st.text(alphabet="abcdef012345/.", max_size=20))
def test_robots_never_crashes(lines, path):
    r = RobotsTxt("\n".join(lines))
    assert r.allowed("/" + path) in (True, False)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abc123", min_size=1, max_size=5),
                max_size=6),
       st.text(alphabet="abc123/", max_size=15))
def test_robots_prefix_only_equivalence(prefixes, path):
    text = "User-agent: *\n" + "\n".join(f"Disallow: /{p}/" for p in prefixes)
    r = RobotsTxt(text)
    path = "/" + path
    naive = not any(path.startswith(f"/{p}/") for p in prefixes)
    assert r.allowed(path) == naive
