"""Canonical hash of a query result — the golden-pin helper
(tests/test_query_goldens.py). Column-name-sorted, row-sorted, floats
rendered at 9 significant digits, sha256 over the CSV bytes."""
import hashlib

import pandas as pd


def canonical_hash(out) -> str:
    if hasattr(out, "to_pandas") and not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    df = pd.DataFrame(out)
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    csv = df.to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(csv.encode()).hexdigest()
