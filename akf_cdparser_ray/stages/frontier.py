"""Frontier table schema + deterministic ordering helpers, shared by the
crawl pipeline (pipelines/crawl.py) and the enqueue-owning filter shard
actors (stages/dedupe.py). Top-level module so worker-pickled code never
needs a runtime package import."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

FRONTIER_COLS = ["url_canon", "url_hash", "host", "priority", "depth", "discovered_at"]

FRONTIER_SCHEMA = pa.schema(
    [
        ("url_canon", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("priority", pa.int64()),
        ("depth", pa.int64()),
        ("discovered_at", pa.int64()),
    ]
)


def empty_frontier_table() -> pa.Table:
    return pa.table(
        {f.name: pa.array([], f.type) for f in FRONTIER_SCHEMA}, schema=FRONTIER_SCHEMA
    )


def sorted_frontier_table(df: pd.DataFrame) -> pa.Table:
    """Deterministic frontier order: priority desc, url_canon asc (url_canon
    is unique per shard, so the order is total)."""
    df = df.sort_values(["priority", "url_canon"], ascending=[False, True])
    return pa.Table.from_pandas(df[FRONTIER_COLS], schema=FRONTIER_SCHEMA, preserve_index=False)
