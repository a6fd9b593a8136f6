"""Arrow schemas for the engine (SURVEY.md §1.2).

``PAIRS_SCHEMA`` is the authoritative input/output shape fixed by
BASELINE.json's input_hint:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.
"""

from __future__ import annotations

import pyarrow as pa

PAIRS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

PAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("url", pa.string()),
        ("html", pa.large_string()),
        ("year", pa.int32()),
        # image payload carried alongside so parse→pair needs no join
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url_canon", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("discovered_at", pa.int64()),  # wave number, not wall clock (replayable)
    ]
)

AUDIT_SCHEMA = pa.schema(
    [
        ("stage", pa.string()),
        ("image_id", pa.string()),
        ("origin", pa.string()),
        ("parsed", pa.string()),
    ]
)
