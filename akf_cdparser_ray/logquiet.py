"""Targeted log hygiene for session-owning entry points (bench, CLI,
tools): Ray 2.49's sort/aggregate reduce emits COLUMN-LESS empty pandas
blocks for empty hash partitions (a known engine behavior this repo
guards every consumer against — see CLAUDE.md), and the streaming
executor then logs a schema-divergence warning for each such bundle.
Those warnings are pure noise that buries real ones, so entry points
install a filter that drops ONLY the empty-new-schema divergence class;
a genuine divergence between two non-empty schemas still logs."""

from __future__ import annotations

import logging

_EMPTY_SCHEMA_MARKERS = (
    # empty pandas block schema
    "new schema: PandasBlockSchema(names=[], types=[])",
    # empty Arrow schema renders as nothing between the colon and period
    "new schema: . This may lead",
)


class _EmptyBlockSchemaFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if "produced a RefBundle with a different schema" not in msg:
            return True
        return not any(m in msg for m in _EMPTY_SCHEMA_MARKERS)


def silence_empty_block_schema_warnings() -> None:
    """Install the filter once on the streaming-executor logger (idempotent)."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptyBlockSchemaFilter) for f in logger.filters):
        logger.addFilter(_EmptyBlockSchemaFilter())
