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


class _EmptyColumnSizeFilter(logging.Filter):
    """Ray's pandas block sizing np.vectorize()s over string columns and
    warns on every SIZE-0 one ("cannot call `vectorize` on size 0 inputs")
    — i.e. on every typed empty frame this repo's shuffle-consumer guards
    deliberately emit. Drop only that class; a real sizing failure on a
    non-empty column still logs."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not ("Error calculating size for column" in msg
                    and "size 0 inputs" in msg)


def silence_empty_block_schema_warnings() -> None:
    """Install the filters once on the Ray Data loggers (idempotent)."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptyBlockSchemaFilter) for f in logger.filters):
        logger.addFilter(_EmptyBlockSchemaFilter())
    blk = logging.getLogger("ray.data._internal.pandas_block")
    if not any(isinstance(f, _EmptyColumnSizeFilter) for f in blk.filters):
        blk.addFilter(_EmptyColumnSizeFilter())
