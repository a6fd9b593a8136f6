"""Flagship pipeline: pages → parse (actor pool) → image+caption pairs
(SURVEY.md §3.1 engine shape, minus the crawl loop which lives in
``pipelines/crawl.py``).

Streaming end to end: no driver-side materialization; output is either a
Dataset (caller consumes/writes) or partitioned parquet via ``write_pairs``.
"""

from __future__ import annotations

import ray.data as rd

from ..sources import synth
from ..stages.parse_stage import ParseProfiles


def pages_dataset(n_pages: int, seed: int = synth.SEED, parallelism: int = 8):
    """Synthetic pages as a Dataset. Generation happens driver-side at small
    scale (test/bench corpora); at 100 TB the read is
    ``ray.data.read_lance/read_parquet`` over the crawl output instead."""
    table = synth.build_pages_table(n_pages, seed)
    return rd.from_arrow(table).repartition(parallelism)


def parse_pages(
    pages,
    *,
    batch_size: int = 64,
    concurrency=(1, 8),
    with_residue: bool = False,
    with_audit: bool = False,
    dictfiles_dir: str | None = None,
):
    """pages Dataset → pairs Dataset (zero-copy Arrow batches; dictionaries
    are actor state loaded once per actor)."""
    return pages.map_batches(
        ParseProfiles,
        fn_constructor_kwargs={
            "dictfiles_dir": dictfiles_dir,
            "with_residue": with_residue,
            "with_audit": with_audit,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def pairs_pipeline(n_pages: int = 120, **kwargs):
    """The flagship: synthesize → parse → select the pairs columns
    (+ the audit side column when with_audit=True)."""
    with_audit = kwargs.get("with_audit", False)
    ds = parse_pages(pages_dataset(n_pages), **kwargs)
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "status"]
    if with_audit:
        cols.append("audit")
    return ds.select_columns(cols)


def write_pairs(ds, out_dir: str):
    """Partitioned parquet sink (one file set per block; resumable layout)."""
    ds.write_parquet(out_dir)
    return out_dir
