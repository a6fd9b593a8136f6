"""Table IO (SURVEY.md §2.1 S1-S4).

Primary sink is Lance when the ``lance`` package is available (the
BASELINE.json target format); otherwise partitioned Parquet with identical
layout semantics — one directory per partition, atomically renamed, plus a
``_MANIFEST.json`` of finished partitions so a killed run resumes by
skipping them (resumable-output requirement).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance not present in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_table(table: pa.Table, uri: str) -> str:
    """Write one Arrow table to ``uri`` (Lance dataset or a parquet file)."""
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, uri, mode="overwrite")
        return uri
    path = uri if uri.endswith(".parquet") else uri + ".parquet"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)
    return path


def read_table(uri: str) -> pa.Table:
    if HAVE_LANCE and os.path.isdir(uri):  # pragma: no cover
        return lance.dataset(uri).to_table()
    path = uri if uri.endswith(".parquet") else uri + ".parquet"
    return pq.read_table(path)


# ---------------------------------------------------------------------------
# partitioned, resumable sink
# ---------------------------------------------------------------------------


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_MANIFEST.json")


def load_manifest(root: str) -> dict:
    p = _manifest_path(root)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"partitions": {}}


def _store_manifest(root: str, manifest: dict) -> None:
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))


def partition_done(root: str, key: str) -> bool:
    return key in load_manifest(root)["partitions"]


def promote_fragments(root: str, key: str, tmpdir: str,
                      lineage: dict | None = None) -> int:
    """Promote a directory of worker-written ``part-*.parquet`` fragments
    to a final partition: count rows from the parquet footers, then
    ``finalize_partition``. Returns the promoted row count (0 and no-op
    when the building dir is absent). Shared by the streaming crawl's
    checkpoint promotion and its end-of-run finalize — one copy of the
    accounting that the kill-resume invariant depends on."""
    import glob as _glob

    import pyarrow.parquet as _pq

    if not os.path.isdir(tmpdir):
        return 0
    frags = _glob.glob(os.path.join(tmpdir, "*.parquet"))
    rows = sum(_pq.read_metadata(p).num_rows for p in frags)
    finalize_partition(root, key, tmpdir, rows=rows, lineage=lineage)
    return rows


def adopt_partition_dir(root: str, key: str,
                        lineage: dict | None = None) -> int:
    """Crash recovery: record an EXISTING partition directory in the
    manifest (the promote crash window — ``finalize_partition`` renamed
    the fragments into place but died before the manifest write; readers
    would silently skip those rows forever). Row count is recovered from
    the parquet footers. Returns the adopted row count."""
    import glob as _glob

    pdir = os.path.join(root, key)
    frags = _glob.glob(os.path.join(pdir, "*.parquet"))
    rows = sum(pq.read_metadata(p).num_rows for p in frags)
    manifest = load_manifest(root)
    manifest["partitions"][key] = {"rows": rows,
                                   "lineage": lineage or {"recovered": True}}
    _store_manifest(root, manifest)
    return rows


def drop_partition(root: str, key: str) -> bool:
    """Remove a partition (dir + manifest entry), idempotently. Used by
    resume paths to roll back partitions promoted after the last complete
    checkpoint marker (stream crawl: a kill between pairs promotion and
    the marker write leaves a partition whose rows will be refetched)."""
    pdir = os.path.join(root, key)
    existed = os.path.isdir(pdir)
    # manifest entry FIRST, directory second: a crash in between leaves an
    # orphan dir no reader trusts (harmless, replaced by a later finalize),
    # whereas the reverse order leaves a manifest entry pointing at a
    # missing dir — which read_partitions silently skips, masking data loss
    manifest = load_manifest(root)
    if key in manifest["partitions"]:
        del manifest["partitions"][key]
        _store_manifest(root, manifest)
        existed = True
    if os.path.isdir(pdir):
        shutil.rmtree(pdir)
    return existed


def write_partition(table: pa.Table, root: str, key: str, lineage: dict | None = None) -> str:
    """Atomically write one partition dir + record it in the manifest.

    ``lineage`` (wave, shard, input fragments…) is stored with the entry so a
    resume can verify provenance (per-partition lineage requirement).
    """
    os.makedirs(root, exist_ok=True)
    final = os.path.join(root, key)
    tmpdir = tempfile.mkdtemp(dir=root, prefix=f".{key.replace('/', '_')}.tmp")
    try:
        if HAVE_LANCE:  # pragma: no cover - exercised where lance exists
            lance.write_dataset(table, os.path.join(tmpdir, "part-0.lance"),
                                mode="create")
        else:
            pq.write_table(table, os.path.join(tmpdir, "part-0.parquet"))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmpdir, final)
    except Exception:
        shutil.rmtree(tmpdir, ignore_errors=True)
        raise
    manifest = load_manifest(root)
    manifest["partitions"][key] = {"rows": table.num_rows, "lineage": lineage or {}}
    _store_manifest(root, manifest)
    return final


def finalize_partition(
    root: str, key: str, tmpdir: str, rows: int, lineage: dict | None = None
) -> str:
    """Atomically promote a directory of worker-written fragments to the
    final partition and record it in the manifest (distributed-write path:
    tasks write ``part-*.parquet`` into ``tmpdir``; the driver finalizes)."""
    os.makedirs(root, exist_ok=True)
    final = os.path.join(root, key)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmpdir, final)
    manifest = load_manifest(root)
    manifest["partitions"][key] = {"rows": rows, "lineage": lineage or {}}
    _store_manifest(root, manifest)
    return final


def _aside_path(root: str, key: str) -> str:
    """Rename-aside dir used during compaction (dot-prefixed so
    read_partitions' fragment listing never double-reads it)."""
    return os.path.join(root, f".{key.replace('/', '_')}.old")


def _recover_partition(root: str, key: str) -> None:
    """Recover from a compaction killed mid-swap. State machine:
    (a) aside dir exists AND partition dir exists → the compacted dir was
        promoted; the aside is the superseded fragments — delete it.
    (b) aside dir exists AND partition dir missing → killed between
        rename-aside and promote; restore the aside so the partition is
        whole again (the orphan .compact tmpdir is ignored/re-done).
    Idempotent; called at the top of compact_partition and by
    read_partitions when a claimed partition dir is missing."""
    pdir = os.path.join(root, key)
    aside = _aside_path(root, key)
    if os.path.isdir(aside):
        if os.path.isdir(pdir):
            shutil.rmtree(aside)
        else:
            os.replace(aside, pdir)


def compact_partition(root: str, key: str, target_rows: int = 1_000_000,
                      update_manifest: bool = True) -> dict:
    """Rewrite one partition's fragment files into ~target_rows-sized
    files. Kill-safe like every sink here: compacted files land in a
    tmpdir; the live dir is renamed ASIDE (never deleted first), the
    tmpdir promoted into place, and only then is the aside removed — so a
    crash at any point leaves either the old fragments, a recoverable
    aside (see ``_recover_partition``), or the finished compaction, never
    a lost partition. Row count is verified before the swap.

    ``update_manifest=False`` defers the lineage note to the caller —
    REQUIRED when compactions run in parallel (concurrent read-modify-
    write of _MANIFEST.json would lose updates; ``compact_partitions``
    applies them in one driver-side write)."""
    _recover_partition(root, key)
    pdir = os.path.join(root, key)
    frags = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    expect_rows = load_manifest(root)["partitions"][key]["rows"]
    if len(frags) <= 1:
        return {"key": key, "files_before": len(frags), "files_after": len(frags),
                "rows": expect_rows, "skipped": True}
    table = pa.concat_tables(
        pq.read_table(os.path.join(pdir, f)) for f in frags
    )
    assert table.num_rows == expect_rows, (key, table.num_rows, expect_rows)
    tmpdir = tempfile.mkdtemp(dir=root, prefix=f".{key.replace('/', '_')}.compact")
    try:
        n_files = max(1, -(-table.num_rows // target_rows))
        step = -(-table.num_rows // n_files)
        for i in range(n_files):
            pq.write_table(table.slice(i * step, step),
                           os.path.join(tmpdir, f"part-{i:05d}.parquet"))
    except Exception:
        shutil.rmtree(tmpdir, ignore_errors=True)
        raise
    aside = _aside_path(root, key)
    os.rename(pdir, aside)   # old data stays recoverable from here on
    os.replace(tmpdir, pdir)
    shutil.rmtree(aside)
    if update_manifest:
        _note_compactions(root, {key: len(frags)})
    return {"key": key, "files_before": len(frags), "files_after": n_files,
            "rows": expect_rows, "skipped": False}


def _note_compactions(root: str, compacted: dict[str, int]) -> None:
    manifest = load_manifest(root)
    for key, n in compacted.items():
        manifest["partitions"][key].setdefault("lineage", {})["compacted_from"] = n
    _store_manifest(root, manifest)


def compact_partitions(root: str, target_rows: int = 1_000_000):
    """Compact every finished partition under ``root`` (the small-file
    problem: a 100-TB crawl's per-task fragment writes leave thousands of
    tiny parquet files per wave dir). Distributed as a Dataset over the
    manifest's partition keys — one task per partition, counters back to
    the driver. Requires an initialized Ray session (callers own it)."""
    import ray.data as rd

    keys = sorted(load_manifest(root)["partitions"])
    if not keys:
        return []

    def work(batch: pa.Table) -> pa.Table:
        stats = [compact_partition(root, k, target_rows, update_manifest=False)
                 for k in batch.column("key").to_pylist()]
        return pa.table({
            "key": pa.array([s["key"] for s in stats], pa.string()),
            "files_before": pa.array([s["files_before"] for s in stats], pa.int64()),
            "files_after": pa.array([s["files_after"] for s in stats], pa.int64()),
            "rows": pa.array([s["rows"] for s in stats], pa.int64()),
            "skipped": pa.array([s["skipped"] for s in stats], pa.bool_()),
        })

    ds = rd.from_arrow(pa.table({"key": pa.array(keys, pa.string())}))
    out = ds.repartition(len(keys)).map_batches(
        work, batch_format="pyarrow", num_cpus=1
    )
    stats = out.take_all()
    # one driver-side manifest write for every compaction that ran
    _note_compactions(root, {
        s["key"]: s["files_before"] for s in stats if not s["skipped"]
    })
    return stats


def spill_dataset(ds, out_dir: str):
    """Deterministic block-preserving disk spill for multi-consumer
    pipeline stages: each block is written by its worker to one parquet
    file, the driver renames the files into dataset order (paths only —
    no rows), and the re-read maps one file back to one block. Row order
    AND block boundaries are reproduced exactly, so batch-layout-sensitive
    consumers (FFD packing) see the identical stream, and each re-read
    costs a disk scan instead of pinning the stage's full output in the
    object store per extra consumer (``materialize()``) or re-executing
    the upstream pipeline (lazy re-consumption).

    Returns ``(dataset, row_count)`` — the count is free (spill metadata),
    saving the separate ``.count()`` consumption."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        fd, path = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(batch, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    meta = ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None).take_all()
    paths, total = [], 0
    for i, m in enumerate(meta):
        final = os.path.join(out_dir, f"block-{i:06d}.parquet")
        os.replace(m["path"], final)
        paths.append(final)
        total += int(m["rows"])
    if not paths:
        return ds, 0
    return rd.read_parquet(paths, override_num_blocks=len(paths)), total


def read_partitions(root: str) -> pa.Table:
    manifest = load_manifest(root)
    tables = []
    for key in sorted(manifest["partitions"]):
        pdir = os.path.join(root, key)
        if not os.path.isdir(pdir):
            # a compaction may have died mid-swap — restore the aside dir
            # rather than silently dropping rows the manifest claims
            _recover_partition(root, key)
        if not os.path.isdir(pdir):
            continue
        for frag in sorted(os.listdir(pdir)):
            if frag.endswith(".lance") and HAVE_LANCE:  # pragma: no cover
                tables.append(lance.dataset(os.path.join(pdir, frag)).to_table())
            elif frag.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(pdir, frag)))
    if not tables:
        raise FileNotFoundError(f"no completed partitions under {root}")
    return pa.concat_tables(tables)
