"""Directory-tree source / mirrored JSON sink (SURVEY.md §2.1 S1-S3).

The reference walks a CD directory tree for ``*.html`` files and writes one
``.json`` per input file into a mirrored output tree
(``bin/akf-html2json:48-77,96-113``). Engine shape: a distributed
``read_binary_files`` over the tree (file paths kept as the mirror key) and
a batch sink that writes one JSON per row under the same relative path —
idempotent per file, so reruns skip nothing but overwrite deterministically
(the reference's natural resumable layout).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd


def read_html_tree(root: str):
    """Recursive *.html reader → Dataset(path, html)."""
    ds = rd.read_binary_files(
        root, file_extensions=["html"], include_paths=True
    )

    def decode(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        raws = batch.column("bytes").to_pylist()
        rel = [os.path.relpath(p, root) for p in paths]
        htmls = [r.decode("utf-8", errors="replace") for r in raws]
        return pa.table(
            {
                "relpath": pa.array(rel, pa.string()),
                "html": pa.array(htmls, pa.large_string()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def parse_html_tree(root: str, batch_size: int = 64, with_audit: bool = False,
                    with_lse: bool = False):
    """Directory tree → parsed profile JSON rows (relpath, caption, status,
    + the checkfile audit / LSE line-capture columns when requested)."""
    from ..stages.cached import cached_parse_batch

    ds = read_html_tree(root)

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "image_id": batch.column("relpath"),
                "html": batch.column("html"),
                "bytes": pa.array([b""] * n, pa.binary()),
                "w": pa.array([0] * n, pa.int32()),
                "h": pa.array([0] * n, pa.int32()),
                "fmt": pa.array([""] * n, pa.string()),
                "phash": pa.array([0] * n, pa.int64()),
            }
        )

    parsed = ds.map_batches(adapt, batch_format="pyarrow").map_batches(
        cached_parse_batch(with_audit=with_audit, with_lse=with_lse),
        batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
    cols = ["image_id", "caption", "status", "error"]
    if with_audit:
        cols.append("audit")
    if with_lse:
        cols.append("lse_lines")
    return parsed.select_columns(cols)


def write_mirrored_json(parsed_ds, out_root: str) -> int:
    """One ``.json`` per input file, mirrored folder tree (S3 semantics).

    Runs as a consuming batch map (each task writes its rows' files);
    returns the number of files written.
    """

    def write_batch(batch: pa.Table) -> pa.Table:
        n = 0
        for relpath, caption in zip(
            batch.column("image_id").to_pylist(), batch.column("caption").to_pylist()
        ):
            if caption is None:
                continue
            target = os.path.join(out_root, os.path.splitext(relpath)[0] + ".json")
            os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
            data = json.loads(caption)
            tmp = target + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(data, f, ensure_ascii=False, indent=2)
            os.replace(tmp, target)
            n += 1
        return pa.table({"written": pa.array([n], pa.int64())})

    counts = parsed_ds.map_batches(write_batch, batch_format="pyarrow").take_all()
    return sum(r["written"] for r in counts)
