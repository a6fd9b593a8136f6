"""Audit side-output (SURVEY.md §2.1 S4 — the checkfile sink).

The reference appends ~36 per-category text logs from inside the parser
(``lib/checkfileWriter.js:104-185`` — appendFileSync per section per doc),
each entry an (origin line index, raw origin text, parsed JSON) triple.
Engine shape: ``ParseProfiles(with_audit=True)`` carries the parser's real
checkfile rows (byte-parity-tested in tests/test_reference_parity.py) as a
JSON ``audit`` column; :class:`AuditExplode` flattens them into a
``(stage, image_id, originline, kind, origin, parsed)`` table written as a
SECOND dataset (``write_parquet``) — never appendFile from tasks. Category
enable/disable toggles follow ``checkfileWriter.js:27-102``
(``parsing/checkfiles.CONFIG``); ``render_checkfile_texts`` reproduces the
reference's exact text-file bytes for the CLI sink.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..parsing.checkfiles import CONFIG, render_checkfiles

DEFAULT_CATEGORIES = list(CONFIG)


class AuditExplode:
    """pairs batch (with the ``audit`` JSON column from
    ``ParseProfiles(with_audit=True)``) → one row per checkfile write:
    (stage, image_id, originline, kind, origin, parsed)."""

    def __init__(self, categories: list[str] | None = None):
        self.categories = set(categories or DEFAULT_CATEGORIES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        stages, ids, lines, kinds, origins, parseds = [], [], [], [], [], []
        for image_id, blob in zip(
            batch.column("image_id").to_pylist(), batch.column("audit").to_pylist()
        ):
            for row in json.loads(blob or "[]"):
                if row["key"] not in self.categories:
                    continue
                stages.append(row["key"])
                ids.append(image_id)
                lines.append(row["originline"])
                kinds.append(row["kind"])
                origins.append(row["origin"])
                parseds.append(row["parsed"])
        return pa.table(
            {
                "stage": pa.array(stages, pa.string()),
                "image_id": pa.array(ids, pa.string()),
                "originline": pa.array(lines, pa.int32()),
                "kind": pa.array(kinds, pa.string()),
                "origin": pa.array(origins, pa.string()),
                "parsed": pa.array(parseds, pa.string()),
            }
        )


def write_audit(pairs_ds, out_dir: str, categories: list[str] | None = None) -> str:
    """Side-output sink: pairs Dataset (with audit column) → audit parquet."""
    audit = pairs_ds.map_batches(
        AuditExplode(categories), batch_format="pyarrow"
    )
    audit.write_parquet(out_dir)
    return out_dir


def render_checkfile_texts(audit_blobs: list[str]) -> dict[str, str]:
    """Concatenate per-document audit rows (in document order) and render
    the reference's checkfile text files byte-for-byte."""
    rows: list[dict] = []
    for blob in audit_blobs:
        rows.extend(json.loads(blob or "[]"))
    return render_checkfiles(rows)


def json2sql_batch(batch: pa.Table) -> pa.Table:
    """S6: caption JSON → SQL INSERT rows (ref bin/akf-json2sql,
    lib/converter.js) as a flat_map-style batch stage."""
    from ..parsing.converter import json2sql

    ids, sqls = [], []
    for image_id, caption in zip(
        batch.column("image_id").to_pylist(), batch.column("caption").to_pylist()
    ):
        if not caption:
            continue
        data = json.loads(caption)
        entries = data.get("all_wkn_entry") or []
        if entries and entries[0].get("wkn"):
            try:
                data["wkn"] = int(entries[0]["wkn"])
            except (TypeError, ValueError):
                pass
        sql = json2sql(data)
        for line in sql.splitlines():
            if line.strip():
                ids.append(image_id)
                sqls.append(line)
    return pa.table(
        {"image_id": pa.array(ids, pa.string()), "sql": pa.array(sqls, pa.string())}
    )
