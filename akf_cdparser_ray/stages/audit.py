"""Audit side-output (SURVEY.md §2.1 S4 — the checkfile sink).

The reference appends ~30 per-category text logs from inside the parser
(``lib/checkfileWriter.js:104-185`` — appendFileSync per section per doc).
Engine shape: the parse output's caption JSON is exploded into
``(stage, image_id, origin, parsed)`` audit rows by a stateless batch stage
and written as a SECOND dataset (``write_parquet``) — never appendFile from
tasks. Categories mirror the checkfile config toggles
(``checkfileWriter.js:27-102``): each section key can be enabled/disabled.
"""

from __future__ import annotations

import json

import pyarrow as pa

# default-enabled audit categories ↔ checkfile names (subset; extend freely)
DEFAULT_CATEGORIES = [
    "name", "all_wkn_entry", "Sitz", "aufsichtsrat", "vorstand",
    "organbezuege", "aktionaer", "gesellschafter", "beteiligungen",
    "kapitalEntwicklung", "grundkapital", "genehmigtesKapital",
    "bedingtesKapital", "boersenbewertung", "ausBilanzen",
    "ausGewinnUndVerlust",
]


class AuditExplode:
    """pairs batch (caption JSON) → audit rows (stage, image_id, origin, parsed)."""

    def __init__(self, categories: list[str] | None = None):
        self.categories = set(categories or DEFAULT_CATEGORIES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        stages, ids, origins, parseds = [], [], [], []
        for image_id, caption in zip(
            batch.column("image_id").to_pylist(), batch.column("caption").to_pylist()
        ):
            if not caption:
                continue
            data = json.loads(caption)
            for key, val in data.items():
                if key not in self.categories:
                    continue
                stages.append(key)
                ids.append(image_id)
                origins.append(image_id)
                parseds.append(json.dumps(val, ensure_ascii=False, sort_keys=True))
        return pa.table(
            {
                "stage": pa.array(stages, pa.string()),
                "image_id": pa.array(ids, pa.string()),
                "origin": pa.array(origins, pa.string()),
                "parsed": pa.array(parseds, pa.string()),
            }
        )


def write_audit(pairs_ds, out_dir: str, categories: list[str] | None = None) -> str:
    """Side-output sink: pairs Dataset → audit parquet directory."""
    audit = pairs_ds.map_batches(
        AuditExplode(categories), batch_format="pyarrow"
    )
    audit.write_parquet(out_dir)
    return out_dir


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
