"""Profile → SQL-insert rows (SURVEY.md §2.1 S6).

Semantics follow the reference ``lib/converter.js:27-42`` / ``bin/akf-json2sql``.
In the engine this runs as ``ds.flat_map(json2sql_rows)`` into a tabular sink.
"""

from __future__ import annotations


def _escape_quote(s: str) -> str:
    return s.replace("'", "\\'", 1)


def _make_insert(table: str, values: list) -> str:
    rendered = []
    for v in values:
        if v is None:
            rendered.append("NULL")
        elif isinstance(v, str):
            rendered.append("'" + _escape_quote(v) + "'")
        else:
            rendered.append(str(v))
    return f'INSERT INTO "{table}" VALUES({", ".join(rendered)});\n'


def json2sql(profil: dict) -> str:
    ret = ""
    if "aufsichtsrat" in profil:
        for manager in profil["aufsichtsrat"]:
            ret += _make_insert(
                "Aufsichtsrat",
                [
                    profil.get("wkn"),
                    manager.get("lastName"),
                    manager.get("firstName"),
                    manager.get("title"),
                    manager.get("city"),
                    manager.get("rank"),
                    "---",
                    0,
                ],
            )
    return ret
