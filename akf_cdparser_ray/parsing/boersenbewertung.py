"""Börsenbewertung parsing (SURVEY.md §2.2 M24).

Semantics follow the reference ``lib/parser_boersenbewertung.js:19-147``.
The ``callnumber`` is the per-document occurrence count of the section —
it forges the ``boersenbewertung{N}`` key (per-row state, see SURVEY §2.3 ST4).
"""

from __future__ import annotations

from ..functions import regex_lib as rl
from ..functions import text_utils as tu


def parse_boersenbewertung(lines: list[str], callnumber: int) -> dict:
    ret: dict = {}
    nextline_is_notiert = False

    for currentline in lines:
        if not currentline:
            continue
        lc = currentline.lower()
        if "wertpapier-kenn-nr" in lc:
            wkn_obj: dict = {}
            nm = rl.match_number(currentline)
            if nm:
                wkn_obj["nummer"] = nm[0]
            split = currentline.split(",")
            if len(split) >= 2:
                wkn_obj["aktienart"] = tu.html_text_to_text(split[1])
            ret.setdefault("wkns", []).append(wkn_obj)
        elif "isin:" in lc:
            isin_obj: dict = {}
            split = currentline.split(",")
            if split[0]:
                ss = split[0].split(":")
                if len(ss) > 1 and ss[1]:
                    isin_obj["nummer"] = tu.html_text_to_text(ss[1]).strip()
            if len(split) > 1 and split[1]:
                info = tu.html_text_to_text(split[1]).strip()
                if info:
                    isin_obj["aktienart"] = info
            ret.setdefault("isins", []).append(isin_obj)
        elif "marktbetreuer" in lc:
            split = currentline.split("arktbetreuer:")
            if len(split) > 1 and split[1]:
                ret.setdefault("marktbetreuer", []).append(
                    tu.html_text_to_text(split[1]).strip()
                )
            if "notiert" in split[0] or "Notiert" in split[0]:
                trimmed = split[0].strip()
                ret.setdefault("notizen_kennzahlen", []).append(trimmed[: len(trimmed) - 2])
        elif nextline_is_notiert:
            for piece in currentline.split("<br>"):
                info = tu.html_text_to_text(piece).strip()
                if info:
                    ret.setdefault("notizen_kennzahlen", []).append(info)
        elif "notiert" in lc:
            for piece in currentline.split("<br>"):
                info = tu.html_text_to_text(piece).replace("Notiert:", "", 1).strip()
                if info:
                    ret.setdefault("notizen_kennzahlen", []).append(info)
                else:
                    nextline_is_notiert = True
        else:
            maybe = tu.html_text_to_text(currentline).strip()
            if maybe:
                ret.setdefault("bemerkungen", []).append(maybe)

    return {f"boersenbewertung{callnumber}": ret}
