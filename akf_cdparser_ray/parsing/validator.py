"""Profile validation (SURVEY.md §3.2).

Two validators, semantics per the reference:

* schema validation (ref ``lib/validator.js:63-73`` + ``schema.yml``) —
  reimplemented without ajv as explicit checks of the same constraints;
* coverage-by-subtraction (ref ``lib/validator.js:46-58``): strike every
  parsed leaf value and the predefined labels from ``_fulltext``; what
  remains is unparsed content. This is the reference's own recall metric and
  becomes a distributed operator in ``stages/parse_stage.py``.
"""

from __future__ import annotations

import re

from ..functions import text_utils as tu

PREDEFINED = [
    "Status",
    "Tätigkeitsgebiet/Gründung",
    "Gründung",
    "e-mail",
    "Telefon",
    "Management",
    "Aufsichtsrat",
    "Stammaktien",
    "Nennwert",
    "Internetseite",
    "Telefax",
    "ISIN",
    "Wertpapier-Kenn.Nr",
]

_PREDEFINED_CLEAN = [tu.clean_text(s) for s in PREDEFINED]

_ZIP_RE = re.compile(r"\d{5}")
_PHONE_RE = re.compile(r"^[0-9()\-\s]+$")
_FUNCT_RE = re.compile(r"^(?:Vors\.|stellv\. Vors\.)$")


def validate(data: dict) -> tuple[bool, list[str]]:
    """Schema checks mirroring ``schema.yml`` (wkn required, Manager
    firstName/lastName required, zip ``\\d{5}``, phone charset, funct enum)."""
    errors: list[str] = []
    if "wkn" not in data:
        errors.append("required property 'wkn' missing")
    elif not isinstance(data.get("wkn"), (int, float)):
        errors.append("wkn must be a number")
    for field in ("aufsichtsrat", "vorstand"):
        managers = data.get(field) or []
        # the parser wraps vorstand lists one level deeper (parser.js:673)
        flat = []
        for m in managers:
            if isinstance(m, list):
                flat.extend(m)
            else:
                flat.append(m)
        for m in flat:
            if not isinstance(m, dict):
                errors.append(f"{field} entry not an object")
                continue
            for req in ("firstName", "lastName"):
                if req not in m:
                    errors.append(f"{field} manager missing '{req}'")
            if "funct" in m and not _FUNCT_RE.match(m["funct"] or ""):
                errors.append(f"{field} funct '{m['funct']}' not in enum")
    if "zip" in data and not _ZIP_RE.search(str(data["zip"])):
        errors.append("zip must match \\d{5}")
    if "phone" in data and not _PHONE_RE.match(str(data["phone"])):
        errors.append("phone charset invalid")
    if "status" in data and data["status"] is not None and "Insolvenz" not in str(data["status"]):
        errors.append("status must match 'Insolvenz'")
    return (len(errors) == 0), errors


def unparsed_text(data: dict, replace_values: str = " ", replace_predefined: str = "*") -> str:
    """Subtraction residue (ref validator.js:46-58)."""
    remaining = tu.clean_text(data.get("_fulltext", ""))
    for k, v in data.items():
        if re.match(r"^_fulltext", k):
            continue
        for leaf in tu.leaf_nodes(v):
            s = tu.clean_text(leaf)
            if not s:
                continue
            remaining = re.sub(
                r"\s*" + re.escape(s) + r"\s*",
                replace_values * len(s),
                remaining,
                count=1,
            )
    for s in _PREDEFINED_CLEAN:
        remaining = re.sub(
            r"\s*\b" + re.escape(s) + r"\b\s*", replace_predefined * len(s), remaining
        )
    return remaining


def coverage_ratio(data: dict) -> float:
    """Fraction of the cleaned fulltext consumed by parsed values —
    1.0 means everything was struck out (engine-side summary metric)."""
    full = tu.clean_text(data.get("_fulltext", ""))
    residue = unparsed_text(data)
    alnum = [c for c in residue if c.isalnum()]
    total = [c for c in full if c.isalnum()]
    if not total:
        return 1.0
    return 1.0 - len(alnum) / len(total)
