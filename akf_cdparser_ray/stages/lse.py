"""Line-segment analysis (SURVEY.md §2.5 A4, §2.3 ST5, §2.6 O4, §2.1 S5).

The reference's ``lib/lineSegmentAnalyzer.js`` collects lines globally across
files, classifies each line's tokens (word / number / special-character run /
parenthesised span), assigns each token to one of ``SEGMENT_NUM`` normalized
position sectors, counts per-(sector, key) occurrences, groups neighbor-sector
maxima (±GROUPING_RANGE), and prints an xlsx separator-recommendation report.

Ray-Data-native shape: the global mutable ``setOfLines`` accumulator becomes
``flat_map(classify)`` → partial-then-final ``groupby(sector, key).count()``;
the grouping pass runs on the tiny aggregated result driver-side
(ref :361-460, :567-…); the xlsx sink becomes a tabular report
(csv/parquet — exceljs has no sandbox equivalent, S5 is a driver-side
post-processing step by design).
"""

from __future__ import annotations

import re

import pandas as pd

SEGMENT_NUM = 10      # ref lineSegmentAnalyzer.js:20
GROUPING_RANGE = 1    # ref :21

_BRACKETS_RE = re.compile(r"\(.*\)")
_NUMBER_RE = re.compile(r"\d+(?:[,.]\d+)?")
_SPECIAL_RE = re.compile(r"[^a-zA-Z0-9üÜäÄöÖßé_.¦]+")
_SEP_SPLIT_RE = re.compile(r"¦+")


def classify_line(line: str, zumstein: bool = False) -> list[tuple[str, str, int]]:
    """One line → [(type, key, sector)] mirroring the reference's
    classification and sectorization (ref :130-380)."""
    if not line:
        return []
    if zumstein:
        specials = _SPECIAL_RE.findall(line.replace("¦", " "))
        joined = "".join(s.strip() for s in specials)
        return [("zumsteinVector", joined or "WHITESPACE", 0)]

    work = line
    tokens: list[tuple[str, str]] = []  # (type, content) in order
    brackets = _BRACKETS_RE.findall(work)
    for b in brackets:
        work = work.replace(b, "¦INBRACKETS¦", 1)
    numbers = []
    for m in _NUMBER_RE.findall(work):
        if "INBRACKETS" in work and m in "INBRACKETS":
            continue
        numbers.append(m)

    # substitute numbers then special runs, tagging with markers like the
    # reference's ¦-separated rewrite
    idx = 0
    for n in _NUMBER_RE.findall(work):
        work = work.replace(n, f"¦NUM{idx}\x00{n}¦", 1)
        idx += 1
    specials = _SPECIAL_RE.findall(work.replace("\x00", "_"))
    sidx = 0
    for s in _SPECIAL_RE.findall(work.replace("\x00", "_")):
        work = work.replace(s, f"¦SPC{sidx}\x00{s}¦", 1)
        sidx += 1

    for piece in _SEP_SPLIT_RE.split(work):
        if not piece:
            continue
        if piece == "INBRACKETS":
            tokens.append(("inBrackets", "INBRACKETS"))
        elif piece.startswith("NUM"):
            content = piece.split("\x00", 1)[1] if "\x00" in piece else piece[3:]
            if "." in content:
                key = "NUMBERDOT"
            elif "," in content:
                key = "NUMBERCOMMA"
            else:
                key = "NUMBER"
            tokens.append(("number", key))
        elif piece.startswith("SPC"):
            content = piece.split("\x00", 1)[1] if "\x00" in piece else ""
            tokens.append(("specialcharacter", content.strip() or "WHITESPACE"))
        else:
            tokens.append(("word", piece))

    n = len(tokens) or 1
    factor = SEGMENT_NUM / n
    out = []
    for pos, (typ, key) in enumerate(tokens):
        sector = round(factor * pos)
        if sector == SEGMENT_NUM:
            sector = SEGMENT_NUM - 1
        out.append((typ, key, sector))
    return out


def classify_batch(batch: pd.DataFrame, zumstein: bool = False) -> pd.DataFrame:
    """lines batch → exploded (sector, key, type) rows (the flat_map)."""
    sectors, keys, types = [], [], []
    for line in batch["line"].fillna(""):
        for typ, key, sector in classify_line(str(line), zumstein=zumstein):
            sectors.append(sector)
            keys.append(key)
            types.append(typ)
    return pd.DataFrame({"sector": sectors, "key": keys, "type": types})


def analyze_lines(lines_ds, zumstein: bool = False) -> pd.DataFrame:
    """Distributed LSE: classify → partial groupby count → final count.

    ``zumstein=True`` is the reference's special configuration (one segment,
    special characters only; lineSegmentAnalyzer.js:25,115-128)."""
    from .relational import partial_groupby_sum
    import functools

    exploded = lines_ds.map_batches(
        functools.partial(classify_batch, zumstein=zumstein), batch_format="pandas"
    )

    def add_one(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["one"] = 1
        return batch

    counted = partial_groupby_sum(
        exploded.map_batches(add_one, batch_format="pandas"),
        ["sector", "key", "type"],
        ["one"],
    )
    df = counted.to_pandas().rename(columns={"one": "ctr"})
    return df.sort_values(["sector", "ctr"], ascending=[True, False]).reset_index(drop=True)


def group_neighborhoods(df: pd.DataFrame, grouping_range: int = GROUPING_RANGE) -> pd.DataFrame:
    """Driver-side grouping pass over the small aggregate: for each key,
    merge counts of neighbor sectors (±range) around each local maximum
    (ref :567-…). Output rows are (key, type, center_sector, group_ctr,
    group_size)."""
    rows = []
    for (key, typ), grp in df.groupby(["key", "type"]):
        by_sector = dict(zip(grp["sector"], grp["ctr"]))
        used: set[int] = set()
        for sector in sorted(by_sector, key=lambda s: (-by_sector[s], s)):
            if sector in used:
                continue
            members = [
                s
                for s in range(sector - grouping_range, sector + grouping_range + 1)
                if s in by_sector and s not in used
            ]
            used.update(members)
            rows.append(
                (key, typ, sector, int(sum(by_sector[s] for s in members)), len(members))
            )
    out = pd.DataFrame(
        rows, columns=["key", "type", "center_sector", "group_ctr", "group_size"]
    )
    return out.sort_values(["group_ctr", "key"], ascending=[False, True]).reset_index(drop=True)


def separator_report(lines_ds, top_n: int = 30, zumstein: bool = False) -> pd.DataFrame:
    """The S5 report: which separators/tokens dominate which line sectors
    (the xlsx content as a DataFrame; write with to_csv/parquet)."""
    df = analyze_lines(lines_ds, zumstein=zumstein)
    grouped = group_neighborhoods(df)
    return grouped.head(top_n)
