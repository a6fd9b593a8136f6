"""From-scratch OOXML writer tests (S5 xlsx artifact, sources/xlsx.py)."""

import os
import zipfile
from xml.etree import ElementTree as ET

from akf_cdparser_ray.sources.xlsx import (
    col_letter, read_xlsx_grid, write_xlsx,
)

GRID = {
    "columns": ["s1p1", "s1p2", "s1p3", "s2p1"],
    "cells": {
        1: {"s1p1": "Sektor0", "s1p2": "..", "s1p3": "..", "s2p1": "Sektor1"},
        2: {"s1p1": "character", "s1p2": "ctr", "s1p3": "group?"},
        3: {"s1p1": "WORT¦", "s1p2": 17, "s1p3": True},
        4: {"s1p1": "NUMMER<&>", "s1p2": 3, "s1p3": False, "s2p1": "x"},
    },
}


def test_col_letter():
    assert [col_letter(n) for n in (1, 2, 26, 27, 52, 53, 702, 703)] == [
        "A", "B", "Z", "AA", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_and_determinism(tmp_path):
    p1, p2 = str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")
    write_xlsx(p1, GRID, widths=[16, 5, 3, 16])
    write_xlsx(p2, GRID, widths=[16, 5, 3, 16])
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()  # byte-stable
    back = read_xlsx_grid(p1, GRID["columns"])
    assert back["cells"] == GRID["cells"]  # types survive: str/int/bool


def test_container_is_valid_ooxml(tmp_path):
    p = str(tmp_path / "a.xlsx")
    write_xlsx(p, GRID)
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels", "xl/styles.xml",
                "xl/worksheets/sheet1.xml", "docProps/core.xml"} <= names
        for name in names:  # every member is well-formed XML
            ET.fromstring(zf.read(name))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        sheet = wb.find(f"{ns}sheets/{ns}sheet")
        assert sheet.get("name") == "MainSheet"
        core = zf.read("docProps/core.xml").decode()
        assert "lineSegmentAnalyzer" in core


def test_report_grid_matches_render_cells(tmp_path):
    """write_xlsx_report → read back == render_cells on real GuV lines."""
    from akf_cdparser_ray.parsing.profile_parser import ProfileParser
    from akf_cdparser_ray.sources.synth import gen_profile, render_page
    from akf_cdparser_ray.stages.lse import (
        build_sectors_holder, render_cells, write_xlsx_report,
    )

    parser = ProfileParser()
    parser.lse_lines = []
    for i in range(3):
        parser.parse(render_page(gen_profile(i)))
    lines = [ln for arr in parser.lse_lines for ln in arr]
    assert lines, "synthetic pages must contain GuV sections"
    sectors = build_sectors_holder(lines, zumstein=True)
    expected = render_cells(sectors)
    path = write_xlsx_report(sectors, str(tmp_path / "r.xlsx"))
    back = read_xlsx_grid(path, expected["columns"])
    assert back["cells"] == expected["cells"]


def test_cli_lse_reports(tmp_path):
    """html2json --lse end-to-end: the distributed spool+aggregate path
    produces the same grids as the reference-shaped in-memory analyzer fed
    in sorted-relpath order. Subprocess CLI (it owns its Ray session)."""
    import subprocess
    import sys

    from akf_cdparser_ray.parsing.profile_parser import ProfileParser
    from akf_cdparser_ray.sources.synth import gen_profile, render_page
    from akf_cdparser_ray.stages.lse import (
        build_sectors_holder, do_grouping, render_cells,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = tmp_path / "html"
    src.mkdir()
    for i in range(4):
        (src / f"p{i}.html").write_text(render_page(gen_profile(i)),
                                        encoding="utf-8")
    out = tmp_path / "json"
    lse_dir = tmp_path / "lse"
    proc = subprocess.run(
        [sys.executable, "-m", "akf_cdparser_ray.cli", "html2json",
         str(src), str(out), "--lse", str(lse_dir), "--batch-size", "2",
         "-n", "2"],
        env=dict(os.environ, PYTHONPATH=repo), capture_output=True,
        text=True, timeout=240, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ungrouped = lse_dir / "LineSegmentAnalysis_PRINTOUT_kapitalentwicklung.xlsx"
    grouped = lse_dir / "LineSegmentAnalysis_PRINTOUT_kapitalentwicklungGrouped.xlsx"
    assert ungrouped.exists() and grouped.exists()

    parser = ProfileParser()
    parser.lse_lines = []
    for name in sorted(os.listdir(src)):  # sorted relpath = spool order
        parser.parse((src / name).read_text(encoding="utf-8"))
    lines = [ln for arr in parser.lse_lines for ln in arr]
    sectors = build_sectors_holder(lines, zumstein=True)
    exp_ungrouped = render_cells(sectors)
    back = read_xlsx_grid(str(ungrouped), exp_ungrouped["columns"])
    assert back["cells"] == exp_ungrouped["cells"]
    exp_grouped = render_cells(do_grouping(sectors))
    back_g = read_xlsx_grid(str(grouped), exp_grouped["columns"])
    assert back_g["cells"] == exp_grouped["cells"]
