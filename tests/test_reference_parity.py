"""Byte-level parity against the REAL reference parser.

Runs `/root/reference/lib/parser.js` through tools/refrun (Node with
from-scratch dependency stand-ins) and asserts the engine's parse output is
identical — the strongest form of the caption-equality invariant
(BASELINE.json per-row invariant)."""

import json
import os
import shutil
import subprocess

import pytest

from akf_cdparser_ray.parsing.profile_parser import parse_profile
from akf_cdparser_ray.sources import synth

REF_LIB = "/root/reference/lib/parser.js"
RUNNER = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools/refrun")
FIXTURE = "/root/reference/test/fixtures/html/2005/0003.html.utf8.html"

pytestmark = pytest.mark.skipif(
    shutil.which("node") is None or not os.path.exists(REF_LIB),
    reason="node or reference not available",
)


@pytest.fixture(scope="module")
def refrun_cwd(tmp_path_factory):
    cwd = tmp_path_factory.mktemp("refrun")
    (cwd / "checkfiles").mkdir()
    os.symlink("/root/reference/dictfiles", cwd / "dictfiles")
    return str(cwd)


def run_reference(html: str, cwd: str) -> dict:
    page = os.path.join(cwd, "page.html")
    with open(page, "w", encoding="utf-8") as f:
        f.write(html)
    out = subprocess.run(
        ["node", os.path.join(RUNNER, "run_parser.js"), page],
        cwd=cwd,
        env=dict(os.environ, NODE_PATH=os.path.join(RUNNER, "node_modules")),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    return json.loads(out.stdout)


def deep_diff(a, b, path="$", out=None, maxn=10):
    if out is None:
        out = []
    if len(out) >= maxn:
        return out
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            if k == "_fulltext":
                continue
            if k not in a:
                out.append(f"{path}.{k} only in engine")
            elif k not in b:
                out.append(f"{path}.{k} only in reference")
            else:
                deep_diff(a[k], b[k], f"{path}.{k}", out, maxn)
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            out.append(f"{path} length {len(a)} != {len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            deep_diff(x, y, f"{path}[{i}]", out, maxn)
    elif a != b:
        out.append(f"{path}: {a!r} != {b!r}")
    return out


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_parity_golden_fixture(refrun_cwd):
    with open(FIXTURE, encoding="utf-8") as f:
        html = f.read()
    ref = run_reference(html, refrun_cwd)
    mine = parse_profile(html)
    assert deep_diff(ref, mine) == []


@pytest.mark.parametrize("idx", list(range(0, 24)) + [29, 34, 38, 47])
def test_parity_synthetic_pages(refrun_cwd, idx):
    html = synth.render_page(synth.gen_profile(idx))
    ref = run_reference(html, refrun_cwd)
    mine = parse_profile(html)
    assert deep_diff(ref, mine) == [], idx


@pytest.mark.parametrize("idx", [0, 3, 7, 11])
def test_parity_full_page_mojibake(refrun_cwd, idx):
    """utf-8 bytes misread as latin-1 (the historical CD encoding accident)
    must parse byte-identically to the reference too."""
    html = synth.render_page(synth.gen_profile(idx))
    mojibake = html.encode("utf-8").decode("latin-1")
    ref = run_reference(mojibake, refrun_cwd)
    mine = parse_profile(mojibake)
    assert deep_diff(ref, mine) == [], idx


def _read_ref_checkfiles(cwd: str) -> dict[str, bytes]:
    d = os.path.join(cwd, "checkfiles")
    return {
        f: open(os.path.join(d, f), "rb").read()
        for f in os.listdir(d)
    }


def _run_checkfile_parity(html: str, refrun_cwd: str) -> list[str]:
    """Run both parsers; compare all ~37 rendered checkfiles byte-for-byte.
    (run_parser.js clears the checkfile dir at module load, so the files
    left in refrun_cwd/checkfiles belong to exactly this page.)"""
    from akf_cdparser_ray.parsing.checkfiles import AuditSink, render_checkfiles
    from akf_cdparser_ray.parsing.profile_parser import ProfileParser

    run_reference(html, refrun_cwd)
    ref_files = _read_ref_checkfiles(refrun_cwd)
    sink = AuditSink()
    ProfileParser(audit=sink).parse(html)
    mine = render_checkfiles(sink.rows)
    problems = []
    for fname in sorted(set(ref_files) | set(mine)):
        a = ref_files.get(fname, b"")
        b = mine.get(fname, "").encode("utf-8")
        if a != b:
            k = next((j for j in range(min(len(a), len(b))) if a[j] != b[j]),
                     min(len(a), len(b)))
            problems.append(
                f"{fname}: ref {len(a)}B vs mine {len(b)}B, first diff at {k}: "
                f"{a[max(0, k - 40):k + 60]!r} vs {b[max(0, k - 40):k + 60]!r}"
            )
    return problems


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_checkfile_parity_golden_fixture(refrun_cwd):
    """Checkfile audit triples (origin, raw, parsed) across all ~37
    categories are byte-identical to the reference's checkfiles
    (ref lib/checkfileWriter.js:104-185 + every parser call site)."""
    with open(FIXTURE, encoding="utf-8") as f:
        html = f.read()
    assert _run_checkfile_parity(html, refrun_cwd) == []


@pytest.mark.parametrize("idx", [0, 2, 5, 9, 13, 21, 29, 38])
def test_checkfile_parity_synthetic_pages(refrun_cwd, idx):
    html = synth.render_page(synth.gen_profile(idx))
    assert _run_checkfile_parity(html, refrun_cwd) == [], idx


def _run_lse_parity(lines: list[str], refrun_cwd: str, zumstein: bool = False,
                    name: str = "lsetest") -> list[str]:
    """Run the REAL lineSegmentAnalyzer under refrun and diff both xlsx cell
    grids (ungrouped + grouped) against stages/lse.py's faithful port."""
    import subprocess

    from akf_cdparser_ray.stages.lse import (
        build_sectors_holder, do_grouping, render_cells,
    )

    inp = os.path.join(refrun_cwd, "lse_input.json")
    with open(inp, "w", encoding="utf-8") as f:
        json.dump({"lines": lines, "name": name, "zumstein": zumstein}, f)
    out = subprocess.run(
        ["node", os.path.join(RUNNER, "run_lse.js"), inp],
        cwd=refrun_cwd,
        env=dict(os.environ, NODE_PATH=os.path.join(RUNNER, "node_modules")),
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    problems = []
    for suffix, grouped in (("", False), ("Grouped", True)):
        path = os.path.join(
            refrun_cwd, f"LineSegmentAnalysis_PRINTOUT_{name}{suffix}.xlsx.json"
        )
        ref = json.load(open(path))["MainSheet"]
        sectors = build_sectors_holder(lines, zumstein=zumstein)
        if grouped:
            do_grouping(sectors)
        mine = render_cells(sectors)
        if ref["columns"] != mine["columns"]:
            problems.append(f"{suffix or 'plain'}: column keys differ")
        mine_cells = {str(r): dict(row) for r, row in mine["cells"].items()}
        if ref["cells"] != mine_cells:
            for r in sorted(set(ref["cells"]) | set(mine_cells), key=int):
                a, b = ref["cells"].get(r, {}), mine_cells.get(r, {})
                if a != b:
                    diffs = {k: (a.get(k), b.get(k))
                             for k in sorted(set(a) | set(b)) if a.get(k) != b.get(k)}
                    problems.append(f"{suffix or 'plain'} row {r}: {diffs}")
                    break
    return problems


_LSE_CORPora = {
    "persons": [
        "Dr. Hans Muster (Vors.), Bonn; Erika Beispiel, Mainz",
        "WP Klaus Langer (stellv. Vors.), Stuttgart",
        "Prof. Dr. Anna Schmidt, Berlin; Uwe Klein (stellv. Vors.), Essen",
        "Karl Gross, Hamburg", "Maria Weiss (Arbeitnehmervertreter), Jena",
    ] * 3,
    "mixed": [
        "2002: Vorstand TEUR 623,5; Aufsichtsrat TEUR 77",
        "Fabrikstr. 45, 73207 Plochingen",
        "Telefon:(07153) 6 63-0", "ISIN: DE0005487805",
        "1999 Gruendungskapital DM 1 000 000,00",
        "Inhaber-Stammaktien o.N.", "", "   ",
        "DM 5.000; Umstellung 1:1 (im Verh. 10:7)",
        "e-mail:info@example.de, presse@example.de",
    ] * 2,
    "numbers": [
        "1999 2000 2001 2002 2003", "12,5% von 1.000.000",
        "0,10 0.25 33 4.400,12", "(100%) (50,5%) rest 7",
    ] * 4,
}


@pytest.mark.parametrize("corpus", sorted(_LSE_CORPora))
def test_lse_grid_parity(refrun_cwd, corpus):
    """xlsx grid layout parity vs the real lineSegmentAnalyzer
    (ref :567-949): both the ungrouped and the grouped printouts."""
    lines = _LSE_CORPora[corpus]
    assert _run_lse_parity(lines, refrun_cwd, name=f"c_{corpus}") == []


def test_lse_grid_parity_zumstein(refrun_cwd):
    lines = _LSE_CORPora["mixed"] + _LSE_CORPora["persons"]
    assert _run_lse_parity(lines, refrun_cwd, zumstein=True, name="zums") == []


def test_lse_grid_parity_synth_sections(refrun_cwd):
    """Aufsichtsrat-style lines out of the synthetic corpus — the LSE's real
    input shape in the reference workflow (parser.js:1915)."""
    lines = []
    for i in range(12):
        p = synth.gen_profile(i)
        for m in p.get("aufsichtsrat", []) or []:
            if isinstance(m, dict):
                lines.append(", ".join(str(v) for v in m.values()))
    assert len(lines) > 10
    assert _run_lse_parity(lines, refrun_cwd, name="synthafs") == []


def test_disabled_matchers_skip_identically(refrun_cwd):
    """The reference ships two DISABLED section parsers (parser.js:516
    Beschäftigte 'obsolete', :552 legacy Aufsichtsrat variant). A page whose
    lines would trigger them must parse identically — the sections simply
    never fire — and the Beschäftigte checkfile stays empty in both engines."""
    from akf_cdparser_ray.parsing.checkfiles import AuditSink, render_checkfiles
    from akf_cdparser_ray.parsing.profile_parser import ProfileParser

    html = synth.render_page(synth.gen_profile(4))
    # inject a Beschäftigte table right before </body> — matched only by the
    # disabled matcher (kennzahlen handles the enabled path elsewhere)
    inject = (
        "<br><b>Beschäftigte</b><table width=100%>\n"
        "<td align=LEFT>1999</td>\n<td>1 234</td>\n</table>\n"
    )
    html = html.replace("</body>", inject + "</body>")
    ref = run_reference(html, refrun_cwd)
    ref_cf = _read_ref_checkfiles(refrun_cwd)
    sink = AuditSink()
    mine = ProfileParser(audit=sink).parse(html)
    assert deep_diff(ref, mine) == []
    assert "employee_stats" not in mine  # the disabled parser never ran
    my_cf = render_checkfiles(sink.rows)
    assert ref_cf["Checkfile_Bescheaftigte.txt"] == b""
    assert my_cf["Checkfile_Bescheaftigte.txt"] == ""
