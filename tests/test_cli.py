"""CLI smoke tests (subprocess, own Ray session per the CLI contract)."""

import json
import os
import subprocess
import sys

import pytest

from akf_cdparser_ray.sources import synth

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "akf_cdparser_ray.cli", *args],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )


@pytest.mark.usefixtures()
def test_cli_html2json_validate_json2sql(tmp_path):
    root = tmp_path / "cd"
    for i in range(3):
        p = synth.gen_profile(i)
        d = root / str(p["year"])
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{i:04d}.html").write_text(synth.render_page(p), encoding="utf-8")

    out = tmp_path / "json"
    r = _run(["html2json", str(root), str(out), "-n", "2"])
    assert r.returncode == 0, r.stderr[-400:]
    assert "wrote 3 json files" in r.stdout

    jsons = list(out.rglob("*.json"))
    assert len(jsons) == 3
    data = json.loads(jsons[0].read_text(encoding="utf-8"))
    assert "all_wkn_entry" in data

    r = _run(["validate", str(out)])
    assert "invalid files" in r.stdout

    r = _run(["json2sql", str(out)])
    assert r.returncode == 0
    assert 'INSERT INTO "Aufsichtsrat"' in r.stdout


def test_cli_html2json_checkfiles(tmp_path):
    """--checkfiles writes the reference-format audit logs alongside the
    mirrored JSON (byte format pinned by tests/test_reference_parity.py)."""
    from akf_cdparser_ray.sources import synth

    src = tmp_path / "in" / "2005"
    src.mkdir(parents=True)
    for i in range(3):
        (src / f"{i:04d}.html").write_text(
            synth.render_page(synth.gen_profile(i)), encoding="utf-8"
        )
    out = tmp_path / "out"
    cfdir = tmp_path / "checkfiles"
    r = _run(["html2json", str(tmp_path / "in"), str(out), "-n", "2",
              "--checkfiles", str(cfdir)])
    assert r.returncode == 0, r.stderr[-500:]
    idx = (cfdir / "Checkfile_Index.txt").read_bytes()
    assert idx.count(b'"Match": "AKF_PARSER_START"') == 3
    assert (cfdir / "Checkfile_Aufsichtsrat.txt").read_bytes().startswith(b"origin: ")
    # every configured file exists (clearCheckfilesAtStart semantics)
    from akf_cdparser_ray.parsing.checkfiles import CONFIG
    for fname, _on in CONFIG.values():
        assert (cfdir / fname).exists(), fname
