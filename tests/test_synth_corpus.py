"""Synthetic-corpus tests: generator determinism, parser ground-truth
recovery on every page variant, image codec invariants (FIXTURES.md §1-2,
BASELINE.json per-row invariant: PSNR >= 40 dB lossy / exact lossless)."""

import numpy as np
import pytest

from akf_cdparser_ray.parsing import validator
from akf_cdparser_ray.parsing.profile_parser import parse_profile
from akf_cdparser_ray.sources import images as im
from akf_cdparser_ray.sources import synth

N = 24


@pytest.fixture(scope="module")
def pages():
    return synth.build_pages_table(N)


def test_determinism(pages):
    again = synth.build_pages_table(N)
    assert pages.equals(again)


def test_ground_truth_recovery(pages):
    htmls = pages.column("html").to_pylist()
    for i in range(N):
        p = synth.gen_profile(i)
        parsed = parse_profile(htmls[i])
        assert parsed["name"] == p["name"], i
        sitz = parsed["Sitz"][0]
        assert sitz["city"] == p["city"], i
        assert sitz["zip"] == p["zip"], i
        assert sitz["email"] == p["emails"], i
        assert parsed["established_year"] == p["established"], i
        assert parsed["all_wkn_entry"][0]["wkn"] == p["wkn"], i
        assert parsed["all_wkn_entry"][0]["isin"] == p["isin"], i
        assert len(parsed["aufsichtsrat"]) == len(p["aufsichtsrat"]), i
        # kurse years present
        kurse = parsed["boersenbewertung"]["boersenbewertung1"]["kurse"]
        years = {k.get("jahr") for k in kurse}
        for y in p["kurs_years"]:
            assert str(y) in years, (i, y, years)
        assert parsed["grundkapital"]["betrag"] == p["grundkapital"], i


def test_organbezuege_variants():
    # idx 3 is the mojibake page (gen_profile: idx % 17 == 3)
    p = synth.gen_profile(3)
    assert p["organbezuege_mojibake"]
    parsed = parse_profile(synth.render_page(p))
    assert "organbezuege" in parsed, "mojibake Organbezüge header must still match"
    p2 = synth.gen_profile(1)
    parsed2 = parse_profile(synth.render_page(p2))
    if not p2["organbezuege_keine"]:
        entries = parsed2["organbezuege"][0]
        assert entries[0]["organ"] == "Vorstand"


def test_beteiligungen_table_variant():
    p = synth.gen_profile(5)
    assert p["wesentliche_tabelle"]
    parsed = parse_profile(synth.render_page(p))
    elems = parsed["beteiligungen"]["elemente"]
    rows = [z for e in elems for z in e["zeilen"] if z]
    assert len(rows) == len(p["beteiligungen"])
    assert rows[0]["beteiliger"] == p["beteiligungen"][0][0]


def test_split_year_kurse():
    p = synth.gen_profile(6)  # idx % 3 == 0 → split layout
    assert p["split_year_kurse"]
    parsed = parse_profile(synth.render_page(p))
    kurse = parsed["boersenbewertung"]["boersenbewertung1"]["kurse"]
    years = {k.get("jahr") for k in kurse}
    assert {str(y) for y in p["kurs_years"]} <= years


def test_kennzahlen_and_guv():
    p = synth.gen_profile(2)
    parsed = parse_profile(synth.render_page(p))
    kz = parsed["boersenbewertung"]["boersenbewertung1"]["kennzahlen"]["Konzern"]
    first_row = next(iter(p["kennzahlen"]))
    kz_years = p["kurs_years"][-3:]
    expected = p["kennzahlen"][first_row][kz_years[0]]
    assert kz[0][first_row] == expected.lower()
    guv = parsed["ausGewinnUndVerlust"][0]["ausGewinnUndVerlustRechnung"]
    assert guv[0]["columnId"] == "AG"
    bil = parsed["ausBilanzen"][0]["ausBilanzen"]
    assert "Aktiva" in bil


def test_coverage(pages):
    htmls = pages.column("html").to_pylist()
    ratios = [validator.coverage_ratio(parse_profile(h)) for h in htmls[:8]]
    assert min(ratios) > 0.55, ratios


def test_image_invariants(pages):
    for i in range(6):
        p = synth.gen_profile(i)
        data, pix = synth.make_image(p)
        dec = im.decode_image(data, p["fmt"])
        if p["fmt"] in ("png", "bmp"):
            assert np.array_equal(dec, pix)
        else:
            assert im.psnr(pix, dec) >= 40.0
        assert im.phash64(dec) is not None


def test_phash_neardup_property():
    p = synth.gen_profile(0)
    _, pix = synth.make_image(p)
    h1 = im.phash64(pix)
    noisy = pix.copy()
    noisy[::13, ::13] ^= 3  # tiny perturbation
    h2 = im.phash64(noisy)
    assert im.hamming64(h1, h2) <= 8
    other = synth.gen_profile(7)
    _, pix2 = synth.make_image(other)
    assert im.hamming64(h1, im.phash64(pix2)) > 8


def test_pairs_table(pages):
    pairs = synth.build_pairs_table(pages.slice(0, 6))
    assert pairs.schema.names == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ]
    cap = pairs.column("caption")[0].as_py()
    assert cap.startswith("{") and "all_wkn_entry" in cap
