"""Golden-fixture tests for the profile parser (SURVEY.md §5).

Mirrors the reference's own end-to-end assertions
(/root/reference/test/parser.test.js:10-24: city == 'Plochingen',
email.length == 2) plus deeper section checks, running against the
reference's golden page when available.
"""

import os

import pytest

from akf_cdparser_ray.parsing.profile_parser import parse_profile
from akf_cdparser_ray.parsing import validator

FIXTURE = "/root/reference/test/fixtures/html/2005/0003.html.utf8.html"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not available"
)


@pytest.fixture(scope="module")
def profile():
    with open(FIXTURE, encoding="utf-8") as f:
        return parse_profile(f.read())


def test_reference_assertions(profile):
    # ref test/parser.test.js:13-14
    assert profile["Sitz"][0]["city"] == "Plochingen"
    assert len(profile["Sitz"][0]["email"]) == 2


def test_header(profile):
    assert profile["name"] == "4MBO International Electronic AG"
    assert profile["all_wkn_entry"] == [
        {
            "type": "Inhaber-Stammaktien",
            "isin": "DE0005487805",
            "wkn": "548780",
            "nw": "1,00 EUR (rechnerisch)",
        }
    ]


def test_sitz_details(profile):
    sitz = profile["Sitz"][0]
    assert sitz["street"] == "Fabrikstr."
    assert sitz["street_number"] == "45"
    assert sitz["zip"] == "73207"
    assert sitz["phone"] == "(07153) 6 63-0"
    assert sitz["email"][0] == "info@4mbo.de"


def test_established_year(profile):
    assert profile["established_year"] == 1970


def test_aufsichtsrat(profile):
    ar = profile["aufsichtsrat"]
    assert ar[0]["title"] == "Dr."
    assert ar[0]["lastName"] == "Kubis"
    assert ar[0]["funct"] == "Vors."
    assert ar[1]["funct"] == "stellv. Vors."
    assert ar[2]["lastName"] == "Speiser"


def test_vorstand(profile):
    flat = profile["vorstand"][0]
    assert flat[0]["lastName"] == "Eichinger"
    assert flat[1]["lastName"] == "Klein"
    assert flat[1]["cityAcc"] == "Plochingen"


def test_organbezuege(profile):
    ob = profile["organbezuege"][0]
    assert ob[0] == {"jahr": "2002", "organ": "Vorstand", "bezuege": "TEUR 623"}
    assert ob[1] == {"jahr": "2002", "organ": "Aufsichtsrat", "bezuege": "TEUR 26"}


def test_gesellschafter_aktionaere(profile):
    ak = profile["gesellschafter"]["aktionaere"]
    assert ak[0]["anteil"] == "7,33%"
    assert ak[1]["bemerkungen"] == ["Anteilseigner: Christof Klein, Plochingen, 100%"]
    assert ak[3]["name"] == "Streubesitz"
    assert ak[3]["anteil"] == "84,33%"


def test_kapitalentwicklung(profile):
    ke = profile["kapitalEntwicklung"]
    assert ke[0]["jahr"] == "1999"
    assert ke[0]["eintraege"][0]["art"] == "Gründungskapital"
    assert ke[0]["eintraege"][0]["betrag"] == "DM 1 000 000,00"
    assert ke[0]["eintraege"][0]["text"] == "der AG"
    assert ke[1]["jahr"] == "2000"
    assert len(ke[1]["eintraege"]) == 5


def test_grundkapital_stueckelung_stimmrecht(profile):
    assert profile["grundkapital"]["betrag"] == "EUR 6 000 000,00"
    assert profile["stückelung"] == ["6 000 000 Stückaktien o.N."]
    assert profile["stimmrecht"] == [" Je Stückaktie = 1 Stimme"]


def test_genehm_beding_kapital(profile):
    assert profile["genehmigtesKapital"]["genehmKapital"]["betrag"] == "EUR 3 000 000,00"
    bk = profile["bedingtesKapital"]["bedingkapital"]
    assert bk["betrag"] == "EUR 400 000,00"
    # the reference keeps the JS-null betrag_einzel key (bkItem ctor)
    assert {"betrag_einzel": None, "bemerkung": "Aktienoptionsplan"} in bk["eintraege"]


def test_boersenbewertung(profile):
    b1 = profile["boersenbewertung"]["boersenbewertung1"]
    assert b1["wkns"][0]["nummer"] == "548780"
    assert b1["isins"][0]["nummer"] == "DE0005487805"
    assert any("Geregelter Markt Frankfurt" in n for n in b1["notizen_kennzahlen"])


def test_kurse(profile):
    kurse = profile["boersenbewertung"]["boersenbewertung1"]["kurse"]
    by_year = {k["jahr"]: k for k in kurse}
    assert by_year["2000"]["hoechst"] == "39,50"
    assert by_year["2005"]["kommentar"] == "bis 12.07."
    assert by_year["2001"]["ultimo"] == "5,40"
    assert len(kurse) == 6


def test_dividenden(profile):
    div = profile["boersenbewertung"]["boersenbewertung1"]["dividenden"]
    assert div[0] == {"jahr": "2000", "dividende": "eur 0", "bonus": "-", "extag": "12.06.01"}
    assert len(div) == 3


def test_kennzahlen_dynamic_keys(profile):
    kz = profile["boersenbewertung"]["boersenbewertung1"]["kennzahlen"]
    konzern = kz["Konzern"]
    assert konzern[0]["Investitionen (Mio EUR)"] == "2,6"
    assert konzern[2]["jahr"] == "2002\xa0i)"
    besch = kz["Beschäftigte"]
    assert besch[2]["GJ-Ende"] == "141"


def test_aus_bilanzen_column_ids(profile):
    ab = profile["ausBilanzen"][0]
    assert ab["waehrung"] == "in TEUR"
    aktiva = ab["ausBilanzen"]["Aktiva"]
    ags = [a for a in aktiva if a.get("columnId") == "AG"]
    konzern = [a for a in aktiva if a.get("columnId") == "Konzern"]
    assert ags[0]["anlagevermögen"] == "3\xa0328"
    assert konzern[1]["vorräte"] == "32\xa0773"


def test_guv(profile):
    guv = profile["ausGewinnUndVerlust"][0]["ausGewinnUndVerlustRechnung"]
    assert guv[0]["umsatz"] == "192\xa0568"
    assert guv[0]["columnId"] == "AG"
    assert guv[3]["jahr"] == "2002\xa0i)"


def test_validator_negative():
    ok, errors = validator.validate({"wkn": 548780})
    assert ok
    ok, errors = validator.validate({})
    assert not ok  # ref test/parser.test.js:20-21 (delete wkn → invalid)


def test_subtraction_residue(profile):
    # coverage-by-subtraction (ref lib/validator.js:46-58): most of the page
    # content must be consumed by parsed values
    ratio = validator.coverage_ratio(profile)
    assert ratio > 0.65, f"coverage only {ratio:.2f}"


def test_schema_validator_ajv_verdicts():
    """Full schema.yml parity (ref lib/validator.js:38-43, schema.yml:1-76,
    test/parser.test.js:13-23): a conforming flat record validates; deleting
    wkn fails (the reference test's negative case); every constraint class
    fires exactly as ajv v4 would judge it."""
    flat = {
        "_fulltext": "x",
        "wkn": 548780,
        "isin": "DE0005487807",
        "email": ["info@example.de", "ir@example.de"],
        "www": ["http://www.example.de"],
        "street": "Musterweg",
        "street_number": "7a",
        "city": "Plochingen",
        "zip": "73207",
        "activity_description": "desc",
        "established_year": 1905,
        "status": "Insolvenz eröffnet",
        "phone": "(07153) 71-0",
        "fax": "(07153) 71-221",
        "aufsichtsrat": [{"firstName": "Hans", "lastName": "Muster", "funct": "Vors."}],
        "vorstand": [{"firstName": "Eva", "lastName": "Beispiel"}],
        "employee_stats": [],
    }
    ok, errors = validator.validate_schema(flat)
    assert ok, errors

    # the reference test's delete-wkn negative case
    no_wkn = dict(flat)
    del no_wkn["wkn"]
    ok, errors = validator.validate_schema(no_wkn)
    assert not ok and any("required property 'wkn'" in e for e in errors)

    # quirk corpus: one mutation per constraint class, each must fail
    quirks = {
        "wkn_string": ({**flat, "wkn": "548780"}, "should be number"),
        "extra_prop": ({**flat, "Sitz": []}, "additional property"),
        "zip_short": ({**flat, "zip": "1234"}, "pattern"),
        "phone_chars": ({**flat, "phone": "07153/71-0x"}, "pattern"),
        "street_number": ({**flat, "street_number": "a7"}, "pattern"),
        "status_pattern": ({**flat, "status": "in Liquidation"}, "pattern"),
        "bad_email": ({**flat, "email": ["not an email"]}, "format"),
        "bad_uri": ({**flat, "www": ["www.example.de"]}, "format 'uri'"),
        "funct_enum": (
            {**flat, "vorstand": [{"firstName": "E", "lastName": "B", "funct": "Mitglied"}]},
            "not in enum",
        ),
        "manager_missing_last": (
            {**flat, "aufsichtsrat": [{"firstName": "Hans"}]},
            "required property 'lastName'",
        ),
        "manager_extra_prop": (
            {**flat, "aufsichtsrat": [{"firstName": "H", "lastName": "M", "cityAcc": []}]},
            "additional property",
        ),
        "email_not_array": ({**flat, "email": "info@example.de"}, "should be array"),
    }
    for name, (record, needle) in quirks.items():
        ok, errors = validator.validate_schema(record)
        assert not ok, name
        assert any(needle in e for e in errors), (name, errors)

    # ajv pattern semantics are unanchored search: zip inside a longer string
    # still matches (\d{5} has no anchors)
    ok, _ = validator.validate_schema({**flat, "zip": "D-73207 Plochingen"})
    assert ok

    # the funct enum pattern's '.' is a regex any-char (faithful quirk):
    # 'VorsX' matches '^(?:Vors.|stellv. Vors.)$'
    ok, _ = validator.validate_schema(
        {**flat, "vorstand": [{"firstName": "E", "lastName": "B", "funct": "VorsX"}]}
    )
    assert ok

    # the current parser's nested golden-fixture output is INVALID under the
    # strict schema (legacy flat layout; validator.js is self-deprecated) —
    # exactly ajv's verdict: unknown section keys + missing top-level wkn
    html = open(
        "/root/reference/test/fixtures/html/2005/0003.html.utf8.html", encoding="utf-8"
    ).read()
    profile = parse_profile(html)
    ok, errors = validator.validate_schema(profile)
    assert not ok
    assert any("additional property 'Sitz'" in e for e in errors)
    assert any("required property 'wkn'" in e for e in errors)

    # engine-mode validate: same constraints, additionalProperties relaxed —
    # with wkn surfaced from all_wkn_entry, the ONLY remaining violations on
    # the golden parse are the vorstand functs outside the schema's enum
    # ('Verwaltung Vertrieb Finanzen', …) — exactly what ajv would flag
    data = dict(profile)
    data["wkn"] = int(profile["all_wkn_entry"][0]["wkn"])
    ok, errors = validator.validate(data)
    assert not ok
    assert errors and all("not in enum" in e and e.startswith("vorstand") for e in errors)


def test_package_public_api():
    """The library surface mirroring the reference's index.js exports
    (parse / validate / json2sql) works without any Ray session."""
    import akf_cdparser_ray as akf

    html = open(
        "/root/reference/test/fixtures/html/2005/0003.html.utf8.html",
        encoding="utf-8",
    ).read()
    profile = akf.parse(html)
    assert profile["name"] == "4MBO International Electronic AG"
    profile2, rows = akf.parse(html, with_audit=True)
    assert profile2 == profile and len(rows) > 30
    ok, _ = akf.validate({"wkn": 548780})
    assert ok
    ok, errs = akf.validate(profile, strict=True)
    assert not ok  # nested layout vs the legacy flat schema (ajv verdict)
    assert akf.json2sql(profile).startswith('INSERT INTO "Aufsichtsrat"')
