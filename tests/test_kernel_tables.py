"""Direct unit tests for the Kapital-family table parsers the golden
fixture doesn't exercise (E21 branches: besondere Bezugsrechte,
Ermächtigung Aktienerwerb, ausgegebenes Kapital, Entwicklung des
Genußkapitals) plus grid-parser mechanics."""

from akf_cdparser_spark.kernel import tables
from akf_cdparser_spark.kernel.document import DocumentParser


def _grids(lines):
    seg = tables.recognize_table_arrays(lines)
    return (tables.create_parsed_tables(seg["tablesArr"]), seg["tablesArr"],
            seg["rest"], seg["infos"])


def test_grid_parser_colspan_and_padding():
    grid = tables.parse_html_table(
        "<table><tr><td>a</td><td>b</td><td>c</td></tr>"
        "<tr><td></td><td colspan=\"2\">span</td></tr>"
        "<tr><td>x</td></tr></table>")
    assert grid[0] == ["a", "", "x"]
    assert grid[1] == ["b", "span", ""]
    assert grid[2] == ["c", "", ""]


def test_bes_bezugsrechte():
    parsed, arr, rest, infos = _grids([
        "<table>",
        "<tr><td><b>Besondere Bezugsrechte</b></td><td></td></tr>",
        "<tr><td>1999</td><td>Optionsrechte Vorstand<br>aus dem Plan 1999</td></tr>",
        "<tr><td>2001</td><td>Wandelanleihe</td></tr>",
        "</table>",
    ])
    out = tables.parse_bes_bezugsrechte(parsed, arr, rest, infos, 0, None)
    assert out[0]["jahr"] == "1999"
    assert out[0]["bemerkungen"] == ["Optionsrechte Vorstand", "aus dem Plan 1999"]
    assert out[1]["jahr"] == "2001"


def test_erm_aktienerwerb():
    parsed, arr, rest, infos = _grids([
        "<table>",
        "<tr><td><b>Ermächtigung Aktienerwerb</b></td></tr>",
        "<tr><td>Gem. HV vom 1.1.2001<br>bis zu 10% des Grundkapitals</td></tr>",
        "</table>",
    ])
    out = tables.parse_erm_aktienerwerb(parsed, arr, rest, infos, 0, None)
    assert out["text"] == ["Gem. HV vom 1.1.2001", "bis zu 10% des Grundkapitals"]


def test_ausgegebenes_kapital():
    parsed, arr, rest, infos = _grids([
        "<table>",
        "<tr><td><b>Ausgegebenes Kapital</b></td><td><b>EUR 1 000 000,00</b></td></tr>",
        "<tr><td>Stückelung: 1 000 000 Stückaktien Stimmrecht: je Aktie 1</td>"
        "<td></td></tr>",
        "</table>",
    ])
    out = tables.parse_ausgegebenes_kapital(parsed, arr, rest, infos, 0)
    entries = out["eintraege"]
    assert entries[0]["betrag"] == "EUR 1 000 000,00"
    assert any(e.get("stueckelung") for e in entries)


def test_entwicklung_genus_kapital():
    parsed, arr, rest, infos = _grids([
        "<table>",
        "<tr><td>1998</td><td>Ausgabe von Genußscheinen</td></tr>",
        "<tr><td></td><td>Gem. Beschluss</td></tr>",
        "</table>",
    ])
    out = tables.parse_entwicklung_genus_kapital(parsed, 0)
    assert {"jahr": "1998", "text": "Ausgabe von Genußscheinen"} in out
    assert {"text": "Gem. Beschluss"} in out


def test_kapital_dispatch_with_genus_and_bezugsrechte():
    """Full dispatch path: a Kapital segment containing Genußkapital and
    Bezugsrechte tables routes each to its parser."""
    doc = "\n".join([
        "<html>", "<head>", "</head>", "<body>", "", "x",
        '<td align="center"><b>Tätigkeitsgebiet/Gründung</b></td>',
        "Aktivität<br>",
        "<br><center></center>",
        "<b>Kapitalentwicklung seit 1990</b>",
        "<table>",
        '<tr><td><b>Derzeitiges Grundkapital</b></td><td><b>EUR 5 000 000,00</b></td></tr>',
        "</table>",
        "<table>",
        "<tr><td><b>Besondere Bezugsrechte</b></td><td></td></tr>",
        "<tr><td>2000</td><td>Optionsplan</td></tr>",
        "</table>",
        "<table>",
        "<tr><td><b>Ermächtigung Aktienerwerb</b></td></tr>",
        "<tr><td>Gem. HV 2002</td></tr>",
        "</table>",
        "<br><center><h5><table><tr>",
        "</body>", "</html>"])
    rec = DocumentParser().parse(doc)
    assert rec["grundkapital"]["betrag"] == "EUR 5 000 000,00"
    assert rec["besBezugsrechte"][0]["jahr"] == "2000"
    assert rec["ermächtigungAktienerwerb"]["text"] == ["Gem. HV 2002"]


def test_headline_table_sanitation():
    """T4: an unclassified table following a one-row classified table takes
    over the classification index (lib/parser.js:1271-1296)."""
    doc = "\n".join([
        "<html>", "<head>", "</head>", "<body>", "", "x",
        '<td align="center"><b>Tätigkeitsgebiet/Gründung</b></td>',
        "Aktivität<br>",
        "<br><center></center>",
        "<b>Kapitalentwicklung seit 1990</b>",
        "<table>",
        '<tr><td><b>Genehmigtes Kapital</b></td></tr>',   # headline-only table
        "</table>",
        "<table>",
        "<tr><td>Gem. HV vom 1.1.2003</td><td><b>EUR 2 000 000,00</b></td></tr>",
        "</table>",
        "<br><center><h5><table><tr>",
        "</body>", "</html>"])
    rec = DocumentParser().parse(doc)
    # sanitation re-points genehmKapitalIndex at the follow-up table
    assert rec.get("genehmigtesKapital") is not None
