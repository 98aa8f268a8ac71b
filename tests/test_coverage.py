"""A4 validator coverage diff (ref lib/validator.js:21-58) unit tests."""

from akf_cdparser_spark import fixtures
from akf_cdparser_spark.kernel import coverage, parse_document


def test_leaf_nodes_recursive():
    # lib/utils.js:58-67 semantics: every scalar leaf, depth-first
    data = {"a": 1, "b": {"c": ["x", {"d": "y"}]}, "e": None}
    assert coverage.leaf_nodes(data) == [1, "x", "y"]


def test_unparsed_subtracts_leaves_and_predefined():
    rec = {
        "_fulltext": "Status aktiv Telefon 0711 12 Unerkannter Resttext",
        "status": "aktiv",
        "nested": {"phone": "0711 12"},
    }
    remaining = coverage.unparsed_text(rec)
    assert "aktiv" not in remaining
    assert "0711 12" not in remaining
    # predefined labels struck with '*' filler
    assert "status" not in remaining and "telefon" not in remaining
    assert "unerkannter resttext" in remaining
    unparsed, total = coverage.coverage_stats(rec)
    assert unparsed == len("unerkannterresttext")
    assert total == len("statusaktivtelefon071112unerkannterresttext")


def test_synthetic_corpus_mostly_parsed():
    # every extractor fires on its variant -> the bulk of each doc's text is
    # consumed; the remainder is markup/labels, bounded well below half
    for i in (0, 2, 5, 7, 9, 13):
        rec, _, _ = parse_document(fixtures.synth_html(i, 40))
        unparsed, total = coverage.coverage_stats(rec)
        assert total > 0
        assert unparsed / total < 0.5, (i, unparsed, total)


def test_coverage_deterministic():
    rec, _, _ = parse_document(fixtures.synth_html(3, 40))
    assert coverage.coverage_stats(rec) == coverage.coverage_stats(rec)
