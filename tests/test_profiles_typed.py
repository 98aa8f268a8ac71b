"""Typed nested profile view: the FIXTURES.md §3 closed schema lifted from
record_json with one from_json — values must match the kernel's output."""

from pyspark.sql import functions as F

from akf_cdparser_spark.operators import extract as X
from akf_cdparser_spark.operators.profiles import profiles_typed


def test_profiles_typed_values(spark):
    recs = X.extract_records(X.docs_dataframe(spark, 24))
    typed = profiles_typed(recs).cache()
    assert typed.count() == 24
    row = typed.filter(F.col("doc_id") == "1999/0000").head()
    assert row.name == "Adler 0000 International AG"
    assert row.status == "Insolvenz"
    assert row.Sitz[0].city == "Plochingen"
    assert row.aufsichtsrat[0].funct == "Vors."
    assert row.grundkapital.betrag.startswith("EUR")
    bb = row.boersenbewertung["boersenbewertung1"]
    assert bb.kurse[0].jahr in ("1999", "2000")
    # doc 0 is multi-exchange (i%5==0): its Kennzahlen section follows the
    # second listing head, so the occurrence counter keys it boersenbewertung2
    bb2 = row.boersenbewertung["boersenbewertung2"]
    assert bb2.kennzahlen is not None
    assert "Konzern" in bb2.kennzahlen
    assert row.ausBilanzen[0].waehrung == "in TEUR"
    # nested dynamic map: kennzahlen rows are map<string,string>
    konzern_rows = bb2.kennzahlen["Konzern"]
    assert any("jahr" in m for m in konzern_rows)
    typed.unpersist()


def test_profiles_typed_schema_stable(spark):
    recs = X.extract_records(X.docs_dataframe(spark, 4))
    typed = profiles_typed(recs)
    names = set(typed.columns)
    assert {"doc_id", "name", "Sitz", "boersenbewertung", "kapitalEntwicklung",
            "ausBilanzen", "sonstigeAngaben", "_fulltext"} <= names
