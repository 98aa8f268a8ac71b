"""Typed nested profile view (FIXTURES.md §3).

``extract_records`` carries the full dynamic record as JSON plus hot
columns; this module lifts it into the closed-schema nested StructType the
output contract specifies — arrays of Manager structs, the
``boersenbewertung`` map keyed ``boersenbewertungN``, the data-dependent
``kennzahlen`` map<string, array<map<string,string>>> — via a single
``from_json`` (JVM-side, no second parse in Python). Dynamic-presence
fields are nullable; keys absent from a record stay null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MANAGER = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("firstName", T.StringType()),
    T.StructField("lastName", T.StringType()),
    T.StructField("cityAcc", T.StringType()),
    T.StructField("funct", T.StringType()),
    T.StructField("bemerkung", T.StringType()),
])

_SITZ = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("street", T.StringType()),
    T.StructField("street_number", T.StringType()),
    T.StructField("zip", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("POBox", T.StringType()),
    T.StructField("zipPOBox", T.StringType()),
    T.StructField("cityPOBox", T.StringType()),
    T.StructField("phone", T.StringType()),
    T.StructField("fax", T.StringType()),
    T.StructField("email", T.ArrayType(T.StringType())),
    T.StructField("www", T.ArrayType(T.StringType())),
    T.StructField("tonline", T.ArrayType(T.StringType())),
    T.StructField("origpost", T.StringType()),
])

_KURS = T.StructType([
    T.StructField("jahr", T.StringType()),
    T.StructField("hoechst", T.StringType()),
    T.StructField("tiefst", T.StringType()),
    T.StructField("ultimo", T.StringType()),
    T.StructField("kommentar", T.StringType()),
])

_DIVIDENDE = T.StructType([
    T.StructField("jahr", T.StringType()),
    T.StructField("dividende", T.StringType()),
    T.StructField("bonus", T.StringType()),
    T.StructField("sonderausschuettung", T.StringType()),
    T.StructField("steuerguthaben", T.StringType()),
    T.StructField("divscheinnr", T.StringType()),
    T.StructField("extag", T.StringType()),
    T.StructField("kupon_nr", T.StringType()),
])

_NUMMER = T.StructType([
    T.StructField("nummer", T.StringType()),
    T.StructField("aktienart", T.StringType()),
])

_KENNZAHLEN = T.MapType(
    T.StringType(),
    T.ArrayType(T.MapType(T.StringType(), T.StringType())))

_BOERSE = T.StructType([
    T.StructField("wkns", T.ArrayType(_NUMMER)),
    T.StructField("isins", T.ArrayType(_NUMMER)),
    T.StructField("marktbetreuer", T.ArrayType(T.StringType())),
    T.StructField("notizen_kennzahlen", T.ArrayType(T.StringType())),
    T.StructField("bemerkungen", T.ArrayType(T.StringType())),
    T.StructField("notiz_bereinigteKurse", T.StringType()),
    T.StructField("kurse", T.ArrayType(_KURS)),
    T.StructField("dividenden", T.ArrayType(_DIVIDENDE)),
    T.StructField("dividenden_notiz", T.StringType()),
    T.StructField("dividenden_bemerkungen", T.ArrayType(T.StringType())),
    T.StructField("ergebnisabfuehrung", T.ArrayType(T.StructType([
        T.StructField("jahr", T.StringType()),
        T.StructField("betrag", T.StringType()),
    ]))),
    T.StructField("kennzahlen", _KENNZAHLEN),
    T.StructField("waehrungsinfo", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("waehrung", T.StringType()),
        T.StructField("eintraege", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("waehrung", T.StringType()),
            T.StructField("index", T.IntegerType()),
        ]))),
    ]))),
    T.StructField("notizen", T.ArrayType(T.StringType())),
])

_BILANZ = T.StructType([
    T.StructField("waehrung", T.StringType()),
    T.StructField("notizen", T.ArrayType(T.StringType())),
    T.StructField("ausBilanzen", _KENNZAHLEN),
])

_GUV = T.StructType([
    T.StructField("waehrung", T.StringType()),
    T.StructField("notizen", T.ArrayType(T.StringType())),
    T.StructField("ausGewinnUndVerlustRechnung",
                  T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
])

PROFILE_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("all_wkn_entry", T.ArrayType(T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("isin", T.StringType()),
        T.StructField("wkn", T.StringType()),
        T.StructField("nw", T.StringType()),
    ]))),
    T.StructField("Sitz", T.ArrayType(_SITZ)),
    T.StructField("activity_description", T.StringType()),
    T.StructField("established_year", T.IntegerType()),
    T.StructField("established_year_bemerkungen", T.ArrayType(T.StringType())),
    T.StructField("status", T.StringType()),
    T.StructField("aufsichtsrat", T.ArrayType(_MANAGER)),
    T.StructField("vorstand", T.ArrayType(T.ArrayType(_MANAGER))),
    T.StructField("geschleitung", T.ArrayType(_MANAGER)),
    T.StructField("organbezuege", T.ArrayType(T.ArrayType(T.StructType([
        T.StructField("jahr", T.StringType()),
        T.StructField("organ", T.StringType()),
        T.StructField("bezuege", T.StringType()),
        T.StructField("bemerkung", T.StringType()),
    ])))),
    T.StructField("aktionaer", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("ort", T.StringType()),
        T.StructField("anteil", T.StringType()),
        T.StructField("bemerkungen", T.ArrayType(T.StringType())),
    ]))),
    T.StructField("anteilsEigner", T.ArrayType(T.StructType([
        T.StructField("eigner", T.StringType()),
        T.StructField("anteil", T.StringType()),
        T.StructField("bemerkung", T.StringType()),
    ]))),
    T.StructField("beteiligungen", T.ArrayType(T.StructType([
        T.StructField("ueberschrift", T.StringType()),
        T.StructField("zeilen", T.ArrayType(T.StructType([
            T.StructField("beteiliger", T.StringType()),
            T.StructField("ort", T.StringType()),
            T.StructField("anteil", T.StringType()),
            T.StructField("bemerkung", T.StringType()),
        ]))),
    ]))),
    T.StructField("unternehmensVertraege", T.ArrayType(T.StringType())),
    T.StructField("kapitalEntwicklung", T.ArrayType(T.StructType([
        T.StructField("jahr", T.StringType()),
        T.StructField("eintraege", T.ArrayType(T.StructType([
            T.StructField("art", T.StringType()),
            T.StructField("betrag", T.StringType()),
            T.StructField("text", T.StringType()),
        ]))),
    ]))),
    T.StructField("grundkapital", T.StructType([
        T.StructField("betrag", T.StringType()),
        T.StructField("bemerkungen",
                      T.ArrayType(T.ArrayType(T.StringType()))),
    ])),
    T.StructField("stimmrecht", T.ArrayType(T.StringType())),
    T.StructField("stückelung", T.ArrayType(T.StringType())),
    T.StructField("genehmigtesKapital", T.StructType([
        T.StructField("betrag", T.StringType()),
        T.StructField("bemerkung", T.StringType()),
    ])),
    T.StructField("bedingtesKapital", T.StructType([
        T.StructField("betrag", T.StringType()),
        T.StructField("eintraege", T.ArrayType(T.StructType([
            T.StructField("betrag_einzel", T.StringType()),
            T.StructField("bemerkung", T.StringType()),
        ]))),
    ])),
    T.StructField("boersenbewertung", T.MapType(T.StringType(), _BOERSE)),
    T.StructField("ausBilanzen", T.ArrayType(_BILANZ)),
    T.StructField("ausGewinnUndVerlust", T.ArrayType(_GUV)),
    T.StructField("sonstigeAngaben",
                  T.ArrayType(T.ArrayType(T.StringType()))),
    T.StructField("_fulltext", T.StringType()),
])


def profiles_typed(records: DataFrame) -> DataFrame:
    """records (from extract_records) -> one fully-typed nested row per doc
    per FIXTURES.md §3. One JVM-side from_json; no Python re-parse."""
    return records.select(
        "doc_id",
        F.from_json("record_json", PROFILE_SCHEMA).alias("p"),
    ).select("doc_id", "p.*")
