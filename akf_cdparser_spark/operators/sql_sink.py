"""S8 — the deprecated json2sql converter twin (ref lib/converter.js:27-42).

The reference's ``AkfConverter.json2sql`` emits one ``INSERT INTO
"Aufsichtsrat"`` statement per supervisory-board member. Quirks preserved:

* ``_escapeQuote`` uses JS ``String.replace`` with a string pattern, which
  replaces only the FIRST quote (ref :8-10) — mirrored with an
  instr/substring splice, not a global regexp_replace;
* ``manager.city`` / ``manager.rank`` do not exist on the parsed manager
  objects (the converter predates the cityAcc/funct schema), so those two
  columns are always ``NULL`` (undefined -> 'NULL', ref :14-16);
* absent fields (the kernel omits keys it didn't parse, e.g. ``title`` or
  ``wkn``) are undefined -> ``NULL``; present strings are single-quoted;
* the trailing constants are the literal ``'---'`` and the number ``0``,
  and every statement ends with ``;\n``.

Everything is built from ``pyspark.sql.functions`` string expressions —
whole-stage codegen, no Python in the pipeline. The per-doc ``sql`` column
concatenates the member statements in array order, matching the string the
reference returns per profil.

Golden lock: tests/test_sql_sink.py runs the reference converter itself
(lib/converter.js has no external dependencies) under Node on the kernel's
own records and compares byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quote(col) -> F.Column:
    """JS value rendering: undefined/null -> NULL, string -> '<escaped>'
    with only the FIRST quote escaped (ref :8-10)."""
    c = F.col(col) if isinstance(col, str) else col
    pos = F.instr(c, "'")
    escaped = F.when(
        pos > 0,
        F.concat(c.substr(F.lit(1), (pos - 1).cast("int")), F.lit("\\'"),
                 c.substr((pos + 1).cast("int"), F.length(c))))\
        .otherwise(c)
    return F.when(c.isNull(), F.lit("NULL")) \
        .otherwise(F.concat(F.lit("'"), escaped, F.lit("'")))


def aufsichtsrat_inserts(records: DataFrame,
                         use_derived_wkn: bool = False) -> DataFrame:
    """One row per (doc, member): (doc_id, seat, stmt).

    ``profil.wkn`` is VESTIGIAL in the reference: no parser code ever sets a
    top-level wkn (the numbers live in ``all_wkn_entry`` /
    ``boersenbewertung.wkns``), so the converter always renders NULL there —
    mirrored by default. ``use_derived_wkn=True`` substitutes this engine's
    derived ``wkn`` column for a useful (non-parity) variant."""
    wkn = F.col("wkn") if use_derived_wkn else F.lit(None).cast("string")
    m = (records
         .select("doc_id", wkn.alias("_wkn"),
                 F.posexplode("aufsichtsrat").alias("seat", "m")))
    stmt = F.concat(
        F.lit('INSERT INTO "Aufsichtsrat" VALUES('),
        _quote("_wkn"), F.lit(", "),
        _quote(F.col("m.lastName")), F.lit(", "),
        _quote(F.col("m.firstName")), F.lit(", "),
        _quote(F.col("m.title")), F.lit(", "),
        F.lit("NULL, NULL, '---', 0);\n"))
    return m.select("doc_id", "seat", stmt.alias("stmt"))


def json2sql(records: DataFrame) -> DataFrame:
    """Per-doc concatenated INSERT script — the converter's return value.
    Docs without an aufsichtsrat list yield '' exactly like the reference
    (the forEach never runs)."""
    per_member = aufsichtsrat_inserts(records)
    agg = (per_member.groupBy("doc_id")
           .agg(F.concat_ws("", F.array_sort(
               F.collect_list(F.struct("seat", "stmt")))
               .getField("stmt")).alias("sql")))
    return (records.select("doc_id")
            .join(agg, "doc_id", "left")
            .select("doc_id", F.coalesce("sql", F.lit("")).alias("sql")))
