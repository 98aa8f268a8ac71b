"""Schema-validation twin of the reference's Ajv validator (A4's sibling).

Re-expresses the JSON-Schema pass/fail half of ``lib/validator.js:38-65``
(compiling ``schema.yml``; exercised by ``test/parser.test.js:19-21``: the
golden fixture validates true, deleting ``wkn`` flips it to false) as a
pure-built-in Spark operator over the extracted records: one ``from_json``
into the typed profile, then higher-order-function rule checks — no Python
in the hot path, the errors channel is an ``array<string>`` column.

Adaptation notes (the reference marks the tool DEPRECATED and its flat
``schema.yml`` predates the kombined parser's nested record shape, so the
enforced subset is mapped onto today's records):

* ``required: [wkn]`` / ``wkn: {type: number}`` — the kombined record
  carries WKNs in ``all_wkn_entry[].wkn``; required = at least one entry
  with a numeric wkn, and every non-empty wkn must be all digits;
* ``definitions.Manager`` (required firstName+lastName) — applied to every
  member of ``aufsichtsrat``, flattened ``vorstand`` and ``geschleitung``;
* ``Manager.funct`` pattern ``^(?:Vors.|stellv. Vors.)$`` — enforced on
  the AUFSICHTSRAT board only: the kombined parser stores free-text
  responsibilities in vorstand members' ``funct`` (e.g. "Marketing und
  Vertrieb" in the golden fixture), which the deprecated schema never saw;
* address patterns (``zip`` ~ ``\\d{5}``, ``street_number`` ~ ``^\\d.*``,
  ``phone``/``fax`` ~ ``^[0-9()\\-\\s]+$``) — applied per ``Sitz`` entry;
* ``status`` pattern ``Insolvenz`` (unanchored, Ajv semantics: must
  CONTAIN) and ``established_year: number`` (raw-JSON type check via
  ``get_json_object`` — ``from_json`` alone would silently null a
  mistyped value) — top-level as in the schema.

Scale shape: one JSON parse + codegen'd expressions per row; errors are
built with transform/filter/flatten — no explode, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .profiles import PROFILE_SCHEMA

# schema.yml definitions.Manager.funct pattern, VERBATIM (schema.yml:20).
# The dots are unescaped in the reference, so Ajv accepts e.g. "Vorsx" or
# "stellv, Vors," — the twin must too (ADVICE r4: escaping them silently
# tightened the contract). Java regex treats the unescaped dot identically.
FUNCT_RE = r"^(?:Vors.|stellv. Vors.)$"
# schema.yml phone/fax pattern, anchored as written there
PHONE_RE = r"^[0-9\(\)\-\s]+$"


def _empty() -> F.Column:
    return F.array().cast("array<string>")


def _flag(cond: F.Column, msg: str) -> F.Column:
    return F.when(cond, F.array(F.lit(msg))).otherwise(_empty())


def _manager_errors(arr: F.Column, board: str) -> F.Column:
    """Per-member required-field errors for one Manager array."""
    checks = F.transform(
        arr,
        lambda m, i: F.concat_ws(
            "; ",
            F.when(F.length(F.coalesce(m["lastName"], F.lit(""))) == 0,
                   F.concat(F.lit(f"{board}["), i.cast("string"),
                            F.lit("]: required lastName"))),
            F.when(F.length(F.coalesce(m["firstName"], F.lit(""))) == 0,
                   F.concat(F.lit(f"{board}["), i.cast("string"),
                            F.lit("]: required firstName"))),
        ))
    return F.filter(F.coalesce(checks, _empty()), lambda e: F.length(e) > 0)


def validate_profiles(records: DataFrame) -> DataFrame:
    """records (``doc_id``, ``record_json``) -> (``doc_id``, ``valid``,
    ``errors``). ``valid`` mirrors ``validator.validate(profile)``; the
    errors array mirrors the ``errors`` getter (``lib/validator.js:68-74``,
    messages simplified to rule identifiers)."""
    df = records.select(
        "doc_id", "record_json",
        F.from_json("record_json", PROFILE_SCHEMA).alias("p"))
    p = F.col("p")

    wkns = F.coalesce(p["all_wkn_entry"],
                      F.array().cast(PROFILE_SCHEMA["all_wkn_entry"].dataType))
    numeric_wkns = F.filter(
        wkns, lambda e: F.coalesce(e["wkn"], F.lit("")).rlike(r"^\d+$"))
    bad_wkns = F.filter(
        wkns, lambda e: (F.length(F.coalesce(e["wkn"], F.lit(""))) > 0)
        & ~e["wkn"].rlike(r"^\d+$"))

    vorstand_flat = F.flatten(F.coalesce(
        p["vorstand"], F.array().cast(PROFILE_SCHEMA["vorstand"].dataType)))
    aufsichtsrat = F.coalesce(
        p["aufsichtsrat"],
        F.array().cast(PROFILE_SCHEMA["aufsichtsrat"].dataType))
    geschleitung = F.coalesce(
        p["geschleitung"],
        F.array().cast(PROFILE_SCHEMA["geschleitung"].dataType))

    funct_errs = F.filter(
        F.transform(
            aufsichtsrat,
            lambda m, i: F.when(
                (F.length(F.coalesce(m["funct"], F.lit(""))) > 0)
                & ~m["funct"].rlike(FUNCT_RE),
                F.concat(F.lit("aufsichtsrat["), i.cast("string"),
                         F.lit("]: funct pattern")))),
        lambda e: e.isNotNull())

    sitz = F.coalesce(p["Sitz"],
                      F.array().cast(PROFILE_SCHEMA["Sitz"].dataType))

    def sitz_rule(field: str, pattern: str, anchored_msg: str) -> F.Column:
        return F.filter(
            F.transform(
                sitz,
                lambda s, i: F.when(
                    (F.length(F.coalesce(s[field], F.lit(""))) > 0)
                    & ~s[field].rlike(pattern),
                    F.concat(F.lit(f"Sitz["), i.cast("string"),
                             F.lit(f"]: {anchored_msg}")))),
            lambda e: e.isNotNull())

    raw_year = F.get_json_object("record_json", "$.established_year")
    status = p["status"]

    errors = F.concat(
        _flag(F.size(numeric_wkns) == 0, "required: wkn"),
        F.transform(bad_wkns, lambda e: F.concat(
            F.lit("wkn: not a number: "), e["wkn"])),
        _manager_errors(aufsichtsrat, "aufsichtsrat"),
        _manager_errors(vorstand_flat, "vorstand"),
        _manager_errors(geschleitung, "geschleitung"),
        funct_errs,
        sitz_rule("zip", r"\d{5}", "zip pattern"),
        sitz_rule("street_number", r"^\d", "street_number pattern"),
        sitz_rule("phone", PHONE_RE, "phone pattern"),
        sitz_rule("fax", PHONE_RE, "fax pattern"),
        _flag(raw_year.isNotNull() & ~raw_year.rlike(r"^-?\d+$"),
              "type: established_year must be number"),
        _flag(status.isNotNull() & ~status.contains("Insolvenz"),
              "status pattern"),
    )
    return df.select("doc_id", (F.size(errors) == 0).alias("valid"),
                     errors.alias("errors"))


def validation_errors(validated: DataFrame) -> DataFrame:
    """The errors CHANNEL: one row per violation (doc_id, error) — the
    shape a pipeline routes to a quarantine sink."""
    return (validated.filter(~F.col("valid"))
            .select("doc_id", F.explode("errors").alias("error")))
