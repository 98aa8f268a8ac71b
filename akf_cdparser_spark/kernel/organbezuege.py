"""Board-remuneration extraction (SURVEY.md §2 E11).

Re-expresses lib/parser_organbezuege.js: one-year vs per-entry-year modes,
currency-token (TDM|DM|TEUR|EUR) splitting, non-currency lines -> bemerkung.
"""

from __future__ import annotations

import re

from . import textops

_RE_CURRENCY = re.compile(r"(TDM)|(DM)|(TEUR)|(EUR)")
_RE_YEAR_ANY = re.compile(r"\d{4}")
_RE_YEAR_SPAN = re.compile(r"\d{4}(/\d\d)*")


def parse_organbezuege(organbezuege: str) -> list[dict]:
    """``2002: Vorstand TEUR 623; Aufsichtsrat TEUR 26`` ->
    [{jahr, organ, bezuege[, bemerkung]}]. Ref: lib/parser_organbezuege.js:18-126."""
    organbezuege = textops.replace_semicolon_and_comma_in_brackets(organbezuege)
    years = _RE_YEAR_ANY.findall(organbezuege)
    one_year_for_all = years[0] if len(years) == 1 else None
    multi_year_fallback = years[0] if len(years) > 1 else None

    out: list[dict] = []
    for chunk in re.split(r"\s*;\s*", organbezuege):
        chunk = chunk.strip()
        jahr = organ = bezuege = bemerkung = None

        def split_on_currency(text: str):
            m = _RE_CURRENCY.search(text)
            if not m:
                return None
            cur = m.group(0)
            parts = re.split(re.escape(cur), text)
            return cur, parts

        if one_year_for_all:
            jahr = one_year_for_all
            if "keine Vergütung" in chunk:
                bemerkung = chunk.replace(jahr, "").replace(":", "").strip()
            else:
                without_year = chunk.replace(jahr, "", 1).strip()
                hit = split_on_currency(without_year)
                if hit:
                    cur, parts = hit
                    organ = parts[0].replace(":", "").strip()
                    bezuege = textops.remove_last_comma(cur + " " + parts[1].strip())
                    if len(parts) > 2 and parts[2].strip():
                        bezuege = bezuege + ", " + cur + " " + parts[2].strip()
                else:
                    bemerkung = without_year
        else:
            span = _RE_YEAR_SPAN.search(chunk)
            if span:
                jahr = span.group(0)
                without_year = chunk.replace(jahr, "", 1).strip()
                hit = split_on_currency(without_year)
                if hit:
                    cur, parts = hit
                    if len(parts) > 1:
                        organ = parts[0].replace(":", "").strip()
                        bezuege = textops.remove_last_comma(cur + " " + parts[1].strip())
                        if len(parts) > 2 and parts[2].strip():
                            bezuege = bezuege + ", " + cur + " " + parts[2].strip()
                    else:
                        bemerkung = parts[0]
                else:
                    bemerkung = chunk
            else:
                hit = split_on_currency(chunk)
                if hit:
                    cur, parts = hit
                    if len(parts) > 1:
                        jahr = multi_year_fallback
                        organ = parts[0].replace(":", "").strip()
                        bezuege = cur + " " + parts[1].strip()
                    else:
                        bemerkung = parts[0]

        entry = {"jahr": jahr, "organ": organ, "bezuege": bezuege, "bemerkung": bemerkung}
        entry = {k: v.replace("()", "") for k, v in entry.items() if v}
        out.append(entry)
    return out
