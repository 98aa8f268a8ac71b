"""Shareholders / owners / participations (SURVEY.md §2 E12-E14, E16-E18).

Re-expresses lib/parser_aktionaer_eigner_beteiligungen.js: percentage
extraction in/out of parenthesis, positional comma-schema line parsing with
number-comma protection, heading-grouped participation lists.
"""

from __future__ import annotations

import re

from . import textops


def parse_aktionaer(lines: list[str]) -> list[dict]:
    """Shareholder lines -> [{name, ort, anteil, bemerkungen[]}].
    Ref: lib/parser_aktionaer_eigner_beteiligungen.js:26-128."""
    out: list[dict] = []
    for raw in lines:
        if raw is None or raw == "":
            continue
        current = raw.replace("Aktionär(e)", "")
        bemerkungen: list[str] = []
        anteil = ""
        ort = ""
        name = None

        paren_groups = textops.get_parenthesis_content(current, fill_parenthesis=True)
        without_parens = textops.remove_strings_from_string(current, paren_groups)
        pm = textops.match_percentage(without_parens)
        if pm:
            anteil = pm[0]
        for grp in paren_groups:
            inner = grp.replace("(", "").replace(")", "").strip()
            pm_in = textops.match_percentage(grp)
            if pm_in:
                rest = inner.replace(pm_in[0], "").strip()
                if not rest:
                    anteil = pm_in[0].strip()
                else:
                    bemerkungen.append(inner)
            else:
                bemerkungen.append(inner)

        if anteil:
            current = current.replace(anteil, "", 1).replace("()", "")
        for bem in bemerkungen:
            if bem:
                current = current.replace(bem, "", 1).replace("()", "")

        parts = re.split(r",|;", current.strip())
        if parts and parts[-1] == "":
            parts = parts[:-1]
        if parts and "Aktionär" in parts[0]:
            head = parts[0].split("</b>")
            parts[0] = head[1] if len(head) >= 2 else head[0].replace("Aktionär(e):", "")
        if parts and parts[0]:
            name = textops.html_text(parts[0]).strip()
        if len(parts) > 1 and parts[1]:
            ort = textops.html_text(parts[1]).strip()

        manager = textops.prune_falsy({
            "name": name, "ort": ort, "anteil": anteil,
            "bemerkungen": bemerkungen or None,
        })
        if manager:
            out.append(manager)
    return out


def parse_anteils_eigner(lines: list[str]) -> list[dict]:
    """Owner lines -> [{eigner, anteil, bemerkung}]: a percentage inside
    parenthesis is context (bemerkung), outside it is the share (anteil).
    Ref: lib/parser_aktionaer_eigner_beteiligungen.js:142-195."""
    out: list[dict] = []
    for raw in lines:
        if not raw or not raw.strip():
            continue
        current = raw
        bemerkung = ""
        anteil = ""
        for pm in textops.match_percentage(current):
            infill = textops.check_if_string_is_in_parenthesis(pm, current)
            if infill:
                bemerkung = infill.group(0).replace("(", "").replace(")", "")
            else:
                anteil = pm
        if anteil:
            current = current.replace(anteil, "", 1).replace("()", "")
        if bemerkung:
            current = current.replace(bemerkung, "", 1).replace("()", "")
        eigner = textops.remove_last_comma(current.strip())
        entry = textops.prune_falsy({"eigner": eigner, "anteil": anteil, "bemerkung": bemerkung})
        if entry:
            out.append(entry)
    return out


def beteiligungen_parse_line(line: str):
    """One participation row -> {beteiliger, ort, anteil, bemerkung} using
    the positional comma-count schema (1=name; 2=name,anteil; 3=name,ort,
    anteil; >3=joined head) with decimal-comma protection and the
    (Gruppe)/(StV)/(StA)/(VzA) and 'Kdt.' specials.
    Ref: lib/parser_aktionaer_eigner_beteiligungen.js:297-426."""
    if line == "":
        return ""
    kdt = ""
    for token in ("Kdt.", "Kdt"):
        line, removed = textops.remove_last_characters(line, token)
        if removed:
            kdt = token

    if textops.find_string_ending_with_colon(line):
        return ""  # a heading, not a row

    paren = textops.match_between_parenthesis(line)
    if paren and not line.replace(paren, "").strip():
        return ""  # parenthesis-only annotation row

    beteiliger = ort = anteil = bemerkung = ""

    line = textops.replace_comma_in_number(line, "¦")
    line = textops.replace_semicolon_and_comma_in_brackets(line)
    parts = [p.replace("¦", ",") for p in line.split(",")]

    if len(parts) == 1:
        beteiliger = parts[0]
    elif len(parts) == 2:
        beteiliger, anteil = parts
    elif len(parts) == 3:
        beteiliger, ort, anteil = parts
    else:
        ort = parts[-2]
        anteil = parts[-1]
        beteiliger = textops.remove_last_comma(",".join(parts[:-2]) + ",")

    # split "<city> (<pct>)" tails unless the row carries a 'Kapital:' figure
    if "apital:" not in line:
        pm = textops.match_percentage(anteil)
        if pm:
            maybe_ort = anteil.replace(pm[0], "").strip().replace("()", "")
            if maybe_ort and len(maybe_ort) > 1:
                ort = maybe_ort
                anteil = pm[0]

    for special in ("(Gruppe)", "(StV)", "(StA)", "(VzA)"):
        if ort and special in ort:
            ort = ort.replace(special, "")
            bemerkung = (bemerkung + " " + special.replace("(", "").replace(")", "")).strip()

    if kdt:
        bemerkung = kdt if not bemerkung else bemerkung + "; " + kdt

    entry = {"beteiliger": beteiliger, "ort": ort, "anteil": anteil, "bemerkung": bemerkung}
    return {k: v.strip() for k, v in entry.items() if v}


def prepare_beteiligungen(lines: list[str]) -> list[str] | None:
    """Split raw category lines at <br>/<b>, drop the headline and empties.
    Ref: lib/parser_aktionaer_eigner_beteiligungen.js:434-483."""
    if len(lines) == 1:
        br_split = lines[0].split("<br>")
        bold_split = br_split[0].split("</b>")
        if len(bold_split) >= 2:
            br_split.append(bold_split[1])
        modified = br_split[1:]
    else:
        if len(lines) < 2 or not lines[1]:
            return None
        modified = lines[1].split("<br>")

    stripped: list[str] = []
    for cur in modified:
        for chunk in cur.split("<b>"):
            txt = textops.strip_tags(chunk)
            if txt:
                stripped.append(txt)
    return [s for s in stripped if s]


def parse_beteiligungen2(lines: list[str]) -> list[dict] | None:
    """Heading-grouped participation list: a line ending with ':' starts a
    new {ueberschrift, zeilen[]} group (sessionization-by-flag).
    Ref: lib/parser_aktionaer_eigner_beteiligungen.js:490-528."""
    groups: list[dict] = []
    current = {"ueberschrift": "ohne_titel", "zeilen": []}
    for raw in lines:
        if not raw or not raw.strip():
            continue
        parsed = beteiligungen_parse_line(raw)
        if not parsed:
            continue
        if textops.does_end_with_colon(raw.strip()):
            heading = textops.remove_last_colon(raw.strip()).strip()
            if current["zeilen"]:
                groups.append(current)
            current = {"ueberschrift": heading, "zeilen": []}
        else:
            current["zeilen"].append(parsed)
    groups.append(current)
    return groups or None


def parse_beteiligungen_tables(tables_parsed: list, rest: dict, infos: list) -> dict | None:
    """Table-shaped participations ('Wesentliche Beteiligungen'): join each
    grid row's cells into one line -> beteiligungen_parse_line; headings come
    from the inter-table rest lines.
    Ref: lib/parser_aktionaer_eigner_beteiligungen.js:207-290."""
    if tables_parsed is None:
        return None
    result = {"elemente": [], "bemerkungen": []}
    current = {"ueberschrift": None, "zeilen": []}

    first_rest = rest.get(0)
    if first_rest:
        maybe_header = textops.html_text(first_rest).strip()
        if maybe_header:
            par = textops.get_parenthesis_content(maybe_header)
            only_paren = bool(par) and not maybe_header.replace(par[0], "").strip()
            if only_paren:
                result["bemerkungen"].append(maybe_header)
            else:
                current["ueberschrift"] = maybe_header

    for s, table in enumerate(tables_parsed):
        info_cur = infos[s] if s < len(infos) else None
        info_next = infos[s + 1] if s + 1 < len(infos) else None
        col0 = table[0] if table else []
        for n in range(len(col0)):
            zeile = ""
            for col in table:
                cell = col[n] if n < len(col) else ""
                txt = textops.html_text(cell).strip()
                if txt:
                    zeile += txt + " "
            current["zeilen"].append(beteiligungen_parse_line(zeile))

        if not current["ueberschrift"]:
            current["ueberschrift"] = "ohne_titel"
        if info_cur and info_next:
            for y in range(info_cur["indexStop"] + 1, info_next["indexStart"]):
                if rest.get(y):
                    heading = textops.html_text(rest[y]).strip()
                    if heading:
                        result["elemente"].append(current)
                        current = {"ueberschrift": heading, "zeilen": []}
    result["elemente"].append(current)
    return result
