"""HTML-table machinery: segmentation, column-major grids, header-index
pivots (SURVEY.md §2 T1-T6, P1-P7, E21, E23-E28).

The reference's tabular model (lib/parser_tables.js) is column-major:
``table[col][row]`` holds each cell's inner HTML; column 0 carries row
headers (years / labels), each later column is one record. This module
re-expresses that model with a regex-based grid parser (one pass per table,
no DOM — the reference's per-cell cheerio loads are its dominant CPU cost,
see SURVEY.md §4.2) plus the static/dynamic header-index pivots and
year-forward-fill.
"""

from __future__ import annotations

import re

from . import textops
from .textops import html_text

# ---------------------------------------------------------------------------
# T1: table segmentation (lib/parser_tables.js:27-79)
# ---------------------------------------------------------------------------


def recognize_table_arrays(lines: list[str]) -> dict:
    """Split category lines into table line-runs, inter-table rest lines
    (keyed by absolute index), and per-table start/stop index infos."""
    in_table = False
    tables_arr: list[list[str]] = []
    current: list[str] = []
    rest: dict[int, str] = {}
    infos: list[dict] = []
    info = None
    for i, line in enumerate(lines):
        if "<table" in line:
            in_table = True
            info = {"indexStart": i, "indexStop": None}
            current.append(line)
        elif "</table" in line:
            in_table = False
            if info is None:
                continue
            info["indexStop"] = i
            current.append(line)
            tables_arr.append(current)
            infos.append(info)
            current = []
        elif in_table:
            current.append(line)
        else:
            rest[i] = line
    return {"tablesArr": tables_arr, "rest": rest, "infos": infos}


# ---------------------------------------------------------------------------
# T2: grid parse — column-major, inner-HTML cells (lib/parser_tables.js:88-103)
# ---------------------------------------------------------------------------

_RE_TR = re.compile(r"<tr[^>]*>(.*?)</tr\s*>", re.S | re.I)
_RE_TD = re.compile(r"<t([dh])([^>]*)>(.*?)</t\1\s*>", re.S | re.I)
_RE_COLSPAN = re.compile(r'colspan\s*=\s*"?(\d+)', re.I)


def parse_html_table(table_html: str) -> list[list[str]]:
    """One HTML table -> ``grid[col][row]`` of inner-HTML cells.

    Matches the reference's cheerio-tableparser usage
    (``parsetable(false,false,false)``): colspan cells occupy their first
    column with '' placeholders for the span; missing trailing cells pad ''.
    """
    rows: list[list[str]] = []
    for row_html in _RE_TR.findall(table_html):
        cells: list[str] = []
        for _tag, attrs, inner in _RE_TD.findall(row_html):
            cells.append(inner)
            span = _RE_COLSPAN.search(attrs)
            if span:
                cells.extend([""] * (int(span.group(1)) - 1))
        rows.append(cells)
    if not rows:
        return []
    ncols = max(len(r) for r in rows)
    return [[(r[c] if c < len(r) else "") for r in rows] for c in range(ncols)]


def create_parsed_tables(tables_arr: list[list[str]]) -> list[list[list[str]]]:
    """Each table's lines are joined with ',' (the reference joins via JS
    ``Array.toString()``, lib/parser_tables.js:91) then grid-parsed."""
    return [parse_html_table(",".join(t)) for t in tables_arr]


def _cell(table: list[list[str]], col: int, row: int) -> str:
    if col < len(table) and row < len(table[col]):
        return table[col][row]
    return ""


# ---------------------------------------------------------------------------
# T3: table-content recognition (lib/parser_tables.js:2567-2642)
# ---------------------------------------------------------------------------


def recognize_table_content(tables_parsed: list) -> dict:
    """Classify each table of a Kapital segment by its first (bold) cell."""
    rec: dict[str, int] = {}
    for i, table in enumerate(tables_parsed):
        if not table or not table[0]:
            continue
        first_html = table[0][0].lower().strip()
        first = html_text(table[0][0].lower()).strip()
        bold = "<b>" in first_html
        if "grundkapital" in first and bold:
            rec["grundkapitalIndex"] = i
        elif textops.match_year(first) and bold and "kapitalEntwicklungIndex" not in rec:
            rec["kapitalEntwicklungIndex"] = i
        elif "genehmigtes" in first and bold and "genu" not in first:
            rec["genehmKapitalIndex"] = i
        elif "genehmigtes" in first and bold and "genu" in first:
            rec["genehmGenusKapitalIndex"] = i
        elif "derzeitiges" in first and bold and "genu" in first:
            rec["derzeitigesGenusKapitalIndex"] = i
        elif ("entwicklung" in first and "genu" in first_html and "kapital" in first
              and bold):
            rec["entwicklungGenusKapitalIndex"] = i
        elif "bedingtes" in first and bold:
            if "bedingKapitalIndex" in rec:
                rec["bedingKapitalIndex2"] = i
            else:
                rec["bedingKapitalIndex"] = i
        elif "bezugsrechte" in first and bold:
            rec["besBezugsrechteIndex"] = i
        elif "ermächtigung" in first and bold:
            rec["ermaechtigungAktienErwerbIndex"] = i
        elif "ausgegebenes" in first and bold:
            rec["ausgegebenesKapitalIndex"] = i
    return rec


def get_next_index(rec: dict, current: int):
    """First classified table index greater than ``current``
    (lib/parser_tables.js:2944-2951)."""
    for v in rec.values():
        if isinstance(v, int) and v > current:
            return v
    return None


def get_rest_lines(info: dict, rest: dict, separator: str, next_info: dict | None):
    """Rest lines between a table's stop and the next table's start, re-split
    on ``separator`` (lib/parser_tables.js:2893-2936)."""
    start = info["indexStop"] + 1
    end = next_info["indexStart"] if next_info else None
    blob = ""
    for k in sorted(rest):
        if end is not None:
            if start <= k < end:
                blob += separator + rest[k]
        elif k >= start:
            blob += separator + rest[k]
    return blob.split(separator) if blob else None


# ---------------------------------------------------------------------------
# E21 family: Kapital tables (lib/parser_tables.js:113-823, 982-1080)
# ---------------------------------------------------------------------------


def parse_kapital_entwicklung(tables_parsed: list, idx: int) -> list[dict]:
    """Year-grouped capital-history rows with year carry-forward: bold col0
    starts a year group; (art, betrag) pairs start entries; header-less
    middle-only rows attach as the entry's ``text``.
    Ref: lib/parser_tables.js:156-249."""
    table = tables_parsed[idx]
    results: list[dict] = []
    cobj: dict | None = None
    sub: dict | None = None
    if not table:
        return results
    for i in range(len(table[0])):
        maybe_year = html_text(table[0][i]).strip()
        if maybe_year and textops.match_number(maybe_year):
            if i > 0 and cobj is not None:
                results.append(cobj)
            if sub is not None and cobj is not None:
                cobj.setdefault("eintraege", []).append(sub)
                sub = None
            cobj = {"jahr": html_text(maybe_year)}
        if cobj is None:
            continue
        if _cell(table, 1, i) and _cell(table, 2, i):
            maybe_art = html_text(table[1][i]).strip()
            if maybe_art:
                cobj.setdefault("eintraege", [])
                if sub is not None:
                    cobj["eintraege"].append(sub)
                sub = {"art": maybe_art}
                betrag = html_text(table[2][i])
                if betrag:
                    sub["betrag"] = betrag
        if _cell(table, 1, i):
            left = html_text(table[0][i])
            mid = html_text(table[1][i])
            right = html_text(_cell(table, 2, i))
            if not left and not right:
                if sub is None:
                    sub = {}
                sub["text"] = mid
    if sub is not None and cobj is not None:
        cobj.setdefault("eintraege", []).append(sub)
    if cobj is not None:
        results.append(cobj)
    return textops.remove_empty(results)


def _collect_bemerkung_lines(content: str) -> list[str]:
    out = []
    for chunk in content.split("<br>"):
        txt = html_text(chunk).strip()
        if txt:
            out.append(txt)
    return out


def parse_genehm_kapital(tables_parsed, tables_arr, rest, infos, idx, next_idx,
                         substituted_keys=None) -> dict:
    """'Genehmigtes Kapital' header + betrag + accumulated bemerkung (from
    extra rows, a header-only follow-up table, and trailing rest lines).
    Ref: lib/parser_tables.js:262-349."""
    was_substituted = bool(substituted_keys) and "genehmKapitalIndex" in substituted_keys
    table = tables_parsed[idx] if idx < len(tables_parsed) else None
    out: dict = {}
    item = {"betrag": None, "bemerkung": ""}
    if table and ("genehmigtes" in table[0][0].lower() or was_substituted):
        if len(table) < 2:
            follow = idx + 1
            if next_idx is not None and follow < next_idx and follow < len(tables_parsed):
                ft = tables_parsed[follow]
                if ft and ft[0]:
                    for cell in ft[0]:
                        txt = html_text(cell).strip()
                        if txt:
                            item["bemerkung"] += " " + txt
        else:
            item["betrag"] = html_text(table[1][0]).strip()
            start = 0 if was_substituted else 1
            for i in range(start, len(table[0])):
                content = table[0][i]
                if not content:
                    continue
                for txt in _collect_bemerkung_lines(content):
                    item["bemerkung"] += " " + txt
        if idx < len(infos):
            next_info = infos[idx + 1] if idx + 1 < len(infos) else None
            restlines = get_rest_lines(infos[idx], rest, "<br>", next_info)
            for line in restlines or []:
                txt = html_text(line.strip())
                if txt:
                    item["bemerkung"] += " " + txt
    item["bemerkung"] = item["bemerkung"].strip()
    if item["bemerkung"] or item["betrag"] is not None:
        out = item
    return out


def parse_beding_kapital(tables_parsed, tables_arr, rest, infos, idx, next_idx) -> dict:
    """'Bedingtes Kapital' -> {betrag, eintraege[{betrag_einzel, bemerkung}]}.
    Ref: lib/parser_tables.js:361-480."""
    table = tables_parsed[idx] if idx < len(tables_parsed) else None
    if not table:
        return {}
    item: dict = {"betrag": None, "eintraege": []}
    col1 = textops.remove_empty(table[1]) if len(table) > 1 else []
    if "bedingtes" in table[0][0].lower():
        if not col1:
            follow = idx + 1
            if next_idx is not None and follow < next_idx and follow < len(tables_parsed):
                ft = tables_parsed[follow]
                if ft and ft[0]:
                    for cell in ft[0]:
                        txt = html_text(cell).strip()
                        if txt:
                            item["eintraege"].append({"bemerkung": txt})
        else:
            item["betrag"] = html_text(table[1][0]).strip()
            for i in range(1, len(table[0])):
                content = table[0][i]
                if not content:
                    continue
                for txt in _collect_bemerkung_lines(content):
                    item["eintraege"].append({"bemerkung": txt})
        if idx < len(infos):
            next_info = infos[idx + 1] if idx + 1 < len(infos) else None
            for line in get_rest_lines(infos[idx], rest, "<br>", next_info) or []:
                txt = html_text(line.strip())
                if txt:
                    item["eintraege"].append({"bemerkung": txt})
    else:
        for content in table[0]:
            if not content:
                continue
            parts = content.split("<br>")
            if len(parts) == 2:
                item["eintraege"].append({
                    "betrag_einzel": html_text(parts[0]).strip(),
                    "bemerkung": html_text(parts[1]).strip(),
                })
    return item


def parse_bes_bezugsrechte(tables_parsed, tables_arr, rest, infos, idx, next_idx):
    """'Besondere Bezugsrechte' -> [{jahr, bemerkungen[]}].
    Ref: lib/parser_tables.js:493-602."""
    table = tables_parsed[idx] if idx < len(tables_parsed) else None
    if not table:
        return None
    entries: list[dict] = []

    def harvest(t, start_row):
        for i in range(start_row, len(t[0])):
            content = _cell(t, 0, i)
            content2 = _cell(t, 1, i)
            if not content:
                continue
            for txt in _collect_bemerkung_lines(content):
                entry = {"jahr": txt, "bemerkungen": []}
                if content2:
                    entry["bemerkungen"].extend(_collect_bemerkung_lines(content2))
                entries.append(entry)

    if "besondere" in table[0][0].lower():
        if len(table[0]) <= 1:
            follow = idx + 1
            if next_idx is not None and follow < next_idx and follow < len(tables_parsed):
                ft = tables_parsed[follow]
                if ft and ft[0]:
                    harvest(ft, 0)
        else:
            harvest(table, 1)
    return entries or None


def parse_erm_aktienerwerb(tables_parsed, tables_arr, rest, infos, idx, next_idx):
    """'Ermächtigung Aktienerwerb' -> {text: [lines]}.
    Ref: lib/parser_tables.js:614-690."""
    table = tables_parsed[idx] if idx < len(tables_parsed) else None
    if not table:
        return None
    texts: list[str] = []
    if "ermächtigung" in html_text(table[0][0]).lower():
        if len(table[0]) <= 1:
            follow = idx + 1
            if next_idx is not None and follow < next_idx and follow < len(tables_parsed):
                ft = tables_parsed[follow]
                if ft and ft[0]:
                    for cell in ft[0]:
                        texts.extend(_collect_bemerkung_lines(cell))
        else:
            for cell in table[0][1:]:
                if cell:
                    texts.extend(_collect_bemerkung_lines(cell))
        if idx < len(infos):
            next_info = infos[idx + 1] if idx + 1 < len(infos) else None
            for line in get_rest_lines(infos[idx], rest, "<br>", next_info) or []:
                txt = html_text(line.strip()).strip()
                if txt:
                    texts.append(txt)
    return {"text": texts} if texts else None


def parse_grundkapital(tables_parsed, tables_arr, rest, infos, idx,
                       headline: str = "grundkapital") -> dict:
    """Grundkapital betrag + grouped bemerkungen; Stückelung / Stimmrecht
    lines split out into their own lists. Ref: lib/parser_tables.js:702-823."""
    table = tables_parsed[idx] if idx < len(tables_parsed) else None
    out: dict = {}
    grundkapital = {"betrag": None, "bemerkungen": []}
    stueckelung: list[str] = []
    stimmrecht: list[str] = []
    current_bem: list[str] = []

    def consume(txt: str):
        nonlocal current_bem
        if not txt:
            return
        st = textops.get_stueckelung(txt)
        if st:
            stueckelung.append(st)
            grundkapital["bemerkungen"].append(current_bem)
            current_bem = []
            return
        sr = textops.get_stimmrecht(txt)
        if sr:
            # reference `continue`s before flushing bemerkungen here
            # (lib/parser_tables.js:743-748)
            stimmrecht.append(sr)
            return
        current_bem.append(txt.strip())

    if table and headline in table[0][0].lower():
        grundkapital["betrag"] = html_text(table[1][0]) if len(table) > 1 else None
        for content in table[0][1:]:
            if not content:
                continue
            for chunk in content.split("<br>"):
                consume(html_text(chunk))
        if idx < len(infos):
            next_info = infos[idx + 1] if idx + 1 < len(infos) else None
            for line in get_rest_lines(infos[idx], rest, "<br>", next_info) or []:
                txt = html_text(line.strip())
                if txt:
                    consume(txt)
    if current_bem:
        grundkapital["bemerkungen"].append(current_bem)
    if grundkapital["betrag"] is not None or grundkapital["bemerkungen"]:
        out["grundkapital"] = grundkapital
    out["stimmrecht"] = stimmrecht
    out["stückelung"] = stueckelung
    return out


def parse_ausgegebenes_kapital(tables_parsed, tables_arr, rest, infos, idx) -> dict:
    """'Ausgegebenes Kapital' rows -> eintraege with betrag / notiz /
    stueckelung / stimmrecht. Ref: lib/parser_tables.js:982-1080."""
    table = tables_parsed[0] if len(tables_parsed) == 1 else None
    if table is None:
        for t in tables_parsed:
            if t and t[0] and "b>Ausgegebenes Kapital" not in t[0][0]:
                table = t
                break
        if table is None and tables_parsed:
            table = tables_parsed[0]
    if not table:
        return {"eintraege": []}
    eintraege: list[dict] = []
    for i in range(len(table[0])):
        c1 = _cell(table, 0, i)
        c2 = _cell(table, 1, i)
        t1 = html_text(c1)
        t2 = html_text(c2)
        entry: dict = {}
        if textops.match_number(t2):
            entry["betrag"] = t2
        if "ausgegebenes kapital" in c1.lower():
            entry["notiz"] = t1
        else:
            sr = textops.get_stimmrecht(t1, True)
            st = textops.get_stueckelung(t1, True)
            notiz = t1
            if sr:
                entry["stimmrecht"] = sr
                notiz = notiz.replace(sr, "").replace("Stimmrecht:", "")
            if st:
                entry["stueckelung"] = st
                notiz = notiz.replace(st, "").replace("Stückelung:", "")
            entry["notiz"] = notiz.strip()
        entry = textops.prune_falsy(entry)
        if entry:
            eintraege.append(entry)
    for k in sorted(rest):
        if html_text(rest[k]):
            tail: dict = {}
            for chunk in rest[k].split("<br>"):
                sr = textops.get_stimmrecht(chunk, True)
                st = textops.get_stueckelung(chunk, True)
                if sr:
                    tail["stimmrecht"] = sr
                if st:
                    tail["stueckelung"] = st
            if tail:
                eintraege.append(tail)
    return {"eintraege": eintraege}


def parse_entwicklung_genus_kapital(tables_parsed, idx, next_idx=None) -> list[dict]:
    """Year + text rows of the Genußkapital history. Ref: lib/parser_tables.js:113-148."""
    table = tables_parsed[idx] if idx < len(tables_parsed) else None
    out: list[dict] = []
    if not table:
        return out
    for i in range(len(table[0])):
        entry: dict = {}
        year = textops.match_year(html_text(_cell(table, 0, i)))
        if year:
            entry["jahr"] = year
        text = html_text(_cell(table, 1, i).strip()).strip()
        if text:
            entry["text"] = text
        if entry:
            out.append(entry)
    return out


# ---------------------------------------------------------------------------
# P1/P5/P6: Kurse pivot (lib/parser_tables.js:834-970)
# ---------------------------------------------------------------------------

_KURS_FIELDS = ("jahr", "kommentar", "hoechst", "tiefst", "ultimo")


def _new_kurs_indices() -> dict:
    return {f: -1 for f in _KURS_FIELDS}


def _finish_kurs_group(g: dict) -> dict:
    if g["jahr"] + 1 != g["hoechst"]:
        g["kommentar"] = g["jahr"] + 1
    return g


def parse_bereinigte_kurse(tables_parsed, tables_arr, rest, infos, callnumber) -> dict:
    """Static header-index pivot over price tables: col0 scanned for year
    (bold cell) / höchst / tiefst / ultimo indices; repeated headers open a
    new index group (multi-year-band tables); each data column fills one
    record per group. Ref: lib/parser_tables.js:834-970."""
    out = {"kurse": [], "notiz_bereinigteKurse": None}

    header = html_text(rest.get(0, ""))
    header_split = header.split("Bereinigte Kurse")
    if len(header_split) == 1:
        out["notiz_bereinigteKurse"] = textops.remove_parenthesis(
            header_split[0]).replace("Kurse", "").strip()
    else:
        out["notiz_bereinigteKurse"] = textops.remove_parenthesis(header_split[1]).strip()

    for table in tables_parsed:
        groups: list[dict] = []
        for i, col in enumerate(table):
            next_col = table[i + 1] if i + 1 < len(table) else None
            if i == 0:
                g = _new_kurs_indices()
                for x, cell in enumerate(col):
                    next_cell = next_col[x] if next_col and x < len(next_col) else None
                    lc = html_text(cell).strip().lower()
                    if "</b>" in cell or (next_cell and "</b>" in next_cell):
                        if g["jahr"] != -1:
                            groups.append(_finish_kurs_group(g))
                            g = _new_kurs_indices()
                        g["jahr"] = x
                    elif lc in ("höchst", "tiefst", "ultimo"):
                        field = {"höchst": "hoechst", "tiefst": "tiefst",
                                 "ultimo": "ultimo"}[lc]
                        if g[field] != -1:
                            groups.append(_finish_kurs_group(g))
                            g = _new_kurs_indices()
                        g[field] = x
                groups.append(_finish_kurs_group(g))
            else:
                multi_band = (len(groups) >= 2 and groups[0]["jahr"] != -1
                              and groups[1]["jahr"] != -1
                              and groups[0]["jahr"] != groups[1]["jahr"])
                group_sets = [[g] for g in groups] if multi_band else [groups]
                for gs in group_sets:
                    item = parse_column_content_to_item(col, gs)
                    push_item_to_return_object("kurse", item, out, i)

    out["kurse"] = textops.remove_empty(out["kurse"])
    if not out["notiz_bereinigteKurse"]:
        out.pop("notiz_bereinigteKurse", None)
    return {f"boersenbewertung{callnumber}": out}


# ---------------------------------------------------------------------------
# P2: Dividenden pivot (lib/parser_tables.js:1093-1258)
# ---------------------------------------------------------------------------

_DIV_HEADERS = {
    "dividende": "dividende", "ausschüttung": "dividende",
    "bonus": "bonus", "sonderausschüttung": "sonderausschuettung",
    "ex-tag": "extag", "div.-schein-nr.": "divscheinnr",
    "aussch.-ant.-schein-nr.": "divscheinnr",
    "steuerguthaben": "steuerguthaben", "st. guthaben": "steuerguthaben",
}
_DIV_FIELDS = ("jahr", "dividende", "bonus", "sonderausschuettung",
               "steuerguthaben", "divscheinnr", "extag", "kupon_nr")


def parse_dividenden(tables_parsed, tables_arr, rest, infos, callnumber) -> dict:
    """Static header pivot for dividend tables; ``<sup>`` footnote cells and
    leftover rest lines become bemerkungen. Ref: lib/parser_tables.js:1093-1258."""
    out = {"dividenden": [], "dividenden_notiz": None, "dividenden_bemerkungen": []}

    header = html_text(rest.get(0, "")).replace("/Ausschüttung", "")
    header_split = header.split("Dividenden")
    if len(header_split) == 1:
        out["dividenden_notiz"] = textops.remove_parenthesis(
            header_split[0]).replace("Kurse", "").strip()
    else:
        out["dividenden_notiz"] = textops.remove_parenthesis(header_split[1]).strip()

    for table in tables_parsed:
        groups: list[dict] = []
        for i, col in enumerate(table):
            next_col = table[i + 1] if i + 1 < len(table) else None
            if i == 0:
                g = {f: -1 for f in _DIV_FIELDS}
                for x, cell in enumerate(col):
                    next_cell = next_col[x] if next_col and x < len(next_col) else None
                    lc = html_text(cell).strip().lower()
                    field = None
                    if "</b>" in cell or (next_cell and "</b>" in next_cell):
                        field = "jahr"
                    elif lc in _DIV_HEADERS:
                        field = _DIV_HEADERS[lc]
                    elif "kupon-nr" in lc:
                        field = "kupon_nr"
                    elif "sup" in cell:
                        for chunk in cell.split("<br>"):
                            out["dividenden_bemerkungen"].append(html_text(chunk))
                    if field:
                        if g[field] != -1:
                            groups.append(g)
                            g = {f: -1 for f in _DIV_FIELDS}
                        g[field] = x
                groups.append(g)
            else:
                item = parse_column_content_to_item(col, groups)
                push_item_to_return_object("dividenden", item, out, i)

    out["dividenden"] = textops.remove_empty(out["dividenden"])
    for k in sorted(rest):
        if "<b>Dividenden" not in rest[k] and "________" not in rest[k]:
            txt = html_text(rest[k]).strip()
            if txt:
                out["dividenden_bemerkungen"].append(txt)
    if not out["dividenden_notiz"]:
        out.pop("dividenden_notiz", None)
    if not out["dividenden_bemerkungen"]:
        out.pop("dividenden_bemerkungen", None)
    return {f"boersenbewertung{callnumber}": out}


# ---------------------------------------------------------------------------
# E25: Ergebnisabführung (lib/parser_tables.js:1298-1356)
# ---------------------------------------------------------------------------


def parse_ergebnisabfuehrung(tables_parsed, tables_arr, rest, infos, callnumber,
                             mode: bool = False) -> dict:
    entries: list[dict] = []
    table = tables_parsed[0] if tables_parsed else None
    if not table:
        return {"ergebnisabfuehrung": entries}
    if not mode:
        for i in range(len(table[0])):
            entry = {"jahr": "", "betrag": ""}
            t1 = html_text(_cell(table, 0, i)).strip()
            if t1 and textops.match_year(t1):
                entry["jahr"] = t1
            t2 = html_text(_cell(table, 1, i)).strip()
            if t2:
                entry["betrag"] = t2
            if entry["jahr"] or entry["betrag"]:
                entries.append(entry)
    else:
        for col in table:
            entry = {"jahr": "", "betrag": ""}
            first = html_text(col[0] if col else "").strip()
            if first and textops.match_year(first):
                entry["jahr"] = first
            second = html_text(col[1] if len(col) > 1 else "").strip()
            if second and "Ergebnisabführung" not in second:
                entry["betrag"] = second
            if entry["jahr"] or entry["betrag"]:
                entries.append(entry)
    return {"ergebnisabfuehrung": entries}


# ---------------------------------------------------------------------------
# P3/P4/P5/P7: dynamic header pivots — Kennzahlen / Bilanzen / GuV
# (lib/parser_tables.js:1368-1712, 1855-2307, 2319-2559)
# ---------------------------------------------------------------------------


def _assign_index(indices: dict, key: str, occurrences: dict, x: int) -> None:
    """Data-dependent field naming: duplicate headers get ``¦N¦`` suffixes.
    Ref: lib/parser_tables.js:1736-1749."""
    count = occurrences.get(key, 0)
    suffix = f"¦{count}¦" if count and count > 1 else ""
    indices[key + suffix] = x


def _increment(occurrences: dict, key: str) -> None:
    occurrences[key] = occurrences.get(key, 0) + 1 if occurrences.get(key) else 1


def parse_column_content_to_item(col: list[str], groups: list[dict]) -> dict:
    """Fill ONE record from a data column using every index group's
    field->row mapping (values lowercased like the reference).
    Ref: lib/parser_tables.js:2704-2720."""
    item: dict = {}
    for x, cell in enumerate(col):
        value = html_text(cell).strip().lower()
        if not value:
            continue
        for g in groups:
            _assign_indices_to_object(item, x, g, value)
    return item


def parse_column_content_to_item_kennzahlen(col: list[str], groups: list[dict]) -> dict:
    """Group-aware column fill: one record per kopfzeile group.
    Ref: lib/parser_tables.js:2729-2753."""
    out: dict = {}
    for g in groups:
        colitem: dict = {}
        for x, cell in enumerate(col):
            value = html_text(cell).strip().lower()
            if not value:
                continue
            _assign_indices_to_object(colitem, x, g, value)
        if colitem:
            out.setdefault(g.get("kopfzeile"), []).append(colitem)
    return out


def _assign_indices_to_object(item: dict, index: int, indices: dict, value: str,
                              additional_key: str | None = None) -> dict:
    """Ref: lib/parser_tables.js:2767-2802 (recursive for nested groups)."""
    for key, arrayval in indices.items():
        if isinstance(arrayval, dict):
            _assign_indices_to_object(item, index, arrayval, value, key)
        elif isinstance(arrayval, int) and not isinstance(arrayval, bool):
            if index == arrayval and arrayval >= 0:
                if additional_key:
                    item.setdefault(additional_key, {})[key] = value
                else:
                    item[key] = value
    return item


def push_item_to_return_object(identifier: str, item: dict, return_object: dict,
                               row_index: int) -> dict:
    """Append a filled record; a record without ``jahr`` merges into the
    record one row up (year spans columns). Ref: lib/parser_tables.js:2654-2696."""
    arr = return_object.setdefault(identifier, [])
    if item:
        if not item.get("jahr"):
            if 0 <= row_index - 1 < len(arr) and arr[row_index - 1]:
                for k, v in item.items():
                    if v:
                        arr[row_index - 1][k] = v
            else:
                if item.get("jahr") == "":
                    try:
                        first_arr = return_object[next(iter(return_object))]
                        item["jahr"] = first_arr[row_index - 1]["jahr"]
                    except (KeyError, IndexError, TypeError, StopIteration):
                        item["jahr"] = ""
                    arr.append(item)
                else:
                    arr.append(item)
        else:
            arr.append(item)
    else:
        arr.append(item)  # keep positional indexing; emptied later
    return return_object


def adapt_year_in_filled_item(filled: dict, return_object: dict, row_index: int) -> dict:
    """Forward-fill missing ``jahr`` within a filled column, falling back to
    the same row of the previously collected key.
    Ref: lib/parser_tables.js:1758-1815."""
    if not filled:
        return filled
    previous_jahr = ""
    for records in filled.values():
        for rec in records:
            if rec.get("jahr"):
                previous_jahr = rec["jahr"]
            else:
                rec["jahr"] = previous_jahr
    if not return_object:
        return filled

    current = None
    first_key = next(iter(filled))
    for key, value in return_object.items():
        if key == first_key and current is not None and len(value) < len(current):
            break
        current = value
    for records in filled.values():
        for rec in records:
            if not rec.get("jahr"):
                if current and 0 <= row_index - 1 < len(current) and current[row_index - 1]:
                    if current[row_index - 1].get("jahr"):
                        rec["jahr"] = current[row_index - 1]["jahr"]
    return filled


def _check_table_contains_year(table, indices: dict, i: int, x: int) -> dict:
    """Empty-bold repair: if any column's cell at this row holds a number,
    treat the row as the year row. Ref: lib/parser_tables.js:1828-1842."""
    for col in table:
        raw = col[i] if i < len(col) else ""
        if textops.match_number(raw):
            indices["jahr"] = x
            break
    return indices


def detect_additional_headline(index: int, infos: list, rest: dict) -> str:
    """Bold rest-line between two tables acts as the next table's kopfzeile.
    Ref: lib/parser_tables.js:1266-1286."""
    if index - 1 < 0 or index >= len(infos):
        return ""
    cur, nxt = infos[index - 1], infos[index]
    found = []
    for n in range(cur["indexStop"] + 1, nxt["indexStart"]):
        line = rest.get(n)
        if line and "<b>" in line and "</b" in line:
            found.append(line)
    return html_text(found[0]) if found else ""


def parse_kennzahlen(tables_parsed, tables_arr, rest, infos, callnumber) -> dict:
    """Dynamic pivot: bold col0 cells open kopfzeile groups, non-bold cells
    become data-dependent field names (with ¦N¦ duplicate suffixes); per-row
    currency harvested from parens into waehrungsinfo.
    Ref: lib/parser_tables.js:1368-1712."""
    out: dict = {"kennzahlen": {}, "waehrungsinfo": [], "notizen": []}

    for k in sorted(rest):
        txt = html_text(rest[k])
        if txt and "Kennzahlen" in txt:
            headline = txt.replace("Kennzahlen", "")
            par = textops.match_between_parenthesis(headline)
            if par:
                out["notizen"].append(par)
        else:
            out["notizen"].append(txt)

    for s, table in enumerate(tables_parsed):
        groups: list[dict] = []
        found_headline = detect_additional_headline(s, infos, rest)
        push_ctr = -1
        for i, col in enumerate(table):
            cinfo = {"name": "", "waehrung": "", "eintraege": []}
            if (col and html_text(col[0]).strip()) or (
                    len(col) > 1 and html_text(col[1]).strip()):
                push_ctr += 1
            if i == 0:
                g: dict = {"kopfzeile": -1, "jahr": -1}
                occurrences: dict = {}
                x = 0
                while x < len(col):
                    cell = col[x]
                    text = html_text(cell).strip()
                    lc = text.lower()
                    if found_headline:
                        if g["kopfzeile"] != -1:
                            groups.append(g)
                            g = {"kopfzeile": -1, "jahr": -1}
                        g["kopfzeile"] = found_headline.replace(",", "")
                        cinfo = {"name": g["kopfzeile"].strip(), "waehrung": "",
                                 "eintraege": []}
                        par = textops.match_between_parenthesis(cinfo["name"])
                        if par:
                            cinfo["waehrung"] = textops.remove_parenthesis(par)
                        out["waehrungsinfo"].append(cinfo)
                        found_headline = ""
                        continue  # revisit this cell (reference's x=x-1)
                    if "<b>" in cell and "</b>" in cell:
                        if g["kopfzeile"] != -1:
                            groups.append(g)
                            g = {"kopfzeile": -1, "jahr": -1}
                        g["kopfzeile"] = text.replace(",", "")
                        g["jahr"] = x
                        cinfo = {"name": g["kopfzeile"].strip(), "waehrung": "",
                                 "eintraege": []}
                        par = textops.match_between_parenthesis(cinfo["name"])
                        if par:
                            cinfo["waehrung"] = textops.remove_parenthesis(par)
                        out["waehrungsinfo"].append(cinfo)
                        x += 1
                        continue
                    if "beschäftigte" in lc:
                        jahr_local = g["jahr"]
                        if g["kopfzeile"] != -1:
                            groups.append(g)
                            g = {"kopfzeile": -1, "jahr": -1}
                        g["kopfzeile"] = text.replace(",", "")
                        g["jahr"] = jahr_local
                        g["durchschnitt"] = x
                        cinfo = {"name": g["kopfzeile"].strip(), "waehrung": "",
                                 "eintraege": []}
                        par = textops.match_between_parenthesis(cinfo["name"])
                        if par:
                            cinfo["waehrung"] = textops.remove_parenthesis(par)
                        out["waehrungsinfo"].append(cinfo)
                        x += 1
                        continue
                    eintrag = {"index": x, "name": text, "waehrung": ""}
                    par = textops.get_parenthesis_content(text)
                    eintrag["waehrung"] = (textops.remove_parenthesis(par[0])
                                           if par else cinfo["waehrung"])
                    cinfo["eintraege"].append(eintrag)
                    _increment(occurrences, text)
                    _assign_index(g, text, occurrences, x)
                    x += 1
                groups.append(g)
            else:
                filled = parse_column_content_to_item_kennzahlen(col, groups)
                filled = adapt_year_in_filled_item(filled, out["kennzahlen"], push_ctr)
                for key, records in filled.items():
                    for rec in records:
                        push_item_to_return_object(key, rec, out["kennzahlen"], push_ctr)

    for key in list(out["kennzahlen"]):
        out["kennzahlen"][key] = textops.remove_empty(out["kennzahlen"][key])
        if not out["kennzahlen"][key]:
            del out["kennzahlen"][key]
    out["notizen"] = textops.remove_empty(out["notizen"])
    return {f"boersenbewertung{callnumber}": out}


def _column_identifiers(tables_parsed, header_table_idx: int, data_table_idx: int):
    """AG/Konzern identifier span across data columns (P7).
    Ref: lib/parser_tables.js:1943-1956, 2377-2390."""
    idents: list[str] = []
    n_cols = len(tables_parsed[data_table_idx]) - 1
    n_idents = len(tables_parsed[header_table_idx]) - 1
    if n_idents <= 0:
        return idents
    span = int(n_cols / n_idents)
    for i in range(1, len(tables_parsed[header_table_idx])):
        ident = html_text(tables_parsed[header_table_idx][i][0]).strip()
        idents.extend([ident] * span)
    return idents


def parse_aus_bilanzen(tables_parsed, tables_arr, rest, infos, headline) -> dict:
    """Balance-sheet dynamic pivot with AG/Konzern column identifiers and the
    empty-bold year repair. Ref: lib/parser_tables.js:1855-2307."""
    out: dict = {"ausBilanzen": {}, "notizen": [], "waehrung": None}

    par = textops.match_between_parenthesis(html_text(headline))
    if par:
        out["waehrung"] = par.replace("(", "").replace(")", "").strip()

    for k in sorted(rest):
        txt = html_text(rest[k])
        if txt and "Aus den Bilanzen" in txt:
            hline = html_text(rest.get(0, "")).replace("Aus den Bilanzen", "")
            p = textops.match_between_parenthesis(hline)
            if p:
                out["notizen"].append(p)
        else:
            out["notizen"].append(txt)

    column_identifiers: list[str] = []
    start = 0
    if len(tables_parsed) == 3:
        start = 1
        column_identifiers = _column_identifiers(tables_parsed, 0, 1)

    for s in range(start, len(tables_parsed)):
        table = tables_parsed[s]
        groups: list[dict] = []
        g: dict = {"kopfzeile": -1, "jahr": -1}
        occurrences: dict = {}
        push_ctr = -1
        for i, col in enumerate(table):
            if (col and html_text(col[0]).strip()) or (
                    len(col) > 1 and html_text(col[1]).strip()):
                push_ctr += 1
            if i == 0:
                for x, cell in enumerate(col):
                    text = html_text(cell).strip()
                    if "<b></b>" in cell:
                        g = _check_table_contains_year(table, g, i, x)
                    elif "<b>" in cell and "</b>" in cell:
                        if g["kopfzeile"] != -1:
                            groups.append(g)
                            g = {"kopfzeile": -1, "jahr": -1}
                        g["kopfzeile"] = text.replace(",", "")
                        if g["jahr"] == -1:
                            g = _check_table_contains_year(table, g, i, x)
                    lc = text.lower()
                    if not cell or not lc:
                        continue
                    _increment(occurrences, lc)
                    _assign_index(g, lc, occurrences, x)
                groups.append(g)
            else:
                filled = parse_column_content_to_item_kennzahlen(col, groups)
                filled = adapt_year_in_filled_item(filled, out["ausBilanzen"], push_ctr)
                for key, records in filled.items():
                    for rec in records:
                        if column_identifiers and 0 <= i - 1 < len(column_identifiers):
                            rec["columnId"] = column_identifiers[i - 1]
                        push_item_to_return_object(key, rec, out["ausBilanzen"], push_ctr)

    out["notizen"] = textops.remove_empty(out["notizen"])
    return out


_GUV_STATIC = (
    # (match-predicate over the lowercased header text, field name)
    (lambda lc: "umsatz" in lc, "umsatz"),
    (lambda lc: "bestandsveränderung" in lc, "bestandsveraenderung"),
    (lambda lc: "akt" in lc and "eigenleistung" in lc, "akteigenleistung"),
    (lambda lc: "sonst" in lc and "betr" in lc and "erträge" in lc, "sonstbetrerträge"),
    (lambda lc: "materialaufwand" in lc, "materialaufwand"),
    (lambda lc: "personalaufwand" in lc, "personalaufwand"),
    (lambda lc: "abschreibungen" in lc, "abschreibungen"),
    (lambda lc: "sonst" in lc and "betr" in lc and "aufwand" in lc, "sonstbetraufwand"),
    (lambda lc: "finanzergebnis" in lc, "finanzergebnis"),
    (lambda lc: "ergebnis" in lc and "geschäftstätigkeit" in lc,
     "ergebnis_d_gewoehnlichen_geschaeftstaetigkeit"),
    (lambda lc: "ao ergebnis" in lc, "aoergebnis"),
    (lambda lc: "steuern" in lc and "ee" not in lc, "steuern"),
    (lambda lc: "ee-steuern" in lc, "eesteuern"),
    (lambda lc: "jahresergebnis" in lc, "jahresergebnis"),
)

_GUV_FIELDS = ("jahr", "bestandsveraenderung", "akteigenleistung", "sonstbetrerträge",
               "materialaufwand", "personalaufwand", "abschreibungen",
               "sonstbetraufwand", "finanzergebnis",
               "ergebnis_d_gewoehnlichen_geschaeftstaetigkeit", "aoergebnis",
               "steuern", "eesteuern", "jahresergebnis")


def parse_aus_guv(tables_parsed, tables_arr, rest, infos, headline) -> dict:
    """P&L pivot with a fixed field battery + dynamic fallback keys and
    AG/Konzern identifiers. Ref: lib/parser_tables.js:2319-2559."""
    out: dict = {"ausGewinnUndVerlustRechnung": [], "notizen": []}

    par = textops.match_between_parenthesis(headline or "")
    if par:
        out["waehrung"] = par.replace("(", "").replace(")", "").strip()

    for k in sorted(rest):
        txt = html_text(rest[k])
        if txt and "Aus den Bilanzen" in txt:
            hline = html_text(rest.get(0, "")).replace("Aus den Bilanzen", "")
            p = textops.match_between_parenthesis(hline)
            if p:
                out["notizen"].append(p)
        else:
            out["notizen"].append(txt)

    column_identifiers: list[str] = []
    start = 0
    if len(tables_parsed) == 2:
        start = 1
        column_identifiers = _column_identifiers(tables_parsed, 0, 1)

    for s in range(start, len(tables_parsed)):
        table = tables_parsed[s]
        groups: list[dict] = []
        g: dict = {f: -1 for f in _GUV_FIELDS}
        for i, col in enumerate(table):
            next_col = table[i + 1] if i + 1 < len(table) else None
            if i == 0:
                for x, cell in enumerate(col):
                    next_cell = next_col[x] if next_col and x < len(next_col) else None
                    if "<b></b>" in cell:
                        for tcol in table:
                            if textops.match_number(tcol[x] if x < len(tcol) else ""):
                                if g["jahr"] != -1:
                                    groups.append(g)
                                    g = {f: -1 for f in _GUV_FIELDS}
                                g["jahr"] = x
                    lc = html_text(cell).strip().lower()
                    if not cell or not lc:
                        continue
                    if ("bilanzsumme" not in lc and next_cell and "</b>" in next_cell):
                        if g["jahr"] != -1:
                            groups.append(g)
                            g = {f: -1 for f in _GUV_FIELDS}
                        g["jahr"] = x
                        continue
                    for pred, field in _GUV_STATIC:
                        if pred(lc):
                            if g.get(field, -1) != -1:
                                groups.append(g)
                                g = {f: -1 for f in _GUV_FIELDS}
                            g[field] = x
                            break
                    else:
                        g[lc] = x
                groups.append(g)
            else:
                item = parse_column_content_to_item(col, groups)
                if column_identifiers and 0 <= i - 1 < len(column_identifiers):
                    item["columnId"] = column_identifiers[i - 1]
                push_item_to_return_object("ausGewinnUndVerlustRechnung", item, out, i)

    out["ausGewinnUndVerlustRechnung"] = textops.remove_empty(
        out["ausGewinnUndVerlustRechnung"])
    out["notizen"] = textops.remove_empty(out["notizen"])
    return out
