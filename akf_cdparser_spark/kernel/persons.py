"""Person-line classification (SURVEY.md §2 E7-E10, E15, E20).

Re-expresses lib/parser_persons.js: a comma-separated person line is
decomposed into title (dictionary longest-match), first/last name, function
(from the trailing comma-field via the functions dictionary, or from a
``(...)`` group), and an accumulated city; plus the Vorstand / Investor
Relations / Gesellschafter / Leitung-Kommunikation drivers built on it.
"""

from __future__ import annotations

import os
import re

from . import textops
from .dicts import check_funct, check_title_in_parts

# Dictionary matching mode for the title lookup: "normal" = exact greedy
# longest-match (the reference's default, lib/parser_persons.js:52-53);
# "ldist" = Levenshtein fuzzy prefix match (lib/dictionaryHandler.js:207-250)
# for OCR-noisy corpora. Configurable per process via the env var or
# ``set_matching_mode`` — never mutated implicitly, so executors stay
# deterministic (workers inherit the env var through spark-submit conf).
MATCHING_MODE = os.environ.get("AKF_DICT_MATCHING", "normal")


def set_matching_mode(mode: str) -> None:
    if mode not in ("normal", "ldist"):
        raise ValueError(f"unknown matching mode: {mode!r}")
    global MATCHING_MODE
    MATCHING_MODE = mode


_RE_PERS_HAFTEND = re.compile(r"\(persönlich haftend\)", re.IGNORECASE)
_RE_X_MITGLIEDER = re.compile(r"\(\d+ Mitglieder\)", re.IGNORECASE)
_RE_STAR_PAREN = re.compile(r"\*\)")


def detect_name_and_funct(data: str) -> dict:
    """Split ``Jane Vaine (Vors.)`` into name halves + the bracketed funct.
    Ref: lib/parser_persons.js:204-260."""
    out = {
        "detected_name": "", "has_name": False,
        "detected_funct": "", "has_funct": False,
        "firstname": "", "lastname": "", "next_index": None,
    }
    m = re.search(r"\((.*?)\)", data or "")
    if m:
        out["has_funct"] = True
        out["detected_funct"] = m.group(1)
        out["has_name"] = True
        out["detected_name"] = (data or "").replace(m.group(0), "").strip()
    else:
        out["has_name"] = True
        out["detected_name"] = data or ""

    refactored = out["detected_name"].replace("  ", " ", 1)
    parts = refactored.strip().split(" ")
    if len(parts) <= 2:
        lastname = parts[-1]
        out["lastname"] = lastname
        out["firstname"] = out["detected_name"].replace(lastname, "")
    else:
        out["lastname"] = " ".join(p.strip() for p in parts[1:]).strip()
        out["firstname"] = textops.remove_last_comma(parts[0])
        out["next_index"] = 2
    return out


def check_person_line(line: str, common_funct_present: bool = False,
                      common_funct: str = "") -> dict:
    """Classify one person string into
    {title, firstName, lastName, cityAcc, funct, bemerkung}.
    Ref: lib/parser_persons.js:25-171."""
    bemerkung = None
    m = _RE_PERS_HAFTEND.search(line)
    if m:
        line = _RE_PERS_HAFTEND.sub("", line)
        bemerkung = m.group(0)
    line = _RE_X_MITGLIEDER.sub("", line)

    parts = line.split(",")
    current_index = -1

    title_info = check_title_in_parts(parts, ",", MATCHING_MODE)

    funct_last = check_funct(parts[-1])
    if funct_last.is_hit:
        if not funct_last["has_rest"] or not funct_last["data_without"].strip():
            parts = parts[:-1] if parts else parts
        if funct_last["has_rest"] and parts:
            parts[-1] = funct_last["data_without"].strip()

    if not title_info["has_name"] and not title_info["has_title"]:
        current_index = 0
        src = parts[current_index] if parts and parts[current_index] else ""
        name_info = detect_name_and_funct(_RE_STAR_PAREN.sub("", src))
        current_index += 1
    elif title_info["has_name"]:
        if not title_info["has_title"]:
            name_info = detect_name_and_funct(_RE_STAR_PAREN.sub("", title_info["name_detected"]))
        else:
            first_chunk = title_info["data_without"].split(",")[0]
            src = _RE_STAR_PAREN.sub("", first_chunk).replace(title_info["title_detected"], "")
            name_info = detect_name_and_funct(src)
        current_index = title_info["next_index"]
    else:
        to_check = textops.remove_last_comma(title_info["data_without"]).strip()
        name_info = detect_name_and_funct(_RE_STAR_PAREN.sub("", to_check))
        current_index = name_info.get("next_index") or title_info["next_index"]

    # city accumulation over remaining comma fields
    city_acc = ""
    for i in range(current_index, len(parts)):
        part = parts[i]
        if _RE_STAR_PAREN.search(part):
            part = part.split("*)")[0].strip()
        city_acc = part.strip() if not city_acc else city_acc + " (" + part.strip() + ")"

    funct = (funct_last["found"].strip() if funct_last.is_hit
             else name_info["detected_funct"].strip())

    if city_acc:
        city_acc = city_acc.replace(funct, "")
        city_acc = city_acc.replace("(", "").replace(")", "").strip()

    title = title_info["title_detected"].strip()
    first_name = name_info["firstname"].strip()
    last_name = name_info["lastname"].strip()

    if common_funct_present and "*)" in line:
        city_acc = city_acc.replace("*)", "")
        if funct.strip() != common_funct.strip():
            funct = (funct + " " + common_funct).strip()

    manager = {
        "title": title,
        "firstName": textops.html_text(first_name) if first_name else first_name,
        "lastName": textops.html_text(last_name) if last_name else last_name,
        "cityAcc": textops.html_text(city_acc) if city_acc else city_acc,
        "funct": funct,
        "bemerkung": textops.html_text(bemerkung) if bemerkung else bemerkung,
    }
    return textops.prune_falsy(manager)


def parse_vorstand(vorstand: str) -> list[dict]:
    """Semicolon-separated board line -> managers. Ref: lib/parser_persons.js:180-196."""
    vorstand = textops.replace_semicolon_and_comma_in_brackets(vorstand)
    return [check_person_line(chunk.strip())
            for chunk in re.split(r"\s*;\s*", vorstand)]


def parse_investor_relations(lines: list[str]) -> dict:
    """IR/PR contact extraction with the reference's fixpoint-over-leftovers
    protocol. Returns {"return_object": [...], "rest_of_lines": [...]}.
    Ref: lib/parser_persons.js:276-367."""
    final: list[str] = []
    for raw in lines:
        if not raw:
            continue
        cur = (raw.replace("; Fax", "  Fax").replace("; Telefon", "  Telefon")
                  .replace("; Email", "  Email").replace("; E-Mail", "  E-Mail"))
        for chunk in cur.split(";"):
            if chunk and chunk.strip():
                final.append(chunk.strip())

    managers: list[dict] = []
    rest_of_lines: list[str] = []
    for entry in final:
        funct_info = check_funct(entry)
        data = funct_info["data_without"] if funct_info.is_hit else entry
        funct = funct_info["found"] if funct_info.is_hit else ""

        email = telefon = fax = ""
        m = textops.match_from_to(data, "E-Mail:|E-Mail :|Email:|Email :|E-Mai", ",|;|$")
        if m and len(m) >= 2:
            email = m[1].strip().replace("(|)", "")
            data = data.replace(m[0], " ")
        m = textops.match_from_to(data, r"Tel\..*:|Telefon:|Telefon :", ",|;|Fax")
        if m and len(m) >= 2:
            telefon = m[1].strip()
            data = data.replace(m[0], " ")
        m = textops.match_from_to(data, "Fax:|Fax :", ",|;|$|Telefon")
        if m and len(m) >= 2:
            fax = m[1].strip()
            data = data.replace(m[0], " ")

        name = re.split(r"\s{2,}", data)[0].strip()
        leftover = data.replace(name, "", 1).strip()
        if leftover:
            rest_of_lines.extend(leftover.split(";"))

        if name:
            name = name.replace("(", "").replace(")", "").replace(",", "")
        if fax:
            fax = fax.replace("()", "").strip()
        manager = textops.prune_falsy(
            {"name": name, "email": email, "telefon": telefon, "fax": fax, "funct": funct})
        if manager:
            managers.append(manager)
    return {"return_object": managers, "rest_of_lines": rest_of_lines}


def parse_leiter(lines: list[str]) -> dict:
    """'Leitung Kommunikation' contact blocks. Ref: lib/parser_persons.js:460-529."""
    leiter = []
    for raw in lines:
        changed = raw
        item: dict = {}
        tel = textops.match_from_to(raw, "Telefon:", "<br>|;")
        fax = textops.match_from_to(raw, "Fax:", "<br>|;")
        email = textops.match_from_to(raw, "Email:", "<br>|;")
        if tel and tel[0] and tel[1]:
            changed = changed.replace(tel[0], "")
            item["phone"] = tel[1]
        if fax and fax[0] and fax[1]:
            changed = changed.replace(fax[0], "")
            item["fax"] = fax[1]
        if email and email[0] and email[1]:
            changed = changed.replace(email[0], "")
            item["email"] = email[1]
        changed = textops.html_text(changed).replace("br>", "").strip()
        person = check_person_line(changed)
        for src, dst in (("title", "title"), ("firstName", "firstname"),
                         ("lastName", "lastname"), ("cityAcc", "city"), ("funct", "funct")):
            if person.get(src):
                item[dst] = person[src].strip()
        item = textops.prune_falsy(item)
        if item:
            leiter.append(item)
    return {"leiter": leiter}


def parse_gesellschafter(items: list[str]) -> dict:
    """Mode-switching shareholder-block parser (Gesellschafter /
    Kommanditisten / Aktionäre / Anteilseigner / Komplementär).
    Ref: lib/parser_persons.js:369-452."""
    from .holdings import beteiligungen_parse_line, parse_aktionaer

    result: dict = {}
    mode = ""
    for item in items:
        text = textops.html_text(item)
        if "Gesellschafter:<" in item:
            mode = "gesellschafter"
        elif ">Kommanditist" in item:
            mode = "kommanditisten"
        elif "b>Aktion" in item:
            mode = "aktionaere"
        elif ">Anteilseigner" in item:
            mode = "anteilseigner"
        elif ">Komplementär" in item:
            mode = "komplementaer"
        elif mode == "gesellschafter":
            result.setdefault("gesellschafter", []).append(check_person_line(text))
        elif mode == "kommanditisten":
            result.setdefault("kommanditisten", []).append(beteiligungen_parse_line(text))
        elif mode == "aktionaere":
            result.setdefault("aktionaere", []).extend(parse_aktionaer([text]))
        elif mode == "anteilseigner":
            result.setdefault("anteilseigner", []).append(beteiligungen_parse_line(text))
        elif mode == "komplementaer":
            parts = item.split(",")
            result.setdefault("komplementaer", []).append({
                "name": parts[0] if parts else "",
                "ort": parts[1] if len(parts) >= 2 else "",
            })
    return result
