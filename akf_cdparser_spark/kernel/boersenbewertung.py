"""Exchange-listing extraction (SURVEY.md §2 E22).

Re-expresses lib/parser_boersenbewertung.js: WKN/ISIN numbers + share kinds,
Marktbetreuer, Notiert-notes, leftovers as bemerkungen. Output is keyed
``boersenbewertung<N>`` by per-document occurrence (the reference's
callCounter, lib/callCounter.js:52-54 — reproduced as a per-document local
counter, never global state; see SURVEY.md §4.2 "hidden global state").
"""

from __future__ import annotations

from . import textops
from .textops import html_text


def parse_boersenbewertung(lines: list[str], callnumber: int) -> dict:
    out: dict = {}
    nextline_is_notiert = False
    for line in lines:
        if not line:
            continue
        lc = line.lower()
        if "wertpapier-kenn-nr" in lc:
            wkn: dict = {}
            nums = textops.match_number(line)
            if nums:
                wkn["nummer"] = nums[0]
            parts = line.split(",")
            if len(parts) >= 2:
                wkn["aktienart"] = html_text(parts[1])
            out.setdefault("wkns", []).append(wkn)
        elif "isin:" in lc:
            isin: dict = {}
            parts = line.split(",")
            if parts:
                head = parts[0].split(":")
                if len(head) > 1:
                    isin["nummer"] = html_text(head[1]).strip()
            if len(parts) > 1:
                info = html_text(parts[1]).strip()
                if info:
                    isin["aktienart"] = info
            out.setdefault("isins", []).append(isin)
        elif "marktbetreuer" in lc:
            parts = line.split("arktbetreuer:")
            if len(parts) > 1:
                out.setdefault("marktbetreuer", []).append(html_text(parts[1]).strip())
            if "notiert" in parts[0] or "Notiert" in parts[0]:
                trimmed = parts[0].strip()
                out.setdefault("notizen_kennzahlen", []).append(trimmed[:-2])
        elif nextline_is_notiert:
            for chunk in line.split("<br>"):
                info = html_text(chunk).strip()
                if info:
                    out.setdefault("notizen_kennzahlen", []).append(info)
        elif "notiert" in lc:
            for chunk in line.split("<br>"):
                info = html_text(chunk).replace("Notiert:", "").strip()
                if info:
                    out.setdefault("notizen_kennzahlen", []).append(info)
                else:
                    nextline_is_notiert = True
        else:
            maybe = html_text(line).strip()
            if maybe:
                out.setdefault("bemerkungen", []).append(maybe)
    return {f"boersenbewertung{callnumber}": out}
