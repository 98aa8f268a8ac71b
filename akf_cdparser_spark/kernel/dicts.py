"""Dictionary-assisted entity matching (titles / person functions).

Behavior mirrors lib/dictionaryHandler.js: two reference tables (person
titles, person functions) scanned greedily longest-entry-first with an
"is the hit followed by a letter?" guard against substring false positives
(lib/dictionaryHandler.js:183-206,302-313). The optional Levenshtein path
(lib/dictionaryHandler.js:207-250, normalized ``d/maxlen*100 + 20/len <= 10``)
is implemented too, though the reference's default path is exact matching
(lib/parser_persons.js:52-53).

In Spark these tables are tiny (1,232 / 2,316 rows) — they ride to executors
as plain broadcast lists inside the Arrow-UDF closure; at 100 TB that is the
textbook broadcast-dimension pattern (no shuffle, no join).
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

from . import textops

# Default location of the public dictionary exports shipped with the
# reference (dictfiles/dict_titles.json, dictfiles/dict_functs.json —
# SQLite exports, shape {ddl, columns, rows: [["Prof. Dr. jur."], ...]}).
_REFERENCE_DICTDIR = "/root/reference/dictfiles"

# Minimal embedded fallback so the engine stays standalone when the
# reference checkout is absent (covers the golden fixture's entries).
_FALLBACK_TITLES = [
    "Prof. Dr. jur.", "Dr. jur.", "Dr. rer. nat.", "Prof. Dr.", "Dipl.-Ing.",
    "Dipl.-Kfm.", "Dr.-Ing.", "Dr.", "Prof.", "WP", "StB", "RA",
]
_FALLBACK_FUNCTS = [
    "Vorstandssprecher", "stellv. Vorsitzender", "Ehrenvorsitzender",
    "stellv. Vors.", "Arbeitnehmervertreter", "Vorsitzender", "Vors.",
    "stellv.", "Marketing und Vertrieb", "Vertrieb", "Finanzen",
]

_RE_BRACKET_GROUPS = re.compile(r"(\((.*?)\))")
_RE_FH_EXCEPTION = re.compile(r"\((FH)\)")

LDIST_THRESHOLD = 10  # lib/dictionaryHandler.js:20


def _load_rows(path: str) -> list[str] | None:
    try:
        with open(path, encoding="utf-8") as fh:
            payload = json.load(fh)
        return [row[0] for row in payload.get("rows", []) if row]
    except (OSError, json.JSONDecodeError):
        return None


@lru_cache(maxsize=1)
def load_dictionaries(dictdir: str | None = None) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(titles, functs), each sorted descending by entry length
    (greedy longest-first — lib/dictionaryHandler.js:302-313)."""
    dictdir = dictdir or os.environ.get("AKF_DICTFILES", _REFERENCE_DICTDIR)
    titles = _load_rows(os.path.join(dictdir, "dict_titles.json")) or list(_FALLBACK_TITLES)
    functs = _load_rows(os.path.join(dictdir, "dict_functs.json")) or list(_FALLBACK_FUNCTS)
    titles.sort(key=len, reverse=True)
    functs.sort(key=len, reverse=True)
    return tuple(titles), tuple(functs)


class DictHit(dict):
    """Result of a dictionary scan (attribute-style access for readability)."""

    @property
    def is_hit(self) -> bool:
        return self.get("is_hit", False)


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@lru_cache(maxsize=8)
def _gram_index(entries: tuple[str, ...]):
    """2-gram candidate index over a (length-desc sorted) dictionary: a line
    can only contain entry ``e`` if the line's character 2-grams include
    ``e[:2]`` — so the scan touches ~tens of candidates instead of all
    entries, with identical results (exactness covered by
    tests/test_kernel_units.py::test_dict_fast_path_equals_reference)."""
    index: dict[str, list[int]] = {}
    always: list[int] = []
    for pos, e in enumerate(entries):
        if len(e) >= 2:
            index.setdefault(e[:2], []).append(pos)
        elif e:
            index.setdefault(e, []).append(pos)
        else:
            always.append(pos)  # '' matches everything in the reference
    return index, always


# the index is a pure function of the (hashable) entries tuple and there
# are only a handful of dictionaries per process — memoize instead of
# rebuilding it on every candidate scan (hot path: thousands of calls/doc
# batch inside the extraction operator)
_gram_index = lru_cache(maxsize=16)(_gram_index)


def _candidate_positions(filtered: str, entries: tuple[str, ...]) -> list[int]:
    index, always = _gram_index(entries)
    grams = {filtered[i:i + 2] for i in range(len(filtered) - 1)}
    grams.update(filtered)
    out: set[int] = set(always)
    for g in grams:
        hits = index.get(g)
        if hits:
            out.update(hits)
    return sorted(out)


def check_dict_content(data: str, entries: tuple[str, ...], matching: str = "normal") -> DictHit:
    """Scan every dictionary entry (already longest-first) against ``data``.

    Normal path (lib/dictionaryHandler.js:183-206): accumulate each entry
    found as a substring — unless the hit is immediately followed by a letter
    (guard via the ``¦`` sentinel) — and strip it from the working string.
    The entry loop is candidate-pruned by a 2-gram index (most lines contain
    no dictionary entry at all); after each hit the candidate tail is
    recomputed because stripping can join characters into new matches.

    ldist path (lib/dictionaryHandler.js:207-250): best normalized prefix
    Levenshtein match below threshold wins.
    """
    result = DictHit(is_hit=False, data_without="", has_rest=False, found="")
    if not entries:
        return result

    if matching == "normal":
        accu = ""
        remaining = data
        filtered = _RE_FH_EXCEPTION.sub("", remaining)
        cand = _candidate_positions(filtered, entries)
        ptr = 0
        while ptr < len(cand):
            pos = cand[ptr]
            ptr += 1
            entry = entries[pos]
            if entry in filtered:
                candidate = remaining.replace(entry, "¦", 1).replace("()", "")
                if not textops.char_followed_by_letter(candidate):
                    accu = accu + " " + entry
                    remaining = candidate.replace("¦", "", 1)
                    filtered = _RE_FH_EXCEPTION.sub("", remaining)
                    # later entries see the stripped string — rebuild the
                    # not-yet-visited candidate tail against it
                    tail = [p for p in _candidate_positions(filtered, entries)
                            if p > pos]
                    cand = cand[:ptr] + sorted(set(cand[ptr:]) | set(tail))
        if accu:
            result["is_hit"] = True
            result["data_without"] = remaining.strip()
            result["has_rest"] = len(remaining.strip()) > 0
            result["found"] = accu
        return result

    # ldist path
    data = data.strip()
    best: tuple[float, str] | None = None
    for entry in entries:
        d = _levenshtein(entry, data[: len(entry)])
        maxlen = max(len(entry), len(data)) or 1
        norm = (d / maxlen * 100) + (20 / max(len(entry), 1))
        if norm <= LDIST_THRESHOLD and (best is None or norm < best[0]):
            best = (norm, entry)
    if best:
        result["is_hit"] = True
        result["found"] = data[: len(best[1])]
        result["data_without"] = data[len(best[1]):].strip()
        result["has_rest"] = len(result["data_without"]) >= 1
    return result


def check_funct(data: str, dictdir: str | None = None) -> DictHit:
    """Person-function lookup (lib/dictionaryHandler.js:135-137)."""
    _, functs = load_dictionaries(dictdir)
    return check_dict_content(data, functs)


def check_title_in_parts(parts: list[str], separator: str = ",",
                         matching: str = "normal", dictdir: str | None = None) -> DictHit:
    """Scan comma-separated person-line parts for titles; accumulate title,
    name candidate, and the line without titles.
    Ref: lib/dictionaryHandler.js:53-129 (checkIfTitleIsInArray)."""
    titles, _ = load_dictionaries(dictdir)

    title_accu = ""
    without_accu = ""
    name_accu = ""
    next_index = 0

    for i, part in enumerate(parts):
        # everything in (...) is a funct, not a title — except the (FH) grade
        bracket_groups = _RE_BRACKET_GROUPS.findall(part)
        found_expr = ""
        for grp, _inner in bracket_groups:
            if not _RE_FH_EXCEPTION.search(grp):
                found_expr = grp
        element = part.replace(found_expr, "") if found_expr else part

        info = check_dict_content(element, titles, matching)
        if info.is_hit:
            title_accu = title_accu + separator + info["found"]
            without_accu = without_accu + separator + part.replace(info["found"].strip(), "")
            if info["has_rest"]:
                name_accu = name_accu + separator + info["data_without"]
            next_index = i + 1
        else:
            without_accu = without_accu + separator + part
            if info["has_rest"]:
                name_accu = name_accu + separator + info["data_without"]

    result = DictHit(
        title_detected=textops.remove_leading_character(title_accu.strip(), separator),
        has_title=False,
        name_detected="",
        has_name=False,
        next_index=next_index,
        data_without=textops.remove_leading_character(without_accu.strip(), separator),
    )
    if name_accu:
        result["has_name"] = True
        # the reference's final "quick fix": name = accumulated non-title data
        # (lib/dictionaryHandler.js:125-127)
        result["name_detected"] = result["data_without"]
    result["has_title"] = len(result["title_detected"]) > 0
    return result
