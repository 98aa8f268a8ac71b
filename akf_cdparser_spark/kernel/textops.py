"""Scalar string/regex kernels (SURVEY.md §2.5, F1-F17).

Each function mirrors the observable behavior of a reference helper
(cited per function). All are pure and operate on single strings; the Spark
layer applies them inside Arrow-batched pandas UDFs or, where a Spark
built-in exists (``regexp_extract``, ``split``…), uses the built-in instead
(see operators/ and __spark_entry__.py).
"""

from __future__ import annotations

import html as _htmllib
import re

# ---------------------------------------------------------------------------
# regex kernels (reference: lib/regexLib.js)
# ---------------------------------------------------------------------------

_RE_PERCENT = re.compile(r"\d+(?:[,.]\d+)?\s*%")
_RE_YEAR = re.compile(r"^\d{4}")
_RE_NUMBER = re.compile(r"\d+(?:[,.]\d+)?")
_RE_TAG = re.compile(r"</?[^>]+(?:>|$)")
_RE_TAG_STRICT = re.compile(r"<[^>]+>")
_RE_CLEAN = re.compile(r"[\s\n\t,;():.\-]+")
_RE_BRACKET_GROUP = re.compile(r"\((.*?)\)")
_RE_ENDS_COLON = re.compile(r":\s*$")
_RE_LAST_COMMA = re.compile(r",\s*$")


def match_percentage(line: str) -> list[str]:
    """All ``12,3 %``-style tokens. Ref: lib/regexLib.js:18-21."""
    return _RE_PERCENT.findall(line or "")


def match_year(line: str) -> str | None:
    """Leading 4-digit year or None. Ref: lib/regexLib.js:28-31."""
    m = _RE_YEAR.match(line or "")
    return m.group(0) if m else None


def match_number(line: str) -> list[str]:
    """All integer/decimal tokens (comma or dot). Ref: lib/regexLib.js:44-51."""
    return _RE_NUMBER.findall(line or "")


def strip_tags(data: str) -> str:
    """Drop every ``<...>`` tag (incl. an unterminated tail tag).
    Ref: lib/regexLib.js:57-60."""
    return _RE_TAG.sub("", data or "")


def html_text(htmltext: str) -> str:
    """Tag-strip + HTML entity decode — behavioral twin of the reference's
    cheerio text extraction (lib/utils.js:217-221)."""
    if htmltext is None:
        return ""
    return _htmllib.unescape(_RE_TAG_STRICT.sub("", str(htmltext)))


def clean_text(literal: str) -> str:
    """Lowercase + collapse separator runs to one space. Ref: lib/utils.js:12-14."""
    return _RE_CLEAN.sub(" ", str(literal).lower())


def replace_comma_in_number(line: str, replacement: str = ".") -> str:
    """Decimal comma -> ``replacement`` only inside number tokens.
    Ref: lib/regexLib.js:82-95."""
    out = line
    for token in match_number(line):
        if "," in token:
            out = out.replace(token, token.replace(",", replacement), 1)
    return out


def remove_leading_character(line: str, character: str) -> str:
    """Strip repeated leading (and trailing) occurrences of ``character``.
    Ref: lib/regexLib.js:104-115 (recursive head/tail trim)."""
    if not line:
        return line
    s = line
    while s[: len(character)] == character or s.endswith(character):
        if s[: len(character)] == character:
            s = s[len(character):]
        elif s.endswith(character):
            s = s[: -len(character)]
        s = s.strip()
        if not s:
            break
    return s.strip()


def replace_semicolon_and_comma_in_brackets(s: str) -> str:
    """Neutralize ``;``/`,`` inside each non-greedy ``(...)`` group with a
    space so the outer split is safe. Ref: lib/regexLib.js:121-134."""
    if not s:
        return s
    groups = re.findall(r"\(.*?\)", s)
    for grp in groups:
        if ";" in grp or "," in grp:
            s = s.replace(grp, grp.replace(";", " ").replace(",", " "))
    return s


def check_if_string_is_in_parenthesis(needle: str, line: str):
    """Match the ``(... needle ...)`` group around ``needle`` if any.
    Ref: lib/regexLib.js:149-154."""
    esc = re.escape(needle)
    pattern = (
        r"\([^)]+" + esc + r"[^(]+\)|\([^)]*" + esc + r"[^(]+\)|\([^)]+" + esc + r"[^(]*\)"
    )
    return re.search(pattern, line)


def match_from_to(data: str, from_re: str, to_re: str, ignore_case: bool = True):
    """Substring starting at first ``from_re`` hit up to the next ``to_re``
    hit; returns [with-delimiters, without-from] or None.
    Ref: lib/regexLib.js:169-198 (note: ``to`` is searched from the start of
    the ``from``-suffix, i.e. it may legitimately hit inside the from-token)."""
    flags = re.IGNORECASE if ignore_case else 0
    m_from = re.search(from_re, data, flags)
    if not m_from:
        return None
    used = data[m_from.start():]
    m_to = re.search(to_re, used, flags)
    if m_to:
        used = used[: m_to.start()]
    without = re.sub(from_re, "", used, count=1, flags=flags).strip()
    return [used, without]


def match_between_parenthesis(data: str):
    """Greedy ``(...)`` span or None. Ref: lib/regexLib.js:204-206."""
    m = re.search(r"\(.*\)", data or "")
    return m.group(0) if m else None


def remove_last_comma(data: str) -> str:
    return _RE_LAST_COMMA.sub("", data or "")


def remove_last_colon(data: str) -> str:
    return _RE_ENDS_COLON.sub("", data or "")


def remove_last_character(data: str, char: str) -> str:
    """Ref: lib/regexLib.js:243-248 (regex-tail removal)."""
    if not char:
        return data
    return re.sub(re.escape(char) + r"\s*$", "", data or "")


def remove_parenthesis(data: str) -> str:
    return (data or "").replace("(", "").replace(")", "")


def does_end_with_colon(data: str) -> bool:
    return bool(data) and bool(_RE_ENDS_COLON.search(data))


def find_string_ending_with_colon(data: str):
    return re.search(r".+:$", data or "")


def char_followed_by_letter(data: str, char: str = "¦") -> bool:
    """True when the sentinel char is immediately followed by a letter —
    rejects dictionary hits inside longer words (``Dr`` in ``Dreikirchen``).
    Ref: lib/regexLib.js:267-274."""
    return bool(data) and re.search("¦[a-zA-Z]", data) is not None


def split_at_first(s: str, sep: str) -> tuple[str, str]:
    """(head, tail) around the FIRST ``sep``; mirrors the reference's
    String.prototype.splitAtFirst incl. its not-found quirk
    (lib/parser.js:50-53: head='' when sep missing)."""
    idx = s.find(sep)
    if idx < 0:
        return "", s[len(sep) - 1:]
    return s[:idx], s[idx + len(sep):]


def remove_last_characters(line: str, tail: str) -> tuple[str, bool]:
    """(line, removed?) — strip an exact trailing token. Ref: lib/utils.js:37-52."""
    if not tail or not line:
        return line, False
    if line.endswith(tail):
        return line[: -len(tail)].strip(), True
    return line, False


def get_parenthesis_content(line: str, fill_parenthesis: bool = False) -> list[str]:
    """Balanced-parenthesis scanner collecting each complete top-level
    ``( ... )`` tree; optionally auto-closes an unbalanced tail.
    Ref: lib/utils.js:134-178. Regex cannot balance — keep as scanner."""
    if not line:
        return []
    collected: list[str] = []
    buf = ""
    opens = closes = 0
    for ch in line:
        if ch == "(":
            opens += 1
        if ch == ")":
            closes += 1
            if closes == opens:
                buf += ch
                collected.append(buf)
                buf = ""
                opens = closes = 0
                continue
        if opens > closes:
            buf += ch
    if fill_parenthesis and buf and opens > closes:
        return get_parenthesis_content(line + ")" * (opens - closes))
    return collected


def remove_strings_from_string(line: str, strings: list[str]) -> str:
    """Remove each entry (longest first, first occurrence each).
    Ref: lib/utils.js:108-126."""
    if not line or not strings:
        return line
    for s in sorted(strings, key=lambda x: -(len(x) if x else 0)):
        if s:
            line = line.replace(s, "", 1)
    return line


def trim_all(parts: list[str]) -> list[str]:
    return [p.strip() for p in parts]


def remove_empty(values: list) -> list:
    """Drop '', None, empty dicts/lists. Ref: lib/utils.js:88-99."""
    out = []
    for v in values:
        if v == "" or v is None:
            continue
        if isinstance(v, (dict, list)) and not v:
            continue
        out.append(v)
    return out


def prune_falsy(obj: dict) -> dict:
    """Drop keys with falsy values (the reference's ``if (!manager[k]) delete``
    idiom, e.g. lib/parser_persons.js:168)."""
    return {k: v for k, v in obj.items() if v}


def get_stueckelung(line: str, specialmode: bool = False) -> str | None:
    """Extract the 'Stückelung:'-tail. Ref: lib/parser_tables.js:2810-2842."""
    if not re.search("Stückelung", line or "", re.IGNORECASE):
        return None
    splitter = "elung:" if specialmode else ":"
    parts = line.split(splitter)
    st = parts[1] if len(parts) > 1 else None
    if specialmode and st:
        st = st.split("Stimmrecht:")[0].strip()
    if st:
        tail = re.split("Stückelung", st, flags=re.IGNORECASE)
        if len(tail) >= 2:
            st = tail[1]
        st = st.strip()
    return st


def get_stimmrecht(line: str, specialmode: bool = False) -> str | None:
    """Extract the 'Stimmrecht:'-tail. Ref: lib/parser_tables.js:2849-2881."""
    if not re.search("Stimmrecht", line or "", re.IGNORECASE):
        return None
    splitter = "immrecht:" if specialmode else ":"
    parts = line.split(splitter)
    st = parts[1] if len(parts) >= 2 else parts[0]
    if specialmode and st:
        st = st.split("Stimmrecht:")[0].strip()
    if st and "tückelung:" in st.strip():
        return None
    return st
