"""A4 validator coverage diff (SURVEY.md §2.6 A4).

Re-expresses lib/validator.js:21-58 (`unparsedText`): subtract every parsed
leaf value plus the predefined static labels from the cleaned ``_fulltext``;
whatever text remains was seen by no extractor. The per-doc
``unparsed_chars / fulltext_chars`` ratio is the reference team's main QA
metric for extractor coverage.

Deviation from the reference (documented): leaf strings are regex-escaped
before substitution — the reference interpolates them raw into a RegExp
(lib/validator.js:50), which crashes on leaves containing metacharacters;
after cleanText only ``* + ? [ ] { } | ^ $ \\ /`` could survive, none of
which occur in value position in the corpus, so escaped-vs-raw is
behavior-identical on real data and strictly safer.
"""

from __future__ import annotations

import re

from .textops import clean_text

# lib/validator.js:22-36
PREDEFINED = [
    "Status",
    "Tätigkeitsgebiet/Gründung",
    "Gründung",
    "e-mail",
    "Telefon",
    "Management",
    "Aufsichtsrat",
    "Stammaktien",
    "Nennwert",
    "Internetseite",
    "Telefax",
    "ISIN",
    "Wertpapier-Kenn.Nr",
]
_PREDEFINED_CLEAN = [clean_text(p) for p in PREDEFINED]


def leaf_nodes(value) -> list:
    """F14 (lib/utils.js:58-67): every scalar leaf of a nested structure."""
    if isinstance(value, dict):
        out = []
        for v in value.values():
            out.extend(leaf_nodes(v))
        return out
    if isinstance(value, (list, tuple)):
        out = []
        for v in value:
            out.extend(leaf_nodes(v))
        return out
    if value is None:
        return []
    return [value]


# no \s* around the label (the reference has it): over the space-filler
# runs the struck text leaves behind, a leading \s* backtracks
# quadratically (~10 ms/doc); adjacent whitespace is invisible to the
# coverage stats either way
_PREDEFINED_RES = [
    (re.compile(r"\b" + re.escape(s) + r"\b"), s)
    for s in _PREDEFINED_CLEAN]


def unparsed_text(record: dict, replace_values: str = " ",
                  replace_predefined: str = "*") -> str:
    """lib/validator.js:44-58: strike each parsed leaf (first occurrence)
    and each predefined label (all occurrences) out of the fulltext.

    Hot path (runs per document inside the extraction operator): the leaf
    strike is a plain substring find + slice-splice — building a regex per
    leaf costs more than the whole kernel parse. Unlike the reference's
    ``\\s*leaf\\s*`` pattern this leaves adjacent whitespace in place, which
    is invisible to the coverage stats (they never count whitespace)."""
    remaining = clean_text(record.get("_fulltext") or "")
    for key, value in record.items():
        if key.startswith("_fulltext"):
            continue
        for leaf in leaf_nodes(value):
            s = clean_text(str(leaf))
            if not s or s.isspace():
                continue
            at = remaining.find(s)
            if at >= 0:
                remaining = (remaining[:at] + replace_values * len(s)
                             + remaining[at + len(s):])
    for rx, s in _PREDEFINED_RES:
        remaining = rx.sub(replace_predefined * len(s), remaining)
    return remaining


def coverage_stats(record: dict) -> tuple[int, int]:
    """(unparsed_chars, fulltext_chars): non-filler characters left after the
    subtraction vs total non-space characters of the cleaned fulltext.
    Counting via str.count (C speed) — the strikes only ever substitute
    ' '/'*' for other characters, so len - count(' ') - count('*') equals
    the old per-char generator count exactly."""
    full = clean_text(record.get("_fulltext") or "")
    remaining = unparsed_text(record)
    unparsed = len(remaining) - remaining.count(" ") - remaining.count("*")
    total = len(full) - full.count(" ")
    return unparsed, total
