"""Golden-lock of the LSE streak-grouping port against the reference.

scripts/lse_golden.js runs the VERBATIM ``doGrouping``/``elementStreak``
source extracted from /root/reference/lib/lineSegmentAnalyzer.js in a Node
vm; the Python port must reproduce it exactly — including plateau walks,
second-rise streak breaks, last-sector maxima and the group-removal repeat
loop — over randomized and adversarial histograms."""

import json
import random
import shutil
import subprocess
import os

import pytest

from akf_cdparser_spark.analytics.lse_grouping import streak_grouping

_JS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "scripts", "lse_golden.js")

node = shutil.which("node")


def _reference(cases):
    out = subprocess.run([node, _JS], input=json.dumps(cases).encode(),
                         capture_output=True, check=True)
    return json.loads(out.stdout)


def _norm(rows):
    return sorted((k, s, c, g) for k, s, c, g in rows)


ADVERSARIAL = [
    # plateau: equal run, no strict maximum
    {"w": {0: 5, 1: 5, 2: 5, 3: 5}},
    # plateau then rise then fall (tie handling + late maximum)
    {"w": {0: 3, 1: 3, 2: 7, 3: 2}},
    # two maxima: second rise after a found maximum splits streaks
    {"w": {0: 1, 1: 9, 2: 1, 3: 8, 4: 1}},
    # maximum in the last sector (stop-index force-extend quirk)
    {"w": {6: 1, 7: 2, 8: 3, 9: 9}},
    # descending from the start (strict-> keeps maxCtr at the start value)
    {"w": {0: 9, 1: 4, 2: 2, 3: 1}},
    # gaps break streaks
    {"w": {0: 2, 1: 3, 4: 5, 5: 6, 6: 1, 9: 4}},
    # single elements stay ungrouped
    {"w": {0: 1, 5: 2, 9: 3}},
    # wide mountain: repeat-grouping path (group span > 1 after removal)
    {"w": {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 4, 6: 3, 7: 2, 8: 1, 9: 1}},
    # several classes at once (independent keys, shared walk)
    {"a": {0: 2, 1: 4, 2: 2}, "b": {1: 1, 2: 1, 3: 1}, "c": {5: 9}},
]


@pytest.mark.skipif(node is None, reason="node not available")
def test_port_matches_reference_adversarial():
    golden = _reference(ADVERSARIAL)
    for case, expect in zip(ADVERSARIAL, golden):
        got = streak_grouping(
            {k: {int(s): c for s, c in v.items()} for k, v in case.items()})
        assert _norm(got) == _norm([tuple(r) for r in expect]), case


@pytest.mark.skipif(node is None, reason="node not available")
def test_port_matches_reference_randomized():
    rng = random.Random(42)
    cases = []
    for _ in range(300):
        case = {}
        for key in ("x", "y")[: rng.randint(1, 2)]:
            sectors = rng.sample(range(10), rng.randint(1, 10))
            case[key] = {s: rng.randint(1, 9) for s in sectors}
        cases.append(case)
    golden = _reference(cases)
    for case, expect in zip(cases, golden):
        got = streak_grouping(case)
        assert _norm(got) == _norm([tuple(r) for r in expect]), case


def test_totals_preserved():
    rng = random.Random(7)
    for _ in range(50):
        hist = {"k": {s: rng.randint(1, 20)
                      for s in rng.sample(range(10), rng.randint(1, 10))}}
        rows = streak_grouping(hist)
        assert sum(c for _, _, c, _ in rows) == sum(hist["k"].values())
