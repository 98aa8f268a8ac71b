"""Drift gate for the pinned q47/q48 oracle tables.

Regenerates the expected values through the same sequential non-Spark paths
as scripts/gen_pinned_oracles.py and asserts they still equal the pinned
module the SQL oracles are rendered from — if the kernel's coverage
semantics or the LSH parameters change, this fails before the driver's
hash gate does.
"""

import importlib.util
import os

import pytest

_GEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts", "gen_pinned_oracles.py")
spec = importlib.util.spec_from_file_location("gen_pinned_oracles", _GEN)
gen = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gen)

from akf_cdparser_spark.plans import pinned  # noqa: E402


def test_q47_pinned_matches_sequential_kernel():
    assert gen.q47_rows() == pinned.Q47_EXPECTED


@pytest.mark.skipif(not os.path.exists(gen.SF001),
                    reason="driver testdata not present")
def test_q29_pinned_matches_sequential_twin():
    assert gen.q29_rows() == pinned.Q29_EXPECTED


@pytest.mark.skipif(not os.path.exists(gen.SF001),
                    reason="driver testdata not present")
def test_q50_pinned_matches_sequential_twin():
    assert gen.q50_rows() == pinned.Q50_EXPECTED


@pytest.mark.skipif(not os.path.exists(gen.SF001),
                    reason="driver testdata not present")
def test_q48_pinned_matches_numpy_twin():
    assert gen.q48_rows() == pinned.Q48_EXPECTED


@pytest.mark.skipif(not os.path.exists(gen.SF001),
                    reason="driver testdata not present")
def test_q65_pinned_matches_numpy_twin():
    assert gen.q65_rows() == pinned.Q65_EXPECTED


def test_q65_recall_meets_semantic_gate():
    vals = [r for _, r in pinned.Q65_EXPECTED]
    assert sum(vals) / len(vals) >= 0.8


def test_q61_pinned_matches_sequential_twin():
    assert gen.q61_rows() == pinned.Q61_EXPECTED


def test_q62_pinned_matches_sequential_twin():
    assert gen.q62_rows() == pinned.Q62_EXPECTED


def test_q63_pinned_matches_sequential_twin():
    assert gen.q63_rows() == pinned.Q63_EXPECTED


def test_q48_recall_meets_semantic_gate():
    vals = [r for _, r in pinned.Q48_EXPECTED]
    assert sum(vals) / len(vals) >= 0.8


def test_q94_pinned_matches_python_bpe_twin():
    assert gen.q94_rows() == pinned.Q94_EXPECTED


def test_q96_pinned_matches_numpy_kmeans_twin():
    assert gen.q96_rows() == pinned.Q96_EXPECTED


def test_q97_pinned_matches_python_tokenize_twin():
    assert gen.q97_rows() == pinned.Q97_EXPECTED


def test_q101_pinned_matches_numpy_twin():
    assert gen.q101_rows() == pinned.Q101_EXPECTED


def test_q101_int8_recall_meets_semantic_gate():
    vals = [r for _, r in pinned.Q101_EXPECTED]
    assert sum(vals) / len(vals) >= 0.8, vals


def test_q105_pinned_matches_numpy_twin():
    assert gen.q105_rows() == pinned.Q105_EXPECTED


def test_q105_semdedup_removes_something_but_not_everything():
    n = sum(m for _, m, _, _, _ in pinned.Q105_EXPECTED)
    r = sum(x for _, _, x, _, _ in pinned.Q105_EXPECTED)
    assert 0 < r < n // 4, (r, n)


@pytest.mark.skipif(not os.path.exists(gen.SF001),
                    reason="driver testdata not present")
def test_q110_pinned_matches_numpy_twin():
    assert gen.q110_rows() == pinned.Q110_EXPECTED


def test_q110_recall_meets_semantic_gate():
    vals = [r for _, r in pinned.Q110_EXPECTED]
    assert sum(vals) / len(vals) >= 0.8


@pytest.mark.skipif(not os.path.exists(gen.SF001),
                    reason="driver testdata not present")
def test_q112_pinned_matches_numpy_twin():
    assert gen.q112_rows() == pinned.Q112_EXPECTED


def test_q112_ivfpq_recall_meets_semantic_gate():
    vals = [r for _, r in pinned.Q112_EXPECTED]
    assert sum(vals) / len(vals) >= 0.8


def test_q114_pinned_matches_sequential_twin():
    assert gen.q114_rows() == pinned.Q114_EXPECTED


def test_q114_jitter_defeats_exact_dedup_but_not_perceptual():
    """The q114 corpus is built so every payload is byte-distinct (exact
    dedup finds zero groups) yet 60+ perceptual pairs survive — the
    operator's reason to exist, pinned."""
    assert len(pinned.Q114_EXPECTED) > 20
    assert all(h <= 3 for _, _, h in pinned.Q114_EXPECTED)


def test_q115_pinned_matches_sequential_twin():
    assert gen.q115_rows() == pinned.Q115_EXPECTED


def test_q115_covers_all_three_modalities():
    kinds = {k for _, _, k, _ in pinned.Q115_EXPECTED}
    assert kinds == {"image", "audio", "video"}


def test_q116_pinned_matches_sequential_twin():
    assert gen.q116_rows() == pinned.Q116_EXPECTED


def test_q116_every_gate_fires():
    by_id = {r[0]: r for r in pinned.Q116_EXPECTED}
    dup = by_id["zzzz/dup-of-first"]
    assert dup[7] == 2 and not dup[8] and not dup[9]   # dedup victim
    assert by_id["1999/0000"][8] and by_id["1999/0000"][9]
    assert not by_id["zzzz/punct-heavy"][6]            # quality fail
    assert by_id["zzzz/tiny"][4] == 4 and not by_id["zzzz/tiny"][6]
    kept = sum(1 for r in pinned.Q116_EXPECTED if r[9])
    assert kept == len(pinned.Q116_EXPECTED) - 3


def test_q117_pinned_matches_sequential_twin():
    assert gen.q117_rows() == pinned.Q117_EXPECTED


def test_q117_keeper_is_biggest_copy():
    by_cluster: dict = {}
    for ref, _k, cid, _n, nb, kept in pinned.Q117_EXPECTED:
        by_cluster.setdefault(cid, []).append((ref, nb, kept))
    assert len(by_cluster) == sum(1 for r in pinned.Q117_EXPECTED if r[5])
    for cid, mem in by_cluster.items():
        keepers = [m for m in mem if m[2]]
        assert len(keepers) == 1
        best = min(mem, key=lambda m: (-m[1], m[0]))
        assert keepers[0] == best
        assert cid == min(m[0] for m in mem)
